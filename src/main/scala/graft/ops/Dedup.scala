package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef._

/** Deduplication over `documents` (★ SURVEY §2c): exact, n-gram Jaccard,
  * MinHash+LSH, SimHash.
  *
  * Hash functions are engine-portable by construction (md5 hex strings;
  * minimum-over-hex-strings equals minimum-over-values for fixed-length
  * hex), so every operator here has a full DuckDB oracle.
  *
  * Scale story:
  *  - exact: one hash-groupBy; trivially distributed.
  *  - ngram-jaccard pairs: gram-explode + equi-join on gram — exact but
  *    join size grows with shared-gram frequency; at 100 TB cap document
  *    frequency (`maxDocFreq`) or use MinHash instead.
  *  - MinHash+LSH: signatures computed per-row inside codegen (NO
  *    explode-per-hash — an array fold per document), then only 8 band
  *    keys per doc are shuffled; candidate verification touches candidate
  *    pairs only. This is the 100 TB path.
  *  - SimHash: per-row fold, embarrassingly parallel.
  */
object Dedup {

  /** Distinct word 3-gram shingles per document (empty when <3 tokens). */
  val shinglesExpr: String =
    """CASE WHEN size(split(text, ' ')) >= 3 THEN
         array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
           i -> concat(element_at(split(text, ' '), i), ' ',
                       element_at(split(text, ' '), i + 1), ' ',
                       element_at(split(text, ' '), i + 2))))
       ELSE CAST(array() AS ARRAY<STRING>) END"""

  /** DuckDB twin of shinglesExpr (over string_split + range). */
  val shinglesSql: String =
    """list_distinct(list_transform(range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
         i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]))"""

  /** Exact dedup: hash-group on canonical text, keep min doc_id. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))

  def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(shinglesExpr).as("grams"))

  /** Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >=
    * threshold) via gram-explode equi-join. `maxDocFreq` (off by default
    * for oracle parity) drops grams occurring in more than that many docs
    * — the standard stop-gram guard against join skew at scale. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double, maxDocFreq: Option[Long] = None): DataFrame = {
    val sh = shingled(docs)
    val grams0 = sh.select(col("doc_id"), explode(col("grams")).as("gram"))
    val grams = maxDocFreq match {
      case Some(cap) =>
        val hot = grams0.groupBy("gram").agg(count(lit(1)).as("df")).filter(col("df") > cap).select("gram")
        grams0.join(broadcast(hot), Seq("gram"), "left_anti")
      case None => grams0
    }
    val counts = sh.select(col("doc_id"), size(col("grams")).cast("long").as("n"))
    val inter = grams.as("a")
      .join(grams.as("b"), col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.as("ca"), col("id_a") === col("ca.doc_id"))
      .join(counts.as("cb"), col("id_b") === col("cb.doc_id"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("ca.n") + col("cb.n") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  val NumHashes = 32
  val Bands = 8
  val Rows = 4 // NumHashes / Bands

  /** MinHash signature: sig[j] = min over shingles of md5(j|gram), as hex
    * strings (min-by-string == min-by-value at fixed length). Computed
    * per-row — one codegen'd fold, no explode. */
  val minhashSigExpr: String =
    s"""transform(sequence(0, ${NumHashes - 1}),
          j -> array_min(transform(grams, g -> md5(concat(cast(j AS STRING), '|', g)))))"""

  /** LSH band keys: md5 over each band's `Rows` signature slots (band
    * index baked into the key so a single equi-join column suffices). */
  val bandKeysExpr: String = {
    val bands = (0 until Bands).map { b =>
      val parts = (1 to Rows).map(r => s"element_at(sig, ${b * Rows + r})").mkString(", ")
      s"md5(concat('$b', ':', $parts))"
    }.mkString(", ")
    s"array($bands)"
  }

  /** MinHash+LSH near-dup pairs: band-bucket join for candidates, then
    * exact Jaccard re-rank (array_intersect on the shingle sets) — output
    * identical to `ngramJaccardPairs` whenever LSH recall holds. */
  def minhashLshPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val sh = shingled(docs)
    val bands = sh
      .withColumn("sig", expr(minhashSigExpr))
      .withColumn("bkey", explode(expr(bandKeysExpr)))
      .select("doc_id", "bkey")
    val cands = bands.as("a")
      .join(bands.as("b"), col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cands
      .join(sh.select(col("doc_id").as("id_a"), col("grams").as("ga")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("grams").as("gb")), "id_b")
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (size(col("ga")) + size(col("gb")) - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Hex digits whose bit k is set, for k = 0..3 — turns md5 hex chars
    * into hash bits without any hex->int conversion. */
  private val HexBit = Array("13579bdf", "2367abef", "4567cdef", "89abcdef")

  val SimhashBits = 32

  /** 32-bit SimHash over word tokens as a '0'/'1' string: bit b set iff
    * sum over tokens of ±1 (sign of bit b of md5(token)) is >= 0. */
  def simhashExprs: (String, String) = {
    val spark = (0 until SimhashBits).map { b =>
      val pos = 1 + b / 4
      val set = HexBit(b % 4)
      s"CASE WHEN aggregate(transform(hs, h -> CASE WHEN instr('$set', substr(h, $pos, 1)) > 0 THEN 1 ELSE -1 END), 0L, (a, x) -> a + x) >= 0 THEN '1' ELSE '0' END"
    }.mkString("concat(", ", ", ")")
    val duck = (0 until SimhashBits).map { b =>
      val pos = 1 + b / 4
      val set = HexBit(b % 4)
      s"CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN strpos('$set', substr(h, $pos, 1)) > 0 THEN 1 ELSE -1 END)) >= 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")
    (spark, duck)
  }

  def simhash(docs: DataFrame): DataFrame =
    docs
      .withColumn("hs", expr("transform(split(text, ' '), t -> md5(t))"))
      .select(col("doc_id"), expr(simhashExprs._1).as("simhash"))

  val queries: Seq[QueryDef] = Seq(
    QueryDef("q40_dedup_exact",
      (s, d) => exact(t(s, d, "documents")),
      Some("""SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_docs
        FROM documents GROUP BY md5(text)""")),

    QueryDef("q41_dedup_ngram_jaccard",
      (s, d) => ngramJaccardPairs(t(s, d, "documents"), 0.8),
      Some(s"""WITH sh AS (SELECT doc_id, $shinglesSql AS grams FROM documents),
        grams AS (SELECT doc_id, unnest(grams) AS gram FROM sh),
        counts AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n FROM sh),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
          FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) AS jaccard
        FROM inter JOIN counts ca ON ca.doc_id = id_a JOIN counts cb ON cb.doc_id = id_b
        WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.8""")),

    QueryDef("q42_dedup_minhash_lsh",
      (s, d) => minhashLshPairs(t(s, d, "documents"), 0.8),
      Some {
        val bandsSql = (0 until Bands).map { b =>
          val parts = (1 to Rows).map(r => s"sig[${b * Rows + r}]").mkString(" || ")
          s"md5('$b' || ':' || $parts)"
        }.mkString(", ")
        s"""WITH sh AS (SELECT doc_id, $shinglesSql AS grams FROM documents),
        sigs AS (SELECT doc_id, grams,
            list_transform(range(0, $NumHashes),
              j -> list_aggregate(list_transform(grams, g -> md5(CAST(j AS VARCHAR) || '|' || g)), 'min')) AS sig
          FROM sh),
        bands AS (SELECT doc_id, unnest([$bandsSql]) AS bkey FROM sigs),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id),
        verified AS (SELECT c.id_a, c.id_b,
            CAST(len(list_intersect(sa.grams, sb.grams)) AS DOUBLE)
              / (len(sa.grams) + len(sb.grams) - len(list_intersect(sa.grams, sb.grams))) AS jaccard
          FROM cand c JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b)
        SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.8"""
      }),

    QueryDef("q43_dedup_simhash",
      (s, d) => simhash(t(s, d, "documents")),
      Some(s"""SELECT doc_id, ${simhashExprs._2} AS simhash
        FROM (SELECT doc_id, list_transform(string_split(text, ' '), t -> md5(t)) AS hs FROM documents)"""))
  )
}
