package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef._

/** The end-to-end training-shard preparation pipeline (★ SURVEY §2c —
  * the composition every operator above exists for), as ONE call a
  * 100 TB user runs to turn a raw document corpus into a clean train
  * split:
  *
  *   1. quality filter        ([[Sampling.qualityFilter]], q39 predicate)
  *   2. exact dedup           ([[Dedup.exact]] min-id representatives, q40)
  *   3. decontaminate TRAIN   (drop train docs sharing any
  *      [[Dedup.SpanWidth]]-token span with a test-split doc — the q90
  *      collision check pointed at the train side)
  *   4. shard manifest        (per-source doc/token counts — what a
  *      packing writer ([[Corpus.packSequences]]) consumes next)
  *
  * Stage order is the load-bearing design: quality filtering is a
  * stateless scan that shrinks everything downstream; exact dedup
  * collapses duplicate texts BEFORE span fingerprinting (the SCALE.md
  * lesson-1 composition — q88 measured the alternative); the span join
  * then runs train-side-big × test-side-distinct-fps, the bloom-filter-
  * friendly shape. Every stage is the already-gated operator, so the
  * pipeline's oracle is their SQL composed verbatim.
  */
object Pipeline {

  /** Per-source manifest (source, n_docs, n_tokens) of the cleaned train
    * shard. */
  def prepareTrainShard(docs: DataFrame, w: Int = Dedup.SpanWidth): DataFrame = {
    // 1. quality cut, as a semi-join on the gated operator's survivors
    val kept = docs.join(
      Sampling.qualityFilter(docs).select("doc_id"), Seq("doc_id"), "left_semi")
    // 2. exact-dedup representatives (min doc_id per identical text)
    val deduped = kept.join(
      Dedup.exact(kept).select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    val bySplit = deduped.withColumn("split", expr(Sampling.splitCase("doc_id")))
    // 3. span-collision decontamination of the train side: any train doc
    // sharing one w-token span with a test doc is dropped (anti-join on
    // the contaminated-id set; test fps collapse to DISTINCT first)
    val spans = Dedup.spanFps(bySplit, w)
      .withColumn("split", expr(Sampling.splitCase("doc_id")))
    val testFps = spans.filter(col("split") === "test").select("fp").distinct()
    val contaminated = spans.filter(col("split") === "train")
      .join(testFps, "fp").select("doc_id").distinct()
    val clean = bySplit.filter(col("split") === "train")
      .join(contaminated, Seq("doc_id"), "left_anti")
    // 4. shard manifest
    clean
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
  }

  def prepareTrainShardSql(w: Int): String =
    s"""WITH kept AS (SELECT d.* FROM documents d
          JOIN (SELECT doc_id FROM (${Sampling.qualityFilterSql})) q USING (doc_id)),
      reps AS (SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
      kd AS (SELECT k.*, ${Sampling.splitCaseDuck("k.doc_id")} AS split
             FROM kept k JOIN reps USING (doc_id)),
      tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM kd),
      spans AS (SELECT doc_id, md5(array_to_string(toks[i : i + ${w - 1}], ' ')) AS fp
        FROM (SELECT doc_id, toks,
                unnest(range(1, greatest(len(toks) - ${w - 1} + 1, 1))) AS i
              FROM tk)),
      sp AS (SELECT s.doc_id, s.fp, ${Sampling.splitCaseDuck("s.doc_id")} AS split FROM spans s),
      test_fps AS (SELECT DISTINCT fp FROM sp WHERE split = 'test'),
      contaminated AS (SELECT DISTINCT s.doc_id FROM sp s
        JOIN test_fps t ON s.fp = t.fp WHERE s.split = 'train'),
      clean AS (SELECT * FROM kd WHERE split = 'train'
        AND doc_id NOT IN (SELECT doc_id FROM contaminated))
      SELECT source, count(*) AS n_docs,
        CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM clean GROUP BY source"""

  val queries: Seq[QueryDef] = Seq(
    QueryDef("q91_train_shard",
      (s, d) => prepareTrainShard(t(s, d, "documents")),
      Some(prepareTrainShardSql(Dedup.SpanWidth))))
}
