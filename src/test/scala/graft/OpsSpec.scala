package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

/** Semantic specs for the extension operators at sf0.001 — properties the
  * oracle compare can't express (idempotence, recall, invariants). */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  def docs = graft.queries.QueryDef.t(spark, dir, "documents")

  test("kmv sketch: per-source sketches merge to the whole-corpus sketch") {
    // the 100 TB claim: k smallest of the UNION of per-shard sketches ==
    // sketch of the union — merge on the driver, never re-scan. Build
    // per-source sketches (k smallest hashes each), merge them, and
    // compare the merged top-k + estimate against a from-scratch corpus
    // sketch over the same rows.
    import org.apache.spark.sql.functions._
    val k = 64
    val hashes = docs
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .select(col("source"),
        expr("CAST(conv(substr(md5(term), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .distinct()
    val perSource = hashes
      .withColumn("rnk", expr("row_number() OVER (PARTITION BY source ORDER BY h)"))
      .filter(col("rnk") <= k)
      .select("h").distinct() // the union of per-source sketches
      .orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    val scratch = hashes.select("h").distinct()
      .orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSeq
    assert(perSource == scratch,
      "merged per-source sketches must equal the from-scratch corpus sketch")
  }

  test("kmv aggregator == window form under adversarial repartitioning") {
    // the Aggregator's buffer is a set function, so ANY partitioning
    // must produce the identical sketch; 7 round-robin partitions give
    // every partial a different slice than the window form's shuffle
    import org.apache.spark.sql.functions._
    val want = Corpus.kmvDistinct(docs)
      .select("source", "n_kept", "kth_hash", "est")
      .collect().map(_.toSeq).toSet
    val got = Corpus.kmvDistinctAgg(docs.repartition(7))
      .collect().map(_.toSeq).toSet
    assert(got == want, s"aggregator form diverged:\nonly-agg=${got -- want}\nonly-win=${want -- got}")
  }

  test("ablation grid: variants nest monotonically and conserve against raw") {
    val g = graft.ops.Pipeline.ablationGrid(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val order = Seq("0_raw", "1_dedup", "2_dedup_rules", "3_dedup_rules_clf")
    assert(g.keySet == order.toSet)
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(g(a)._1 >= g(b)._1, s"$b docs must nest inside $a")
      assert(g(a)._2 >= g(b)._2, s"$b tokens must nest inside $a")
    }
    assert(g("0_raw")._1 == docs.count(), "raw row must equal the corpus")
    assert(g("3_dedup_rules_clf")._1 > 0, "the full pipeline must keep something")
  }

  test("davies-bouldin: worst neighbor is foreign and components are positive") {
    val rows = graft.ops.Similarity.daviesBouldin(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(0) != r.getInt(3), "worst_other must differ from the label")
      assert(r.getLong(2) > 0, "scatter must be positive on non-degenerate clusters")
      assert(r.getLong(4) > 0, "the DB ratio must be positive")
    }
  }

  test("dedup exact: fingerprint groups partition the corpus") {
    val d = Dedup.exact(docs).collect()
    assert(d.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(d.map(_.getAs[String]("fp")).distinct.length == d.length)
  }

  test("minhash LSH pairs == exact ngram-jaccard pairs (full recall at 0.8)") {
    val exact = Dedup.ngramJaccardPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    assert(exact.nonEmpty) // the corpus has planted near-dups
  }

  test("reps-composed near-dup rates == naive rates on a duplicate-heavy corpus") {
    import org.apache.spark.sql.functions._
    // replicate sf0.001 docs 5x with offset ids AND rotated sources: exact
    // groups span sources, so within/cross involvement must be decided
    // from (group, source) occupancy — the hard case for the group algebra
    val n = docs.agg(max("doc_id")).head().getLong(0) + 1
    val sources = docs.select("source").distinct()
      .collect().map(_.getString(0)).sorted
    val srcExpr = sources.zipWithIndex
      .map { case (s, i) => s"WHEN '$s' THEN ${i}L" }
      .mkString("CASE source ", " ", " ELSE -1L END")
    val rep = (0 until 5).map { k =>
      docs.select((col("doc_id") + lit(k * n)).as("doc_id"), col("text"),
        // rotate the source by k so replicas of one text live in k sources
        element_at(lit(sources), (((expr(srcExpr) + k) % sources.length) + 1).cast("int")).as("source"))
    }.reduce(_ unionByName _)
    val tmp = java.nio.file.Files.createTempDirectory("ndr-reps").toString
    rep.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("source").collect().map(_.toString).toSeq
    val naive = sorted(Dedup.nearDupRates(spark, tmp))
    val composed = sorted(Dedup.nearDupRatesDeduped(spark, tmp))
    assert(composed == naive, "group-algebra rates must equal the naive pair-explode rates")
    // and the reps pair mine emits one pair per distinct TEXT pair: vs the
    // naive mine's output-quadratic d²-per-group blowup on this corpus
    val naivePairs = Dedup.minhashLshPairs(
      graft.queries.QueryDef.t(spark, tmp, "documents"), 0.8).count()
    val repPairs = Dedup.minhashLshPairsDeduped(
      graft.queries.QueryDef.t(spark, tmp, "documents"), 0.8).count()
    assert(repPairs < naivePairs / 10,
      s"reps mine ($repPairs) must collapse the replicated pair space ($naivePairs)")
    SessionHygiene.clear(spark)
  }

  test("degenerate sub-shingle docs: mine is total (null bands); reps rates count exact dups") {
    import org.apache.spark.sql.functions._
    // "x y" shingles to an EMPTY gram set: its minhash bands are null,
    // null keys never join, so the mine forms no candidate and no 0/0
    // verify — total under ANSI, zero pairs. The group-algebra report
    // (q126) counts the two byte-identical copies as within-dups via the
    // group self-edge: the one documented divergence from the naive form.
    val tmp = java.nio.file.Files.createTempDirectory("degen").toString
    val d = {
      import spark.implicits._
      Seq((1L, "a", "x y"), (2L, "a", "x y"),
        (3L, "b", "a perfectly ordinary document with enough tokens to shingle"))
        .toDF("doc_id", "source", "text")
    }
    d.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    assert(Dedup.minhashLshPairs(d, 0.8).count() == 0, "no pairs, no crash")
    val naive = Dedup.nearDupRates(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_within_dup")).toMap
    val comp = Dedup.nearDupRatesDeduped(spark, tmp).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_within_dup")).toMap
    assert(naive("a") == 0L, "naive form cannot see sub-shingle exact dups")
    assert(comp("a") == 2L, "group algebra counts byte-identical texts as dups")
    assert(naive("b") == 0L && comp("b") == 0L)
    SessionHygiene.clear(spark)
  }

  test("cdc chunking: boundaries re-align after a prepended token (shift robustness)") {
    import org.apache.spark.sql.functions._
    // the same long text, once verbatim and once with one token
    // prepended: fixed-width spans all shift (every w-gram changes);
    // CDC boundaries are content-chosen, so all chunks after the first
    // boundary re-align and share fingerprints
    val base = docs.orderBy("doc_id").limit(60)
      .agg(concat_ws(" ", collect_list("text"))).head().getString(0)
    val d = {
      import spark.implicits._
      Seq((1L, "a", base), (2L, "b", "inserted " + base))
        .toDF("doc_id", "source", "text")
    }
    val byDoc = Dedup.cdcChunks(d).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(2)).toSet).toMap
    val shared = byDoc(1L).intersect(byDoc(2L)).size.toDouble
    assert(byDoc(1L).size > 10, s"corpus slice too short for the property (${byDoc(1L).size} chunks)")
    assert(shared / byDoc(1L).size >= 0.8,
      f"CDC must re-align after an insertion: only ${shared / byDoc(1L).size}%.2f shared")
    // and the chunking partitions the token stream exactly
    val stats = Dedup.cdcChunkStats(d).agg(sum("n_tokens")).head().getLong(0)
    assert(stats == d.select(sum(size(split(col("text"), " ")))).head().getLong(0))
  }

  test("edit near-dups: a merged-token region is caught by edit verify where token-set jaccard craters") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a contiguous region of dropped spaces (60 token merges in tokens
    // 100-220 of a ~600-token doc): ~120 word-3-gram shingles change, so
    // jaccard falls below the 0.8 cut — but the CHARACTER edit is just
    // 60 deletions (sim ~0.98), and CDC chunks outside the region
    // re-align, so the pair still blocks together
    val toksAll = docs.orderBy("doc_id").limit(40)
      .agg(concat_ws(" ", collect_list("text"))).head().getString(0).split(" ")
    val baseToks = toksAll.slice(0, 600)
    val base = baseToks.mkString(" ")
    val mutated = (baseToks.slice(0, 100) ++
      baseToks.slice(100, 220).grouped(2).map(_.mkString("")) ++
      baseToks.slice(220, 600)).mkString(" ")
    val d = Seq((1L, "a", base), (2L, "b", mutated)).toDF("doc_id", "source", "text")
    val jac = Dedup.ngramJaccardPairs(d, 0.8).count()
    assert(jac == 0L, "the token-set mine must miss the merged-boundary pair")
    val ed = Dedup.editNearDupPairs(d).collect()
    assert(ed.length == 1, s"edit verify must catch the pair, got ${ed.length}")
    assert(ed.head.getAs[Long]("dist") == 60L, s"60 dropped spaces, got ${ed.head.getAs[Long]("dist")}")
    assert(ed.head.getAs[Double]("sim") > 0.95)
    // and a genuinely different pair is NOT reported even when CDC
    // blocks them together via a shared chunk (quote + unrelated tail)
    val toks = docs.orderBy("doc_id").limit(40)
      .agg(concat_ws(" ", collect_list("text"))).head().getString(0).split(" ")
    val d2 = Seq(
      (1L, "a", toks.slice(0, 600).mkString(" ")),
      (2L, "b", (toks.slice(0, 200) ++ toks.slice(3000, 3400)).mkString(" ")))
      .toDF("doc_id", "source", "text")
    assert(Dedup.editNearDupPairs(d2).count() == 0L,
      "a shared-prefix pair far apart in edit distance must fail the verify")
  }

  test("leakage-safe folds: every near-dup pair lands in one fold, folds in range") {
    import org.apache.spark.sql.functions._
    val folds = Dedup.leakageSafeFolds(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(folds.values.forall { case (_, f) => f >= 0 && f < 5 })
    assert(folds.values.map(_._2).toSet.size > 1, "multiple folds must be populated")
    val pairs = Dedup.minhashLshPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      assert(folds(a)._2 == folds(b)._2, s"near-dup pair ($a, $b) split across folds")
      assert(folds(a)._1 == folds(b)._1, s"pair ($a, $b) in different clusters")
    }
  }

  test("temperature mix: flattening upweights small sources, shares and budget hold") {
    import org.apache.spark.sql.functions._
    val rows = Sampling.temperatureMix(docs).collect()
    assert(rows.nonEmpty)
    // per-source kept tokens never exceed the share
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val share = rs.head.getAs[Long]("share_tokens")
      assert(rs.map(_.getAs[Long]("n_tokens")).sum <= share)
    }
    // flattening: share/avail is (weakly) decreasing in avail — the
    // smallest source gets a strictly larger fraction of itself than
    // the largest (sqrt weights), which proportional mixing never does
    val avail = docs.select(col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("avail")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val shares = rows.groupBy(_.getString(1)).view
      .mapValues(_.head.getAs[Long]("share_tokens")).toMap
    val bySize = shares.keys.toSeq.sortBy(avail)
    val (small, big) = (bySize.head, bySize.last)
    assert(avail(small) < avail(big), "corpus must have unequal sources for the property")
    assert(shares(small) * avail(big) > shares(big) * avail(small),
      s"sqrt temperature must favor the small source: $small ${shares(small)}/${avail(small)} vs $big ${shares(big)}/${avail(big)}")
  }

  test("cluster histogram + folds: reps-composed forms equal the naive ones on a replicated corpus") {
    import org.apache.spark.sql.functions._
    // the q126 equality corpus: 5x replication with offset ids — exact
    // groups of 5, plus whatever near-dup structure the slice has
    val n = docs.agg(max("doc_id")).head().getLong(0) + 1
    val tmp = java.nio.file.Files.createTempDirectory("chist-reps").toString
    (0 until 5).map { k =>
      docs.select((col("doc_id") + lit(k * n)).as("doc_id"), col("text"), col("source"))
    }.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def rep = spark.read.parquet(s"$tmp/documents.parquet")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(sorted(Dedup.clusterSizeHistogramDeduped(rep)) ==
      sorted(Dedup.clusterSizeHistogram(rep)),
      "group-algebra histogram must equal the naive one")
    SessionHygiene.clear(spark)
    assert(sorted(Dedup.leakageSafeFoldsDeduped(rep)) ==
      sorted(Dedup.leakageSafeFolds(rep)),
      "group-algebra folds must equal the naive ones")
    SessionHygiene.clear(spark)
  }

  test("silence trim: edges trim, interior silence survives, round-trip md5") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val loud = "x" * 64 // one full high-energy frame
    val d = Seq(
      (1L, " " * 128 + loud + " " * 64, 0L),        // 2 lead + 1 tail silent frames
      (2L, loud + " " * 192 + loud, 0L),             // interior silence only
      (3L, " " * 256, 0L)                            // all silence
    ).toDF("doc_id", "text", "n_chars")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val rows = Multimodal.trimSilence(
      Multimodal.attachMedia(d).as[graft.ops.MediaRecord]).collect()
      .map(r => r.doc_id -> r).toMap
    assert(rows(1L).lead_trimmed == 2 && rows(1L).tail_trimmed == 1)
    assert(rows(1L).kept_len == 64 &&
      rows(1L).kept_md5 == java.security.MessageDigest.getInstance("MD5")
        .digest(loud.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(rows(2L).lead_trimmed == 0 && rows(2L).tail_trimmed == 0 &&
      rows(2L).kept_len == 64 + 192 + 64, "interior silence must survive")
    assert(rows(3L).lead_trimmed == 4 && rows(3L).tail_trimmed == 0 &&
      rows(3L).kept_len == 0, "all-silent payload empties with lead consuming everything")
  }

  test("mmr rerank: greedy invariants (argmax-rel first pick, bounded scores, distinct ranks)") {
    val rows = Similarity.mmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).sorted.toSeq == (1L to rows.length).toSeq, "ranks must be 1..k")
    assert(rows.map(_._2).distinct.length == rows.length, "no vec_id selected twice")
    val first = rows.find(_._1 == 1L).get
    assert(first._3 == rows.map(_._3).max, "step 1 must pick the pure relevance argmax")
    // penalty = max cosine to selected, which lives in [-1, 1] (a random
    // corpus yields NEGATIVE sims, which raise the score above λ·rel)
    val lam = Similarity.MmrLambda.toDouble
    val oml = Similarity.MmrOneMinusLambda.toDouble
    rows.foreach { case (_, id, rel, score) =>
      assert(score <= lam * rel + oml + 1e-12 && score >= lam * rel - oml - 1e-12,
        s"vec $id: score $score outside lambda*rel +/- (1-lambda)") }
  }

  test("cdc containment: a wholesale quote scores high containment at tiny jaccard") {
    import org.apache.spark.sql.functions._
    val toks = docs.orderBy("doc_id").limit(60)
      .agg(concat_ws(" ", collect_list("text"))).head().getString(0).split(" ")
    val long = toks.mkString(" ")
    // a ~400-token contiguous slice: every interior CDC boundary is
    // content-chosen identically in both docs, so the quote's chunks
    // align with the original's — high containment; chunk-Jaccard
    // against the full doc stays small
    val quote = toks.slice(1000, 1400).mkString(" ")
    val d = {
      import spark.implicits._
      Seq((1L, "a", long), (2L, "b", quote)).toDF("doc_id", "source", "text")
    }
    val rows = Dedup.cdcContainmentPairs(d, threshold = 0.3).collect()
    assert(rows.length == 1, s"expected the containment pair, got ${rows.length}")
    val r = rows.head
    val (shared, cont) = (r.getAs[Long]("n_shared"), r.getAs[Double]("containment"))
    assert(cont >= 0.5, f"quote containment $cont%.2f < 0.5")
    // and the symmetric overlap against the LONG side is genuinely small
    val chunksLong = Dedup.cdcChunks(d.filter(col("doc_id") === 1L))
      .select("fp").distinct().count()
    assert(shared.toDouble / chunksLong < 0.35,
      "jaccard-style overlap must be small — containment is the signal here")
    SessionHygiene.clear(spark)
  }

  test("prefix filter is order-invariant: df-ordered == lexicographic output") {
    val lex = Dedup.ngramJaccardPairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the df-ordered sort stage must not rank via a global
    // (partitionBy-less) window — that single-threads the gram vocabulary
    // at scale. Checked on the pre-checkpoint subtree (the full query's
    // plan hides it behind the eager localCheckpoint's LogicalRDD).
    val sortStage = Dedup.canonicalSorted(Dedup.shingled(docs), orderByDocFreq = true)
    sortStage.queryExecution.optimizedPlan.foreach {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        assert(w.partitionSpec.nonEmpty, "global window in df-ordered prefix path")
      case _ => ()
    }
    val byDf = Dedup.ngramJaccardPairs(docs, 0.8, orderByDocFreq = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(byDf == lex && lex.nonEmpty)
  }

  test("maxDocFreq cap shrinks the candidate join and keeps planted dups") {
    import org.apache.spark.sql.functions.{col, size => asize, sort_array, expr}
    def shWith(cap: Option[Long]) = {
      val base = cap.foldLeft(Dedup.shingled(docs))((b, c) => Dedup.capGrams(b, c))
      base.withColumn("sorted", sort_array(col("grams")))
        .withColumn("n", asize(col("grams")).cast("long"))
    }
    val uncapped = Dedup.prefixCandidates(shWith(None)).count()
    val capped = Dedup.prefixCandidates(shWith(Some(4))).count()
    assert(capped < uncapped,
      s"cap must shrink candidates: capped=$capped uncapped=$uncapped")
    // the planted near-dup pairs survive the cap (their shared grams are rare)
    val pairs = Dedup.ngramJaccardPairs(docs, 0.8, maxDocFreq = Some(4))
    assert(pairs.count() > 0)
    assert(pairs.filter(expr("id_a >= id_b")).count() == 0)
  }

  test("near-dup clusters: pairs co-clustered, labels are component minima") {
    val pairs = Dedup.minhashLshPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cl = Dedup.nearDupClusters(docs, 0.8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl.size == docs.count()) // every doc labeled, singletons included
    pairs.foreach { case (a, b) => assert(cl(a) == cl(b), s"pair ($a,$b) split") }
    // label is the minimum doc_id of its cluster
    cl.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl)
    }
    assert(pairs.nonEmpty && cl.values.toSet.size < cl.size) // some merging happened
  }

  test("simhash pairs over representatives are a subset of all-docs pairs") {
    val all = Dedup.simhashPairs(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val reps = Dedup.simhashPairsDeduped(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reps.nonEmpty && reps.subsetOf(all))
  }

  test("ngram jaccard: symmetric threshold, jaccard in (0,1]") {
    val rows = Dedup.ngramJaccardPairs(docs, 0.8).collect()
    assert(rows.forall(r => r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0))
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("simhash: near-dup pairs collide, fingerprints are 32-bit strings") {
    val fp = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp.values.forall(s => s.length == 32 && s.forall(c => c == '0' || c == '1')))
    val nearDups = Dedup.ngramJaccardPairs(docs, 0.8)
      .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // >=0.9-jaccard docs should agree on most simhash bits (random pairs
    // expect hamming ~16 of 32)
    nearDups.foreach { case (a, b) =>
      val hamming = fp(a).zip(fp(b)).count { case (x, y) => x != y }
      assert(hamming <= 8, s"pair ($a,$b) hamming=$hamming")
    }
  }

  test("knn brute: k rows per vector, sim descending, self excluded") {
    val rows = Similarity.knnBrute(spark, dir, 5).collect()
    val byVec = rows.groupBy(_.getLong(0))
    assert(byVec.forall(_._2.length == 5))
    byVec.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x.getDouble(3) >= y.getDouble(3); case _ => true
      })
      assert(rs.forall(r => r.getLong(2) != r.getLong(0)))
    }
  }

  test("knn LSH: every reported (vec, neighbor, sim) exists in the all-pairs truth") {
    val brute = Similarity.knnBrute(spark, dir, 500).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
    val lsh = Similarity.knnLsh(spark, dir, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(lsh.nonEmpty)
    // every LSH (vec, neighbor, sim) must appear among all-pairs sims
    assert(lsh.forall(brute.contains))
  }

  test("events() is session-timezone independent (forces UTC for the NTZ cast)") {
    val tzBefore = spark.conf.get("spark.sql.session.timeZone")
    val utcTs = try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      EventOps.events(spark, dir).agg(org.apache.spark.sql.functions.min("ts"))
        .head().getLong(0)
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
    val shiftedTs = try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      EventOps.events(spark, dir).agg(org.apache.spark.sql.functions.min("ts"))
        .head().getLong(0)
    } finally spark.conf.set("spark.sql.session.timeZone", tzBefore)
    assert(utcTs == shiftedTs,
      s"events() shifted by session tz: UTC=$utcTs vs NY=$shiftedTs")
  }

  test("sessionize: per-user event counts are preserved") {
    val ev = EventOps.events(spark, dir)
    val sessions = EventOps.sessionize(ev, 1800L)
    val perUserSess = sessions.groupBy("user_id").sum("n_events")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perUser = ev.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perUserSess == perUser)
  }

  test("attribution: cents conserve per purchase; boundary click moves to next window; remainder to latest") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // user 7: p1 at t=100s (cents 100, 3 prior clicks -> 33/33/34, 34 on the
    // latest), a click stamped EXACTLY at p1 (t=100s) must attribute to p2,
    // not p1; p2 at t=200s. user 8: purchase with no clicks keeps all cents.
    def ns(sec: Long) = sec * 1000000000L
    val ev = Seq(
      (1L, 7L, "click", 0.0, ns(10)), (2L, 7L, "click", 0.0, ns(20)),
      (3L, 7L, "click", 0.0, ns(30)), (4L, 7L, "purchase", 1.00, ns(100)),
      (5L, 7L, "click", 0.0, ns(100)), // boundary: == p1's ts
      (6L, 7L, "purchase", 0.50, ns(200)),
      (7L, 8L, "purchase", 2.00, ns(50)),
      // user 9: REFUND (negative cents). -100 div 3 = -33 truncating and
      // -100 % 3 = -1 (sign of dividend) in BOTH Spark and DuckDB, so the
      // split is -33/-33/-34 and conservation holds; pmod would have paired
      // +2 with the truncating div and leaked 3 cents.
      (8L, 9L, "click", 0.0, ns(10)), (9L, 9L, "click", 0.0, ns(20)),
      (10L, 9L, "click", 0.0, ns(30)), (11L, 9L, "purchase", -1.00, ns(100))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val rows = EventOps.attribution(ev).collect()
      .map(r => (r.getAs[Long]("purchase_id"), Option(r.getAs[Any]("click_id")),
        r.getAs[Long]("n_clicks"), r.getAs[Long]("attributed_cents")))
    val p1 = rows.filter(_._1 == 4L)
    assert(p1.map(_._4).sorted.toSeq == Seq(33L, 33L, 34L))
    assert(p1.find(_._4 == 34L).get._2.contains(3L), "remainder goes to the LATEST click")
    assert(!p1.exists(_._2.contains(5L)), "boundary click is not in p1's window")
    val p2 = rows.filter(_._1 == 6L)
    assert(p2.map(_._2.get).toSeq == Seq(5L) && p2.head._4 == 50L, "boundary click attributes to p2")
    assert(rows.filter(_._1 == 7L).toSeq == Seq((7L, None, 0L, 200L)), "no-click purchase keeps all cents")
    val refund = rows.filter(_._1 == 11L)
    assert(refund.map(_._4).sorted.toSeq == Seq(-34L, -33L, -33L),
      s"refund splits -33/-33/-34 with truncating div + sign-of-dividend remainder: ${refund.toSeq}")
    assert(refund.map(_._4).sum == -100L, "refund cents conserve")
    // corpus-wide conservation on real testdata: attributed == purchase cents
    val full = EventOps.attribution(EventOps.events(spark, dir))
    val attributed = full.agg(sum("attributed_cents")).head().getLong(0)
    val purchases = EventOps.events(spark, dir).filter(col("event_type") === "purchase")
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long"))).head().getLong(0)
    assert(attributed == purchases, s"conservation: $attributed != $purchases")
    // no click attributed twice
    val dupClicks = full.filter(col("click_id").isNotNull)
      .groupBy("click_id").count().filter(col("count") > 1).count()
    assert(dupClicks == 0L)
  }

  test("q192 attribution models: every model conserves total cents; fixture allocations; position zeroes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ns(sec: Long) = sec * 1000000000L
    // user 7: 3 clicks (10,20,30) then purchase 100c — linear 33/33/34,
    // first-touch 100 to click 1, last-touch 100 to click 3.
    // user 8: single-click purchase ('only') and a no-click purchase ('none').
    val ev = Seq(
      (1L, 7L, "click", 0.0, ns(10)), (2L, 7L, "click", 0.0, ns(20)),
      (3L, 7L, "click", 0.0, ns(30)), (4L, 7L, "purchase", 1.00, ns(100)),
      (5L, 8L, "click", 0.0, ns(10)), (6L, 8L, "purchase", 0.70, ns(50)),
      (7L, 8L, "purchase", 0.30, ns(60))
    ).toDF("event_id", "user_id", "event_type", "value", "ts")
    val m = EventOps.attributionModels(ev).collect()
      .map(r => (r.getAs[String]("model"), r.getAs[String]("position")) ->
        r.getAs[Long]("cents")).toMap.withDefaultValue(0L)
    // per-model conservation: 100 + 70 + 30 everywhere
    Seq("linear", "first_touch", "last_touch").foreach { mod =>
      val tot = Seq("first", "middle", "last", "only", "none").map(p => m((mod, p))).sum
      assert(tot == 200L, s"$mod conserves: $tot")
      assert(m((mod, "only")) == 70L && m((mod, "none")) == 30L,
        "models agree on only/none by construction")
    }
    assert(m(("linear", "first")) == 33L && m(("linear", "middle")) == 33L
      && m(("linear", "last")) == 34L)
    assert(m(("first_touch", "first")) == 100L && m(("first_touch", "middle")) == 0L
      && m(("first_touch", "last")) == 0L)
    assert(m(("last_touch", "last")) == 100L && m(("last_touch", "first")) == 0L)
    // real-corpus conservation: all three models rebuild q150's total
    val full = EventOps.attributionModels(EventOps.events(spark, dir)).collect()
    val byModel = full.groupBy(_.getAs[String]("model"))
      .view.mapValues(_.map(_.getAs[Long]("cents")).sum).toMap
    assert(byModel.values.toSet.size == 1, s"models must agree on the total: $byModel")
  }

  test("q193 activity concentration: uniform = 0; 99%-one-user fixture exact; grouped formula == per-user brute") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def mk(rows: Seq[(Long, Long)]) = rows.zipWithIndex.map { case ((u, reps), i) =>
      (u, reps)
    }.flatMap { case (u, reps) => (1L to reps).map(r => (u * 100000 + r, u, "view", 0.0, r * 1000000000L)) }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    // uniform: 4 users × 5 events — Gini exactly 0; top-10% = 1 of 4 users = 25%
    val uni = EventOps.activityConcentration(mk(Seq((1L, 5L), (2L, 5L), (3L, 5L), (4L, 5L)))).collect().head
    assert(uni.getAs[Long]("gini_micro") == 0L)
    assert(uni.getAs[Long]("top10_micro") == 250000L)
    // concentrated: 9 users × 1 + 1 user × 991 → hand-computed gini 0.8910
    val conc = EventOps.activityConcentration(
      mk((1L to 9L).map(u => (u, 1L)) :+ (10L, 991L))).collect().head
    assert(conc.getAs[Long]("gini_micro") == 891000L)
    assert(conc.getAs[Long]("top10_micro") == 991000L)
    assert(conc.getAs[Long]("top1_micro") == 991000L)
    // real corpus: grouped closed form == per-user brute force, every type
    val got = EventOps.activityConcentration(EventOps.events(spark, dir)).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val counts = EventOps.events(spark, dir).groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("c")).collect()
      .groupBy(_.getAs[String]("event_type"))
    counts.foreach { case (et, rows) =>
      val xs = rows.map(_.getAs[Long]("c")).sorted
      val n = xs.length.toLong; val s = xs.sum
      val isum = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val gini = (BigInt(2 * isum - (n + 1) * s) * 1000000 / BigInt(n * s)).toLong
      val k10 = (n + 9) / 10
      val top10 = (xs.reverse.take(k10.toInt).sum * 1000000L) / s
      assert(got(et).getAs[Long]("gini_micro") == gini, s"$et gini")
      assert(got(et).getAs[Long]("top10_micro") == top10, s"$et top10")
    }
  }

  test("mad outliers: catches the spike classic z-score dilutes away") {
    import spark.implicits._
    val ev = Seq(
      (1L, 5L, 8.0), (2L, 5L, 9.0), (3L, 5L, 10.0),
      (4L, 5L, 11.0), (5L, 5L, 12.0), (6L, 5L, 1000.0)
    ).map { case (e, u, v) => (e, u, "view", v, e * 1000000000L) }
      .toDF("event_id", "user_id", "event_type", "value", "ts")
    val mad = EventOps.madOutliers(ev).collect()
    assert(mad.map(_.getAs[Long]("event_id")).toSeq == Seq(6L),
      "exactly the spike is MAD-flagged")
    assert(mad.head.getAs[Double]("med") == 10.5 && mad.head.getAs[Double]("mad") == 1.5)
    // the same spike inflates mean AND std enough that q80's z-test misses it
    val z = EventOps.valueOutliers(ev).collect()
    assert(z.isEmpty, "z-score is diluted by its own contamination")
  }

  test("asof join: matched click is strictly earlier, same user") {
    val ev = EventOps.events(spark, dir)
    val m = EventOps.asofJoin(ev, "purchase", "click").collect()
    assert(m.nonEmpty)
    m.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(3) < r.getLong(2)) // right_t_us < left_t_us
    }
  }

  test("media features: histogram sums to byte_len") {
    val feats = Multimodal.mediaPipeline(spark, dir)
    val agg = feats.groupBy("doc_id", "byte_len").sum("cnt").collect()
    assert(agg.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("salted skew join == plain join, spread over salt buckets") {
    import org.apache.spark.sql.functions._
    val li = graft.queries.QueryDef.t(spark, dir, "lineitem")
    val orders = graft.queries.QueryDef.t(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(orders, "l_orderkey").count()
    val salted = SkewJoin.saltedInnerJoin(li, orders, "l_orderkey", "l_linenumber").count()
    assert(salted == plain && plain > 0)
  }

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    import org.apache.spark.sql.functions._
    val li = graft.queries.QueryDef.t(spark, dir, "lineitem")
    val r = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05)
  }

  test("hash sampling: deterministic, near-nominal fraction, split partitions corpus") {
    val n = docs.count()
    val s1 = Sampling.hashSample(docs, 6554).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.hashSample(docs, 6554).collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // pure function of id — stable across runs
    val frac = s1.size.toDouble / n
    assert(frac > 0.04 && frac < 0.2, s"10% nominal, got $frac")
    val split = Sampling.hashSplit(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(split.size == n) // every doc in exactly one split
    val train = split.values.count(_ == "train").toDouble / n
    assert(train > 0.7 && train < 0.9, s"80% nominal train, got $train")
    // sample ⊂ hash space below 0x199a ⊂ train range (0xcccd): consistent
    assert(s1.forall(id => split(id) == "train"))
  }

  test("quality filter: integer predicates hold on every surviving row") {
    val rows = Sampling.qualityFilter(docs).collect()
    assert(rows.nonEmpty && rows.length < docs.count())
    rows.foreach { r =>
      val (nt, nd, sl, ns) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nt >= 20 && nd * 10 >= nt * 3 && sl >= nt * 3 && sl <= nt * 12 && ns >= 1)
    }
  }

  test("quality score bounded in [0,1]") {
    val q = TextStats.quality(docs).collect()
    assert(q.forall { r =>
      val s = r.getAs[Double]("score"); s >= 0.0 && s <= 1.0
    })
  }

  test("q54 topk aggregator rows == q10 window top-3 rows") {
    val agg = SparkEntry.queries("q54_topk_agg")(spark, dir)
      .collect().map(_.toSeq).toSet
    val win = SparkEntry.queries("q10_top3_per_supplier")(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(agg == win && agg.nonEmpty)
  }

  test("proximity pairs: banded equi-join == naive theta join, no dup pairs") {
    import org.apache.spark.sql.functions._
    val ev = EventOps.events(spark, dir)
    val banded = EventOps.proximityPairs(ev, 300L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(banded.length == banded.toSet.size, "each pair must meet exactly once")
    val e = ev.select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("t_us"))
    val naive = e.as("a").join(e.as("b"),
      col("a.user_id") === col("b.user_id") &&
        (col("b.t_us") - col("a.t_us")).between(0L, 300000000L) &&
        (col("a.t_us") < col("b.t_us") ||
          (col("a.t_us") === col("b.t_us") && col("a.event_id") < col("b.event_id"))))
      .select(col("a.event_id"), col("b.event_id"), col("b.t_us") - col("a.t_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded.toSet == naive && naive.nonEmpty)
  }

  test("q70 hll distinct: within 2% of exact per group; daily sketches merge losslessly") {
    import org.apache.spark.sql.functions._
    val ev = graft.ops.EventOps.events(spark, dir)
    val est = graft.ops.EventOps.approxDistinctUsers(ev).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type").agg(countDistinct("user_id").as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      assert(math.abs(est(k) - ex) <= math.max(1.0, 0.02 * ex),
        s"$k: est ${est(k)} vs exact $ex")
    }
    // mergeability: union of per-day sketches == whole-corpus sketch.
    // This is THE property that makes sketches the 100 TB shape — a day's
    // sketch is computed once and unions associatively into any rollup.
    val daily = ev.withColumn("day", expr("ts DIV 86400000000000"))
      .groupBy("event_type", "day").agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("merged"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(daily == est,
      "union of daily sketches must equal the corpus sketch estimate")
  }

  test("q71 repetition: fractions in [0,1]; bigram count = token count - 1; dup text maxes out") {
    import org.apache.spark.sql.functions._
    val r = TextStats.repetitionSignals(docs).collect()
    assert(r.length == docs.count())
    r.foreach { row =>
      val (nt, nb) = (row.getAs[Long]("n_tokens"), row.getAs[Long]("n_bigrams"))
      assert(nb == math.max(nt - 1, 0L))
      val (dt, db) = (row.getAs[Double]("dup_token_frac"), row.getAs[Double]("dup_bigram_frac"))
      assert(dt >= 0.0 && dt <= 1.0 && db >= 0.0 && db <= 1.0)
    }
    // a document that is one phrase repeated has dup fractions near 1
    val spam = spark.createDataFrame(Seq((1L, Seq.fill(50)("buy now").mkString(" "))))
      .toDF("doc_id", "text")
    val s = TextStats.repetitionSignals(spam).collect().head
    assert(s.getAs[Double]("dup_token_frac") > 0.9)
    assert(s.getAs[Double]("dup_bigram_frac") > 0.9)
  }

  test("q188 gopher repetition: run-length pass == hand counts; catches the doc q71's distinct-ratio can't") {
    import org.apache.spark.sql.functions._
    // "a b" repeated: toks = [a b a b a b], bigrams = [a b, b a, a b, b a, a b]
    // → n2 = 5, top2 = 3 (15 > 5 fails rule 1); 5-grams [a b a b a, b a b a b]
    // → n5 = 2 distinct singles → dup5 = 0 (rule 3 passes).
    // The salad doc has every phrase ≤ 2× → top shares tiny, all rules pass —
    // yet BOTH docs have dup_bigram_frac > 0.5, the pair q71 cannot split.
    val spam = "a b " * 3
    val salad = (1 to 30).flatMap(i => Seq(s"w$i x$i", s"w$i x$i")).mkString(" ")
    val d = spark.createDataFrame(Seq(
      (1L, spam.trim, "spam_src"), (2L, salad, "salad_src")))
      .toDF("doc_id", "text", "source")
    val r = TextStats.gopherRepetition(d).collect()
      .map(row => row.getAs[String]("source") -> row).toMap
    assert(r("spam_src").getAs[Long]("pass_top2") == 0L, "repeated phrase must trip the top-2-gram rule")
    assert(r("spam_src").getAs[Long]("pass_dup5") == 1L)
    assert(r("salad_src").getAs[Long]("pass_rep") == 1L, "diverse-but-doubled phrases must pass all rules")
    // q71 blindness witness: BOTH docs read as repetitive on the
    // distinct-ratio axis (dup_bigram_frac well above a 0.2 cut) — only
    // the top-share rule separates one-phrase spam from doubled variety
    val q71 = TextStats.repetitionSignals(d.select("doc_id", "text")).collect()
    q71.foreach(row => assert(row.getAs[Double]("dup_bigram_frac") > 0.2))
    // invariants over the real corpus: counts bounded, conjunction ≤ each rule
    val corpus = TextStats.gopherRepetition(docs).collect()
    assert(corpus.map(_.getAs[Long]("n_docs")).sum == docs.count())
    corpus.foreach { row =>
      val n = row.getAs[Long]("n_docs")
      Seq("pass_top2", "pass_top3", "pass_dup5").foreach { c =>
        assert(row.getAs[Long](c) >= 0L && row.getAs[Long](c) <= n)
        assert(row.getAs[Long]("pass_rep") <= row.getAs[Long](c))
      }
      assert(row.getAs[Long]("rep5_num") <= row.getAs[Long]("rep5_den"))
    }
  }

  test("q190 length drift: TV catches a mean-preserving shape split; identical versions read zero") {
    import org.apache.spark.sql.functions._
    def mk(rows: Seq[(Long, String, String)]) =
      spark.createDataFrame(rows).toDF("doc_id", "source", "text")
    // v1: two 8-token docs (bucket 4). v2: a 4-token + a 12-token doc —
    // SAME total tokens (16) and doc count, so every mean-based view is
    // flat, but the mass split across buckets 3 and 4: 2×TV = 1e6.
    val v1 = mk(Seq((1L, "s", Seq.fill(8)("w").mkString(" ")),
                    (2L, "s", Seq.fill(8)("w").mkString(" "))))
    val v2 = mk(Seq((1L, "s", Seq.fill(4)("w").mkString(" ")),
                    (2L, "s", Seq.fill(12)("w").mkString(" "))))
    val r = Pipeline.lengthDrift(v1, v2).collect().head
    assert(r.getAs[Long]("tv2_micro") == 1000000L)
    assert(r.getAs[Long]("worst_bucket") == 3L) // |±500000| ties break bucket-asc
    assert(r.getAs[Long]("worst_delta_micro") == 500000L)
    // identical versions: zero drift, every source
    Pipeline.lengthDrift(docs, docs).collect().foreach { row =>
      assert(row.getAs[Long]("tv2_micro") == 0L)
      assert(row.getAs[Long]("worst_delta_micro") == 0L)
    }
  }

  test("q191 ngram novelty: identical = zero; concatenated docs cost only seam grams; fresh text counts full") {
    import org.apache.spark.sql.functions._
    def mk(rows: Seq[(Long, String, String)]) =
      spark.createDataFrame(rows).toDF("doc_id", "source", "text")
    val v1 = mk(Seq((1L, "s", "a b c d e f"), (2L, "s", "g h i j k l")))
    // identical versions → novelty 0
    val same = Pipeline.ngramNovelty(v1, v1).collect().head
    assert(same.getAs[Long]("n_novel") == 0L && same.getAs[Long]("novelty_q") == 0L)
    // a refresh that CONCATENATES the two docs re-chunks but adds no
    // content: only the 4 seam-crossing 5-grams are novel (q164 would
    // call the whole thing changed)
    val cat = mk(Seq((1L, "s", "a b c d e f g h i j k l")))
    val r = Pipeline.ngramNovelty(v1, cat).collect().head
    assert(r.getAs[Long]("n_grams") == 8L) // 12 - 4 positions
    assert(r.getAs[Long]("n_novel") == 4L, "only grams spanning the seam are new")
    // genuinely fresh text counts in full
    val fresh = mk(Seq((1L, "s", "a b c d e f"), (2L, "s", "p q r s t u")))
    val f = Pipeline.ngramNovelty(v1, fresh).collect().head
    assert(f.getAs[Long]("n_novel") == 2L && f.getAs[Long]("novelty_q") == 500000L)
  }

  test("q72 packing: bins conserve tokens and docs per source; no bin starts past capacity runout") {
    import org.apache.spark.sql.functions._
    val bins = Corpus.packSequences(docs).collect()
    val totals = docs.groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("tok"), count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bySource = bins.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet == totals.keySet)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_.getAs[Long]("n_tokens")).sum == totals(src)._1, s"$src token conservation")
      assert(rows.map(_.getAs[Long]("n_docs")).sum == totals(src)._2, s"$src doc conservation")
      // bin ids are floor(cumstart/C): they start at 0 and are strictly
      // increasing; they are DENSE only while every doc fits in one bin —
      // a doc longer than PackCapacity advances the cumulative start past
      // a whole bin, legitimately skipping ids (first-token-bin semantics)
      val ids = rows.map(_.getAs[Long]("bin")).sorted
      val maxDocTok = docs.filter(col("source") === src)
        .agg(max(size(split(col("text"), " ")).cast("long"))).collect().head.getLong(0)
      assert(ids.head == 0L && ids.zip(ids.tail).forall { case (a, b) => b > a })
      if (maxDocTok <= Corpus.PackCapacity)
        assert(ids.zip(ids.tail).forall { case (a, b) => b - a == 1 }, s"$src dense bins")
    }
  }

  test("q73 chunking: stride coverage is exact and chunks reconstruct the document") {
    import org.apache.spark.sql.functions._
    val chunks = Corpus.chunkOverlap(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(chunks.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val toks = text.split(" ")
      val expected = 1 + (toks.length - 1) / Corpus.ChunkStride
      val rows = chunks(id).sortBy(_.getAs[Long]("chunk_id"))
      assert(rows.length == expected, s"doc $id chunk count")
      rows.foreach { r =>
        val start = r.getAs[Long]("start").toInt
        val body = toks.slice(start - 1, start - 1 + Corpus.ChunkSize)
        assert(r.getAs[Long]("chunk_tokens") == body.length)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(body.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        assert(r.getAs[String]("chunk_md5") == md, s"doc $id start $start")
      }
      // strides tile the doc: every chunk is full-size or runs to the end,
      // and the last chunk reaches the final token
      rows.foreach { r =>
        val start = r.getAs[Long]("start")
        assert(r.getAs[Long]("chunk_tokens") ==
          math.min(Corpus.ChunkSize.toLong, toks.length - start + 1))
      }
      val last = rows.last
      assert(last.getAs[Long]("start") + last.getAs[Long]("chunk_tokens") - 1 == toks.length)
    }
  }

  test("q74 decontamination == cross-split subset of the full LSH pair mine") {
    import org.apache.spark.sql.functions._
    val split = Sampling.hashSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    // ground truth from the symmetric pair miner: unordered near-dup pairs
    // with one end in test, the other in train
    val pairs = Dedup.minhashLshPairs(docs, 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = pairs.flatMap { case (a, b, j) =>
      Seq((a, b, j), (b, a, j)).collect {
        case (t, tr, jj) if split(t) == "test" && split(tr) == "train" => (t, jj)
      }
    }.groupBy(_._1).map { case (t, hits) => t -> (hits.length.toLong, hits.map(_._2).max) }
    val got = Dedup.decontaminate(docs, 0.8).collect()
      .map(r => r.getAs[Long]("test_id") ->
        (r.getAs[Long]("n_train_dups"), r.getAs[Double]("max_jaccard"))).toMap
    assert(got == expect)
    assert(got.nonEmpty) // the corpus plants cross-split near-dups
  }

  test("q89/q90 span stats == driver recompute of w-gram window collisions") {
    val w = Dedup.SpanWidth
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def spansOf(text: String): Seq[String] = {
      val toks = text.split(" ")
      if (toks.length < w) Seq.empty
      else (0 to toks.length - w).map(i => toks.slice(i, i + w).mkString(" "))
    }
    val allSpans = texts.toSeq.flatMap { case (id, t) => spansOf(t).map(s => (id, s)) }
    val docFreq = allSpans.distinct.groupBy(_._2).view.mapValues(_.length).toMap
    // q89: per-doc duplicated-span counts
    val expect89 = texts.map { case (id, t) =>
      val sp = spansOf(t)
      id -> (sp.length.toLong, sp.count(s => docFreq(s) >= 2).toLong)
    }
    val got89 = Dedup.dupSpans(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"))).toMap
    assert(got89 == expect89)
    assert(got89.values.exists(_._2 > 0)) // planted near-dups share long runs
    // q90: per-test-doc train-span hit counts under the q38 hash split
    val split = Sampling.hashSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val trainSpans = allSpans.collect { case (id, s) if split(id) == "train" => s }.toSet
    val expect90 = texts.collect { case (id, t) if split(id) == "test" =>
      val sp = spansOf(t)
      id -> (sp.length.toLong, sp.count(trainSpans).toLong)
    }.toMap
    val got90 = Dedup.spanContamination(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_train_spans"))).toMap
    assert(got90 == expect90)
    assert(got90.keySet == split.collect { case (id, "test") => id }.toSet)
  }

  test("q99 bigram score == driver recompute of quantized conditional probabilities") {
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val allBi = texts.toSeq.flatMap { case (id, t) =>
      val w = t.split(" "); w.zip(w.tail).map(b => (id, b))
    }
    val c12 = allBi.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val c1 = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val expect = allBi.groupBy(_._1).map { case (id, bs) =>
      id -> ((bs.size.toLong,
        bs.map { case (_, b) => (c12(b) * Corpus.LmScale) / c1(b._1) }.sum))
    }
    val got = Corpus.bigramLmScore(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("score_num")))).toMap
    assert(got == expect)
    // the score separates: planted near-dup runs push common transitions,
    // so per-doc means differ — the column carries signal, not a constant
    assert(got.values.map(_._2).toSet.size > 1)
  }

  test("q120 near-dup rates reconcile with the q42 pair mine") {
    import graft.ops.Dedup
    val srcOf = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val pairs = Dedup.minhashLshPairs(docs, 0.8).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")))
    val within = pairs.filter { case (a, b) => srcOf(a) == srcOf(b) }
      .flatMap { case (a, b) => Seq(a, b) }.toSet
    val cross = pairs.filter { case (a, b) => srcOf(a) != srcOf(b) }
      .flatMap { case (a, b) => Seq(a, b) }.toSet
    val expect = srcOf.groupBy(_._2).map { case (s, m) =>
      val ids = m.keySet
      s -> ((ids.size.toLong, (ids & within).size.toLong, (ids & cross).size.toLong))
    }
    val got = Dedup.nearDupRates(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_within_dup"),
          r.getAs[Long]("n_cross_dup")))).toMap
    assert(got == expect)
    // the planted near-dup runs make the report non-degenerate
    assert(got.values.exists(v => v._2 + v._3 > 0))
  }

  test("q111 dsir weights == driver recompute of smoothed bucket likelihood ratios") {
    def md5b(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(Corpus.DsirBucketChars)
    val rows = docs.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[String]("text")))
    val occ = rows.flatMap { case (id, lang, t) =>
      val w = t.split(" ")
      w.zip(w.tail).map { case (a, b) => (id, lang == "en", md5b(s"$a $b")) }
    }
    val raw = occ.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val tgt = occ.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val expect = occ.groupBy(_._1).map { case (id, os) =>
      id -> ((os.size.toLong,
        os.map { case (_, _, b) =>
          ((tgt.getOrElse(b, 0L) + 1) * Corpus.LmScale) / (raw(b) + 1)
        }.sum))
    }
    val got = Corpus.dsirScore(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("score_num")))).toMap
    assert(got == expect)
    // target-language docs must score higher on average than the rest:
    // the whole point of the ratio is separating target-like text
    val (en, rest) = got.partition { case (id, _) =>
      rows.find(_._1 == id).exists(_._2 == "en") }
    def mean(m: Map[Long, (Long, Long)]): Double =
      m.values.map { case (n, s) => s.toDouble / (n * Corpus.LmScale) }.sum / m.size
    assert(mean(en) > mean(rest), "en docs must out-score non-en docs")
  }

  test("q100 source overlap == driver recompute of distinct shared spans") {
    val w = Dedup.SpanWidth
    val rows = docs.collect().map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val bySrc = rows.groupBy(_._1).view.mapValues(_.flatMap { case (_, t) =>
      val toks = t.split(" ")
      if (toks.length < w) Seq.empty
      else (0 to toks.length - w).map(i => toks.slice(i, i + w).mkString(" "))
    }.toSet).toMap
    val expect = (for {
      a <- bySrc.keys; b <- bySrc.keys if a < b
      shared = (bySrc(a) & bySrc(b)).size.toLong if shared > 0
    } yield (a, b) -> ((bySrc(a).size.toLong, bySrc(b).size.toLong, shared))).toMap
    val got = Dedup.sourceOverlap(docs).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_shared")))).toMap
    assert(got == expect)
    assert(got.nonEmpty) // near-dups straddle sources at span granularity
  }

  test("q101 shuffle assignment == driver md5 recompute; writer realizes the order") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val got = Sampling.shuffleAssign(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard"), r.getAs[String]("sortkey")))).toMap
    docs.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      val k = md5hex(s"shuf:$id")
      assert(got(id) == ((java.lang.Long.parseLong(k.take(2), 16).toLong, k)), s"doc $id")
    }
    // the salt decorrelates shuffle order from the q37/q38 bucket
    assert(got.values.map(_._2).toSet.size == got.size, "sortkeys unique")
    // writer: every shard in one file, rows sorted by (shard, sortkey)
    val dirOut = java.nio.file.Files.createTempDirectory("shuf").toString
    Sampling.shuffleWrite(docs, dirOut, coalesceShards = 4)
    import org.apache.spark.sql.functions.input_file_name
    val back = spark.read.parquet(dirOut).withColumn("f", input_file_name()).collect()
    assert(back.map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      got.keys.toSeq.sorted, "round trip complete")
    val byShard = back.groupBy(_.getAs[Long]("shard"))
    byShard.foreach { case (sh, rows) =>
      assert(rows.map(_.getAs[String]("f")).distinct.length == 1, s"shard $sh split across files")
    }
    back.groupBy(_.getAs[String]("f")).foreach { case (f, rows) =>
      val keys = rows.map(r => (r.getAs[Long]("shard"), r.getAs[String]("sortkey")))
      assert(keys.sameElements(keys.sorted), s"file $f not in (shard, sortkey) order")
    }
  }

  test("q103 funnel reconciles with the q39 filter: per-source pass counts match") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val funnel = Sampling.filterFunnel(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_pass")))).toMap
    val survivors = Sampling.qualityFilter(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    assert(funnel.view.mapValues(_._2).filter(_._2 > 0).toMap == survivors)
    assert(funnel.values.map(_._1).sum == docs.count())
    // every reject column is live on this corpus or zero-by-construction;
    // at minimum the totals are consistent: pass <= docs per source
    funnel.values.foreach { case (n, p) => assert(p <= n) }
  }

  test("q91 shard manifest == driver recompute of the composed pipeline") {
    val w = Dedup.SpanWidth
    val all = docs.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text"), r.getAs[String]("source")))
    val stop = TextStats.Stopwords.toSet
    def quality(t: String): Boolean = {
      val toks = t.split(" ")
      val n = toks.length.toLong
      val sl = toks.map(_.length.toLong).sum
      n >= 20 && toks.distinct.length * 10 >= n * 3 &&
        sl >= n * 3 && sl <= n * 12 && toks.exists(stop)
    }
    def spansOf(t: String): Seq[String] = {
      val toks = t.split(" ")
      if (toks.length < w) Seq.empty
      else (0 to toks.length - w).map(i => toks.slice(i, i + w).mkString(" "))
    }
    val split = Sampling.hashSplit(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val kept = all.filter(d => quality(d._2))
    val reps = kept.groupBy(_._2).map { case (_, ds) => ds.minBy(_._1) }.toSeq
    val testFps = reps.collect { case (id, t, _) if split(id) == "test" => spansOf(t) }
      .flatten.toSet
    val clean = reps.filter { case (id, t, _) =>
      split(id) == "train" && !spansOf(t).exists(testFps) }
    val expect = clean.groupBy(_._3).map { case (src, ds) =>
      src -> (ds.size.toLong, ds.map(_._2.split(" ").length.toLong).sum) }
    val got = Pipeline.prepareTrainShard(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(got == expect)
    assert(got.nonEmpty && clean.size < reps.count(r => split(r._1) == "train"),
      "the corpus plants cross-split contamination the pipeline must drop")
  }

  test("q105 dataset card reconciles with its constituent gated queries") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val card = Corpus.datasetCard(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // n_pass per source == q103's funnel pass column
    val funnel = Sampling.filterFunnel(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_pass")).toMap
    assert(card.view.mapValues(_.getAs[Long]("n_pass")).toMap == funnel)
    // n_en_guess per source == q32's langId verdicts counted
    val en = TextStats.langId(docs)
      .join(docs.select("doc_id", "source"), "doc_id")
      .filter(col("lang_guess") === "en")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    card.foreach { case (src, r) =>
      assert(r.getAs[Long]("n_en_guess") == en.getOrElse(src, 0L), s"$src en count")
    }
    // mean quality == driver recompute off q31's per-doc scores
    val scores = TextStats.quality(docs)
      .join(docs.select("doc_id", "source"), "doc_id").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("score"))
      .groupBy(_._1).view.mapValues(_.map(v => math.floor(v._2 * 1e6).toLong)).toMap
    card.foreach { case (src, r) =>
      assert(r.getAs[Long]("q_micro_sum") == scores(src).sum, s"$src micro sum")
      assert(r.getAs[Double]("avg_quality") ==
        scores(src).sum.toDouble / (scores(src).size * 1000000L).toDouble, s"$src avg")
    }
    // no exact dups in the raw corpus (q40's finding), so the column is 0
    assert(card.values.forall(_.getAs[Long]("n_exact_dups") == 0L))
  }

  test("q104 pretrain corpus == driver recompute of the full chain") {
    val w = Dedup.SpanWidth
    val stop = TextStats.Stopwords.toSet
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // stage 0: line cleaning with the corpus stand-in parameters
    val cleaned = docs.collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[String]("text"), r.getAs[String]("source")))
      .filter(!_._2.contains(Cleaning.DocBlockPhrase))
      .map { case (id, t, src) =>
        val kept = t.split(java.util.regex.Pattern.quote(Cleaning.LineDelim))
          .filter(ln => ln.split(" ").length >= Cleaning.MinLineWords &&
            !ln.split(" ").contains(Cleaning.LineBlockToken))
        (id, kept.mkString("\n"), src, kept.length)
      }.filter(_._4 >= 1).map(d => (d._1, d._2, d._3))
    // stages 1-3 on the cleaned text (same recompute as the q91 spec)
    def quality(t: String): Boolean = {
      val toks = t.split(" ")
      val n = toks.length.toLong
      val sl = toks.map(_.length.toLong).sum
      n >= 20 && toks.distinct.length * 10 >= n * 3 &&
        sl >= n * 3 && sl <= n * 12 && toks.exists(stop)
    }
    def spansOf(t: String): Seq[String] = {
      val toks = t.split(" ")
      if (toks.length < w) Seq.empty
      else (0 to toks.length - w).map(i => toks.slice(i, i + w).mkString(" "))
    }
    def splitOf(id: Long): String = {
      val b = md5hex(id.toString).take(4)
      if (b < f"${Sampling.TrainMax}%04x") "train"
      else if (b < f"${Sampling.ValMax}%04x") "val" else "test"
    }
    val kept = cleaned.filter(d => quality(d._2))
    val reps = kept.groupBy(_._2).map { case (_, ds) => ds.minBy(_._1) }.toSeq
    val testFps = reps.collect { case (id, t, _) if splitOf(id) == "test" => spansOf(t) }
      .flatten.toSet
    val clean = reps.filter { case (id, t, _) =>
      splitOf(id) == "train" && !spansOf(t).exists(testFps) }
    // stage 4: epoch mixing (factor 3, src-name weights) over the clean docs
    def score(t: String): Double = {
      val toks = t.split(" ")
      val n = toks.length
      (math.min(n, 100).toDouble / 100.0) * 0.5 +
        (toks.distinct.length.toDouble / n) * 0.3 +
        (math.min(toks.count(stop), 10).toDouble / 10.0) * 0.2
    }
    val tTotal = clean.map(_._2.split(" ").length.toLong).sum
    val weights = clean.map(_._3).distinct.map(s => s -> (s.drop(3).toLong % 3 + 1)).toMap
    val totw = weights.values.sum
    val expect = clean.groupBy(_._3).flatMap { case (src, ds) =>
      val share = (3L * tTotal * weights(src)) / totw
      val avail = ds.map(_._2.split(" ").length.toLong).sum
      val e = share / avail
      val rem = share - e * avail
      val ordered = ds.sortBy { case (id, t, _) => (-score(t), id) }
      var cum = 0L
      ordered.flatMap { case (id, t, _) =>
        val n = t.split(" ").length.toLong
        cum += n
        val epochs = e + (if (cum <= rem) 1L else 0L)
        if (epochs > 0) {
          val k = md5hex(s"shuf:$id")
          Some((id, src, n, epochs, java.lang.Long.parseLong(k.take(2), 16), k))
        } else None
      }
    }.toSet
    val got = Pipeline.preparePretrainCorpus(docs,
      weight = Sampling.srcNameWeight, delim = Cleaning.LineDelim,
      lineBlockToken = Cleaning.LineBlockToken,
      docBlockPhrase = Cleaning.DocBlockPhrase).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("epochs"),
        r.getAs[Long]("shard"), r.getAs[String]("sortkey"))).toSet
    assert(got == expect)
    assert(got.nonEmpty && got.exists(_._4 >= 2), "multi-epoch sources present")
  }

  test("q88 dedupFirst == decontaminating the exact-dedup representative corpus") {
    import org.apache.spark.sql.functions._
    val reps = Dedup.exact(docs).select(col("keep_id").as("doc_id"))
    val expect = Dedup.decontaminate(docs.join(reps, "doc_id"), 0.8).collect()
      .map(r => (r.getAs[Long]("test_id"), r.getAs[Long]("n_train_dups"),
        r.getAs[Double]("max_jaccard"))).toSet
    val got = Dedup.decontaminate(docs, 0.8, dedupFirst = true).collect()
      .map(r => (r.getAs[Long]("test_id"), r.getAs[Long]("n_train_dups"),
        r.getAs[Double]("max_jaccard"))).toSet
    assert(got == expect)
    assert(got.nonEmpty)
    // every reported test doc is a representative (min doc_id of its text)
    val keepIds = Dedup.exact(docs).collect().map(_.getAs[Long]("keep_id")).toSet
    assert(got.forall(r => keepIds(r._1)))
  }

  test("q121 image near-dups: pairs == brute-force hamming over driver-built aHashes") {
    import spark.implicits._
    def ahash(bytes: Array[Byte]): String = {
      val n = bytes.length
      val sums = new Array[Long](Multimodal.AHashCells)
      val cnts = new Array[Long](Multimodal.AHashCells)
      var total = 0L
      bytes.zipWithIndex.foreach { case (b, i) =>
        val c = (i.toLong * Multimodal.AHashCells / n).toInt
        val v = (b & 0xff).toLong
        sums(c) += v; cnts(c) += 1; total += v
      }
      (0 until Multimodal.AHashCells).collect {
        case c if cnts(c) > 0 => if (sums(c) * n > total * cnts(c)) '1' else '0'
      }.mkString
    }
    def hamming(a: String, b: String): Long =
      a.zip(b).count { case (x, y) => x != y }.toLong
    val hs = docs.collect().map(r =>
      r.getAs[Long]("doc_id") -> ahash(r.getAs[String]("text").getBytes("UTF-8"))).toMap
    // engine hashes must equal the driver recompute exactly
    val engineHs = Multimodal.imageHashes(
      Multimodal.attachMedia(docs).as[MediaRecord]).collect()
      .map(h => h.doc_id -> h.ahash).toMap
    assert(engineHs == hs)
    // pairs: brute force — banding must lose nothing at hamming <= 6 < 8 bands
    val expect = (for {
      a <- hs.keys; b <- hs.keys if a < b
      h = hamming(hs(a), hs(b)) if h <= Multimodal.AHashMaxHamming
    } yield (a, b) -> h).toMap
    val got = Multimodal.imageNearDups(spark, dir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(got == expect)
    assert(got.nonEmpty, "planted near-dup texts must collide perceptually")
  }

  test("q124 image dedup-reps: exact-dup clique collapses to one perceptual pair") {
    import spark.implicits._
    val a = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val b = a.replace("juliet", "juliex") // 1-char delta: near-dup of a
    val planted = Seq((1L, a, a.length.toLong), (2L, a, a.length.toLong),
      (3L, a, a.length.toLong), (4L, b, b.length.toLong))
      .toDF("doc_id", "text", "n_chars")
    // naive mining sees the dup clique: pairs (1,2)(1,3)(2,3) at hamming 0
    val naive = Multimodal.imageNearDupsOn(planted).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(Set((1L, 2L), (1L, 3L), (2L, 3L)).subsetOf(naive))
    // the composed path mines representatives only: the clique is gone,
    // and the genuine perceptual pair (1, 4) survives iff hashes collide
    val reps = Dedup.exact(planted).select(org.apache.spark.sql.functions.col("keep_id").as("doc_id"))
    val composed = Multimodal.imageNearDupsOn(planted.join(reps, "doc_id")).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(!composed.exists(p => Set(2L, 3L)(p._1) || Set(2L, 3L)(p._2)),
      s"non-representative ids leaked into composed pairs: $composed")
    assert(composed == naive.filter(p => !Set(2L, 3L)(p._1) && !Set(2L, 3L)(p._2)),
      "composed pairs must equal naive pairs restricted to representatives")
  }

  test("image hashing drops zero-length payloads (no empty-hash near-dup clique)") {
    import spark.implicits._
    val mixed = Seq((1L, "", 0L), (2L, "", 0L), (3L, "solid content words here", 24L))
      .toDF("doc_id", "text", "n_chars")
    val hs = Multimodal.imageHashes(
      Multimodal.attachMedia(mixed).as[MediaRecord]).collect()
    assert(hs.map(_.doc_id).toSet == Set(3L),
      "empty payloads must not be hashed — they would band-collide as hamming-0 pairs")
    val pairs = Multimodal.imageNearDupsOn(mixed).collect()
    assert(pairs.isEmpty, s"empty docs reported as near-dups: ${pairs.toSeq}")
  }

  test("q83 frame sampling: stride selection, offsets, and tail truncation") {
    import spark.implicits._
    val frames = Multimodal.sampleFrames(
      Multimodal.attachMedia(docs).as[MediaRecord]).collect()
      .groupBy(_.doc_id)
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(frames.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val n = text.getBytes("UTF-8").length
      val nFrames = (n + Multimodal.FrameBytes - 1) / Multimodal.FrameBytes
      val expectIdx = (0 until nFrames by Multimodal.FrameStride).map(_.toLong)
      val rows = frames(id).sortBy(_.frame_idx)
      assert(rows.map(_.frame_idx).toSeq == expectIdx, s"doc $id sampled indices")
      rows.foreach { f =>
        assert(f.frame_off == f.frame_idx * Multimodal.FrameBytes)
        assert(f.frame_len == math.min(Multimodal.FrameBytes.toLong, n - f.frame_off))
      }
    }
  }

  test("winnowing: shared >= w+k-1 token run is always caught, index shrinks vs spans") {
    import spark.implicits._
    // two docs sharing EXACTLY a 7-token run (w + k - 1 = 4 + 4 - 1) in
    // otherwise disjoint text: the published guarantee says a selected
    // fingerprint must land inside the shared run in BOTH docs
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val d = Seq(
      (1L, s"one two three four $shared five six seven eight"),
      (2L, s"red green blue $shared yellow purple orange cyan pink")).toDF("doc_id", "text")
    val rows = Dedup.winnowing(d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_sel")).toMap
    assert(rows(1L) >= 1 && rows(2L) >= 1,
      s"the shared 7-token run must be fingerprinted in both docs: $rows")
    // disjoint docs must share nothing
    val e = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj"),
      (2L, "kk ll mm nn oo pp qq rr ss tt")).toDF("doc_id", "text")
    assert(Dedup.winnowing(e).collect().forall(_.getAs[Long]("n_dup_sel") == 0))
    // the point of winnowing: selected index is a small fraction of the
    // gram count on the real corpus (q89 indexes EVERY position)
    val real = Dedup.winnowing(docs).agg(
      org.apache.spark.sql.functions.expr(
        "CAST(sum(n_selected) AS DOUBLE) / sum(n_grams)")).head.getDouble(0)
    assert(real < 0.55, s"winnowing density must shrink the index, got $real")
  }

  test("length-matched sample: per bucket keeps exactly min(factor * target, pool)") {
    import org.apache.spark.sql.functions._
    val factor = 3L
    val kept = Sampling.lengthMatchedSample(spark, dir, "src1", factor)
      .groupBy("len_bucket").count().collect()
      .map(r => r.getAs[Long]("len_bucket") -> r.getAs[Long]("count")).toMap
    val base = docs.select(col("doc_id"), col("source"),
        expr("CAST(length(bin(CAST(size(split(text, ' ')) AS BIGINT))) AS BIGINT)").as("b"))
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("b")))
    val tb = base.filter(_._1 == "src1").groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pool = base.filter(_._1 != "src1").groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(kept.nonEmpty)
    kept.keySet.foreach(b => assert(tb.contains(b), s"bucket $b absent from target"))
    tb.foreach { case (b, t) =>
      val expect = math.min(factor * t, pool.getOrElse(b, 0L))
      assert(kept.getOrElse(b, 0L) == expect,
        s"bucket $b: kept ${kept.getOrElse(b, 0L)}, expected $expect")
    }
  }

  test("unimax allocation: water-filling invariants hold and the frontier is exercised") {
    val rows = Sampling.unimaxAlloc(spark, dir).collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("toks"), r.getAs[Long]("cap"),
        r.getAs[Long]("alloc"), r.getAs[Boolean]("capped")))
    val budget = rows.map(_._2).sum // B = one epoch of the corpus
    assert(rows.map(_._4).sum == budget, "allocations must spend the budget exactly")
    assert(rows.forall { case (_, _, cap, alloc, _) => alloc <= cap },
      "no source may exceed its epoch cap")
    val (capped, free) = rows.partition(_._5)
    assert(capped.nonEmpty && free.nonEmpty,
      s"the cap frontier must be exercised (capped=${capped.length} free=${free.length})")
    // uniform fill: uncapped allocations differ by at most the 1-token
    // remainder, and sit at or above every capped source's cap (that is
    // WHY those sources are capped)
    val fa = free.map(_._4)
    assert(fa.max - fa.min <= 1, s"uncapped allocs must be uniform ±1: ${fa.toSeq}")
    assert(fa.min >= capped.map(_._3).max,
      "uniform share must dominate every capped source's cap")
  }

  test("jsonl ingest: malformed lines quarantine with the raw text, good lines parse") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("jsonl").toString
    // two good objects (one with an unknown extra field — must be
    // dropped, not fatal), one torn line, one non-JSON line
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "part-0.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web", "n_chars": 10}""",
        """{"doc_id": 2, "text": "gamma", "lang": "de", "source": "web", "n_chars": 5, "extra": true}""",
        """{"doc_id": 3, "text": "torn""",
        """not json at all"""))
    val schema = docs.schema
    val (parsed, bad) = graft.sources.JsonlCorpus.quarantine(
      graft.sources.JsonlCorpus.read(spark, tmp, schema))
    assert(parsed.columns.toSeq == schema.fieldNames.toSeq, "pinned schema, no corrupt col")
    val good = parsed.orderBy("doc_id").collect()
    assert(good.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(good.map(_.getAs[String]("text")).toSeq == Seq("alpha beta", "gamma"))
    val raw = bad.collect().map(_.getAs[String]("raw_line")).sorted
    assert(raw.toSeq == Seq("""{"doc_id": 3, "text": "torn""", "not json at all").sorted,
      s"quarantine must preserve the raw malformed lines, got ${raw.toSeq}")
  }

  test("q199 CUSUM closed form == the recursive definition, per type") {
    // the operator computes S_t = P_t − min(0, min_{j≤t} P_j); the
    // definition is S_t = max(0, S_{t-1} + dev_t). Recompute recursively
    // from the same daily rollup and compare every (type, day).
    val ev = graft.ops.EventOps.events(spark, dir)
    val daily = ev.selectExpr("event_type", "ts DIV 86400000000000 AS day")
      .groupBy("event_type", "day").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      val sorted = rows.toSeq.sortBy(_._2)
      val mu = sorted.map(_._3).sum * 1000000L / sorted.length
      var s = 0L
      sorted.map { case (_, day, n) =>
        s = math.max(0L, s + (n * 1000000L - mu))
        (t, day) -> s
      }
    }.toMap
    val got = graft.ops.EventOps.rateCusum(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, v) =>
      assert(v == expect(k), s"$k: closed form $v != recursive ${expect(k)}") }
  }

  test("q198 DoReMi step: shares sum to ~1e6 and low-quality sources are upweighted") {
    val rows = graft.ops.Sampling.doremiStep(
      spark.read.parquet(s"$dir/documents.parquet")).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6)))
    val shareSum = rows.map(_._5).sum
    // floor-division share per source loses < 1 micro each
    assert(math.abs(shareSum - 1000000L) <= rows.length,
      s"shares must sum to ~1e6, got $shareSum")
    // monotone: among equal-token sources, lower mean quality -> >= share
    for (Seq(a, b) <- rows.toSeq.sortBy(_._3).sliding(2) if a._2 == b._2)
      assert(a._4 >= b._4, s"factor must not increase with quality: $a vs $b")
    // the update factor is exactly 1e6 + eta*excess (floored)
    rows.foreach { case (_, _, _, f, _) => assert(f >= graft.ops.Sampling.DoremiFloorMicro) }
  }

  test("q209 Spearman closed form == plain average-rank Pearson on random tied data") {
    import spark.implicits._
    val rnd = new scala.util.Random(209)
    // small value ranges force heavy ties — the case the closed form is for
    val rows = (1 to 400).map(i =>
      (i.toLong, s"s${i % 3}", 1L, rnd.nextInt(7).toLong, true, rnd.nextInt(9).toLong))
    val df = rows.toDF("doc_id", "source", "n_tokens", "score_int", "rules", "q_micro")
    val got = graft.ops.TextStats.filterRankCorrelationFrom(df).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    def avgRanks(vs: Seq[Long]): Seq[Double] = {
      val sorted = vs.sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> (g.map(_._2 + 1).sum.toDouble / g.size) }
      vs.map(sorted)
    }
    rows.groupBy(_._2).foreach { case (src, rs) =>
      val xs = avgRanks(rs.map(t => t._4 * 1000000L)) // x = (score_int*1e6) div 1
      val ys = avgRanks(rs.map(_._6))
      val n = xs.size
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val num = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val den = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum) *
        math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
      assert(math.abs(got(src) - num / den) < 1e-12,
        s"$src: closed form ${got(src)} != brute ${num / den}")
    }
  }

  test("q208 TVD min-identity == brute half-sum over the UNION vocabulary") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode, split}
    // partly-disjoint vocabularies: the min-form inner join must still
    // charge absent terms' full mass (the identity under test)
    val docs = Seq(
      (1L, "a", "x x y z w"), (2L, "a", "x y y q"),
      (3L, "b", "x z z z r r"), (4L, "b", "y r s")).toDF("doc_id", "source", "text")
    val got = graft.ops.Corpus.sourceSimilarityMatrixOn(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3)).toMap
    // brute: ½ Σ_t∈union |ca/na − cb/nb| with exact BigInt cross-products
    val counts = docs.select(col("source"), explode(split(col("text"), " ")).as("t"))
      .groupBy("source", "t").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val na = counts.collect { case (("a", _), c) => c }.sum
    val nb = counts.collect { case (("b", _), c) => c }.sum
    val vocab = counts.keys.map(_._2).toSet
    val num = vocab.toSeq.map { t =>
      val ca = BigInt(counts.getOrElse(("a", t), 0L))
      val cb = BigInt(counts.getOrElse(("b", t), 0L))
      (ca * nb - cb * na).abs
    }.sum
    val brute = BigInt(1000000) - ((BigInt(2) * na * nb - num) * 1000000) / (BigInt(2) * na * nb)
    // op: 1e6 − floor(Σmin·1e6/(na·nb)); brute via Σ|…| and
    // Σmin = (2·na·nb − Σ|…|)/2 — same floor, so exact equality
    assert(got(("a", "b")) == brute.toLong,
      s"min-identity ${got(("a", "b"))} != brute $brute")
  }

  test("q205 suppression: no published cohort below k; totals conserve exactly") {
    val ev = graft.ops.EventOps.events(spark, dir)
    val raw = graft.ops.EventOps.rfmSegments(ev).collect()
    val sup = graft.ops.EventOps.suppressSmallCells(
      graft.ops.EventOps.rfmSegments(ev),
      Seq("r_seg", "f_seg", "m_seg"), "n_users", Seq("seg_cents")).collect()
    val k = graft.ops.EventOps.SuppressK
    // every published non-combined row has population >= k
    sup.filter(r => r.getString(0) != "~").foreach { r =>
      assert(r.getAs[Long]("n_users") >= k, s"published small cohort: $r") }
    // exact conservation of both measures
    assert(sup.map(_.getAs[Long]("n_users")).sum == raw.map(_.getAs[Long]("n_users")).sum)
    assert(sup.map(_.getAs[Long]("seg_cents")).sum == raw.map(_.getAs[Long]("seg_cents")).sum)
    // something was actually suppressed on this corpus
    assert(sup.exists(_.getString(0) == "~"), "tuned cuts must produce small cells to suppress")
  }

  test("q200 RFM: segment counts conserve the user universe") {
    val ev = graft.ops.EventOps.events(spark, dir)
    val users = ev.select("user_id").distinct().count()
    val segs = graft.ops.EventOps.rfmSegments(ev).collect()
    assert(segs.map(_.getAs[Long]("n_users")).sum == users)
    assert(segs.length > 1, "the tuned cuts must actually segment the corpus")
  }

  test("q271 cross-modal alignment: flags exactly the planted negated pairs") {
    import org.apache.spark.sql.functions.col
    val card = graft.ops.Similarity.crossModalAlignment(spark, dir).collect()
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val plantedByLabel = vecs.filter(_._1 % 37 == 5).groupBy(_._2)
      .map { case (l, v) => l -> v.length.toLong }
    assert(card.map(_.getAs[Long]("n_pairs")).sum === vecs.length.toLong)
    card.foreach { r =>
      val label = r.getAs[Int]("label").toLong
      assert(r.getAs[Long]("n_flagged") === plantedByLabel.getOrElse(label, 0L),
        s"label $label flags must equal the planted negations")
      if (plantedByLabel.contains(label)) {
        val m = r.getAs[Long]("min_align_micro")
        // cosine is exactly -1 in real arithmetic; the double dot/norm
        // round trip can land 1 ulp below, so floor gives -1e6 or -1e6-1
        assert(m === -1000000L || m === -1000001L,
          s"a negated pair must floor to cosine -1: $m")
      }
      assert(r.getAs[Long]("mean_align_micro") > 800000L ||
        plantedByLabel.contains(label),
        s"unplanted labels must be near-perfectly aligned")
    }
  }

  test("q272 pagerank: mass conservation and edge-consistent centrality") {
    val ev = graft.ops.EventOps.events(spark, dir)
    val pr = graft.ops.EventOps.transitionPagerank(ev).collect()
    val types = ev.select("event_type").distinct().count()
    assert(pr.length === types.toInt)
    val mass = pr.map(_.getAs[Long]("pr_micro")).sum
    // truncating divisions only LOSE mass, never create it
    assert(mass <= 1000000L && mass > 900000L, s"PR mass out of band: $mass")
    val byRank = pr.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("pr_micro"))
    assert(byRank.zip(byRank.tail).forall { case (hi, lo) => hi >= lo })
    assert(pr.forall(_.getAs[Long]("pr_micro") >= 30000L),
      "every node keeps at least the teleport mass (1-d)/N")
  }

  test("q272 pagerank: empty transition graph returns zero rows, not a crash") {
    import org.apache.spark.sql.functions.{col, expr}
    // every session has exactly one event -> sessionTransitions is empty
    val ev = graft.ops.EventOps.events(spark, dir)
      .withColumn("rn", expr(
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)"))
      .filter(col("rn") === 1).drop("rn")
    val pr = graft.ops.EventOps.transitionPagerank(ev)
    assert(pr.count() === 0, "degenerate input must match the oracle's zero rows")
    assert(pr.columns.toSeq === Seq("event_type", "pr_micro", "n_out", "rank"))
  }

  test("q273 l-diversity: partitions the RFM universe, share bounds") {
    val ev = graft.ops.EventOps.events(spark, dir)
    val cells = graft.ops.EventOps.lDiversityAudit(ev).collect()
    val users = ev.select("user_id").distinct().count()
    assert(cells.map(_.getAs[Long]("n_users")).sum === users)
    cells.foreach { r =>
      val l = r.getAs[Long]("l")
      assert(l >= 1 && l <= 3, "sensitive attribute has 3 bands")
      assert(r.getAs[Long]("ok_l2") === (if (l >= 2) 1L else 0L))
      val share = r.getAs[Long]("top_m_share_micro")
      assert(share * l >= 1000000L && share <= 1000000L,
        s"dominant share must sit in [1/l, 1]: $share (l=$l)")
    }
  }

  test("q274 pass@k: exact brute recompute of the unbiased estimator") {
    import org.apache.spark.sql.functions.{col, size, split}
    val docs = graft.queries.QueryDef.t(spark, dir, "documents")
    val card = graft.ops.Sampling.passAtK(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val n = graft.ops.Sampling.PakAttempts
    val base = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("w")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def permL(a: Long, k: Int): Long = (0 until k).map(i => a - i).product
    base.groupBy(_._2).foreach { case (src, rows) =>
      val cs = rows.map { case (id, _, w) =>
        val thr = 20 + id % 60
        (0 until n).count(i => (id * 31 + i * 17 + w) % 100 < thr).toLong
      }
      val r = card(src)
      assert(r.getAs[Long]("n_problems") === rows.length.toLong)
      assert(r.getAs[Long]("mean_c_micro") ===
        cs.sum * 1000000L / (rows.length.toLong * n))
      graft.ops.Sampling.PakKs.foreach { k =>
        val exp = cs.map(c => 1000000L - permL(n - c, k) * 1000000L / permL(n, k))
          .sum / rows.length
        assert(r.getAs[Long](s"pass${k}_micro") === exp, s"$src pass@$k")
      }
      // monotone in k: more samples can only help
      assert(r.getAs[Long]("pass1_micro") <= r.getAs[Long]("pass2_micro"))
      assert(r.getAs[Long]("pass2_micro") <= r.getAs[Long]("pass4_micro"))
    }
  }

  test("q266 best-of-n: brute recompute, conservation, positive gain") {
    import org.apache.spark.sql.functions.{col, size, split}
    val docs = graft.queries.QueryDef.t(spark, dir, "documents")
    val card = graft.ops.Sampling.bestOfN(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // independent brute recompute of the derivation + card
    val base = docs.select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("w")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = base.groupBy(_._2)
    bySource.foreach { case (src, rows) =>
      val r = card(src)
      val scores = rows.map { case (id, _, w) =>
        (0 until graft.ops.Sampling.BonCandidates)
          .map(c => (id * 37 + c * 101 + w * (c + 1)) % 1000)
      }
      val n = rows.length.toLong
      assert(r.getAs[Long]("n_prompts") === n)
      assert(r.getAs[Long]("base_mean_milli") === scores.map(_.head).sum * 1000 / n)
      assert(r.getAs[Long]("best_mean_milli") === scores.map(_.max).sum * 1000 / n)
      val slotWins = scores.map(s => s.indexOf(s.max))
      (0 until graft.ops.Sampling.BonCandidates).foreach { c =>
        assert(r.getAs[Long](s"won$c") === slotWins.count(_ == c).toLong)
      }
      assert(r.getAs[Long]("won0") + r.getAs[Long]("won1") +
        r.getAs[Long]("won2") + r.getAs[Long]("won3") === n)
      assert(r.getAs[Long]("gain_milli") > 0,
        s"$src: best-of-n must beat the first sample")
    }
  }
}
