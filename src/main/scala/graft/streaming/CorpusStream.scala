package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.MetricsSink
import graft.ops.{Cleaning, Corpus, Dedup, TextStats}

/** Incremental corpus ingestion — the streaming twin of the batch
  * pretrain-prep pipeline (q92 line clean → q39 quality gate → q40 exact
  * dedup, the same stage order as q104) plus a live per-source dataset
  * card (q105's streaming twin). The production shape this models: crawl
  * shards land continuously (`spark.readStream.parquet(dropDir)`), each
  * micro-batch is cleaned and gated STATELESSLY, new content is admitted
  * exactly once against the all-history dedup state, and the card stream
  * feeds a monitoring sink with per-source corpus health.
  *
  * Every expression here IS the batch operator's expression (shared
  * single-source: [[Cleaning.cleanLines]], [[TextStats.QualityPassCond]],
  * [[TextStats.cardSignals]], [[Corpus.cardAggs]]) — so batch and stream
  * agree row-for-row, which the StreamingSpec locks.
  *
  * Reference scope note: the reference extractor (csv_extractor.py) is itself
  * a live incremental pipeline (poll → parse → dedup-by-catalog → post);
  * this object is that architecture applied to the corpus domain.
  */
object CorpusStream {

  /** C4-style line cleanup over a stream of (doc_id, source, text) rows.
    * Stateless codegen'd projection — identical plan to batch q92, so it
    * runs in append mode with no state store. */
  def clean(docs: DataFrame, delim: String = "\n",
      minWords: Int = Cleaning.MinLineWords, lineBlockToken: String = "javascript",
      docBlockPhrase: String = "lorem ipsum"): DataFrame =
    Cleaning.cleanLines(docs, delim, minWords, lineBlockToken, docBlockPhrase,
      keep = Seq("source"))
      .withColumnRenamed("text_clean", "text")

  /** q39's exact quality gate (same [[TextStats.QualityPassCond]] text),
    * stateless — a failing document never reaches the dedup state store,
    * which keeps state proportional to the ADMITTED corpus. */
  def qualityGate(docs: DataFrame): DataFrame =
    docs.select(col("doc_id") +: col("source") +: col("text") +:
      TextStats.signalCols: _*)
      .filter(expr(TextStats.QualityPassCond))

  /** Exact content dedup across the whole stream: the FIRST arrival of
    * each md5(text) is admitted, every later copy (same batch or any
    * later batch) is dropped — the streaming counterpart of q40's
    * min-id representative (feed order replaces id order).
    *
    * State: one store entry per distinct admitted text. With no
    * timestamp column that state is all-history — correct for "never
    * re-admit", and the ceiling is the deduped corpus cardinality
    * (document it per deployment). Passing `tsCol` (an ingest-time
    * column) switches to `dropDuplicatesWithinWatermark`, which expires
    * entries `delay` behind the watermark: re-crawls inside the horizon
    * are suppressed, state is bounded by the horizon's distinct volume,
    * and an exact historical guard (e.g. a nightly batch q40 over the
    * written shards) catches the long tail. */
  def dedupeExact(docs: DataFrame, tsCol: Option[String] = None,
      delay: String = "24 hours"): DataFrame = {
    val keyed = docs.withColumn("content_md5", md5(col("text")))
    tsCol match {
      case Some(ts) =>
        keyed.withWatermark(ts, delay).dropDuplicatesWithinWatermark("content_md5")
      case None => keyed.dropDuplicates("content_md5")
    }
  }

  /** The full ingest: clean → gate → dedup (q104's stage order). Output
    * is the admitted stream — cleaned text, quality signals, content
    * hash — ready for a parquet/shard sink in append mode. */
  def ingest(docs: DataFrame, delim: String = "\n",
      minWords: Int = Cleaning.MinLineWords, lineBlockToken: String = "javascript",
      docBlockPhrase: String = "lorem ipsum", tsCol: Option[String] = None,
      delay: String = "24 hours"): DataFrame =
    dedupeExact(qualityGate(clean(docs, delim, minWords, lineBlockToken, docBlockPhrase)),
      tsCol, delay)

  /** Stateless STREAMING decontamination gate: flag every incoming
    * document that shares any word 3-gram with the (static) test suite,
    * probing the serialized Bloom filter built batch-side by
    * [[graft.ops.Dedup.testGramBloomBytes]]. The filter rides into the
    * plan as a base64 literal, so the probe is a pure per-row
    * projection — no state store, no join, append-mode safe, and the
    * stream never touches the test corpus itself. No false negatives
    * (same `xxhash64` both sides): a `contaminated = false` document is
    * CERTAIN to share no gram; `true` carries the bloom's small
    * false-positive tail, which an offline exact pass (q131) settles —
    * the right asymmetry for admission, where a false drop costs one
    * document and a false admit costs an eval leak. */
  def contaminationGuard(docs: DataFrame, bloom: Array[Byte]): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val b64 = java.util.Base64.getEncoder.encodeToString(bloom)
    docs.withColumn("toks", split(col("text"), " "))
      .withColumn("contaminated", expr(
        s"""exists(${Dedup.shinglesExpr},
            g -> might_contain(unbase64('$b64'), xxhash64(g)))"""))
      .drop("toks")
  }

  /** Production terminal for [[ingest]]: land each micro-batch of
    * admitted documents as a parquet shard under `outDir/batch_id=N/`
    * and push a per-source accounting snapshot to the pluggable
    * [[MetricsSink]] after the write — the reference extractor's
    * post-then-push cadence (csv_extractor.py:194-230: post the batch,
    * then `monitor.push()`), applied to the corpus domain.
    *
    * Exactly-once: the shard write is mode=overwrite into the
    * batch-id-keyed directory, so a replayed micro-batch (crash between
    * write and checkpoint commit) overwrites its own partial output;
    * dedup state recovers from the checkpoint. The metrics rollup is
    * source-cardinality — a bounded collect, pushed DRIVER-side (the
    * Gauge/sink discipline from [[LiveStream]]). */
  def ingestToShards(docs: DataFrame, outDir: String, checkpointDir: String,
      sink: MetricsSink = MetricsSink.Noop, tsCol: Option[String] = None,
      delay: String = "24 hours", trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = ingest(docs, tsCol = tsCol, delay = delay)
      .writeStream.option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
      StreamState.bindLineage(batch.sparkSession, outDir, checkpointDir)
      if (batchId < StreamState.horizon(batch.sparkSession, outDir)) {
        // replay of a shard-compacted batch: its rows live in the base
        // generation; readers ignore a re-minted partition — skip the
        // write AND the metrics re-push
        ()
      } else {
      batch.persist()
      try {
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        val card = batch.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_toks"))
          .collect() // source-cardinality rows
        sink.push(card.flatMap { r =>
          val src = r.getAs[String]("source")
          Seq(s"corpus.admitted_docs.$src" -> r.getAs[Long]("n_docs"),
            s"corpus.admitted_tokens.$src" -> r.getAs[Long]("n_toks"))
        }.toMap + ("corpus.batch_id" -> batchId))
      } finally { batch.unpersist(); () }
      }
    }.start()
  }

  /** Streaming NEAR-duplicate admission — the incremental twin of the
    * batch MinHash pipeline (q42 band candidates → exact-Jaccard verify →
    * q53 cluster minima). A document is admitted iff it is not a verified
    * near-dup (Jaccard ≥ threshold on shingle sets) of any
    * EARLIER-ADMITTED document, and within a micro-batch only each
    * verified near-dup cluster's min-id representative is admitted — so
    * the invariant across the whole stream is exactly the batch one: no
    * two admitted documents are near-dups, and every dropped document is
    * (transitively) a near-dup of an admitted one that arrived no later.
    *
    * Mechanics: `dropDuplicates` can't express multi-key LSH admission
    * (a doc holds 8 band keys that must be claimed atomically), so state
    * lives in batch-id-partitioned parquet tables — `stateDir/bands`
    * (bkey → rep_id) and `stateDir/grams` (rep_id → sorted shingles) —
    * and each micro-batch runs the BATCH operators against them inside
    * foreachBatch: band equi-join against admitted keys, exact
    * `sorted_intersect_count` Jaccard against admitted shingles (state
    * collisions are VERIFIED, never trusted), then [[Dedup.nearDupClusters]]
    * over the survivors. Replay-idempotent like [[ingestToShards]]: every
    * write is mode=overwrite into its own `batch_id=N` subdir, and the
    * state read prunes `batch_id < N`, so a replayed batch never sees its
    * own half-written keys (partition pruning makes the guard free).
    *
    * Scale: state grows with the ADMITTED corpus (8 band rows + one
    * shingle row per rep); the per-batch join is candidate-bounded — the
    * same equi-join shape the batch pipeline ships. At a 100 TB corpus
    * the grams table is the big side; it joins only on verified
    * candidates' rep_ids, and a deployment compacts old batch_id
    * partitions without changing semantics via [[compactState]]. */
  def dedupeNearToShards(docs: DataFrame, stateDir: String, outDir: String,
      checkpointDir: String, threshold: Double = 0.8,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = docs.writeStream.option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      graft.functions.GraftFunctions.register(spark)
      StreamState.bindLineage(spark, stateDir, checkpointDir)
      StreamState.bindLineage(spark, outDir, checkpointDir)
      if (batchId < math.max(StreamState.horizon(spark, s"$stateDir/bands"),
          StreamState.horizon(spark, outDir))) {
        // replay of an already-COMPACTED batch (state or shard side):
        // its rows live in the base generations and readers ignore its
        // partitions — skip the wasted rewrite entirely (StreamState's
        // no-op contract)
        ()
      } else {
      val b = batch.persist()
      // Collapse byte-identical copies to their min-id representative
      // BEFORE shingling (the q125/q52 discipline inside every
      // micro-batch): admission is invariant under the collapse —
      // identical text means identical gram set, so a copy has exactly
      // its rep's verified partners, every non-rep copy would lose the
      // cluster-minimum election to its own rep (rep_id = group min),
      // and the admitted set / state writes are row-identical
      // (StreamingSpec locks stream == batch). What changes is cost: a
      // duplicate-heavy batch's intra-batch pair mine is quadratic in
      // per-batch group size (measured A/B at the 100x drive's 25k-doc
      // batches: SCALE.md round-6).
      val reps0 = b.join(
        Dedup.exact(b).select(col("keep_id").as("doc_id")), "doc_id")
        .persist()
      try {
        val sh = Dedup.shingled(reps0)
          .withColumn("sorted", sort_array(col("grams")))
          .withColumn("n", size(col("grams")).cast("long")).localCheckpoint()
        val bands = sh.select(col("doc_id"), explode(
          expr(s"minhash_bands(grams, ${Dedup.NumHashes}, ${Dedup.Rows})")).as("bkey"))
          .localCheckpoint()
        // Match on BOTH state tables together: a crash between the two
        // state writes of the very first batch leaves bands/ on disk with
        // no grams/ — that partial state is by construction empty after
        // batch_id pruning, so a missing table means "no admitted state",
        // never an error (replay-idempotence would otherwise wedge here).
        val dropped = (StreamState.read(spark, s"$stateDir/bands", batchId),
            StreamState.read(spark, s"$stateDir/grams", batchId)) match {
          case (Some(stBands), Some(stGrams)) =>
            bands.join(stBands.select("bkey", "rep_id"), "bkey")
              .select("doc_id", "rep_id").distinct()
              .join(sh.select(col("doc_id"), col("sorted").as("ga"), col("n").as("na")), "doc_id")
              .join(stGrams.select("rep_id", "gb", "nb"), "rep_id")
              .withColumn("inter", expr("sorted_intersect_count(ga, gb)"))
              .filter(col("inter").cast("double") /
                (col("na") + col("nb") - col("inter")) >= threshold)
              .select("doc_id").distinct()
          case _ => bands.select("doc_id").limit(0)
        }
        val survivors = reps0.join(dropped, Seq("doc_id"), "left_anti")
        val reps = Dedup.nearDupClusters(survivors, threshold)
          .filter(col("doc_id") === col("cluster_id")).select("doc_id")
        val admitted = survivors.join(reps, Seq("doc_id"), "left_semi").persist()
        try {
          admitted.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
          bands.join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
            .select(col("bkey"), col("doc_id").as("rep_id"))
            .write.mode("overwrite").parquet(s"$stateDir/bands/batch_id=$batchId")
          sh.join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
            .select(col("doc_id").as("rep_id"), col("sorted").as("gb"), col("n").as("nb"))
            .write.mode("overwrite").parquet(s"$stateDir/grams/batch_id=$batchId")
        } finally { admitted.unpersist(); () }
      } finally { reps0.unpersist(); b.unpersist(); () }
      }
    }.start()
  }

  /** Compact the near-dedup state (bands + grams) up to `upToBatch` —
    * SIZE-TIERED since r13 (VERDICT ask 1): both tables are row-per-fact
    * identity merges (a band key claim, a rep's shingle set) but
    * CORPUS-scale — rows per admitted document forever — so the r12
    * full-generation fold paid O(corpus) per maintenance window, the
    * exact non-starter [[StreamState.compactShardsTiered]] removed on
    * the shard side. They now ride the same geometric cascade:
    * O(new data · log corpus) amortized, the corpus-scale grams run's
    * files untouched by a steady-state window. Admission semantics
    * untouched: readers resolve live runs plus live partitions through
    * [[StreamState.read]], and a replayed compacted batch is a no-op
    * (its partition is below the horizon — ignored on read, skipped on
    * write). Call between batches with `upToBatch` ≤ last COMMITTED
    * batch id + 1. */
  def compactState(spark: org.apache.spark.sql.SparkSession, stateDir: String,
      upToBatch: Long): Unit =
    Seq("bands", "grams").foreach { tbl =>
      StreamState.compactShardsTiered(spark, s"$stateDir/$tbl", upToBatch,
        numFiles = 1)
    }

  /** Compact the chunk-index state up to `upToBatch`: the per-batch
    * (source, fp, n, nd) partials are SUMS, so the merge re-aggregates.
    * Tiered + merge-aware since r13 (the LSM shape): each run holds one
    * row per distinct (source, fp) WITHIN ITS BATCH RANGE — the sum
    * merge applies at every run fold, so row growth stays key-bounded
    * per run while a maintenance window costs O(new · log state), never
    * a full-state rewrite. The live card re-aggregates across runs
    * ([[liveChunkDupCard]]), which is what makes the fold-boundary
    * placement invisible to readers. */
  def compactChunkIndex(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, upToBatch: Long): Unit =
    StreamState.compactShardsTiered(spark, stateDir, upToBatch, numFiles = 1,
      merge = _.groupBy("source", "fp").agg(sum("n").as("n"), sum("nd").as("nd")))

  /** Compact the KMV vocabulary state up to `upToBatch`: the merge is
    * the KMV union-trim itself (k smallest distinct hashes), so every
    * RUN is a ≤ k-row sketch no matter how many batches folded in
    * (tiered + merge-aware since r13; [[kmvLive]] re-trims across runs,
    * so fold boundaries are invisible to the estimate). */
  def compactKmv(spark: org.apache.spark.sql.SparkSession, stateDir: String,
      upToBatch: Long, k: Int = Corpus.KmvK): Unit =
    StreamState.compactShardsTiered(spark, stateDir, upToBatch, numFiles = 1,
      merge = _.select("h").distinct().orderBy("h").limit(k))

  /** Live dataset card: q105's per-source report as a streaming
    * aggregate (complete/update mode) — document volume, token volume,
    * language mix, quality-pass count, exact micro-unit mean quality.
    * The batch card's EXACT `n_exact_dups` is not streamable
    * (count(DISTINCT) is not a streaming aggregate), so the live card
    * carries the MERGEABLE estimate instead: an HLL
    * `approx_count_distinct` over the content hash, and
    * `n_approx_dups = n_docs − that` (the q70 sketch discipline — state
    * per source is one fixed-size sketch, and sketches merge across
    * partitions and micro-batches). The exact dup count remains the
    * batch card's job; the live estimate is the monitoring signal. One
    * shuffle keyed by source; state is source-cardinality — flat at any
    * volume. */
  def liveCard(docs: DataFrame): DataFrame = {
    val aggs = Corpus.cardAggs(withDupCount = false) :+
      approx_count_distinct(md5(col("text"))).as("n_distinct_approx")
    Corpus.withAvgQuality(
      TextStats.cardSignals(docs).groupBy("source").agg(aggs.head, aggs.tail: _*))
      .withColumn("n_approx_dups", col("n_docs") - col("n_distinct_approx"))
  }

  /** Live RAG chunk-geometry card — q275's unbounded twin: the
    * char-window chunk explode is stateless and the geometry rollup is
    * merge-only (docs count as "chunks with k = 0", so there is NO
    * countDistinct — unlike [[liveCard]]'s dup estimate, this card is
    * EXACT live), which makes the whole card one streaming aggregate in
    * complete/update mode. State per source is one row of counters —
    * flat at any ingest volume. Spec-locked: live card == batch q275
    * on everything streamed. */
  def liveChunkCard(docs: DataFrame): DataFrame =
    graft.ops.Chunking.geometryCard(graft.ops.Chunking.charChunks(docs))

  /** Drop-folder RAG chunk-index maintainer — q276's streaming twin in
    * the [[kmvStream]] discipline: each micro-batch rolls ITS OWN
    * documents up to (source, fp, n, nd) chunk-fingerprint partials
    * ([[graft.ops.Chunking.chunkFps]] — the batch operator verbatim)
    * and overwrites them into `stateDir/batch_id=N`. No state is read
    * in the hot path, so a replayed batch rewrites itself
    * bit-identically and can never compound (replay-idempotent,
    * StreamingSpec-locked). The partials are lossless merge units
    * because a document's chunks all arrive in its batch: occurrence
    * counts sum, and contributing-doc counts sum since a doc_id never
    * recurs across batches (the drop-folder contract). State on disk is
    * distinct-chunk-bounded per batch — fp keys only, chunk text never
    * persists. [[kmvStream]]'s lifecycle contract applies verbatim: one
    * stateDir per checkpoint lineage. */
  def chunkIndexStream(docs: DataFrame, stateDir: String, checkpointDir: String,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = docs.writeStream.option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
      StreamState.bindLineage(batch.sparkSession, stateDir, checkpointDir)
      if (batchId >= StreamState.horizon(batch.sparkSession, stateDir))
        graft.ops.Chunking.chunkFps(batch)
          .write.mode("overwrite").parquet(s"$stateDir/batch_id=$batchId")
      ()
    }.start()
  }

  /** The live chunk-dup card over everything [[chunkIndexStream]] has
    * indexed: merge the per-batch fp partials (sum n, sum nd per
    * (source, fp)) and run batch q276's own source rollup — equal to
    * running [[graft.ops.Chunking.chunkDupCard]] over the full streamed
    * corpus (StreamingSpec locks streamed == batch). The read touches
    * fp-level rows only, never documents. */
  def liveChunkDupCard(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): DataFrame =
    graft.ops.Chunking.dupCardRollup(
      StreamState.read(spark, stateDir)
        .getOrElse(sys.error(s"no chunk-index state at $stateDir"))
        .groupBy("source", "fp")
        .agg(sum("n").as("n"), sum("nd").as("nd")))

  /** Streaming KMV distinct-vocabulary sketch — q230's unbounded twin:
    * each micro-batch writes ITS OWN k-smallest-hash sketch into a
    * batch_id=N partition (mode=overwrite — a replayed batch rewrites
    * itself bit-identically, the IndexStream discipline; no state is
    * read in the hot path, so replay can't compound), and the live
    * sketch is the k smallest of the UNION of partitions — exactly the
    * KMV merge the OpsSpec locks, so [[kmvLive]]'s sketch equals a
    * from-scratch batch sketch over everything streamed so far. State
    * on disk is ≤ k rows per batch; the live read unions sketch rows,
    * never corpus rows.
    *
    * Lifecycle contract: a `stateDir` is bound to ONE checkpoint
    * lineage. batch_id partitions are keyed by checkpoint-assigned
    * batch ids, so restarting against a FRESH `checkpointDir` (new
    * batch boundaries, not the bit-identical replay the overwrite
    * discipline covers) must also start from a fresh/cleared
    * `stateDir` — stale partitions from the old lineage would merge
    * into [[kmvLive]], and KMV union-merge makes extra hashes harmless
    * only when they came from the same corpus (hashes from a
    * since-removed document deflate the estimate forever). */
  def kmvStream(docs: DataFrame, stateDir: String, checkpointDir: String,
      k: Int = Corpus.KmvK, trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = docs.writeStream.option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
      StreamState.bindLineage(batch.sparkSession, stateDir, checkpointDir)
      if (batchId >= StreamState.horizon(batch.sparkSession, stateDir))
        batch.select(explode(split(col("text"), " ")).as("term"))
          .select(expr("CAST(conv(substr(md5(term), 1, 15), 16, 10) AS BIGINT)").as("h"))
          .distinct().orderBy("h").limit(k)
          .write.mode("overwrite").parquet(s"$stateDir/batch_id=$batchId")
      ()
    }.start()
  }

  /** The live sketch + estimate over everything [[kmvStream]] has seen:
    * k smallest of the merged per-batch sketches, with q230's estimator
    * arithmetic (exact integers; n_kept < k means exact count). */
  def kmvLive(spark: org.apache.spark.sql.SparkSession, stateDir: String,
      k: Int = Corpus.KmvK): DataFrame =
    StreamState.read(spark, stateDir)
      .getOrElse(sys.error(s"no KMV state at $stateDir"))
      .select("h").distinct()
      .orderBy("h").limit(k)
      .agg(count(lit(1)).as("n_kept"), max("h").as("kth_hash"))
      .withColumn("est", expr(
        s"CASE WHEN n_kept < $k THEN n_kept ELSE " +
          s"CAST(((CAST(n_kept AS DECIMAL(38,0)) - 1) * 1152921504606846976) div kth_hash AS BIGINT) END"))
}
