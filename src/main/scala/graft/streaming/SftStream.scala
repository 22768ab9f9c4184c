package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Conversations

/** SFT conversational admission — the streaming twin of the q251-family
  * batch pipeline, in the [[CorpusStream]] discipline: conversations
  * land continuously as documents, each micro-batch is parsed to turns
  * and gated STATELESSLY (template strip + assistant-side benchmark
  * bloom), new turn content is admitted exactly once against
  * batch-id-partitioned dedup state, and the admitted shards answer the
  * live role-balance card with batch q255's own rollup.
  *
  * Single-source with the batch family: the turn parse IS
  * [[Conversations.chatTurns]], the strip predicate is the q253 template
  * set by text equality, the span probe hashes the same 13-gram stream
  * q254 fingerprints, and the live card is
  * [[Conversations.roleBalanceOnTurns]] — so stream and batch agree
  * row-for-row on an in-order feed (StreamingSpec locks it).
  *
  * Reference scope note: the reference extractor (csv_extractor.py) is a
  * live poll → parse → dedup-by-catalog → post loop; this object is that
  * architecture applied to the SFT-corpus domain.
  */
object SftStream {

  /** Serialized Bloom filter over the benchmark passages' xxhash64
    * fingerprints — the admission-side stand-in for q254's exact md5
    * span join. No false negatives (same hash both sides); the
    * false-positive tail drops at most a few extra turns, the right
    * asymmetry for admission (q254 stays the exact offline audit). */
  def benchBloomBytes(spark: SparkSession,
      passages: Seq[String] = Conversations.BenchPassages,
      numBits: Long = 1L << 16): Array[Byte] = {
    graft.functions.GraftFunctions.register(spark)
    spark.range(1)
      .select(explode(array(passages.map(lit): _*)).as("p"))
      .agg(expr(s"bloom_filter_agg(xxhash64(p), ${passages.size}L, ${numBits}L)").as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** The STATELESS admission gates over a turn frame: template strip
    * (q253's mined texts, by equality) then assistant-side span-bloom
    * decontamination (any [[Conversations.BenchSpanWords]]-gram of an
    * assistant turn hitting the bloom drops the turn). One projection +
    * filter — shared verbatim by the stream and the batch twin, which
    * is what makes streamed == batch provable rather than approximate. */
  def gateTurns(turns: DataFrame, templates: Seq[String],
      bloom: Array[Byte], w: Int = Conversations.BenchSpanWords): DataFrame = {
    graft.functions.GraftFunctions.register(turns.sparkSession)
    val b64 = java.util.Base64.getEncoder.encodeToString(bloom)
    val stripped =
      if (templates.isEmpty) turns
      else turns.filter(!col("text").isInCollection(templates))
    stripped
      .withColumn("toks", split(col("text"), " "))
      .filter(!(col("role") === "assistant" && expr(
        s"""CASE WHEN size(toks) >= $w THEN
              exists(transform(sequence(1, size(toks) - ${w - 1}),
                  i -> xxhash64(concat_ws(' ', slice(toks, i, $w)))),
                h -> might_contain(unbase64('$b64'), h))
            ELSE false END""")))
      .drop("toks")
  }

  /** Batch twin of the full admission — parse, gate, then per (role,
    * md5-fp) keep the (conv_id, turn_idx)-minimum turn (the q40 min-id
    * representative at turn granularity). The stream equals this
    * exactly on a conv-ordered feed, because first-arrival = struct
    * minimum when batches respect id order. */
  def admitBatch(docs: DataFrame, templates: Seq[String],
      bloom: Array[Byte]): DataFrame =
    dedupTurns(gateTurns(Conversations.chatTurns(docs), templates, bloom))

  /** Per-(role, fp) struct-minimum winners of a gated turn frame. */
  private def dedupTurns(gated: DataFrame): DataFrame =
    gated.withColumn("fp", md5(col("text")))
      .groupBy("role", "fp")
      .agg(min(struct(col("conv_id"), col("turn_idx"), col("text"))).as("t"))
      .select(col("t.conv_id").as("conv_id"), col("t.turn_idx").as("turn_idx"),
        col("role"), col("t.text").as("text"))

  /** The admission stream: per micro-batch — parse + stateless gates,
    * drop turn fps already admitted by an EARLIER batch (state read
    * prunes `batch_id < N`, so a replayed batch never sees its own
    * half-written keys), elect per-(role, fp) struct-minimum winners
    * within the batch, land them under `outDir/batch_id=N` and their
    * (role, fp) keys under `stateDir/turnfps/batch_id=N` — every write
    * mode=overwrite into its own batch dir (the [[CorpusStream]]
    * replay-idempotence discipline). State grows with the ADMITTED
    * distinct-turn cardinality — two small columns, never text. */
  def ingestToShards(docs: DataFrame, templates: Seq[String],
      bloom: Array[Byte], stateDir: String, outDir: String,
      checkpointDir: String, trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = docs.writeStream.option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      val gated = gateTurns(Conversations.chatTurns(batch), templates, bloom)
        .withColumn("fp", md5(col("text")))
      val fresh = readState(spark, s"$stateDir/turnfps", batchId) match {
        case Some(st) =>
          gated.join(st.select("role", "fp"), Seq("role", "fp"), "left_anti")
        case None => gated
      }
      val admitted = fresh
        .groupBy("role", "fp")
        .agg(min(struct(col("conv_id"), col("turn_idx"), col("text"))).as("t"))
        .select(col("t.conv_id").as("conv_id"), col("t.turn_idx").as("turn_idx"),
          col("role"), col("t.text").as("text"), col("fp"))
        .localCheckpoint() // feeds the shard write AND the state write
      admitted.drop("fp")
        .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      admitted.select("role", "fp")
        .write.mode("overwrite").parquet(s"$stateDir/turnfps/batch_id=$batchId")
      ()
    }.start()
  }

  /** Live role-balance card over everything admitted so far — batch
    * q255's own rollup ([[Conversations.roleBalanceOnTurns]]) on the
    * landed shards. */
  def liveRoleBalance(spark: SparkSession, outDir: String): DataFrame =
    Conversations.roleBalanceOnTurns(
      spark.read.parquet(outDir).select("conv_id", "turn_idx", "role", "text"))

  /** Batch-id-pruned state read ([[CorpusStream]]'s reader, same
    * contract): None until the first batch materializes the table. */
  private def readState(spark: SparkSession, dir: String,
      current: Long): Option[DataFrame] =
    try {
      val df = spark.read.parquet(dir).filter(col("batch_id") < current)
      df.schema; Some(df)
    } catch { case _: org.apache.spark.sql.AnalysisException => None }
}
