package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ops.Similarity

/** Streaming maintenance of a persisted IVF index — the production shape
  * of q170's batch append path: a growing corpus arrives as a stream, and
  * each micro-batch of new vectors is assigned against the FROZEN
  * persisted centroids (no retraining — one n×k broadcast pass per
  * batch) and lands as one batch-id partition of an appends table next
  * to the base index.
  *
  * Replay-idempotent by the [[CorpusStream.dedupeNearToShards]]
  * discipline, simplified by q170's invariant: per-vector assignment
  * reads NO append state (a vector's cell depends only on itself and the
  * frozen centroids), so there is nothing to prune — each batch writes
  * `mode=overwrite` into its own `batch_id=N` partition, and a replayed
  * batch overwrites itself with bit-identical rows. The live index view
  * is base assignments ∪ appends; append-then-query equals
  * assign-union-then-query row for row (spec-locked against batch q170),
  * however the stream was batched.
  *
  * Retrain stays a deliberate operator decision: the cell-occupancy
  * drift audit (q171) reads the SAME live view, so a drifting stream
  * shows up as a climbing max/mean cell ratio.
  */
object IndexStream {

  /** Start the append stream: `vectors` is a STREAMING frame of
    * quantized rows (vec_id, qv, nrm) — the caller quantizes with the
    * shared [[Similarity.quantExpr]] so streamed and batch vectors carry
    * identical integers. */
  def appendStream(vectors: DataFrame, indexDir: String, checkpointDir: String,
      nprobe: Int = Similarity.IvfNprobe,
      trigger: Option[Trigger] = None): StreamingQuery = {
    val writer = vectors.writeStream.option("checkpointLocation", checkpointDir)
    trigger.foreach(writer.trigger)
    writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val spark = batch.sparkSession
      graft.functions.GraftFunctions.register(spark)
      val cents = spark.read.parquet(s"$indexDir/centroids")
      Similarity.assignCells(batch.select("vec_id", "qv", "nrm"), cents, nprobe)
        .write.mode("overwrite")
        .parquet(s"$indexDir/appends/batch_id=$batchId")
    }.start()
  }

  /** The live assignments view of a streamed index: the base table plus
    * every streamed append partition. None-append indexes read as plain
    * persisted ones (the appends directory may not exist yet). */
  def assignments(spark: SparkSession, indexDir: String): DataFrame = {
    val base = spark.read.parquet(s"$indexDir/assignments")
    try {
      val app = spark.read.parquet(s"$indexDir/appends").drop("batch_id")
      app.schema // force resolution
      base.unionByName(app)
    } catch { case _: org.apache.spark.sql.AnalysisException => base }
  }

  /** Top-k neighbors off the live view — [[Similarity.knnIvfPersisted]]
    * for a streamed index. */
  def knn(spark: SparkSession, indexDir: String, k: Int,
      nprobe: Int = Similarity.IvfNprobe): DataFrame =
    Similarity.knnIvfOnAssignments(spark, assignments(spark, indexDir), k, nprobe)
}
