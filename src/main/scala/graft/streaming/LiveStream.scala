package graft.streaming

import java.nio.charset.Charset

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.Metrics
import graft.sink.{BatchedSink, DatapointsClient}
import graft.tebis.TebisCsv

/** Live micro-batch mode (reference E2, csv_extractor.py:25-50,265-280),
  * re-expressed as Structured Streaming over the binaryFile source.
  *
  * Reference constants → source/trigger configuration:
  *  - poll every 8 s            → Trigger.ProcessingTime(8 s)
  *  - 20 newest files per poll  → maxFilesPerTrigger=20 + latestFirst=true
  *  - delete-as-commit          → checkpointed source offsets + cleanSource
  *    (strictly stronger: exactly-once file accounting instead of the
  *    reference's at-least-once delete-after-post, SURVEY §3 E2)
  *  - 1 s mtime settle window   → no direct option; the checkpoint replays
  *    any torn file on restart, and `maxFileAge` bounds backlog (gap
  *    documented per SURVEY S2).
  */
object LiveStream {
  case class Config(
      inputDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 20,
      triggerMs: Long = 8000L,
      latestFirst: Boolean = true,
      /** When true (default), the micro-batch itself applies the
        * reference's commit protocol: SUCCESSFUL files are deleted (or
        * moved to archiveDir), failed files are dead-lettered to
        * failedDir or left in place — never deleted. Spark's cleanSource
        * would delete/archive failed files too (it cannot see parse
        * outcomes), so it stays "off" when this is on. */
      manageLifecycle: Boolean = true,
      cleanSource: String = "off", // off | delete | archive (only when !manageLifecycle)
      archiveDir: Option[String] = None,
      failedDir: Option[String] = None, // dead-letter parse failures (--move-failed)
      batchMax: Int = BatchedSink.BatchMax)

  /** Start the live pipeline: stream files → parse per-file in executors →
    * post ≤1000-series batches via the client. Returns the running query. */
  def start(
      spark: SparkSession,
      cfg: Config,
      client: DatapointsClient,
      metrics: Option[Metrics] = None): StreamingQuery = {
    import spark.implicits._
    // binaryFile's fixed schema, required explicitly for streaming
    val binarySchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val cleanSource = if (cfg.manageLifecycle) "off" else cfg.cleanSource
    val reader = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.csv")
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .option("latestFirst", cfg.latestFirst)
      .option("cleanSource", cleanSource)
    if (!cfg.manageLifecycle) cfg.archiveDir.foreach(reader.option("sourceArchiveDir", _))
    val files = reader.load(cfg.inputDir)
      .select($"path", $"content").as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        TebisCsv.parseContent(p, new String(bytes, Charset.forName(TebisCsv.Encoding)))
      }

    files.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.ProcessingTime(cfg.triggerMs))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.tebis.TebisFile], _: Long) =>
        val batchMax = cfg.batchMax
        batch.persist()
        try {
          // posts run distributed; dead-letter moves run on the DRIVER so
          // they use the session's Hadoop configuration (credentials etc.)
          batch.filter(_.error.isEmpty).foreach { file =>
            BatchedSink.postFile(file, client, batchMax)
            metrics.foreach { m =>
              m.processedFiles.add(1)
              m.postedDatapoints.add(file.datapointCount)
            }
          }
          val failedPaths = batch.filter(_.error.isDefined).map(_.path)(
            org.apache.spark.sql.Encoders.STRING).collect()
          val lifecycle = new graft.tebis.Discovery.Lifecycle(
            cfg.failedDir, cfg.archiveDir, spark.sparkContext.hadoopConfiguration)
          failedPaths.foreach { p =>
            metrics.foreach(_.failedFiles.add(1))
            // dead-letter or leave in place; NEVER delete an uningested file
            if (cfg.failedDir.isDefined) lifecycle.onFailure(p)
          }
          if (cfg.manageLifecycle) {
            // delete-as-commit (or archive) for successfully posted files —
            // the reference's E2 protocol, applied per micro-batch
            val okPaths = batch.filter(_.error.isEmpty).map(_.path)(
              org.apache.spark.sql.Encoders.STRING).collect()
            okPaths.foreach(lifecycle.onSuccess)
          }
        } finally { batch.unpersist(); () }
      }
      .start()
  }
}
