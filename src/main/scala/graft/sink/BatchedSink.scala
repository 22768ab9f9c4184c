package graft.sink

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, SaveMode}
import org.apache.spark.sql.functions._

import graft.tebis.{Datapoint, DatapointValue, TebisFile}

/** One insert-request payload: all buffered points of one series
  * (reference `{"externalId":…, "datapoints":[(ts,value)…]}`,
  * csv_extractor.py:158). */
case class SeriesPayload(externalId: String, datapoints: Seq[DatapointValue])

/** Pluggable datapoints endpoint (the reference's CogniteClient stand-in).
  * Implementations must be idempotent on (externalId, timestamp) — the
  * pipeline is at-least-once (SURVEY §3 E2). */
trait DatapointsClient extends Serializable {
  def insertMultiple(batch: Seq[SeriesPayload]): Unit
}

/** Clients needing endpoint credentials implement this; the CLI resolves
  * the key (`--api-key` flag, else GRAFT_EXTRACTOR_API_KEY env — the
  * reference's main.py:83-85 pattern) and injects it AFTER construction,
  * so `clientClass` reflection stays no-arg and the key never appears in
  * any Config/log rendering (see [[graft.Main.Secret]]). */
trait ApiKeyAuthed {
  def setApiKey(key: String): Unit
}

/** Dry-run client: logs request shapes to stdout. No-arg constructible,
  * so it also serves as a `clientClass` for the DataSourceV2 sink. */
class StdoutDatapointsClient extends DatapointsClient with ApiKeyAuthed {
  // carried as instance state so a driver-configured client SERIALIZES
  // its credential into executor closures (a global/singleton client
  // re-resolves per executor JVM and would lose driver-side injection)
  @volatile private var apiKey: Option[String] = None
  override def setApiKey(key: String): Unit = {
    apiKey = Some(key)
    println("[sink] api key configured (****)")
  }
  def insertMultiple(batch: Seq[SeriesPayload]): Unit =
    println(s"[sink] insert_multiple${if (apiKey.isDefined) " (authed)" else ""}: ${batch.size} series, ${batch.map(_.datapoints.size).sum} datapoints")
}

/** Batched parallel sink (S15/S16, csv_extractor.py:22,137-146,162-196).
  *
  * Reference constants preserved as configuration: at most `BatchMax`
  * (1000) series per insert request; parallelism comes from Spark tasks
  * (the reference's thread fan-out, but distributed and retried by
  * `spark.task.maxFailures`).
  *
  * Scale: `write(ds)` shuffles once on externalId so each series lands in
  * exactly one task, then streams a SORTED iterator — memory is bounded by
  * one series' buffered points, never the partition. No collect, no
  * driver-side loops.
  */
object BatchedSink {
  val BatchMax = 1000

  /** Post one parsed file's payloads in <=1000-series batches, preserving
    * the reference's flush-at-1000 grouping (grouped == flush-then-rest
    * because the reference flushes exactly at 1000). Only series with >=1
    * surviving datapoint become payloads (csv_extractor.py:157-160). */
  def postFile(file: TebisFile, client: DatapointsClient, batchMax: Int = BatchMax): Unit = {
    val payloads = file.columns.iterator
      .filter(_.datapoints.nonEmpty)
      .map(c => SeriesPayload(c.externalId, c.datapoints))
    payloads.grouped(batchMax).foreach(client.insertMultiple(_))
  }

  /** Distributed datapoint sink: one shuffle on externalId, sorted
    * streaming within each partition, <=batchMax series per request. */
  def write(ds: Dataset[Datapoint], client: DatapointsClient, batchMax: Int = BatchMax): Unit = {
    ds.repartition(col("externalId"))
      .sortWithinPartitions("externalId", "timestampMs")
      .foreachPartition { (it: Iterator[Datapoint]) =>
        val batch = ArrayBuffer.empty[SeriesPayload]
        var curId: String = null
        var curPoints = ArrayBuffer.empty[DatapointValue]
        def flushSeries(): Unit = if (curId != null && curPoints.nonEmpty) {
          batch += SeriesPayload(curId, curPoints.toSeq)
          curPoints = ArrayBuffer.empty[DatapointValue]
          if (batch.length >= batchMax) { client.insertMultiple(batch.toSeq); batch.clear() }
        }
        it.foreach { dp =>
          if (dp.externalId != curId) { flushSeries(); curId = dp.externalId }
          curPoints += DatapointValue(dp.timestampMs, dp.value)
        }
        flushSeries()
        if (batch.nonEmpty) client.insertMultiple(batch.toSeq)
      }
  }

  /** Shared lakehouse layout: one place defines the day partitioning and
    * in-file sort so the historical and streaming paths cannot diverge. */
  private def writeLake(ds: Dataset[Datapoint], path: String, mode: SaveMode): Unit =
    ds.withColumn("day", to_date(timestamp_millis(col("timestampMs"))))
      // repartition by (day, externalId), not day alone: a day's whole
      // volume in one task is the classic few-distinct-keys trap;
      // partitionBy(day) still yields one directory per day
      .repartition(col("day"), col("externalId"))
      .sortWithinPartitions("day", "externalId", "timestampMs")
      .write.partitionBy("day").mode(mode).parquet(path)

  /** Exactly-once-at-rest streaming twin of [[writeParquet]]: each
    * micro-batch lands in its own `batch_id=N` subdirectory with
    * OVERWRITE semantics, so a batch replayed after a crash rewrites the
    * same directory instead of appending duplicates. Readers point at
    * `path` and get `batch_id` via partition discovery (prune it or drop
    * it — the day partition below carries the query-pruning value). */
  def writeParquetBatch(ds: Dataset[Datapoint], path: String, batchId: Long): Unit =
    writeLake(ds, s"$path/batch_id=$batchId", SaveMode.Overwrite)

  /** Parquet datapoint sink for the lakehouse path: partitioned by UTC day
    * so per-series time-range queries prune partitions, sorted within files
    * by (externalId, timestampMs) for row-group skipping at 100 TB. */
  def writeParquet(ds: Dataset[Datapoint], path: String): Unit =
    writeLake(ds, path, SaveMode.Append)

  /** Compact a streaming lake (`path/batch_id=N/day=D/...`, many small
    * per-trigger files) into the historical Append layout at `destPath`:
    * one read, re-bucketed and re-sorted by the shared layout, so
    * downstream scans pay row-group pruning instead of a
    * file-per-micro-batch listing storm.
    *
    * Only COMMITTED batch dirs (those with a `_SUCCESS` marker) are
    * compacted — a batch the streaming query is mid-writing is skipped,
    * never torn. Idempotence is IN-BAND: after the append commits, each
    * compacted dir gets a `_COMPACTED` marker and marked dirs are skipped
    * on every later scan — a re-run without any caller-side cleanup is a
    * no-op, never a row duplication. (Underscore-prefixed files are
    * invisible to Spark's partition discovery, so lake readers are
    * unaffected.) Returns the dirs compacted THIS call; the caller may
    * delete them at leisure to reclaim space — or never. */
  def compactLake(spark: org.apache.spark.sql.SparkSession, path: String, destPath: String): Seq[String] = {
    import spark.implicits._
    require(destPath != path, "compacting a lake onto itself would mix batch_id and day layouts")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val committed = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .filter(s => fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .filter(s => !fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_COMPACTED")))
      .map(_.getPath.toString).toSeq.sorted
    if (committed.isEmpty) return Nil
    // basePath keeps partition discovery rooted at the lake when reading
    // an explicit list of batch_id dirs (else Spark flags them as
    // conflicting partition roots)
    val dps = spark.read.option("basePath", path).parquet(committed: _*)
      .select($"externalId", $"timestampMs", $"value").as[Datapoint]
    writeLake(dps, destPath, SaveMode.Append)
    // marker AFTER the append commits: a crash between write and marker
    // re-compacts (at-least-once within this maintenance op) — the same
    // window the caller-delete contract had, but now bounded in-band
    committed.foreach { dir =>
      fs.create(new org.apache.hadoop.fs.Path(dir, "_COMPACTED"), true).close()
    }
    committed
  }
}
