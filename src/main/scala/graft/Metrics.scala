package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.util.LongAccumulator

/** A settable gauge (reference monitoring.py Gauge usage). DRIVER-set
  * only: unlike the accumulators, a Gauge has no executor->driver merge,
  * and a .set inside a task closure mutates a deserialized throwaway
  * copy (even in local[n] — closures serialize there too). Callers set
  * gauges from driver-side accounting (bounded metadata collects). */
final class Gauge(val name: String) extends Serializable {
  private val v = new AtomicLong()
  def set(x: Long): Unit = v.set(x)
  def add(x: Long): Unit = { v.addAndGet(x); () }
  def get: Long = v.get
}

/** Where metric snapshots go (reference monitoring.py:96-100
  * `push_to_server`). No Prometheus client in a zero-egress build, so the
  * push target is pluggable: a gateway impl would POST the map; the
  * shipped impls log or record. Driver-side only — `Metrics.push()` is
  * called from driver code, never task closures. */
trait MetricsSink extends Serializable {
  def push(snapshot: Map[String, Long]): Unit
}

object MetricsSink {
  /** Discard (the reference's effective behavior when no push-gateway is
    * configured). */
  object Noop extends MetricsSink {
    def push(snapshot: Map[String, Long]): Unit = ()
  }

  /** One sorted `k=v` line per push — the standalone stand-in for the
    * reference's gateway. */
  final class Logging extends MetricsSink {
    def push(snapshot: Map[String, Long]): Unit =
      println(snapshot.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString("[metrics] ", " ", ""))
  }

  /** Retains every pushed snapshot, for tests and embedding callers. */
  final class Recording extends MetricsSink {
    private val buf = scala.collection.mutable.ArrayBuffer[Map[String, Long]]()
    def push(snapshot: Map[String, Long]): Unit = synchronized { buf += snapshot; () }
    def pushes: Seq[Map[String, Long]] = synchronized(buf.toSeq)
    def last: Option[Map[String, Long]] = synchronized(buf.lastOption)
  }
}

/** Pipeline metrics (reference S21, monitoring.py:49-100) as Spark
  * accumulators (counters: cluster-safe, driver-aggregated) plus gauges
  * mirroring the reference's four (monitoring.py:57-79). `snapshot()`
  * feeds the pluggable [[MetricsSink]] via `push()`, mirroring the
  * reference's `monitor.push()` cadence (csv_extractor.py:41,230,234):
  * after discovery, after each file's accounting, after the final flush. */
final class Metrics(sc: SparkContext, namespace: String,
    @transient private val sink: MetricsSink = MetricsSink.Noop) extends Serializable {
  val postedDatapoints: LongAccumulator = sc.longAccumulator(s"$namespace.posted_data_points")
  val createdTimeSeries: LongAccumulator = sc.longAccumulator(s"$namespace.created_time_series")
  val failedFiles: LongAccumulator = sc.longAccumulator(s"$namespace.failed_processing_files")
  val processedFiles: LongAccumulator = sc.longAccumulator(s"$namespace.processed_files")

  /** csv files in the input folder that the extractor could process. */
  val availableCsvFiles = new Gauge(s"$namespace.available_csv_files")
  /** csv files remaining to be processed in this batch. */
  val unprocessedFiles = new Gauge(s"$namespace.unprocessed_files")
  /** csv files successfully processed in this batch. */
  val successfullyProcessedFiles = new Gauge(s"$namespace.successfully_processed_files")
  /** series with valid datapoints in the file currently being posted. */
  val postedTimeSeriesCount = new Gauge(s"$namespace.posted_time_series_count")

  def snapshot(): Map[String, Long] = Map(
    postedDatapoints.name.get -> postedDatapoints.value,
    createdTimeSeries.name.get -> createdTimeSeries.value,
    failedFiles.name.get -> failedFiles.value,
    processedFiles.name.get -> processedFiles.value,
    availableCsvFiles.name -> availableCsvFiles.get,
    unprocessedFiles.name -> unprocessedFiles.get,
    successfullyProcessedFiles.name -> successfullyProcessedFiles.get,
    postedTimeSeriesCount.name -> postedTimeSeriesCount.get)

  /** Push a snapshot to the sink. A monitoring outage must never kill
    * extraction: failures are logged and swallowed, exactly the
    * reference's try/except (monitoring.py:96-100). Null-safe because the
    * sink field is transient: a Metrics that round-tripped through
    * closure serialization pushes nowhere rather than NPEs. */
  def push(): Unit = {
    val s = sink
    if (s != null) {
      try s.push(snapshot())
      catch {
        case e: Exception =>
          System.err.println(s"[graft] failed to push metrics: ${e.getMessage}")
      }
    }
  }
}

object Metrics {
  def apply(sc: SparkContext, namespace: String = "csv_hist",
      sink: MetricsSink = MetricsSink.Noop): Metrics =
    new Metrics(sc, namespace, sink)
}
