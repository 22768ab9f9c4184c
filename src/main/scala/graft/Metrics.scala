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

/** Pipeline metrics (reference S21, monitoring.py:49-100) as Spark
  * accumulators (counters: cluster-safe, driver-aggregated) plus gauges
  * mirroring the reference's four (monitoring.py:57-79). `snapshot()` is
  * the integration point where the reference calls
  * `prometheus.push_to_server()` (monitoring.py:96-100) — an exporter
  * polls or pushes that map; no external push is wired here by design
  * (zero-egress build). */
final class Metrics(sc: SparkContext, namespace: String) extends Serializable {
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
}

object Metrics {
  def apply(sc: SparkContext, namespace: String = "csv_hist"): Metrics =
    new Metrics(sc, namespace)
}
