package graft

import org.apache.spark.SparkContext
import org.apache.spark.util.LongAccumulator

/** Pipeline metrics (reference S21, monitoring.py:49-79) as Spark
  * accumulators: cluster-safe counters aggregated on the driver, exposed to
  * any metrics sink via SparkListener / the metrics system instead of a
  * Prometheus push-gateway. */
final class Metrics(sc: SparkContext, namespace: String) extends Serializable {
  val postedDatapoints: LongAccumulator = sc.longAccumulator(s"$namespace.posted_data_points")
  val createdTimeSeries: LongAccumulator = sc.longAccumulator(s"$namespace.created_time_series")
  val failedFiles: LongAccumulator = sc.longAccumulator(s"$namespace.failed_processing_files")
  val processedFiles: LongAccumulator = sc.longAccumulator(s"$namespace.processed_files")
}

object Metrics {
  def apply(sc: SparkContext, namespace: String = "csv_hist"): Metrics =
    new Metrics(sc, namespace)
}
