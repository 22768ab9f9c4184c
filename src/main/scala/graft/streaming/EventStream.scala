package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming event analytics (★ SURVEY §2b streaming row):
  * event-time windows with watermarks and session windows over an
  * unbounded event stream. Batch twins of these semantics are oracle-
  * tested in EventOps (q19-q21); these run the same aggregations
  * incrementally with bounded state — the watermark caps state size and
  * drops late events, which is what survives on an unbounded 100 TB/day
  * stream. Input: any streaming DataFrame with (ts TIMESTAMP,
  * event_type STRING, value DOUBLE). */
object EventStream {

  /** Tumbling (or, with `slide`, sliding) event-time window counts. */
  def windowedAgg(
      events: DataFrame,
      width: String = "1 hour",
      slide: Option[String] = None,
      watermark: String = "10 minutes"): DataFrame = {
    val w = slide match {
      case Some(s) => window(col("ts"), width, s)
      case None => window(col("ts"), width)
    }
    events
      .withWatermark("ts", watermark)
      .groupBy(w.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("win.start").as("ws"), col("win.end").as("we"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Session windows (gap-based), the streaming twin of
    * EventOps.sessionize. */
  def sessionAgg(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("win.start").as("session_start"),
        col("win.end").as("session_end"), col("n_events"), col("sum_value"))
}
