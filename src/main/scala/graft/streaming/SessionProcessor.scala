package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming._

/** One open (not yet watermark-closed) session interval, ms epoch. */
case class OpenSession(start_ms: Long, end_ms: Long, n: Long, sum: Double)

/** One FINAL session: emitted only once the watermark passed its close. */
case class FinalSession(
    user_id: Long, session_start: Long, session_end: Long,
    n_events: Long, sum_value: Double)

/** Event-time sessionization on the `transformWithState` API (Spark 4's
  * arbitrary-state successor to mapGroupsWithState) — the third streaming
  * sessionization shape in the engine, complementing
  * [[EventStream.sessionAgg]] (built-in `session_window`) and the batch
  * [[graft.ops.EventOps.sessionize]]:
  *
  *  - [[ListState]] holds the user's OPEN sessions — a list, not a single
  *    value, because out-of-order rows inside the watermark horizon can
  *    legitimately open an earlier session while a later one exists, and
  *    only the watermark may decide a session can no longer grow;
  *  - each batch's rows are interval-merged into the list (gap-merge over
  *    sessions sorted by start, aggregates combined), never emitted early;
  *  - an event-time TIMER at min(end)+gap fires when the watermark passes
  *    it; expired sessions emit as [[FinalSession]] EXACTLY ONCE and the
  *    timer re-arms for the next-closing survivor. Spark drops
  *    later-than-watermark input itself, so a just-expired session cannot
  *    be reopened.
  *
  * State per key is O(open sessions), bounded by the watermark horizon /
  * gap; the store is keyed by user and distributed with the shuffle, so
  * the shape holds on an unbounded stream at any key cardinality.
  * Requires the RocksDB state-store provider (multi-column-family state):
  * `spark.sql.streaming.stateStore.providerClass =
  * org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`.
  */
class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Timestamp, Double), FinalSession] {

  @transient private var open: ListState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getListState[OpenSession](
      "open", Encoders.product[OpenSession], TTLConfig.NONE)

  /** Gap-merge `sessions` in place of a sorted rebuild: sort by start,
    * fold adjacent intervals closer than the gap. */
  private def merged(sessions: ArrayBuffer[OpenSession]): ArrayBuffer[OpenSession] = {
    val sorted = sessions.sortBy(s => (s.start_ms, s.end_ms))
    val out = ArrayBuffer.empty[OpenSession]
    for (s <- sorted) {
      if (out.nonEmpty && s.start_ms <= out.last.end_ms + gapMs) {
        val p = out.remove(out.length - 1)
        out += OpenSession(p.start_ms, math.max(p.end_ms, s.end_ms), p.n + s.n, p.sum + s.sum)
      } else out += s
    }
    out
  }

  /** Re-arm the single per-key timer at the earliest possible close. */
  private def rearm(sessions: Seq[OpenSession]): Unit = {
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    if (sessions.nonEmpty)
      getHandle.registerTimer(sessions.map(_.end_ms).min + gapMs)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Timestamp, Double)],
      timerValues: TimerValues): Iterator[FinalSession] = {
    val buf = ArrayBuffer.empty[OpenSession]
    if (open.exists()) buf ++= open.get()
    rows.foreach { case (_, ts, v) =>
      val t = ts.getTime
      buf += OpenSession(t, t, 1L, v)
    }
    val m = merged(buf)
    open.put(m.toArray)
    rearm(m.toSeq)
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[FinalSession] = {
    val wm = timerValues.getCurrentWatermarkInMs()
    val all = if (open.exists()) open.get().toSeq else Seq.empty
    val (done, still) = all.partition(_.end_ms + gapMs <= wm)
    if (still.isEmpty) open.clear() else open.put(still.toArray)
    rearm(still)
    done.sortBy(_.start_ms).iterator
      .map(s => FinalSession(key, s.start_ms, s.end_ms, s.n, s.sum))
  }
}

object SessionProcessor {
  /** Final-only sessionization of (user_id, ts, value) streams: sessions
    * emit exactly once, when the watermark proves them closed. */
  def sessions(
      events: DataFrame,
      gapMs: Long = 1800000L,
      watermark: String = "10 minutes"): Dataset[FinalSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").as[Long], col("ts").as[Timestamp], col("value").as[Double])
      .groupByKey(_._1)
      .transformWithState(
        new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }
}
