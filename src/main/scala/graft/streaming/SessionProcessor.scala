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

/** One open TYPED session interval: endpoints at MICRO precision with
  * their event ids (the batch ops sessionize on t_us and tie-break
  * same-timestamp events by event_id — ms endpoints would merge or
  * mis-order what the batch keeps apart). */
case class OpenTypedSession(
    start_us: Long, start_eid: Long, entry_type: String,
    end_us: Long, end_eid: Long, exit_type: String, n: Long)

/** One FINAL typed session — carries everything q235 (size) and q236
  * (entry/exit profile) need, emitted exactly once at watermark close. */
case class TypedFinalSession(
    user_id: Long, start_us: Long, end_us: Long, n_events: Long,
    entry_type: String, exit_type: String)

/** [[SessionProcessor]]'s discipline with TYPED endpoints — the session
  * stream behind the live q235/q236 cards: each final session carries
  * its size and its entry/exit event types, so the engagement-shape
  * card ([[SessionCards.sizeCard]]) and the funnel-design card
  * ([[SessionCards.entryExitCard]]) are plain bounded rollups over the
  * EMITTED sessions — no second stateful operator, no event retention.
  * Micro-precision endpoints + event-id tie-breaks make the streamed
  * sessions equal the batch ops' rows exactly (spec-locked).
  *
  * Same shape bounds as [[SessionProcessor]]: ListState of open
  * sessions per user, one event-time timer at the earliest possible
  * close, exactly-once emission. */
class TypedSessionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, (Long, Timestamp, Long, String), TypedFinalSession] {

  @transient private var open: ListState[OpenTypedSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getListState[OpenTypedSession](
      "open", Encoders.product[OpenTypedSession], TTLConfig.NONE)

  private def merged(sessions: ArrayBuffer[OpenTypedSession]): ArrayBuffer[OpenTypedSession] = {
    val sorted = sessions.sortBy(s => (s.start_us, s.start_eid))
    val out = ArrayBuffer.empty[OpenTypedSession]
    for (s <- sorted) {
      if (out.nonEmpty && s.start_us <= out.last.end_us + gapUs) {
        val p = out.remove(out.length - 1)
        // exit = endpoint with the greater (end_us, end_eid); entry = p's
        // (sort order guarantees p's start is the lesser endpoint)
        val sWins = s.end_us > p.end_us || (s.end_us == p.end_us && s.end_eid > p.end_eid)
        val (eu, ee, et) =
          if (sWins) (s.end_us, s.end_eid, s.exit_type) else (p.end_us, p.end_eid, p.exit_type)
        out += OpenTypedSession(p.start_us, p.start_eid, p.entry_type,
          eu, ee, et, p.n + s.n)
      } else out += s
    }
    out
  }

  private def rearm(sessions: Seq[OpenTypedSession]): Unit = {
    getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
    if (sessions.nonEmpty)
      getHandle.registerTimer((sessions.map(_.end_us).min + gapUs) / 1000L + 1L)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Timestamp, Long, String)],
      timerValues: TimerValues): Iterator[TypedFinalSession] = {
    def micros(t: Timestamp): Long = EventStream.micros(t)
    val buf = ArrayBuffer.empty[OpenTypedSession]
    if (open.exists()) buf ++= open.get()
    rows.foreach { case (_, ts, eid, tpe) =>
      val t = micros(ts)
      buf += OpenTypedSession(t, eid, tpe, t, eid, tpe, 1L)
    }
    val m = merged(buf)
    open.put(m.toArray)
    rearm(m.toSeq)
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[TypedFinalSession] = {
    // strict <: an event at EXACTLY end + gap still merges in the batch
    // semantics and is not yet late at watermark == end + gap
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    val all = if (open.exists()) open.get().toSeq else Seq.empty
    val (done, still) = all.partition(_.end_us + gapUs < wmUs)
    if (still.isEmpty) open.clear() else open.put(still.toArray)
    rearm(still)
    done.sortBy(_.start_us).iterator
      .map(s => TypedFinalSession(key, s.start_us, s.end_us, s.n,
        s.entry_type, s.exit_type))
  }
}

object TypedSessionProcessor {
  /** Final-only TYPED sessionization of (user_id, ts, event_id,
    * event_type) streams — the session stream the live q235/q236 cards
    * roll up. */
  def sessions(
      events: DataFrame,
      gapUs: Long = 1800000000L,
      watermark: String = "10 minutes"): Dataset[TypedFinalSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").as[Long], col("ts").as[Timestamp],
        col("event_id").as[Long], col("event_type").as[String])
      .groupByKey(_._1)
      .transformWithState(
        new TypedSessionProcessor(gapUs), TimeMode.EventTime(), OutputMode.Append())
  }
}

/** The q235/q236 cards as rollups over a [[TypedFinalSession]] frame
  * (the collected stream output, or any batch of final sessions) — the
  * live twins of EventOps.sessionSizes / entryExitTypes. Both are
  * bounded aggregations: sizes collapse to distinct-level rows, the
  * profile is types-bounded; neither touches events again. */
object SessionCards {
  import org.apache.spark.sql.functions.{broadcast, count, expr, lit, max, min, sum, when}

  /** q235's card over final sessions: tie-aware exact p50/p90/p99 of
    * n_events via the count-of-counts discipline. */
  def sizeCard(sessions: DataFrame): DataFrame = {
    val levels = sessions.select(col("n_events").as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("sz")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    levels.withColumn("cum", sum("cnt").over(w))
      .crossJoin(broadcast(levels.agg(sum("cnt").as("n"),
        sum(expr("sz * cnt")).as("n_events"))))
      .agg(
        max("n").as("n_sessions"),
        max("n_events").as("n_events"),
        min(when(expr("cum * 100 >= 50 * n"), col("sz"))).as("p50"),
        min(when(expr("cum * 100 >= 90 * n"), col("sz"))).as("p90"),
        min(when(expr("cum * 100 >= 99 * n"), col("sz"))).as("p99"),
        max("sz").as("max_size"))
      .withColumn("mean_micro", expr("(n_events * 1000000L) div n_sessions"))
  }

  /** q289's card over final sessions: per day, peak concurrent
    * sessions — the same day-clipped sweep-line as the batch op, run
    * over EMITTED sessions (the [[sizeCard]] discipline: no second
    * stateful operator). Spec-locked: live card == batch q289 on the
    * full event table. */
  def concurrencyCard(sessions: DataFrame): DataFrame =
    graft.ops.EventOps.concurrencyFromIntervals(
      sessions.select(col("start_us").as("s"), col("end_us").as("e")))

  /** q236's card over final sessions: per event type, how many sessions
    * it opens and closes, with micro shares of all sessions. */
  def entryExitCard(sessions: DataFrame): DataFrame = {
    val entries = sessions.groupBy(col("entry_type").as("event_type"))
      .agg(count(lit(1)).as("n_entry"))
    val exits = sessions.groupBy(col("exit_type").as("event_type"))
      .agg(count(lit(1)).as("n_exit"))
    entries.join(exits, Seq("event_type"), "full_outer")
      .na.fill(0L, Seq("n_entry", "n_exit"))
      .crossJoin(broadcast(sessions.agg(count(lit(1)).as("n_sessions"))))
      .withColumn("entry_share_micro", expr("(n_entry * 1000000L) div n_sessions"))
      .withColumn("exit_share_micro", expr("(n_exit * 1000000L) div n_sessions"))
      .select("event_type", "n_entry", "n_exit", "n_sessions",
        "entry_share_micro", "exit_share_micro")
  }
}
