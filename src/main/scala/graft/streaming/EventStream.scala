package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user running state for the custom stateful operator. */
case class UserStats(user_id: Long, n_events: Long, sum_value: Double, max_value: Double)

/** One anomaly emission: an event whose value exceeded `factor` x the
  * user's running mean at the time it arrived. */
case class Anomaly(user_id: Long, value: Double, running_mean: Double, n_seen: Long)

/** Per-user funnel progress (-1 = step not reached; done = converted;
  * p_ts set on conversion so expiry can anchor at the LAST advance). */
case class FunnelState(v_ts: Long, c_ts: Long, done: Boolean, p_ts: Long = -1L)

/** One completed view→click→purchase conversion (epoch micros). */
case class Conversion(user_id: Long, v_ts: Long, c_ts: Long, p_ts: Long)

/** Per-user cursor for [[EventStream.transitions]]: the last seen event
  * type and its event time — fixed-size, no event buffering. */
case class TransCursor(last_type: String, last_us: Long)

/** One within-session transition (q166's unit of count). */
case class Transition(user_id: Long, from_type: String, to_type: String)

/** Emitted row of [[EventStream.transitionLatencies]] — q214's per-pair
  * dwell time, one row per adjacent same-user event pair. */
case class TransitionLat(user_id: Long, from_type: String, to_type: String,
  gap_us: Long)

/** Per-type CUSUM state: the open day's running count + the closed-form
  * accumulators (P and min(0, min P)). Fixed-size per key. */
case class CusumState(day: Long, n: Long, p: Long, minP: Long)

/** Per-type state for [[EventStream.seasonalMonitor]]: the one OPEN
  * (absolute-hour, count) cell. */
case class SeasonalState(cell: Long, n: Long)

/** One flagged cell emitted by [[EventStream.seasonalMonitor]] — the
  * streaming twin of a batch q219 row. */
case class SeasonalFlag(event_type: String, day: Long, hour: Long, n: Long,
    n_hour: Long, n_days: Long, ratio_micro: Long, direction: String)

/** One closed day's drift reading (the streaming twin of a q199 row). */
case class DriftPoint(event_type: String, day: Long, n: Long,
    cusum_micro: Long, spike: Boolean)

/** Per-(user, type) state for [[EventStream.dupMonitor]]: every OPEN
  * (event-time micros -> count) delivery group still inside the
  * watermark window — window-bounded, expired by event-time timeout
  * once the watermark proves a timestamp closed. */
case class DupState(counts: Map[Long, Long])

/** One closed delivery group emitted by [[EventStream.dupMonitor]] —
  * n >= 2 means the event was delivered n times (at-least-once
  * redelivery); the batch q247 card is a types-bounded rollup of these. */
case class DupGroup(user_id: Long, event_type: String, t_us: Long, n: Long)

/** Per-user state for [[EventStream.scd2Monitor]]: `open` days still
  * inside the watermark (day -> (best ts_us, best event_id, its k));
  * `fin` days the watermark has finalized but whose island has not yet
  * provably closed (day -> k). Both maps are bounded by the watermark
  * window plus one undecided island — never by the stream. */
case class Scd2State(open: Map[Long, (Long, Long, Long)], fin: Map[Long, Long])

/** One closed SCD2 interval emitted by [[EventStream.scd2Monitor]] —
  * the streaming twin of a q283 row. */
case class Scd2Iv(user_id: Long, k: Long, valid_from_day: Long,
    valid_to_day: Long, n_days: Long)

/** Structured-Streaming event analytics (★ SURVEY §2b streaming row):
  * event-time windows with watermarks and session windows over an
  * unbounded event stream. Batch twins of these semantics are oracle-
  * tested in EventOps (q19-q21); these run the same aggregations
  * incrementally with bounded state — the watermark caps state size and
  * drops late events, which is what survives on an unbounded 100 TB/day
  * stream. Input: any streaming DataFrame with (ts TIMESTAMP,
  * event_type STRING, value DOUBLE). */
object EventStream {

  /** Micro-precision event time from a JDBC timestamp: ms * 1000 plus
    * the sub-ms micros (getTime already carries whole ms, so only the
    * nanos' micro remainder is added). Shared by every stateful
    * operator in this package — a precision fix lands once. */
  private[streaming] def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

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

  /** Custom keyed state (★ SURVEY §2b UDF/state row):
    * flatMapGroupsWithState anomaly detector — emits events whose value
    * exceeds `factor` x the user's running mean, maintaining bounded
    * per-key state (count/sum/max) across micro-batches. The pattern to
    * copy for any custom per-key streaming state the built-in windows
    * can't express. Input columns: (user_id LONG, value DOUBLE). */
  def anomalies(events: DataFrame, factor: Double = 3.0): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events.select(col("user_id").as[Long], col("value").as[Double])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserStats]) =>
          var st = state.getOption.getOrElse(UserStats(user, 0L, 0.0, Double.MinValue))
          val out = Seq.newBuilder[Anomaly]
          rows.foreach { case (_, v) =>
            if (st.n_events > 0 && v > factor * (st.sum_value / st.n_events))
              out += Anomaly(user, v, st.sum_value / st.n_events, st.n_events)
            st = UserStats(user, st.n_events + 1, st.sum_value + v, math.max(st.max_value, v))
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming CUSUM drift monitor — the unbounded twin of
    * EventOps.rateCusum (q199): per event type, the same closed-form
    * one-sided CUSUM over daily counts, emitted live as each day CLOSES
    * (a strictly later day arrives for that type). The reference rate
    * `muMicro` is FROZEN and passed in — the production shape: a batch
    * job (q199's own mean, or an SLO) sets the reference, the monitor
    * tracks drift against it; deriving mu from the stream itself would
    * make early days' verdicts change retroactively.
    *
    * State per type is FIXED-SIZE — (open day, its count, P, min-P) —
    * and the per-batch working set is a day-cardinality count map,
    * never buffered events. In-order contract as [[funnel]]: a day
    * closes when a later day is observed, so an event arriving AFTER
    * its day closed cannot be counted (document-stream late data is the
    * watermark's job upstream); within a batch arrival order is
    * irrelevant (counts merge by day). Spec-locked: streamed DriftPoints
    * == batch q199 rows at the same frozen mu, however the stream is
    * batched. Input columns: (event_type STRING, ts TIMESTAMP). */
  def driftMonitor(events: DataFrame, muMicro: Map[String, Long],
      spikeFactor: Long = 3L): Dataset[DriftPoint] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type").as[String],
        expr("unix_micros(ts) div 86400000000").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Long)], state: GroupState[CusumState]) =>
          val mu = muMicro.getOrElse(tpe, 0L)
          val counts = scala.collection.mutable.Map.empty[Long, Long]
          rows.foreach { case (_, d) => counts(d) = counts.getOrElse(d, 0L) + 1L }
          var st = state.getOption.getOrElse(CusumState(Long.MinValue, 0L, 0L, 0L))
          if (st.day != Long.MinValue)
            counts(st.day) = counts.getOrElse(st.day, 0L) + st.n
          val out = Seq.newBuilder[DriftPoint]
          val days = counts.keys.toSeq.sorted
          days.dropRight(1).foreach { d =>
            val p = st.p + (counts(d) * 1000000L - mu)
            val minP = math.min(st.minP, p) // minP starts at 0 == P_0
            val cusum = p - minP
            out += DriftPoint(tpe, d, counts(d), cusum, cusum > spikeFactor * mu)
            st = CusumState(Long.MinValue, 0L, p, minP)
          }
          days.lastOption.foreach(d => st = st.copy(day = d, n = counts(d)))
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming seasonality-adjusted anomaly monitor — q219's unbounded
    * twin, the [[driftMonitor]] discipline applied to the diurnal
    * baseline: the hour-of-day PROFILE is FROZEN and passed in (deriving
    * it from the stream would re-judge old cells retroactively — the
    * driftMonitor argument verbatim), per-type state is the ONE open
    * (absolute-hour, count) cell, and a cell is judged the moment a
    * later cell arrives for its type. Emits only flagged cells (≥3× or
    * ≤⅓ of the hour's expectation, under the ≥1-event/day support rule)
    * with the exact cross-multiplied micro ratio — BigInt-widened, the
    * batch op's DECIMAL discipline.
    *
    * Same in-order contract as [[driftMonitor]]: an event arriving after
    * its hour closed cannot be counted; within a batch, counts merge by
    * cell. Spec-locked: emitted flags == batch q219's rows at the same
    * frozen profile, however the stream is batched. */
  def seasonalMonitor(events: DataFrame, profile: Map[(String, Long), Long],
      nDays: Long, spikeMicro: Long = 3000000L,
      droughtMicro: Long = 333333L): Dataset[SeasonalFlag] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type").as[String],
        expr("unix_micros(ts) div 3600000000").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Long)], state: GroupState[SeasonalState]) =>
          val counts = scala.collection.mutable.Map.empty[Long, Long]
          rows.foreach { case (_, c) => counts(c) = counts.getOrElse(c, 0L) + 1L }
          var st = state.getOption.getOrElse(SeasonalState(Long.MinValue, 0L))
          if (st.cell != Long.MinValue)
            counts(st.cell) = counts.getOrElse(st.cell, 0L) + st.n
          val out = Seq.newBuilder[SeasonalFlag]
          val cells = counts.keys.toSeq.sorted
          cells.dropRight(1).foreach { c =>
            val hour = c % 24
            val nHour = profile.getOrElse((tpe, hour), 0L)
            if (nHour >= nDays && nHour > 0L) {
              val n = counts(c)
              val ratio = (BigInt(n) * nDays * 1000000L / nHour).toLong
              if (ratio >= spikeMicro || ratio <= droughtMicro)
                out += SeasonalFlag(tpe, c / 24, hour, n, nHour, nDays, ratio,
                  if (ratio >= spikeMicro) "spike" else "drought")
            }
          }
          st = SeasonalState(cells.last, counts(cells.last))
          state.update(st)
          out.result().iterator
      }
  }

  /** Live at-least-once-delivery monitor — the unbounded twin of
    * EventOps.duplicateEvents (q247): emits one [[DupGroup]] per
    * (user, type, event-time) delivery group the moment the group is
    * PROVABLY closed, so a redelivery storm shows up as n >= 2 groups
    * while it is happening instead of at the next batch audit.
    *
    * The ONLY provable close is the watermark passing the group's
    * timestamp: once it has, a redelivery of that exact timestamp would
    * be late-dropped upstream, so the count is final. (An earlier form
    * also closed a group when a LATER timestamp arrived for the key —
    * the driftMonitor day-close discipline — but that close is not
    * provable under out-of-order delivery: a redelivery arriving after
    * a newer event, still inside the watermark, re-opened the group and
    * double-emitted it with the count split. Exactly the shape real
    * at-least-once redelivery takes; spec-locked against now.)
    *
    * State per (user, type) is every still-open (t_us, n) inside the
    * watermark window — bounded by the window, not the stream — and
    * self-expires via the event-time timeout on the oldest open entry.
    * [[dupCard]] rolls emitted groups into q247's card; spec-locked:
    * streamed groups == the batch op's (user, type, ts) rollup on the
    * same delivered rows, however the stream is batched and reordered
    * within the watermark. Input columns: (user_id LONG, event_type
    * STRING, ts TIMESTAMP) with timestamps at micro precision. */
  def dupMonitor(events: DataFrame,
      watermarkDelay: String = "10 minutes"): Dataset[DupGroup] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").as[Long], col("event_type").as[String],
        col("ts").as[java.sql.Timestamp])
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), rows: Iterator[(Long, String, java.sql.Timestamp)],
            state: GroupState[DupState]) =>
          // one unified path: merge state + batch rows, close everything
          // the watermark has passed, keep the rest (handles the timeout
          // wake-up too — rows is just empty there)
          val counts = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(_.counts.foreach { case (t, n) => counts(t) = n })
          rows.foreach { r =>
            val us = EventStream.micros(r._3)
            counts(us) = counts.getOrElse(us, 0L) + 1L
          }
          val wm = state.getCurrentWatermarkMs()
          // final once the watermark passed the group's millisecond (+1 ms
          // guard: watermarks/timeouts are ms, timestamps are us)
          val (closed, open) = counts.partition { case (t, _) => t / 1000L + 1L <= wm }
          if (open.nonEmpty) {
            state.update(DupState(open.toMap))
            state.setTimeoutTimestamp(open.keys.min / 1000L + 1L)
          } else if (state.exists) state.remove()
          closed.toSeq.sortBy(_._1).iterator
            .map { case (t, n) => DupGroup(key._1, key._2, t, n) }
      }
  }

  /** q247's card over a [[DupGroup]] frame (the collected monitor output
    * or any batch of closed groups): per type — delivered rows,
    * duplicate groups, extra rows, micro duplicate share. The same
    * types-bounded second rollup as the batch op. */
  def dupCard(groups: DataFrame): DataFrame =
    groups.groupBy("event_type").agg(
        sum("n").as("n_events"),
        expr("CAST(count_if(n >= 2) AS BIGINT)").as("n_dup_groups"),
        sum(expr("n - 1")).as("n_extra_rows"))
      .withColumn("dup_micro", expr("(n_extra_rows * 1000000L) div n_events"))

  /** Live SCD2 maintenance (streaming twin of q283
    * `EventOps.scd2History`): per user, maintains the daily-last-value
    * snapshot under the watermark and emits each [valid_from_day,
    * valid_to_day] interval EXACTLY ONCE, at the moment it provably
    * closed — when the island's decision day (the day after its last
    * day) is itself final under the watermark, so it is either present
    * with a different value (a change row) or provably absent (a gap).
    * This is the CDC-to-dimension path run live: the emitted rows ARE
    * the type-2 dimension's closed intervals, append-only.
    *
    * Order-independence: the per-day "last value" merge keeps the max
    * (ts, event_id) candidate, so any batching/reordering inside the
    * watermark yields the same intervals — the spec replays shuffled
    * batch splits and asserts multiset equality with the batch op.
    *
    * State per user: open days inside the watermark + at most one
    * undecided trailing island — watermark-bounded, never
    * stream-bounded; self-expires via the event-time timeout on the
    * earliest future decision point. Input columns: (user_id LONG,
    * ts TIMESTAMP, event_id LONG, k LONG) — the caller parses k
    * upstream (batch q283 uses get_json_object on props). */
  def scd2Monitor(events: DataFrame,
      watermarkDelay: String = "10 minutes"): Dataset[Scd2Iv] = {
    import events.sparkSession.implicits._
    val DayUs = 86400000000L
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").as[Long], col("ts").as[java.sql.Timestamp],
        col("event_id").as[Long], col("k").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, Long)],
            state: GroupState[Scd2State]) =>
          val open = scala.collection.mutable.Map.empty[Long, (Long, Long, Long)]
          val fin = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach { s => open ++= s.open; fin ++= s.fin }
          rows.foreach { r =>
            val us = EventStream.micros(r._2); val day = us / DayUs
            val keep = open.get(day) match {
              case Some((pus, pid, _)) => us > pus || (us == pus && r._3 > pid)
              case None => true
            }
            if (keep) open(day) = (us, r._3, r._4)
          }
          val wm = state.getCurrentWatermarkMs()
          // day d is final once the watermark passed its last possible
          // micro (the dupMonitor ms-guard discipline)
          def isFinal(d: Long): Boolean = ((d + 1) * DayUs - 1) / 1000L + 1L <= wm
          open.keys.filter(isFinal).toSeq.foreach { d =>
            fin(d) = open(d)._3; open.remove(d)
          }
          // walk finalized days in order; emit maximal islands whose
          // decision day is itself decided
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Iv]
          val days = fin.keys.toSeq.sorted
          var i = 0
          while (i < days.length) {
            val a = days(i); val k = fin(a)
            var b = a; var j = i + 1
            while (j < days.length && days(j) == b + 1 && fin(days(j)) == k) {
              b = days(j); j += 1
            }
            if (isFinal(b + 1)) { // change row at b+1 or proven gap
              out += Scd2Iv(user, k, a, b, b - a + 1)
              (a to b).foreach(fin.remove)
              i = j
            } else i = days.length // trailing undecided island: retain
          }
          if (open.nonEmpty || fin.nonEmpty) {
            state.update(Scd2State(open.toMap, fin.toMap))
            // earliest future decision: an open day finalizing, or the
            // retained island's decision day finalizing — both strictly
            // beyond the current watermark by construction
            val cands = open.keys.map(d => ((d + 1) * DayUs - 1) / 1000L + 1L) ++
              fin.keys.toSeq.sorted.lastOption
                .map(b => ((b + 2) * DayUs - 1) / 1000L + 1L)
            state.setTimeoutTimestamp(cands.min)
          } else if (state.exists) state.remove()
          out.iterator
      }
  }

  /** Streaming conversion funnel, the unbounded twin of
    * EventOps.funnelStages (q78): a per-user state machine advances
    * view → click-within-window → purchase-within-window and emits one
    * [[Conversion]] the moment the chain completes. State is one tiny
    * fixed-size record per user — no event buffering — which is the only
    * funnel shape that survives an unbounded stream.
    *
    * State ceiling: DISTINCT-USER CARDINALITY, explicitly — `NoTimeout`
    * is deliberate. The q78 semantics this operator is spec-locked to are
    * first-view-only and at-most-one-conversion-per-user, so a user's
    * record stays meaningful forever: a `done` record suppresses
    * re-emission, and a stalled record pins the first view as the only
    * funnel attempt. Expiring either (GroupStateTimeout) would let a
    * later view restart the funnel and emit conversions q78 never
    * reports. Size the state store for |users| × ~40 bytes; a deployment
    * that wants RESTARTABLE funnels with watermark-bounded state uses
    * [[funnelRestartable]] instead.
    *
    * Contract: events are applied in event-time order WITHIN each
    * micro-batch (sorted here); an event arriving in a LATER batch than
    * one it precedes in event time cannot rewind already-advanced state —
    * for in-order streams the emitted conversions equal the batch q78's
    * stage-3 rows exactly (locked by spec). Input columns:
    * (user_id LONG, event_type STRING, ts TIMESTAMP). */
  def funnel(
      events: DataFrame,
      windowUs: Long = graft.ops.EventOps.FunnelWindowUs): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").as[Long], col("event_type").as[String],
        unix_micros(col("ts")).as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long)], state: GroupState[FunnelState]) =>
          val st0 = state.getOption.getOrElse(FunnelState(-1L, -1L, done = false))
          val (st, out) = advanceFunnel(user, st0, rows.toSeq.sortBy(_._3), windowUs)
          state.update(st)
          out.iterator
      }
  }

  /** Streaming within-session transition stream — the incremental twin
    * of the batch transition matrix (q166,
    * [[graft.ops.EventOps.sessionTransitions]]): per-user state is ONE
    * fixed-size cursor (last event type + time); each arriving event
    * within `gapSec` of the cursor emits a (from, to) transition, a gap
    * beyond it starts a new session silently — exactly the q21/q166 gap
    * rule, evaluated incrementally. Downstream aggregation (the count
    * matrix) is an ordinary streaming groupBy over the emitted
    * transitions. Same in-order contract as [[funnel]]: events sort by
    * event time within each micro-batch; for in-order streams the
    * emitted multiset equals the batch q166 counts exactly (spec). */
  def transitions(events: DataFrame, gapSec: Long = 1800L): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").as[Long], col("event_type").as[String],
        unix_micros(col("ts")).as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long)], state: GroupState[TransCursor]) =>
          var st = state.getOption.getOrElse(TransCursor(null, Long.MinValue))
          val out = Seq.newBuilder[Transition]
          rows.toSeq.sortBy(_._3).foreach { case (_, tpe, t) =>
            if (st.last_type != null && t - st.last_us <= gapSec * 1000000L)
              out += Transition(user, st.last_type, tpe)
            st = TransCursor(tpe, t)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming twin of q214's transition-LATENCY matrix: the same
    * fixed-size per-user cursor as [[transitions]], but every adjacent
    * pair (NO session gap cut — q214's contract) emits its dwell time in
    * µs; the (from, to, count, sum, max) matrix is an ordinary streaming
    * groupBy over the emissions. Ties on event time break by event_id,
    * matching the batch window's (ts, event_id) order; same in-order
    * contract as [[transitions]] — for in-order streams the aggregated
    * emissions equal batch q214 exactly (spec). */
  def transitionLatencies(events: DataFrame): Dataset[TransitionLat] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").as[Long], col("event_type").as[String],
        unix_micros(col("ts")).as[Long], col("event_id").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, Long)],
            state: GroupState[TransCursor]) =>
          var st = state.getOption.getOrElse(TransCursor(null, Long.MinValue))
          val out = Seq.newBuilder[TransitionLat]
          rows.toSeq.sortBy(r => (r._3, r._4)).foreach { case (_, tpe, t, _) =>
            if (st.last_type != null)
              out += TransitionLat(user, st.last_type, tpe, t - st.last_us)
            st = TransCursor(tpe, t)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** The shared view→click→purchase state machine — ONE definition drives
    * both funnel variants, so their per-event semantics cannot drift. */
  private def advanceFunnel(user: Long, st0: FunnelState,
      evs: Seq[(Long, String, Long)], windowUs: Long): (FunnelState, Seq[Conversion]) = {
    var st = st0
    val out = Seq.newBuilder[Conversion]
    evs.foreach { case (_, tpe, t) =>
      if (!st.done) {
        if (st.v_ts < 0) {
          if (tpe == "view") st = st.copy(v_ts = t)
        } else if (st.c_ts < 0) {
          if (tpe == "click" && t > st.v_ts && t <= st.v_ts + windowUs)
            st = st.copy(c_ts = t)
        } else if (tpe == "purchase" && t > st.c_ts && t <= st.c_ts + windowUs) {
          out += Conversion(user, st.v_ts, st.c_ts, t)
          st = st.copy(done = true, p_ts = t)
        }
      }
    }
    (st, out.result())
  }

  /** RESTARTABLE streaming funnel — the bounded-state production variant
    * [[funnel]]'s Scaladoc names: same per-event machine (shared code),
    * but per-user state EXPIRES via EventTimeTimeout once the watermark
    * passes `window` beyond the attempt's last advance. Under in-order
    * delivery an expired non-`done` attempt could never advance anyway
    * (every remaining step is out of window), so removal loses nothing —
    * and a later view then starts a FRESH attempt. `done` records expire
    * on the same clock, so one user can convert again in a later
    * session. State ceiling: users ACTIVE within the last funnel window,
    * not all-time distinct users — the difference between O(traffic) and
    * O(history) on an unbounded stream.
    *
    * Semantics therefore deliberately diverge from q78/[[funnel]]
    * (which are first-view-only, at-most-one-conversion): within one
    * window-span of activity the two agree exactly (locked by spec);
    * across expiries this one re-opens. Expiry is enforced BOTH ways
    * Spark can surface it: the timeout callback removes idle state, and
    * an inline check resets state that is already past its expiry when
    * new data for the user arrives first — Spark only invokes
    * hasTimedOut for groups with NO data in the trigger, so without the
    * inline check a fresh attempt landing in the same batch would be
    * judged against the dead one. Requires an event-time watermark;
    * `watermarkDelay` is the lateness bound. */
  def funnelRestartable(
      events: DataFrame,
      windowUs: Long = graft.ops.EventOps.FunnelWindowUs,
      watermarkDelay: String = "10 seconds"): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    val windowMs = windowUs / 1000L
    // the watermarked TIMESTAMP column must survive projection up to the
    // stateful operator (projecting it to a LONG would orphan the
    // watermark and fail the streaming checker) — micros conversion
    // happens inside the lambda instead (EventStream.micros)
    events
      .withWatermark("ts", watermarkDelay)
      .select(col("user_id").as[Long], col("event_type").as[String],
        col("ts").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
            state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove() // stale attempt or emitted conversion: re-open
            Iterator.empty
          } else {
            def anchorMs(s: FunnelState) =
              math.max(s.v_ts, math.max(s.c_ts, s.p_ts)) / 1000L
            val wm = state.getCurrentWatermarkMs()
            val st0 = state.getOption match {
              // already past expiry but the timeout callback hasn't fired
              // (it only fires for groups with no data): start fresh
              case Some(s) if anchorMs(s) + windowMs <= wm =>
                FunnelState(-1L, -1L, done = false)
              case Some(s) => s
              case None => FunnelState(-1L, -1L, done = false)
            }
            val evs = rows.map { case (u, tpe, t) => (u, tpe, micros(t)) }
            val (st, out) = advanceFunnel(user, st0, evs.toSeq.sortBy(_._3), windowUs)
            if (st.v_ts < 0) {
              // only pre-view noise seen: hold no state at all
              if (state.exists) state.remove()
            } else {
              state.update(st)
              // expire one window after the last advance (incl. the
              // purchase for done records); clamp above the current
              // watermark so a late-arriving batch still registers
              state.setTimeoutTimestamp(math.max(anchorMs(st) + windowMs, wm + 1L))
            }
            out.iterator
          }
      }
  }

  /** Streaming exact dedup, the unbounded-stream twin of Dedup.exact:
    * `dropDuplicatesWithinWatermark` keyed on the id columns, with a
    * watermark on the event-time column bounding the state — per-key
    * state is evicted as the watermark advances, the only dedup shape
    * that survives an unbounded stream (plain dropDuplicates on a
    * non-event-time key grows state forever). A replayed duplicate
    * arriving within the watermark horizon of the first sighting is
    * suppressed even if its `ts` differs (the at-least-once-source ->
    * exactly-once-sink repair); duplicates farther apart than the
    * horizon are intentionally out of contract. */
  def dedupe(
      events: DataFrame,
      idCols: Seq[String] = Seq("event_id"),
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks from the preceding `maxGapSec` seconds — the streaming
    * twin of the q55 banded proximity join (and the all-matches sibling
    * of the q22 as-of join). Both sides carry watermarks and the join
    * condition bounds click_ts to a window ENDING at purchase_ts, which
    * is what lets the state store evict: a buffered click older than
    * (watermark − maxGap) can never match a future purchase and is
    * dropped, so state stays bounded on an unbounded stream. Inner join
    * in append mode — results emit as soon as both sides arrive. */
  def intervalJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      maxGapSec: Long = 300L,
      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("c_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $maxGapSec SECONDS"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
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
