package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef._

/** Event-time analytics over the `events` table (★ SURVEY §2c): JSON
  * extraction, tumbling/sliding windows, sessionization, as-of join.
  *
  * Time base: `ts` is normalized to epoch NANOS as long at load —
  * testdata generations have shipped both ns-parquet timestamps (read
  * as long via `spark.sql.legacy.parquet.nanosAsLong`) and plain
  * timestamp[us] columns, and [[events]] accepts either — so all window
  * math is integer arithmetic on `t_us`/`t_sec` (exactly what the
  * oracle's `epoch_us` computes). Integer window math beats `window()`
  * structs for oracle
  * portability and keeps everything in whole-stage codegen. Division
  * note: Spark `DIV` and DuckDB `//` BOTH truncate toward zero, so the
  * engines agree for any sign; for pre-1970 (negative-epoch) events the
  * window buckets are truncation buckets, whose boundaries differ from
  * floor-division buckets — consistent and well-defined, but callers
  * wanting calendar-aligned pre-1970 windows should floor explicitly.
  *
  * Scale: every op here is one shuffle (groupBy/window on user_id or
  * window-start); no self-joins. The as-of join is the union trick —
  * O(n log n) sort within user partitions instead of a per-row probe.
  */
object EventOps {

  def events(spark: SparkSession, dir: String): DataFrame =
    eventsOn(spark, t(spark, dir, "events"))

  /** The ts-normalization over an EXPLICIT raw events frame (epoch-nanos
    * Long out, whatever parquet type in) — the `sessionize(path, gap)`
    * TVF's prep (r13), shared with [[events]] so SQL and Scala agree. */
  def eventsOn(spark: SparkSession, raw: DataFrame): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TIMESTAMP cast below interprets wall-clock time in the
    // SESSION time zone; enforce UTC here (not just in Main/Bench/Verify)
    // so library callers on a non-UTC JVM don't silently shift events.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw // ns-parquet read as nanos
      case _ => // timestamp[us] (NTZ or not) → epoch nanos, UTC enforced above
        raw.withColumn("ts", expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000"))
    }
  }

  /** Tumbling-window aggregate: ws = floor(t_sec / width) * width. */
  def tumbling(ev: DataFrame, widthSec: Long): DataFrame =
    ev.withColumn("ws", expr(s"((ts DIV 1000000000) DIV $widthSec) * $widthSec"))
      .groupBy("ws", "event_type")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))

  /** Sliding windows of `widthSec` every `slideSec`: each event lands in
    * width/slide windows via a sequence explode (no shuffle before the
    * final aggregate). */
  def sliding(ev: DataFrame, widthSec: Long, slideSec: Long): DataFrame = {
    val k = (widthSec / slideSec).toInt
    ev.withColumn("t_sec", expr("ts DIV 1000000000"))
      .withColumn("k", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("ws", expr(s"(((t_sec - k * $slideSec) DIV $widthSec) * $widthSec) + k * $slideSec"))
      .groupBy("ws")
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
  }

  /** Session windows per user with gap > `gapSec`: lag + cumulative flag
    * sum — the classic two-window sessionization, one shuffle on user_id.
    * Gap math at microsecond granularity to match the oracle exactly. */
  /** Gap-based session ids: one exchange on user_id, two passes of the
    * same window — shared by [[sessionize]] and [[sessionPatterns]]. */
  private def withSessionIds(ev: DataFrame, gapSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t_us").asc, col("event_id").asc)
    ev.withColumn("t_us", expr("ts DIV 1000"))
      .withColumn("prev_us", lag("t_us", 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull || col("t_us") - col("prev_us") > gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("sess_seq",
        sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessionize(ev: DataFrame, gapSec: Long): DataFrame = {
    withSessionIds(ev, gapSec)
      .groupBy("user_id", "sess_seq")
      .agg(
        min(expr("t_us DIV 1000000")).as("session_start"),
        max(expr("t_us DIV 1000000")).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
  }

  /** Session transition matrix (q166): within-session Markov transition
    * counts and probabilities between event types — the journey-shape
    * summary a funnel definition (q78) is hand-built from, computed for
    * ALL type pairs at once (which transitions exist, which dominate,
    * where sessions leak). Transitions never cross a session boundary
    * (the q21 gap rule). `p` is the row-stochastic estimate quantized to
    * `(n·1e6) div n_from` exact integers then one portable double
    * division — the q99 determinism discipline.
    *
    * Scale shape: ONE user-keyed exchange carries the session-id lag
    * window AND the within-session lead (same partitioning); the
    * transition rollup is (type × type)-bounded with map-side combine;
    * the row-total join is type-cardinality and broadcasts. */
  def sessionTransitions(ev: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id", "sess_seq")
      .orderBy(col("t_us").asc, col("event_id").asc)
    val trans = withSessionIds(ev, gapSec)
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy("from_type").agg(sum("n").as("n_from"))
    trans.join(broadcast(totals), "from_type")
      .withColumn("p", expr("CAST((n * 1000000L) div n_from AS DOUBLE)") / lit(1000000.0))
      .select("from_type", "to_type", "n", "n_from", "p")
  }

  def sessionTransitionsSql(gapSec: Long = 1800L): String =
    s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
      f AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > ${gapSec}000000
              THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      g AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM f),
      h AS (SELECT event_type, lead(event_type) OVER (PARTITION BY user_id, sess_seq
              ORDER BY t_us, event_id) AS next_type FROM g),
      tr AS (SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
             FROM h WHERE next_type IS NOT NULL GROUP BY 1, 2),
      tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM tr GROUP BY 1)
      SELECT from_type, to_type, CAST(n AS BIGINT) AS n, n_from,
        CAST((n * 1000000) // n_from AS DOUBLE) / 1000000.0 AS p
      FROM tr JOIN tot USING (from_type)"""

  /** As-of join: for each `leftType` event, the most recent STRICTLY
    * earlier `rightType` event of the same user (ties on time broken by
    * max event_id). Implemented as union + last(ignoreNulls) over a
    * (t_us asc, left-first-at-ties, event_id asc) ordering — left rows
    * sort before right rows at equal t_us, which is exactly what makes
    * the match strict. Scales as one shuffle + sort per user partition;
    * no n² probe. */
  def asofJoin(ev: DataFrame, leftType: String, rightType: String): DataFrame = {
    val tagged = ev
      .filter(col("event_type").isin(leftType, rightType))
      .withColumn("t_us", expr("ts DIV 1000"))
      .withColumn("is_left", (col("event_type") === lit(leftType)).cast("int"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t_us").asc, col("is_left").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("right_t_us", last(when(col("is_left") === 0, col("t_us")), ignoreNulls = true).over(w))
      .withColumn("right_event_id", last(when(col("is_left") === 0, col("event_id")), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(
        col("event_id").as("left_event_id"), col("user_id"),
        col("t_us").as("left_t_us"), col("right_t_us"), col("right_event_id"))
  }

  /** Banded range join ("time-proximity join"): all ordered pairs of
    * same-user events at most `windowSec` apart (earlier event first;
    * equal-time ties ordered by event_id). The naive formulation is a
    * theta join (`a.t <= b.t <= a.t + w`) — an O(n²)-per-user nested
    * loop with no shuffle key. This is the standard banding rewrite: any
    * qualifying pair satisfies bucket(b) ∈ {bucket(a), bucket(a)+1} for
    * width-w buckets, so the LEFT side explodes into those two bucket
    * keys (2× one narrow column), the RIGHT side keeps its single home
    * bucket, and the join is an EQUI-join on (user_id, bucket) that
    * Catalyst plans as a shuffled hash/sort-merge join — fully
    * partitionable at 100 TB; the residual range predicate prunes inside
    * buckets. Each pair meets exactly once (b's home bucket is unique). */
  def proximityPairs(ev: DataFrame, windowSec: Long): DataFrame = {
    val wUs = windowSec * 1000000L
    val base = ev.select(col("event_id"), col("user_id"), expr("ts DIV 1000").as("t_us"))
    val left = base.withColumn("bkt",
      explode(array(expr(s"t_us DIV $wUs"), expr(s"t_us DIV $wUs + 1"))))
    val right = base.withColumn("bkt", expr(s"t_us DIV $wUs"))
    left.alias("a").join(right.alias("b"),
      col("a.user_id") === col("b.user_id") && col("a.bkt") === col("b.bkt") &&
        (col("b.t_us") - col("a.t_us")).between(0L, wUs) &&
        (col("a.t_us") < col("b.t_us") ||
          (col("a.t_us") === col("b.t_us") && col("a.event_id") < col("b.event_id"))))
      .select(
        col("a.event_id").as("id_a"), col("b.event_id").as("id_b"),
        col("a.user_id").as("user_id"), (col("b.t_us") - col("a.t_us")).as("dt_us"))
  }

  /** The same class of bounded range join as [[proximityPairs]], but
    * written as the NAIVE theta join — no hand banding, no equi key — and
    * re-planned by [[graft.plans.BandedRangeJoinRule]], which this query
    * installs via `spark.experimental.extraOptimizations` (the
    * `spark.sql.extensions=graft.GraftExtensions` route injects the same
    * rule). Purchase→click attribution across ALL users: without the rule
    * Spark plans this as BroadcastNestedLoopJoin (every purchase × every
    * click); with it, a shuffled equi-join on width-w time buckets. The
    * residual keeps the exact predicate, so rows are identical either
    * way — the PlanSpec gate asserts the shape, the oracle the rows. */
  def rangeJoinAuto(spark: SparkSession, dir: String, windowSec: Long): DataFrame = {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BandedRangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandedRangeJoinRule
    val ev = events(spark, dir).withColumn("t_us", expr("ts DIV 1000"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("t_us").as("pt_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("t_us").as("ct_us"))
    p.join(c, col("ct_us") > col("pt_us") &&
        col("ct_us") <= col("pt_us") + lit(windowSec * 1000000L))
      .select(col("purchase_id"), col("click_id"),
        (col("ct_us") - col("pt_us")).as("dt_us"))
  }

  /** Trailing time-RANGE window: per user, for every event, the count and
    * exact sum of values in the preceding `windowSec` (value-based frame —
    * peers at equal t_us share one frame, per SQL RANGE semantics; no
    * row-order tie-break needed, which is what makes it deterministic).
    * Complements the ROWS frames (q11) and bucketed sliding windows
    * (q20): this is the event-time-relative form. One shuffle on user_id
    * + one sort per partition; Spark evaluates the moving frame
    * incrementally (two pointers), not O(frame) per row. The sum is
    * decimal inside the window (accumulation-order-independent), double
    * only at the edge. */
  def trailingWindow(ev: DataFrame, windowSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("t_us").asc)
      .rangeBetween(-windowSec * 1000000L, 0L)
    ev.withColumn("t_us", expr("ts DIV 1000"))
      .select(col("event_id"), col("user_id"), col("t_us"),
        count(lit(1)).over(w).as("n_win"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))).over(w)
          .cast("double").as("sum_win"))
  }

  /** Approximate distinct users per event type via Spark's built-in HLL
    * sketches (Datasketches HLL_4): the streaming-mergeable sibling of
    * exact countDistinct — per-partition sketches merge associatively, so
    * the shuffle carries one ~KB sketch per group per partition no matter
    * how many rows (the 100 TB cardinality shape; MisraGries is the same
    * story for heavy hitters). NO DuckDB oracle ON PURPOSE: its
    * approx_count_distinct is a different HLL implementation with
    * different register hashing, so cross-engine values can't match —
    * the correctness gate is the spec instead: estimates within 2% of
    * exact on every group, and union-of-daily-sketches equal to the
    * whole-corpus sketch (mergeability, the property that matters). */
  def approxDistinctUsers(ev: DataFrame): DataFrame =
    ev.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("approx_users"),
        count(lit(1)).as("n_rows"))

  /** Events viewed as a per-user datapoint series (ms timestamps), so the
    * TEBIS series operators (gaps, resample) apply to the oracle tables. */
  def asSeries(ev: DataFrame): DataFrame =
    ev.select(
      col("user_id").cast("string").as("externalId"),
      expr("ts DIV 1000000").as("timestampMs"),
      col("value"))

  /** Funnel step window: a step must follow the previous one within 2 h. */
  val FunnelWindowUs = 7200L * 1000000L

  /** Time-bounded conversion funnel (view → click → purchase) per user:
    * the first view, the first click within [[FunnelWindowUs]] AFTER that
    * view, the first purchase within the window after THAT click, and the
    * stage reached (1–3). The strict ordering chain is the semantics; the
    * per-step timestamps prove it.
    *
    * Scale shape: three user_id-keyed partial-aggregated groupBys plus
    * two equi-joins whose right sides are one-row-per-user aggregates
    * (AQE broadcasts them while small, shuffles on user_id past that) —
    * no window over raw events, no state. The left joins at the end touch
    * only per-user rows. Integer microsecond arithmetic — portable. */
  def funnelStages(ev: DataFrame): DataFrame = {
    val e = ev.select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("t"))
    val v = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("t")).as("v_ts"))
    val c = e.join(v, "user_id")
      .filter(col("event_type") === "click" &&
        col("t") > col("v_ts") && col("t") <= col("v_ts") + FunnelWindowUs)
      .groupBy("user_id").agg(min(col("t")).as("c_ts"))
    val p = e.join(c, "user_id")
      .filter(col("event_type") === "purchase" &&
        col("t") > col("c_ts") && col("t") <= col("c_ts") + FunnelWindowUs)
      .groupBy("user_id").agg(min(col("t")).as("p_ts"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("v_ts"), col("c_ts"), col("p_ts"),
        (lit(1L) + when(col("c_ts").isNull, lit(0L)).otherwise(lit(1L))
          + when(col("p_ts").isNull, lit(0L)).otherwise(lit(1L))).as("stage"))
  }

  def funnelStagesSql: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      v AS (SELECT user_id, min(t) AS v_ts FROM e WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(t) AS c_ts FROM e JOIN v USING (user_id)
            WHERE event_type = 'click' AND t > v_ts AND t <= v_ts + $FunnelWindowUs GROUP BY 1),
      p AS (SELECT e.user_id, min(t) AS p_ts FROM e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND t > c_ts AND t <= c_ts + $FunnelWindowUs GROUP BY 1)
      SELECT v.user_id, v.v_ts, c.c_ts, p.p_ts,
        CAST(1 + CASE WHEN c.c_ts IS NULL THEN 0 ELSE 1 END
               + CASE WHEN p.p_ts IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
      FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)"""

  /** Session-pattern gap for q81: long enough that multi-step journeys
    * land in one session on the sparse synthetic stream. */
  val PatternGapSec = 21600L

  /** CEP-lite sequence matching (the MATCH_RECOGNIZE shape): sessionize,
    * concatenate each session's event-type codes in event-time order, and
    * keep sessions whose journey matches a regex — here `v.*c.*p`, a view
    * later followed by a click then a purchase within one session.
    *
    * The per-session sequence string is built ORDER-DETERMINISTICALLY:
    * `collect_list(struct(t_us, event_id, code))` is order-free only
    * until `array_sort` imposes the (time, id) total order — never trust
    * a bare collect_list's arrival order. Scale: sessions are the q21
    * shuffle (one exchange on user_id); sequence strings are bounded by
    * session length; the regex is a per-session codegen'd filter. */
  def sessionPatterns(ev: DataFrame, gapSec: Long, pattern: String): DataFrame =
    withSessionIds(ev, gapSec)
      .groupBy("user_id", "sess_seq")
      .agg(count(lit(1)).as("n_events"),
        expr("""array_join(transform(
            array_sort(collect_list(struct(t_us, event_id, substr(event_type, 1, 1) AS code))),
            x -> x.code), '')""").as("seq"))
      .filter(col("seq").rlike(pattern))

  def sessionPatternsSql(gapSec: Long, pattern: String): String =
    s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
      l AS (SELECT *, lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) AS prev FROM e),
      n AS (SELECT *, CASE WHEN prev IS NULL OR t - prev > ${gapSec}000000 THEN 1 ELSE 0 END AS new_sess FROM l),
      s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY t, event_id
              ROWS UNBOUNDED PRECEDING) AS sess_seq FROM n),
      g AS (SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq, count(*) AS n_events,
              string_agg(substr(event_type, 1, 1), '' ORDER BY t, event_id) AS seq
            FROM s GROUP BY 1, 2)
      SELECT user_id, sess_seq, n_events, seq FROM g WHERE regexp_matches(seq, '$pattern')"""

  /** Cohort retention (the day-N retention table every growth dashboard
    * is built on): users are cohorted by FIRST-SEEN day; for each
    * (cohort, day-offset k) the fraction of the cohort active on that
    * day. All-integer day math from the epoch-nanos ts.
    *
    * Scale shape: a user-keyed min (first-seen), a distinct on
    * (user, cohort, k) — bounded by users × active days, the natural
    * output grain — then a cohort-keyed count. Three partial-aggregated
    * shuffles, no window, no self-join over raw events. */
  def retention(ev: DataFrame): DataFrame = {
    val e = ev.select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
    val first = e.groupBy("user_id").agg(min(col("day")).as("cohort"))
    val act = e.join(first, "user_id")
      .select(col("user_id"), col("cohort"), (col("day") - col("cohort")).as("k"))
      .distinct()
    val sz = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    act.groupBy("cohort", "k").agg(count(lit(1)).as("n_active"))
      .join(sz, "cohort")
      .withColumn("retention", col("n_active").cast("double") / col("cohort_size"))
      .select("cohort", "k", "n_active", "cohort_size", "retention")
  }

  val retentionSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      first AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
      act AS (SELECT DISTINCT e.user_id, f.cohort, e.day - f.cohort AS k
              FROM e JOIN first f USING (user_id)),
      sz AS (SELECT cohort, count(*) AS cohort_size FROM first GROUP BY 1)
      SELECT a.cohort, CAST(a.k AS BIGINT) AS k, count(*) AS n_active, sz.cohort_size,
        CAST(count(*) AS DOUBLE) / sz.cohort_size AS retention
      FROM act a JOIN sz USING (cohort) GROUP BY a.cohort, a.k, sz.cohort_size"""

  /** DAU / trailing-7-day WAU / stickiness (q176): daily active users,
    * the distinct actives of the trailing week, and their ratio — the
    * product-analytics engagement line. WAU is EXACT: the per-(user,
    * day) distinct frame (bounded by users × active days, q84's bound)
    * explodes each active day into the ≤7 trailing report days it
    * serves (a stateless 1→7 projection — never a range self-join of
    * event rows), then one (day)-keyed distinct-user count. Report days
    * are days with ≥1 event (DAU > 0, so stickiness never divides by
    * zero). */
  def engagement(ev: DataFrame): DataFrame = {
    val act = ev.select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
      .distinct().localCheckpoint() // feeds DAU and the WAU explode
    val dau = act.groupBy("day").agg(count(lit(1)).as("dau"))
    val wau = act
      .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("day"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wau, "day")
      .withColumn("stickiness", col("dau").cast("double") / col("wau").cast("double"))
      .select("day", "dau", "wau", "stickiness")
  }

  val engagementSql: String =
    """WITH act AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
      dau AS (SELECT day, count(*) AS dau FROM act GROUP BY 1),
      w AS (SELECT DISTINCT user_id, day + k AS day
            FROM act, LATERAL (SELECT unnest(range(0, 7)) AS k) t),
      wau AS (SELECT day, count(*) AS wau FROM w GROUP BY 1)
      SELECT d.day, CAST(d.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau,
        CAST(d.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
      FROM dau d JOIN wau USING (day)"""

  /** Cohort revenue / LTV matrix (q177): purchase revenue by (first-seen
    * cohort day, age-in-days), in exact integer cents with the running
    * cumulative per cohort — the money twin of the q84 retention table
    * (which counts heads; budgeting wants the cents). Cents sums are
    * BIGINTs; the cumulative is ONE cohort-keyed window over the
    * (cohort × age)-bounded matrix rows, never event rows. */
  def cohortLtv(ev: DataFrame): DataFrame = {
    val e = ev.select(col("user_id"), col("event_type"), col("value"),
      expr("ts DIV 86400000000000").as("day"))
    val first = e.groupBy("user_id").agg(min(col("day")).as("cohort"))
    val rev = e.filter(col("event_type") === "purchase")
      .join(first, "user_id")
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("k"))
      .agg(sum((col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * lit(100))
        .cast("long")).as("cents"))
    val w = Window.partitionBy("cohort").orderBy("k")
    rev.withColumn("cum_cents", sum("cents").over(w))
      .select("cohort", "k", "cents", "cum_cents")
  }

  val cohortLtvSql: String =
    """WITH e AS (SELECT user_id, event_type, value, epoch_us(ts) // 86400000000 AS day FROM events),
      first AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY 1),
      rev AS (SELECT f.cohort, e.day - f.cohort AS k,
              CAST(SUM(CAST(CAST(e.value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
            FROM e JOIN first f USING (user_id)
            WHERE e.event_type = 'purchase' GROUP BY 1, 2)
      SELECT cohort, CAST(k AS BIGINT) AS k, cents,
        CAST(SUM(cents) OVER (PARTITION BY cohort ORDER BY k) AS BIGINT) AS cum_cents
      FROM rev"""

  /** Time-to-conversion latency stats (q181): per user, the first view
    * and the first purchase STRICTLY after it; the corpus-wide latency
    * distribution as exact percentiles (q59's weighted interpolation —
    * portable) plus count and mean (integer-microsecond sum, one double
    * division). The funnel tells conversion RATE; this is the speed.
    * Two user-keyed aggregations + one report-sized global percentile
    * reduce (the output is one row — buffering is report-bounded, not
    * corpus-bounded). */
  def conversionLatency(ev: DataFrame): DataFrame = {
    val e = ev.select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("t_us"))
    val firstView = e.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("t_us").as("v_us"))
    val lat = e.filter(col("event_type") === "purchase")
      .join(firstView, "user_id")
      .filter(col("t_us") > col("v_us"))
      .groupBy("user_id").agg((min("t_us") - first("v_us")).as("lat_us"))
    lat.agg(
      count(lit(1)).as("n_users"),
      sum("lat_us").as("sum_lat_us"),
      expr("percentile(lat_us, CAST(0.5 AS DOUBLE))").as("p50_us"),
      expr("percentile(lat_us, CAST(0.9 AS DOUBLE))").as("p90_us"))
      .withColumn("mean_us", col("sum_lat_us").cast("double") / col("n_users").cast("double"))
  }

  val conversionLatencySql: String =
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t_us FROM events),
      fv AS (SELECT user_id, min(t_us) AS v_us FROM e WHERE event_type = 'view' GROUP BY 1),
      lat AS (SELECT e.user_id, min(e.t_us) - any_value(fv.v_us) AS lat_us
              FROM e JOIN fv USING (user_id)
              WHERE e.event_type = 'purchase' AND e.t_us > fv.v_us
              GROUP BY e.user_id)
      SELECT CAST(count(*) AS BIGINT) AS n_users,
        CAST(SUM(lat_us) AS BIGINT) AS sum_lat_us,
        quantile_cont(lat_us, 0.5) AS p50_us,
        quantile_cont(lat_us, 0.9) AS p90_us,
        CAST(SUM(lat_us) AS DOUBLE) / count(*) AS mean_us
      FROM lat"""

  /** Hour-of-day seasonality profile (q182): event counts per (UTC hour,
    * event type) with each type's within-type share — the traffic-shape
    * report capacity planning and anomaly baselines read. One
    * (24 × types)-bounded rollup + a broadcast per-type total. */
  def hourlySeasonality(ev: DataFrame): DataFrame = {
    val h = ev.select(col("event_type"),
      expr("(ts DIV 3600000000000) % 24").as("hour"))
      .groupBy("event_type", "hour").agg(count(lit(1)).as("n"))
    val tot = h.groupBy("event_type").agg(sum("n").as("n_type"))
    h.join(broadcast(tot), "event_type")
      .withColumn("share", col("n").cast("double") / col("n_type").cast("double"))
      .select("event_type", "hour", "n", "n_type", "share")
  }

  val hourlySeasonalitySql: String =
    """WITH h AS (SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour,
            count(*) AS n
          FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_type FROM h GROUP BY 1)
      SELECT event_type, CAST(hour AS BIGINT) AS hour, CAST(n AS BIGINT) AS n, n_type,
        CAST(n AS DOUBLE) / CAST(n_type AS DOUBLE) AS share
      FROM h JOIN t USING (event_type)"""

  /** Within-session event-type co-occurrence PMI (q187): for each
    * unordered pair of DISTINCT event types, how much more often they
    * co-occur in one session than independence predicts — the
    * association view next to q166's adjacency view (a type pair can
    * never be adjacent yet strongly co-sessioned). Counts are
    * session-level presence (distinct (session, type) rows); PMI ranks
    * by the exact quantized rational `(c12·N·1e6) div (c1a·c1b)` — the
    * q114 discipline, log-free because log is monotone, DECIMAL-widened
    * so the product can't overflow. The pair self-join is keyed by
    * session and bounded by types² per session. */
  def sessionTypePmi(ev: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val st = withSessionIds(ev, gapSec)
      .select(col("user_id"), col("sess_seq"), col("event_type"))
      .distinct().localCheckpoint() // feeds margins, total, AND both pair sides
    val nTot = st.select("user_id", "sess_seq").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val m = st.groupBy("event_type").agg(count(lit(1)).as("c1"))
    val pairs = st.as("a").join(st.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.sess_seq") === col("b.sess_seq") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
      .agg(count(lit(1)).as("c12"))
    pairs
      .join(broadcast(m.select(col("event_type").as("t1"), col("c1").as("c1a"))), "t1")
      .join(broadcast(m.select(col("event_type").as("t2"), col("c1").as("c1b"))), "t2")
      .crossJoin(broadcast(nTot))
      .withColumn("pmi_q", expr(
        "(CAST(c12 AS DECIMAL(38,0)) * n_sessions * 1000000L)" +
          " div (CAST(c1a AS DECIMAL(38,0)) * c1b)"))
      .select("t1", "t2", "c12", "c1a", "c1b", "n_sessions", "pmi_q")
  }

  def sessionTypePmiSql(gapSec: Long = 1800L): String =
    s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
      f AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > ${gapSec}000000
              THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      g AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM f),
      st AS (SELECT DISTINCT user_id, sess_seq, event_type FROM g),
      nt AS (SELECT count(*) AS n_sessions
             FROM (SELECT DISTINCT user_id, sess_seq FROM st)),
      m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS c1 FROM st GROUP BY 1),
      p AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS c12
            FROM st a JOIN st b ON a.user_id = b.user_id AND a.sess_seq = b.sess_seq
              AND a.event_type < b.event_type
            GROUP BY 1, 2)
      SELECT t1, t2, CAST(c12 AS BIGINT) AS c12,
        ma.c1 AS c1a, mb.c1 AS c1b,
        CAST((SELECT n_sessions FROM nt) AS BIGINT) AS n_sessions,
        CAST((CAST(c12 AS HUGEINT) * (SELECT n_sessions FROM nt) * 1000000)
          // (CAST(ma.c1 AS HUGEINT) * mb.c1) AS BIGINT) AS pmi_q
      FROM p JOIN m ma ON ma.event_type = p.t1 JOIN m mb ON mb.event_type = p.t2"""

  /** Inter-event burstiness (q186, Goh & Barabási 2008): per user, the
    * coefficient-of-variation form `B = (σ − µ)/(σ + µ)` over the
    * inter-event gaps — B → 1 is bursty (human sessions), B ≈ 0 is
    * Poisson, B → −1 is metronome-regular (bots, heartbeats). Gaps are
    * integer microseconds, so µ and σ come from the q62 exact-moment
    * discipline: BIGINT Σgap and Σgap² per user (order-independent),
    * ONE int64→double cast each, then the identical rounded expression
    * tree in both engines — portable without trusting float
    * accumulation. Population σ (÷n) keeps the single-gap user at
    * σ = 0, B = −1 rather than NULL. One user-keyed window (lag) + one
    * user rollup. */
  def burstiness(ev: DataFrame): DataFrame = {
    // gaps in MILLISECONDS: a µs gap squares past int64 (a 70-minute
    // gap is 4.2e9 µs; its square overflows), ms gaps square to ~1.8e13
    // with per-user sums far inside the BIGINT range
    val w = Window.partitionBy("user_id").orderBy(col("t_ms").asc, col("event_id").asc)
    val gaps = ev.select(col("user_id"), col("event_id"), expr("ts DIV 1000000").as("t_ms"))
      .withColumn("gap", col("t_ms") - lag("t_ms", 1).over(w))
      .filter(col("gap").isNotNull)
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"), sum("gap").as("s1"),
        sum(col("gap") * col("gap")).as("s2"))
      .filter(col("s1") > 0)
      .withColumn("mean_ms", col("s1").cast("double") / col("n_gaps").cast("double"))
      .withColumn("sd_ms", sqrt(
        col("s2").cast("double") / col("n_gaps").cast("double") -
          (col("s1").cast("double") / col("n_gaps").cast("double")) *
          (col("s1").cast("double") / col("n_gaps").cast("double"))))
      .withColumn("b", (col("sd_ms") - col("mean_ms")) / (col("sd_ms") + col("mean_ms")))
      .select("user_id", "n_gaps", "mean_ms", "sd_ms", "b")
  }

  val burstinessSql: String =
    """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS t_ms FROM events),
      g AS (SELECT user_id, t_ms - lag(t_ms) OVER w AS gap
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, event_id)),
      m AS (SELECT user_id, count(*) AS n_gaps,
              CAST(SUM(gap) AS BIGINT) AS s1, CAST(SUM(gap * gap) AS BIGINT) AS s2
            FROM g WHERE gap IS NOT NULL GROUP BY 1)
      SELECT user_id, n_gaps,
        CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mean_ms,
        sqrt(CAST(s2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
          - (CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
            * (CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))) AS sd_ms,
        (sqrt(CAST(s2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
          - (CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
            * (CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
         - CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
        / (sqrt(CAST(s2 AS DOUBLE) / CAST(n_gaps AS DOUBLE)
          - (CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE))
            * (CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)))
         + CAST(s1 AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS b
      FROM m WHERE s1 > 0"""

  /** Rate-spike detection (q180): the q168 per-series derivative fed
    * through the q151 median/MAD gate — flags datapoints whose RATE OF
    * CHANGE is a robust outlier within their series (a step change in a
    * sensor stream whose absolute values stay in range; level-based
    * outlier cuts miss it by construction). Pure composition: one
    * per-series window (derivative) + two user-keyed exact-median
    * passes; both stages keep their gated shapes. */
  def rateSpikes(ev: DataFrame, k: Double = 3.0): DataFrame =
    madOutliers(
      graft.tebis.Datapoints.derivative(asSeries(ev))
        .select(col("externalId").cast("long").as("user_id"),
          col("timestampMs").as("event_id"), col("rate_per_s").as("value")), k)
      .select(col("user_id"), col("event_id").as("ts"),
        col("value").as("rate_per_s"), col("med"), col("mad"))

  def rateSpikesSql(k: Double = 3.0): String =
    s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS t_ms, value FROM events),
      l AS (SELECT user_id, t_ms, value,
              lag(t_ms) OVER w AS p_ms, lag(value) OVER w AS p_v
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, value)),
      d AS (SELECT user_id, t_ms AS ts,
              (value - p_v) * 1000.0 / CAST(t_ms - p_ms AS DOUBLE) AS rate_per_s
            FROM l WHERE p_ms IS NOT NULL AND t_ms > p_ms),
      m AS (SELECT user_id, median(rate_per_s) AS med FROM d GROUP BY 1),
      dd AS (SELECT d.user_id, median(abs(rate_per_s - med)) AS mad
             FROM d JOIN m USING (user_id) GROUP BY 1),
      s AS (SELECT user_id, med, mad FROM m JOIN dd USING (user_id) WHERE mad > 0.0)
      SELECT d.user_id, d.ts, d.rate_per_s, s.med, s.mad
      FROM d JOIN s USING (user_id)
      WHERE abs(d.rate_per_s - s.med) > $k * s.mad"""

  /** Per-user z-score outliers over `value` — the standard data-cleaning
    * cut before aggregating sensor/metric streams. Same exactness
    * discipline as q62: `value` is exact cents (locked by the oracle), so
    * the two moment sums are exact BIGINT aggregates, each cast
    * int64→double ONCE before the identical exactly-rounded expression
    * tree (mean, sample sd, z) runs in both engines — bit-portable
    * without trusting float accumulation order. Constant series (sd = 0)
    * have no outliers by definition (keeps 0/0 NaNs out of the output).
    *
    * Scale shape: one user-keyed partial-aggregated groupBy (int64 sums),
    * then the per-user stats join back to events — AQE broadcasts the
    * stats side while it fits, shuffles on user_id past that. int64 caps
    * ~3.8e9 rows/user at these magnitudes (vm² ≈ 2.4e9); past that,
    * re-scale the quantization (q62's documented cap). */
  def valueOutliers(ev: DataFrame, zThreshold: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val vm = (col("value").cast(DecimalType(12, 2)) * lit(100)).cast("long")
    val e = ev.select(col("event_id"), col("user_id"), col("value"), vm.as("vm"))
    val stats = e.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("s1"),
        sum(col("vm") * col("vm")).as("s2"))
      .filter(col("n") >= 2)
      .select(col("user_id"), col("n").cast("double").as("nn"),
        (col("s1").cast("double") / 100.0).as("sx"),
        (col("s2").cast("double") / 10000.0).as("sxx"))
      .withColumn("mean", col("sx") / col("nn"))
      .withColumn("sd", sqrt((col("nn") * col("sxx") - col("sx") * col("sx"))
        / (col("nn") * (col("nn") - 1.0))))
      .filter(col("sd") > 0.0)
    e.join(stats, "user_id")
      .withColumn("z", (col("vm").cast("double") / 100.0 - col("mean")) / col("sd"))
      .filter(abs(col("z")) >= zThreshold)
      .select(col("user_id"), col("event_id"), col("value"), col("z"))
  }

  def valueOutliersSql(zThreshold: Double = 3.0): String =
    s"""WITH e AS (SELECT event_id, user_id, value,
            CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vm FROM events),
      s AS (SELECT user_id, count(*) AS n,
              CAST(CAST(sum(vm) AS BIGINT) AS DOUBLE) / 100.0 AS sx,
              CAST(CAST(sum(vm * vm) AS BIGINT) AS DOUBLE) / 10000.0 AS sxx
            FROM e GROUP BY 1 HAVING count(*) >= 2),
      t AS (SELECT user_id, CAST(n AS DOUBLE) AS nn, sx, sxx,
              sx / CAST(n AS DOUBLE) AS mean,
              sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS sd
            FROM s),
      z AS (SELECT e.user_id, e.event_id, e.value,
              (CAST(vm AS DOUBLE) / 100.0 - mean) / sd AS z
            FROM e JOIN t USING (user_id) WHERE sd > 0.0)
      SELECT user_id, event_id, value, z FROM z WHERE abs(z) >= $zThreshold"""

  // --------------------------------------------------------------------
  // Multi-touch attribution: split each purchase's revenue across the
  // clicks that preceded it (since the user's previous purchase). The
  // split is EXACT integer money math — cents div k to every click,
  // remainder to the LATEST click — so conservation (attributed sums
  // back to the purchase, to the cent) is a structural invariant, not a
  // float hope, and the oracle hash-matches with no double division.
  // --------------------------------------------------------------------

  /** Equal-split multi-touch attribution. Window boundaries: a click at
    * `prev_t <= ct < t` attributes to THIS purchase (a click stamped
    * exactly at the previous purchase belongs to the next window — never
    * double-counted). Purchases with no prior click keep their full
    * revenue with a NULL click_id, so total attributed cents == total
    * purchase cents corpus-wide.
    *
    * Scale shape: ONE user-keyed exchange carries everything — the
    * prev-purchase lag, the per-user click range join (sort-merge on
    * user_id with the time band as residual predicate), and the
    * per-purchase rank window all run inside user partitions
    * (HashPartitioning(user_id) satisfies the (user_id, purchase_id)
    * clustering, so Spark plans sorts, not re-shuffles). Per-user volume
    * bounds the work; a pathological single-user firehose is the q-skew
    * salting case, not this plan's default. */
  def attribution(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = ev.select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), expr("ts DIV 1000").as("t_us"))
    val wp = Window.partitionBy("user_id").orderBy(col("t_us"), col("event_id"))
    val p = e.filter(col("event_type") === "purchase")
      .withColumn("cents", (col("value").cast(DecimalType(12, 2)) * lit(100)).cast("long"))
      .withColumn("prev_t", coalesce(lag(col("t_us"), 1).over(wp), lit(Long.MinValue)))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("t_us").as("pt"), col("prev_t"), col("cents"))
    // p and c share lineage (both derive from e): rename c's key instead
    // of relying on p("user_id")/c("user_id") disambiguation, which is
    // unreliable across a self-derived join (same attribute ids).
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("t_us").as("ct"))
    val wr = Window.partitionBy("user_id", "purchase_id")
    val j = p.join(c,
      col("user_id") === col("c_user") && col("ct") >= col("prev_t") && col("ct") < col("pt"),
      "left").drop("c_user")
    j.withColumn("n_clicks", count(col("click_id")).over(wr))
      .withColumn("rn", row_number().over(
        wr.orderBy(col("ct").desc_nulls_last, col("click_id").desc_nulls_last)))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        col("n_clicks"),
        when(col("click_id").isNull, col("cents"))
          .otherwise(expr("cents div n_clicks") +
            when(col("rn") === 1, expr("cents % n_clicks")).otherwise(lit(0L)))
          .as("attributed_cents"))
  }

  /** User-activity concentration (q193): per event type, the exact Gini
    * coefficient and top-1%/top-10% user shares of event volume — the
    * bot-detection / platform-health card (organic traffic sits near
    * Gini ~0.3–0.6; a scripted flood or a dead long tail pushes it
    * toward 1). All integer-exact: Gini comes from the GROUPED
    * count-of-counts distribution, not a per-user ranking — for users
    * tied at activity level c occupying ranks [R+1, R+m], Σ rank·x over
    * the group is c·(m·R + m(m+1)/2) in closed form, so the ranking
    * window runs over (type × distinct-activity-level) rollup rows, NEVER
    * over user-cardinality rows (a per-type total order of users is the
    * single-partition sort this card must not pay at 100 TB). Top-k
    * shares fall out of the same cumulative: take = min(m, max(0,
    * k − usersAbove)). The only quantization wide enough to overflow
    * int64 (gini_num·1e6 at web-scale n·S) runs through DECIMAL(38,0)
    * in both engines. Shape: one (type, user) rollup — the only
    * event-volume exchange — then a (type, c) rollup, a window over
    * rollup rows, broadcast totals. */
  def activityConcentration(ev: DataFrame): DataFrame = {
    val ucnt = ev.groupBy("event_type", "user_id").agg(count(lit(1)).as("c"))
    val grp = ucnt.groupBy("event_type", "c").agg(count(lit(1)).as("m"))
    val tot = grp.groupBy("event_type")
      .agg(sum("m").as("n"), sum(expr("m * c")).as("s"))
    val w = Window.partitionBy("event_type").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grp.withColumn("cum", sum("m").over(w))
      .join(broadcast(tot), "event_type")
      .withColumn("isum_part", expr("c * (m * (cum - m) + (m * (m + 1)) div 2)"))
      .withColumn("k10", expr("(n + 9) div 10"))
      .withColumn("k1", expr("(n + 99) div 100"))
      .withColumn("take10", expr("least(m, greatest(0L, k10 - (n - cum)))"))
      .withColumn("take1", expr("least(m, greatest(0L, k1 - (n - cum)))"))
    cum.groupBy("event_type").agg(
      max("n").as("n_users"), max("s").as("n_events"),
      sum("isum_part").as("isum"),
      sum(expr("take10 * c")).as("top10_sum"),
      sum(expr("take1 * c")).as("top1_sum"))
      .withColumn("gini_micro", expr(
        "CAST((CAST(2 * isum - (n_users + 1) * n_events AS DECIMAL(38,0)) * 1000000) div (n_users * n_events) AS BIGINT)"))
      .withColumn("top10_micro", expr("(top10_sum * 1000000L) div n_events"))
      .withColumn("top1_micro", expr("(top1_sum * 1000000L) div n_events"))
      .select("event_type", "n_users", "n_events", "gini_micro",
        "top10_micro", "top1_micro")
  }

  val activityConcentrationSql: String =
    """WITH uc AS (SELECT event_type, user_id, count(*) AS c FROM events GROUP BY 1, 2),
      g AS (SELECT event_type, c, count(*) AS m FROM uc GROUP BY 1, 2),
      t AS (SELECT event_type, CAST(sum(m) AS BIGINT) AS n, CAST(sum(m * c) AS BIGINT) AS s
            FROM g GROUP BY 1),
      cw AS (SELECT g.event_type, g.c, g.m, t.n, t.s,
              CAST(sum(g.m) OVER (PARTITION BY g.event_type ORDER BY g.c) AS BIGINT) AS cum
            FROM g JOIN t USING (event_type)),
      x AS (SELECT event_type, n, s,
              c * (m * (cum - m) + (m * (m + 1)) // 2) AS isum_part,
              least(m, greatest(0, (n + 9) // 10 - (n - cum))) * c AS top10_part,
              least(m, greatest(0, (n + 99) // 100 - (n - cum))) * c AS top1_part
            FROM cw)
      SELECT event_type, CAST(max(n) AS BIGINT) AS n_users, CAST(max(s) AS BIGINT) AS n_events,
        CAST((CAST(2 * sum(isum_part) - (max(n) + 1) * max(s) AS HUGEINT) * 1000000)
          // (max(n) * max(s)) AS BIGINT) AS gini_micro,
        CAST((CAST(sum(top10_part) AS BIGINT) * 1000000) // max(s) AS BIGINT) AS top10_micro,
        CAST((CAST(sum(top1_part) AS BIGINT) * 1000000) // max(s) AS BIGINT) AS top1_micro
      FROM x GROUP BY event_type"""

  /** Attribution-model comparison (q192): the SAME purchase windows as
    * q150, allocated under three position rules — `linear` (q150's
    * equal split, remainder to latest), `first_touch` (all cents to the
    * earliest click), `last_touch` (all cents to the latest) — rolled up
    * by click-position class (`first`/`middle`/`last`/`only`/`none`).
    * The sensitivity view a channel-budget decision needs: if the three
    * models disagree wildly, position effects dominate and the linear
    * number alone is not safe to act on. Money math stays exact-integer
    * cents; per model the position sums rebuild total purchase cents —
    * conservation is structural, and the models agree by construction on
    * `only` and `none` rows (spec-locked).
    * Scale shape: q150's ONE user-keyed exchange (lag + range join +
    * both rank windows run inside user partitions), then a stateless 3×
    * model expand and a ≤15-key rollup. */
  def attributionModels(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val e = ev.select(col("event_id"), col("user_id"), col("event_type"),
      col("value"), expr("ts DIV 1000").as("t_us"))
    val wp = Window.partitionBy("user_id").orderBy(col("t_us"), col("event_id"))
    val p = e.filter(col("event_type") === "purchase")
      .withColumn("cents", (col("value").cast(DecimalType(12, 2)) * lit(100)).cast("long"))
      .withColumn("prev_t", coalesce(lag(col("t_us"), 1).over(wp), lit(Long.MinValue)))
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("t_us").as("pt"), col("prev_t"), col("cents"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("t_us").as("ct"))
    val wr = Window.partitionBy("user_id", "purchase_id")
    val j = p.join(c,
      col("user_id") === col("c_user") && col("ct") >= col("prev_t") && col("ct") < col("pt"),
      "left").drop("c_user")
      .withColumn("n_clicks", count(col("click_id")).over(wr))
      .withColumn("rn_desc", row_number().over(
        wr.orderBy(col("ct").desc_nulls_last, col("click_id").desc_nulls_last)))
      .withColumn("rn_asc", row_number().over(
        wr.orderBy(col("ct").asc_nulls_last, col("click_id").asc_nulls_last)))
      .withColumn("position",
        when(col("click_id").isNull, lit("none"))
          .when(col("n_clicks") === 1, lit("only"))
          .when(col("rn_asc") === 1, lit("first"))
          .when(col("rn_desc") === 1, lit("last"))
          .otherwise(lit("middle")))
      .withColumn("linear_cents",
        when(col("click_id").isNull, col("cents"))
          .otherwise(expr("cents div n_clicks") +
            when(col("rn_desc") === 1, expr("cents % n_clicks")).otherwise(lit(0L))))
      .withColumn("first_cents",
        when(col("click_id").isNull, col("cents"))
          .otherwise(when(col("rn_asc") === 1, col("cents")).otherwise(lit(0L))))
      .withColumn("last_cents",
        when(col("click_id").isNull, col("cents"))
          .otherwise(when(col("rn_desc") === 1, col("cents")).otherwise(lit(0L))))
    j.select(col("position"), explode(expr(
        """array(named_struct('model', 'linear', 'c', linear_cents),
                 named_struct('model', 'first_touch', 'c', first_cents),
                 named_struct('model', 'last_touch', 'c', last_cents))""")).as("m"))
      .select(col("m.model").as("model"), col("position"), col("m.c").as("c"))
      .groupBy("model", "position")
      .agg(sum("c").as("cents"), count(lit(1)).as("n_rows"))
  }

  val attributionModelsSql: String =
    s"""WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t_us FROM events),
      p AS (SELECT event_id AS purchase_id, user_id, t_us AS pt,
              CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
              coalesce(lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id),
                       ${Long.MinValue}) AS prev_t
            FROM e WHERE event_type = 'purchase'),
      c AS (SELECT event_id AS click_id, user_id, t_us AS ct FROM e WHERE event_type = 'click'),
      j AS (SELECT p.purchase_id, p.user_id, p.cents, c.click_id, c.ct
            FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ct >= p.prev_t AND c.ct < p.pt),
      r AS (SELECT *, count(click_id) OVER (PARTITION BY user_id, purchase_id) AS n_clicks,
              row_number() OVER (PARTITION BY user_id, purchase_id
                ORDER BY ct DESC NULLS LAST, click_id DESC NULLS LAST) AS rn_desc,
              row_number() OVER (PARTITION BY user_id, purchase_id
                ORDER BY ct ASC NULLS LAST, click_id ASC NULLS LAST) AS rn_asc
            FROM j),
      x AS (SELECT CASE WHEN click_id IS NULL THEN 'none'
                   WHEN n_clicks = 1 THEN 'only'
                   WHEN rn_asc = 1 THEN 'first'
                   WHEN rn_desc = 1 THEN 'last'
                   ELSE 'middle' END AS position,
              CASE WHEN click_id IS NULL THEN cents
                   ELSE cents // n_clicks + (CASE WHEN rn_desc = 1 THEN cents % n_clicks ELSE 0 END)
                   END AS linear_cents,
              CASE WHEN click_id IS NULL THEN cents
                   WHEN rn_asc = 1 THEN cents ELSE 0 END AS first_cents,
              CASE WHEN click_id IS NULL THEN cents
                   WHEN rn_desc = 1 THEN cents ELSE 0 END AS last_cents
            FROM r),
      u AS (SELECT 'linear' AS model, position, linear_cents AS c FROM x
            UNION ALL SELECT 'first_touch', position, first_cents FROM x
            UNION ALL SELECT 'last_touch', position, last_cents FROM x)
      SELECT model, position, CAST(sum(c) AS BIGINT) AS cents,
        CAST(count(*) AS BIGINT) AS n_rows
      FROM u GROUP BY model, position"""

  val attributionSql: String =
    s"""WITH e AS (SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t_us FROM events),
      p AS (SELECT event_id AS purchase_id, user_id, t_us AS pt,
              CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
              coalesce(lag(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id),
                       ${Long.MinValue}) AS prev_t
            FROM e WHERE event_type = 'purchase'),
      c AS (SELECT event_id AS click_id, user_id, t_us AS ct FROM e WHERE event_type = 'click'),
      j AS (SELECT p.purchase_id, p.user_id, p.cents, c.click_id, c.ct
            FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ct >= p.prev_t AND c.ct < p.pt),
      r AS (SELECT *, count(click_id) OVER (PARTITION BY user_id, purchase_id) AS n_clicks,
              row_number() OVER (PARTITION BY user_id, purchase_id
                ORDER BY ct DESC NULLS LAST, click_id DESC NULLS LAST) AS rn
            FROM j)
      SELECT purchase_id, user_id, click_id, CAST(n_clicks AS BIGINT) AS n_clicks,
        CAST(CASE WHEN click_id IS NULL THEN cents
             ELSE cents // n_clicks + (CASE WHEN rn = 1 THEN cents % n_clicks ELSE 0 END)
             END AS BIGINT) AS attributed_cents
      FROM r"""

  // --------------------------------------------------------------------
  // Robust (median/MAD) outliers — q80's z-score flags drown when the
  // contamination itself inflates the std; median and MAD are order
  // statistics, immune to the outliers they hunt AND exactly portable
  // (no accumulation-order-dependent double sums: an interpolated median
  // is one correctly-rounded average of two selected elements).
  // --------------------------------------------------------------------

  /** Median/MAD outliers per user: flag events with
    * `|value - median| > k * MAD`. Two grouped exact-median passes (one
    * over values, one over |value - med|), each ONE user-keyed exchange;
    * the per-user stats frame is tiny and joins back broadcast-style
    * under AQE. Users with MAD = 0 (constant or near-constant streams)
    * are excluded — every deviation would be infinite-sigma. */
  def madOutliers(ev: DataFrame, k: Double = 3.0): DataFrame = {
    val e = ev.select(col("event_id"), col("user_id"), col("value"))
    val med = e.groupBy("user_id").agg(median(col("value")).as("med"))
    val mad = e.join(med, "user_id")
      .groupBy("user_id").agg(median(abs(col("value") - col("med"))).as("mad"))
      .filter(col("mad") > 0.0)
    e.join(med, "user_id").join(mad, "user_id")
      .filter(abs(col("value") - col("med")) > lit(k) * col("mad"))
      .select(col("user_id"), col("event_id"), col("value"), col("med"), col("mad"))
  }

  def madOutliersSql(k: Double = 3.0): String =
    s"""WITH e AS (SELECT event_id, user_id, value FROM events),
      m AS (SELECT user_id, median(value) AS med FROM e GROUP BY 1),
      d AS (SELECT e.user_id, median(abs(value - med)) AS mad
            FROM e JOIN m USING (user_id) GROUP BY 1),
      s AS (SELECT user_id, med, mad FROM m JOIN d USING (user_id) WHERE mad > 0.0)
      SELECT e.user_id, e.event_id, e.value, s.med, s.mad
      FROM e JOIN s USING (user_id)
      WHERE abs(e.value - s.med) > $k * s.mad"""

  /** CUSUM change-point detection over daily event rates (q199; Page
    * 1954's one-sided cumulative sum, the standard drift detector a
    * rate monitor runs above q180's point-spike view — a slow 20%%
    * drift never trips a per-day MAD gate but accumulates here): per
    * event type over daily counts, S_t = max(0, S_{t-1} + (x_t − μ)) in
    * CLOSED FORM — S_t = P_t − min(0, min_{j≤t} P_j) with P the prefix
    * sum of deviations — so the recursive scan becomes two windows
    * (cumulative sum + running min) over day-level rows. Deviations in
    * exact micro units (x·1e6 − μ_micro, μ_micro = (Σx·1e6) div n_days)
    * — bit-portable; a day is flagged when S exceeds 3 days' worth of
    * the mean rate.
    *
    * Scale shape: ONE (type × day)-bounded map-side-combined rollup is
    * the only event-volume exchange; the mean attaches as a broadcast
    * (type-cardinality) join; both windows run over day-level rows. */
  def rateCusum(ev: DataFrame): DataFrame = {
    // day-level rows, checkpointed: the frame feeds both the mean branch
    // and the join — without materialization Spark re-scans the EVENT
    // volume for each (caught by the PlanSpec exchange-count gate)
    val daily = ev.select(col("event_type"), expr("ts DIV 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val mu = daily.groupBy("event_type")
      .agg(expr("(sum(n) * 1000000L) div count(1)").as("mu_micro"))
    val wCum = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(mu), "event_type")
      .withColumn("p", sum(col("n") * lit(1000000L) - col("mu_micro")).over(wCum))
      .withColumn("cusum_micro", col("p") - least(lit(0L), min("p").over(wCum)))
      .withColumn("spike", col("cusum_micro") > lit(3L) * col("mu_micro"))
      .select("event_type", "day", "n", "cusum_micro", "spike")
  }

  val rateCusumSql: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
      mu AS (SELECT event_type,
            CAST((SUM(n) * 1000000) // COUNT(*) AS BIGINT) AS mu_micro
          FROM daily GROUP BY 1),
      p AS (SELECT d.event_type, d.day, d.n, mu.mu_micro,
            CAST(SUM(d.n * 1000000 - mu.mu_micro) OVER
              (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS p
          FROM daily d JOIN mu USING (event_type))
      SELECT event_type, day, n,
        CAST(p - LEAST(0, MIN(p) OVER (PARTITION BY event_type ORDER BY day)) AS BIGINT)
          AS cusum_micro,
        (p - LEAST(0, MIN(p) OVER (PARTITION BY event_type ORDER BY day)))
          > 3 * mu_micro AS spike
      FROM p"""

  /** Seasonality-adjusted rate anomalies (q219): q182's hour-of-day
    * profile turned into the BASELINE for anomaly detection — each
    * (type, day, hour) cell is compared to its type's expected count for
    * THAT HOUR (n_hour / n_days), and cells at ≥3× or ≤⅓ of expectation
    * are flagged. The diurnal complement to q180 (point spikes vs a
    * global per-type mean) and q199 (slow drift): a 2 am traffic level
    * that is normal at 2 pm IS an anomaly at 2 am, and a flat detector
    * either misses it or alarms every rush hour.
    *
    * Determinism discipline: the comparison is the exact cross-multiplied
    * rational n·n_days·1e6 div n_hour (DECIMAL-widened), thresholds are
    * integer micro constants on the floored ratio — no per-cell division
    * of doubles anywhere.
    *
    * Scale shape: the (type × day × hour) rollup is the ONLY
    * event-volume exchange (map-side combined, checkpointed — it feeds
    * the profile, the day count, and the screen); the profile is a
    * 24·types-row second agg of those rows, broadcast back; the day
    * count is a 1-row broadcast. Output is flagged-cells-bounded. */
  def seasonalityAnomalies(ev: DataFrame): DataFrame = {
    val cells = ev.select(col("event_type"),
        expr("ts DIV 86400000000000").as("day"),
        expr("(ts DIV 3600000000000) % 24").as("hour"))
      .groupBy("event_type", "day", "hour").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val nd = cells.select("day").distinct().agg(count(lit(1)).as("n_days"))
    val prof = cells.groupBy("event_type", "hour").agg(sum("n").as("n_hour"))
    cells.join(broadcast(prof), Seq("event_type", "hour"))
      .crossJoin(broadcast(nd))
      .filter(col("n_hour") >= col("n_days")) // support: ≥1 event/day expected
      .withColumn("ratio_micro", expr(
        "CAST((CAST(n AS DECIMAL(38,0)) * n_days * 1000000) div n_hour AS BIGINT)"))
      .filter(col("ratio_micro") >= 3000000L || col("ratio_micro") <= 333333L)
      .withColumn("direction",
        when(col("ratio_micro") >= 3000000L, lit("spike")).otherwise(lit("drought")))
      .select("event_type", "day", "hour", "n", "n_hour", "n_days",
        "ratio_micro", "direction")
  }

  val seasonalityAnomaliesSql: String =
    """WITH cells AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
            (epoch_us(ts) // 3600000000) % 24 AS hour, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2, 3),
      nd AS (SELECT CAST(count(DISTINCT day) AS BIGINT) AS n_days FROM cells),
      prof AS (SELECT event_type, hour, CAST(SUM(n) AS BIGINT) AS n_hour
          FROM cells GROUP BY 1, 2),
      r AS (SELECT c.event_type, c.day, c.hour, c.n, p.n_hour, nd.n_days,
            CAST((CAST(c.n AS HUGEINT) * nd.n_days * 1000000) // p.n_hour AS BIGINT)
              AS ratio_micro
          FROM cells c JOIN prof p USING (event_type, hour) CROSS JOIN nd
          WHERE p.n_hour >= nd.n_days)
      SELECT event_type, day, hour, n, n_hour, n_days, ratio_micro,
        CASE WHEN ratio_micro >= 3000000 THEN 'spike' ELSE 'drought' END AS direction
      FROM r
      WHERE ratio_micro >= 3000000 OR ratio_micro <= 333333"""

  /** Week-over-week event-mix drift (q225): total-variation distance
    * between consecutive weeks' event-TYPE distributions — the
    * "did the product's traffic shape change" screen next to q219's
    * per-cell anomalies (a mix shift can hide in cells that are all
    * individually in-band) and q199's per-type drift (which cannot see
    * SHARE moving between types at constant totals). Same min-identity
    * as q208: TVD = 1 − Σ min(p, q), so the inner type join is complete
    * — absent-type mass lands in the distance by algebra.
    *
    * Determinism: Σ min(n_a·N_b, n_b·N_a) on DECIMAL(38,0) (exact
    * cross-multiplied mins), ONE integral division per week pair.
    *
    * Scale shape: the (week × type) rollup is the only event-volume
    * exchange; weekly totals are a second agg of those rows; the
    * consecutive-week join is (weeks × types)-bounded. Week PAIRS come
    * from the totals frame, not the per-type inner join — a pair of
    * consecutive weeks sharing zero event types must still emit its
    * TVD = 1000000 row (the screen would otherwise be quiet exactly
    * when the mix shift is total); the per-type min-mass sum left-joins
    * on, defaulting to 0. */
  def weeklyMixDrift(ev: DataFrame): DataFrame = {
    val wt = ev.select(col("event_type"), expr("ts DIV 604800000000000").as("week"))
      .groupBy("week", "event_type").agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds totals AND both join sides
    val tot = wt.groupBy("week").agg(sum("n").as("nw")).localCheckpoint() // both pair sides
    val pairs = tot.as("ta").join(tot.as("tb"), col("tb.week") === col("ta.week") + 1)
      .select(col("ta.week").as("week_a"), col("tb.week").as("week_b"),
        col("ta.nw").as("n_a"), col("tb.nw").as("n_b"))
    val overlap = wt.as("a")
      .join(wt.as("b"),
        col("b.week") === col("a.week") + 1 &&
          col("a.event_type") === col("b.event_type"))
      .select(col("a.week").as("week_a"), col("b.week").as("week_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .join(broadcast(tot.select(col("week").as("week_a"), col("nw").as("n_a"))), "week_a")
      .join(broadcast(tot.select(col("week").as("week_b"), col("nw").as("n_b"))), "week_b")
      .groupBy("week_a", "week_b")
      .agg(sum(expr(
        "least(CAST(na AS DECIMAL(38,0)) * n_b, CAST(nb AS DECIMAL(38,0)) * n_a)"))
        .as("summin"))
    pairs.join(overlap, Seq("week_a", "week_b"), "left")
      .withColumn("summin",
        coalesce(col("summin"), expr("CAST(0 AS DECIMAL(38,0))")))
      .withColumn("tvd_micro", expr(
        "CAST(1000000 - (summin * 1000000) div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
      .select("week_a", "week_b", "n_a", "n_b", "tvd_micro")
  }

  val weeklyMixDriftSql: String =
    """WITH wt AS (SELECT epoch_us(ts) // 604800000000 AS week, event_type,
            CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
      tot AS (SELECT week, CAST(SUM(n) AS BIGINT) AS nw FROM wt GROUP BY 1),
      pairs AS (SELECT ta.week AS week_a, tb.week AS week_b,
            ta.nw AS n_a, tb.nw AS n_b
          FROM tot ta JOIN tot tb ON tb.week = ta.week + 1),
      j AS (SELECT a.week AS week_a, b.week AS week_b, a.n AS na, b.n AS nb
          FROM wt a JOIN wt b
            ON b.week = a.week + 1 AND a.event_type = b.event_type),
      m AS (SELECT j.week_a, j.week_b,
            SUM(LEAST(CAST(j.na AS HUGEINT) * tb.nw, CAST(j.nb AS HUGEINT) * ta.nw))
              AS summin
          FROM j JOIN tot ta ON ta.week = j.week_a
            JOIN tot tb ON tb.week = j.week_b
          GROUP BY 1, 2)
      SELECT p.week_a, p.week_b, p.n_a, p.n_b,
        CAST(1000000 - (COALESCE(m.summin, 0) * 1000000)
          // (CAST(p.n_a AS HUGEINT) * p.n_b) AS BIGINT) AS tvd_micro
      FROM pairs p LEFT JOIN m ON m.week_a = p.week_a AND m.week_b = p.week_b"""

  /** Markov next-step baseline (q229): for each event type, the single
    * best always-predict-this next type (the argmax row of q166's
    * transition matrix) and the accuracy that rule achieves — the
    * order-1 predictability ceiling any sequence model must beat to
    * justify itself, and the complement of q214's dwell times (WHAT
    * comes next vs WHEN). Per-from accuracy is the exact micro rational
    * max_n / Σn; argmax tie-breaks to the lexicographically first type.
    *
    * Scale shape: q166's one user-keyed exchange builds the transition
    * counts; everything after is a types²-bounded rollup + a rank
    * window over those rollup rows. */
  def markovBaseline(ev: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id", "sess_seq")
      .orderBy(col("t_us").asc, col("event_id").asc)
    val trans = withSessionIds(ev, gapSec)
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    trans
      .withColumn("rnk", expr(
        "row_number() OVER (PARTITION BY from_type ORDER BY n DESC, to_type)"))
      .groupBy("from_type").agg(
        sum("n").as("n_trans"),
        max(when(col("rnk") === 1, col("to_type"))).as("predicted_next"),
        max(when(col("rnk") === 1, col("n")).otherwise(0L)).as("n_correct"))
      .withColumn("acc_micro", expr("(n_correct * 1000000L) div n_trans"))
  }

  def markovBaselineSql(gapSec: Long = 1800L): String =
    s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
      f AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > ${gapSec}000000
              THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      g AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM f),
      h AS (SELECT *, lead(event_type) OVER (PARTITION BY user_id, sess_seq
              ORDER BY t_us, event_id) AS next_type FROM g),
      tr AS (SELECT event_type AS from_type, next_type AS to_type,
              CAST(count(*) AS BIGINT) AS n
            FROM h WHERE next_type IS NOT NULL GROUP BY 1, 2),
      rk AS (SELECT *, row_number() OVER (PARTITION BY from_type ORDER BY n DESC, to_type) AS rnk
            FROM tr)
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_trans,
        MAX(CASE WHEN rnk = 1 THEN to_type END) AS predicted_next,
        CAST(MAX(CASE WHEN rnk = 1 THEN n ELSE 0 END) AS BIGINT) AS n_correct,
        (CAST(MAX(CASE WHEN rnk = 1 THEN n ELSE 0 END) AS BIGINT) * 1000000)
          // CAST(SUM(n) AS BIGINT) AS acc_micro
      FROM rk GROUP BY from_type"""

  /** Benford first-digit audit (q232): the distribution of leading
    * digits of event values against Benford's law — the classic
    * fabricated-/synthetic-amounts screen (Nigrini 1996) run as a data-
    * quality gate over the `value` column. Per digit: count, observed
    * micro share, the Benford expectation (floor-micro'd log10(1+1/d)
    * literals — the only logs in the op are compile-time constants), and
    * the absolute micro deviation. A uniform generator (like this
    * corpus's) fails loudly; real transaction amounts pass — either way
    * the table says which.
    *
    * Determinism: cents = round(value·100) — one IEEE multiply+round on
    * both engines (values are 2-decimal, so nothing lands on a .5 tie);
    * the leading digit reads the BIGINT's decimal string, which both
    * engines format identically; shares are floored micro rationals.
    * Non-positive cents (the data fault q237 screens for) get an
    * explicit 'invalid' digit row with expectation 0 — their whole
    * observed share counts as deviation instead of silently inheriting
    * digit-9's expectation via the ELSE branch.
    *
    * Scale shape: a 10-key map-side-combined rollup above the scan plus
    * one broadcast total — the q105 card shape. */
  def benfordAudit(ev: DataFrame): DataFrame = {
    val d = ev
      .select(expr(
        """CASE WHEN CAST(round(value * 100) AS BIGINT) < 1 THEN 'invalid'
           ELSE substr(CAST(CAST(round(value * 100) AS BIGINT) AS STRING), 1, 1) END""")
        .as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val benford = "CASE digit WHEN '1' THEN 301029L WHEN '2' THEN 176091L " +
      "WHEN '3' THEN 124938L WHEN '4' THEN 96910L WHEN '5' THEN 79181L " +
      "WHEN '6' THEN 66946L WHEN '7' THEN 57991L WHEN '8' THEN 51152L " +
      "WHEN '9' THEN 45757L ELSE 0L END"
    d.crossJoin(broadcast(d.agg(sum("n").as("n_total"))))
      .withColumn("obs_micro",
        expr("CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div n_total AS BIGINT)"))
      .withColumn("benford_micro", expr(benford))
      .withColumn("dev_micro", expr("abs(obs_micro - benford_micro)"))
      .select("digit", "n", "n_total", "obs_micro", "benford_micro", "dev_micro")
  }

  val benfordAuditSql: String =
    """WITH d AS (SELECT CASE WHEN CAST(round(value * 100) AS BIGINT) < 1 THEN 'invalid'
            ELSE substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), 1, 1) END
            AS digit, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM d)
      SELECT digit, n, n_total,
        CAST((CAST(n AS HUGEINT) * 1000000) // n_total AS BIGINT) AS obs_micro,
        CAST(CASE digit WHEN '1' THEN 301029 WHEN '2' THEN 176091 WHEN '3' THEN 124938
          WHEN '4' THEN 96910 WHEN '5' THEN 79181 WHEN '6' THEN 66946
          WHEN '7' THEN 57991 WHEN '8' THEN 51152 WHEN '9' THEN 45757 ELSE 0 END
          AS BIGINT) AS benford_micro,
        CAST(abs(CAST((CAST(n AS HUGEINT) * 1000000) // n_total AS BIGINT)
          - (CASE digit WHEN '1' THEN 301029 WHEN '2' THEN 176091 WHEN '3' THEN 124938
              WHEN '4' THEN 96910 WHEN '5' THEN 79181 WHEN '6' THEN 66946
              WHEN '7' THEN 57991 WHEN '8' THEN 51152 WHEN '9' THEN 45757 ELSE 0 END))
          AS BIGINT) AS dev_micro
      FROM d CROSS JOIN t"""

  /** Acquisition-cohort funnel (q238): q78's view→click→purchase stages
    * split by the user's first-seen week — the "is conversion quality
    * changing as we acquire new users" table (a flat overall CVR can
    * hide collapsing cohorts back-filled by strong old ones; q20's
    * retention sees activity, not conversion). One extra user-keyed
    * rollup (first week) joined onto q78's per-user stage frame; the
    * final rollup is week-bounded; rates are exact micro rationals.
    *
    * Population note (q78's contract): the base is users with ≥1 view —
    * a user whose first event is a click has no funnel entry. */
  def cohortFunnel(ev: DataFrame): DataFrame = {
    val cohort = ev.select(col("user_id"), expr("ts DIV 604800000000000").as("week"))
      .groupBy("user_id").agg(min("week").as("cohort_week"))
    funnelStages(ev).join(cohort, "user_id")
      .groupBy("cohort_week").agg(
        count(lit(1)).as("n_viewers"),
        expr("CAST(count_if(stage >= 2) AS BIGINT)").as("n_clicked"),
        expr("CAST(count_if(stage = 3) AS BIGINT)").as("n_converted"))
      .withColumn("click_micro", expr("(n_clicked * 1000000L) div n_viewers"))
      .withColumn("cvr_micro", expr("(n_converted * 1000000L) div n_viewers"))
  }

  def cohortFunnelSql: String =
    s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      cohort AS (SELECT user_id, MIN(epoch_us(ts) // 604800000000) AS cohort_week
          FROM events GROUP BY 1),
      v AS (SELECT user_id, min(t) AS v_ts FROM e WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(t) AS c_ts FROM e JOIN v USING (user_id)
            WHERE event_type = 'click' AND t > v_ts AND t <= v_ts + $FunnelWindowUs GROUP BY 1),
      p AS (SELECT e.user_id, min(t) AS p_ts FROM e JOIN c USING (user_id)
            WHERE event_type = 'purchase' AND t > c_ts AND t <= c_ts + $FunnelWindowUs GROUP BY 1),
      st AS (SELECT v.user_id,
            CAST(1 + CASE WHEN c.c_ts IS NULL THEN 0 ELSE 1 END
                   + CASE WHEN p.p_ts IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
          FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
      SELECT co.cohort_week, CAST(count(*) AS BIGINT) AS n_viewers,
        CAST(count(*) FILTER (WHERE stage >= 2) AS BIGINT) AS n_clicked,
        CAST(count(*) FILTER (WHERE stage = 3) AS BIGINT) AS n_converted,
        (CAST(count(*) FILTER (WHERE stage >= 2) AS BIGINT) * 1000000) // count(*)
          AS click_micro,
        (CAST(count(*) FILTER (WHERE stage = 3) AS BIGINT) * 1000000) // count(*)
          AS cvr_micro
      FROM st JOIN cohort co USING (user_id)
      GROUP BY 1"""

  /** Session-size distribution (q235): exact tie-aware p50/p90/p99 of
    * events-per-session plus count, mean, and max — the engagement-shape
    * scalar card next to q181's DAU/WAU (sticky users can hide behind a
    * long tail of one-event sessions; percentiles expose it). Same
    * count-of-counts order statistics as q223: the percentile is the
    * smallest DISTINCT size level whose cumulative session count reaches
    * ceil(k·N/100) — no interpolation convention to drift.
    *
    * Scale shape: q21's user-keyed exchange builds per-session sizes;
    * sizes collapse to LEVEL rows (bounded by the max session length,
    * not session count); the cumulative window and every aggregate run
    * over level rows; output is ONE row. */
  def sessionSizes(ev: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val levels = withSessionIds(ev, gapSec)
      .groupBy("user_id", "sess_seq").agg(count(lit(1)).as("sz"))
      .groupBy("sz").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("sz")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
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

  def sessionSizesSql(gapSec: Long = 1800L): String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
      f AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > ${gapSec}000000
              THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      g AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM f),
      sz AS (SELECT user_id, sess_seq, CAST(count(*) AS BIGINT) AS sz FROM g GROUP BY 1, 2),
      lv AS (SELECT sz, CAST(count(*) AS BIGINT) AS cnt FROM sz GROUP BY 1),
      cu AS (SELECT sz, cnt, SUM(cnt) OVER (ORDER BY sz) AS cum,
            (SELECT CAST(SUM(cnt) AS BIGINT) FROM lv) AS n,
            (SELECT CAST(SUM(sz * cnt) AS BIGINT) FROM lv) AS n_events
          FROM lv)
      SELECT MAX(n) AS n_sessions, MAX(n_events) AS n_events,
        CAST(MIN(CASE WHEN cum * 100 >= 50 * n THEN sz END) AS BIGINT) AS p50,
        CAST(MIN(CASE WHEN cum * 100 >= 90 * n THEN sz END) AS BIGINT) AS p90,
        CAST(MIN(CASE WHEN cum * 100 >= 99 * n THEN sz END) AS BIGINT) AS p99,
        CAST(MAX(sz) AS BIGINT) AS max_size,
        (MAX(n_events) * 1000000) // MAX(n) AS mean_micro
      FROM cu"""

  /** Session entry/exit type profile (q236): which event types OPEN
    * sessions and which CLOSE them, with micro shares of all sessions —
    * the funnel-design table (an "entry" type that never exits is a
    * landing surface; an exit-heavy type is where users leave). Both
    * firsts and lasts come from ONE window pass (row_number ascending +
    * count per session — last ⇔ rn == sz), over q21's single user-keyed
    * exchange; the rollup is types-bounded.
    *
    * A single-event session is both its own entry and exit — counted in
    * both columns by definition (shares each sum to 1). */
  def entryExitTypes(ev: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val w = Window.partitionBy("user_id", "sess_seq")
      .orderBy(col("t_us").asc, col("event_id").asc)
    val wAll = Window.partitionBy("user_id", "sess_seq")
    val marked = withSessionIds(ev, gapSec)
      .withColumn("rn", row_number().over(w))
      .withColumn("sz", count(lit(1)).over(wAll))
    val byType = marked.groupBy("event_type").agg(
      expr("CAST(count_if(rn = 1) AS BIGINT)").as("n_entry"),
      expr("CAST(count_if(rn = sz) AS BIGINT)").as("n_exit"))
    byType
      .crossJoin(broadcast(byType.agg(sum("n_entry").as("n_sessions"))))
      .withColumn("entry_share_micro", expr("(n_entry * 1000000L) div n_sessions"))
      .withColumn("exit_share_micro", expr("(n_exit * 1000000L) div n_sessions"))
      .select("event_type", "n_entry", "n_exit", "n_sessions",
        "entry_share_micro", "exit_share_micro")
  }

  def entryExitTypesSql(gapSec: Long = 1800L): String =
    s"""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events),
      f AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > ${gapSec}000000
              THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      g AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM f),
      m AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess_seq
              ORDER BY t_us, event_id) AS rn,
              count(*) OVER (PARTITION BY user_id, sess_seq) AS sz FROM g),
      bt AS (SELECT event_type,
            CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_entry,
            CAST(count(*) FILTER (WHERE rn = sz) AS BIGINT) AS n_exit
          FROM m GROUP BY 1),
      t AS (SELECT CAST(SUM(n_entry) AS BIGINT) AS n_sessions FROM bt)
      SELECT event_type, n_entry, n_exit, n_sessions,
        (n_entry * 1000000) // n_sessions AS entry_share_micro,
        (n_exit * 1000000) // n_sessions AS exit_share_micro
      FROM bt CROSS JOIN t"""

  /** Exact equi-depth boundaries (q244): the k-quantile cut points of
    * the value column (as exact cents), tie-aware count-of-counts form —
    * what a range partitioner / histogram planner needs (Spark's range
    * partitioner SAMPLES for these boundaries; on skewed money-like
    * columns sampling misses heavy ties, and a boundary that splits a
    * tie bucket is exactly how partition skew happens — the exact
    * distinct-level form can't split a tie by construction). Boundary i
    * = the smallest distinct cents level whose cumulative count reaches
    * ceil(i·N/k) — q223's discipline on a value column.
    *
    * Scale shape: values collapse to (cents, count) LEVEL rows map-side
    * (money-like columns have bounded distinct levels); the cumulative
    * window runs over level rows; the k boundaries explode from ONE
    * aggregated row. */
  def equiDepthBoundaries(ev: DataFrame, k: Int = 8): DataFrame = {
    val levels = ev.select(expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("cents").agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val aggCols = max("n").as("n_total") +: (1 to k).map(i =>
      min(when(expr(s"cum * $k >= $i * n"), col("cents"))).as(s"b$i"))
    val bounds = levels.withColumn("cum", sum("cnt").over(w))
      .crossJoin(broadcast(levels.agg(sum("cnt").as("n"))))
      .agg(aggCols.head, aggCols.tail: _*)
    bounds.select(col("n_total"),
        posexplode(array((1 to k).map(i => col(s"b$i")): _*)).as(Seq("i", "upper_cents")))
      .select((col("i") + 1).cast("long").as("bucket"), col("upper_cents"), col("n_total"))
  }

  def equiDepthBoundariesSql(k: Int = 8): String = {
    val rows = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS bucket, b$i AS upper_cents, n_total FROM g")
      .mkString(" UNION ALL ")
    val cols = (1 to k).map(i =>
      s"CAST(MIN(CASE WHEN cum * $k >= $i * n THEN cents END) AS BIGINT) AS b$i")
      .mkString(", ")
    s"""WITH lv AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents,
            CAST(count(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1),
      cu AS (SELECT cents, cnt, SUM(cnt) OVER (ORDER BY cents) AS cum,
            (SELECT CAST(SUM(cnt) AS BIGINT) FROM lv) AS n FROM lv),
      g AS (SELECT CAST(MAX(n) AS BIGINT) AS n_total, $cols FROM cu)
      $rows"""
  }

  /** Duplicate-event audit (q247): per type — exact duplicate groups
    * (same user, type, timestamp), extra rows they carry, and the micro
    * share of the type's volume — the at-least-once-delivery screen
    * every event pipeline needs before its counts mean anything (a 2%
    * duplicate rate silently inflates every rollup upstream of this
    * table; q37's streaming dedupe REMOVES dups, this MEASURES them).
    *
    * Scale shape: one (user, type, ts)-keyed rollup (map-side combined —
    * duplicate groups collapse before the exchange), then a types-
    * bounded second rollup. */
  def duplicateEvents(ev: DataFrame): DataFrame = {
    val g = ev.select("user_id", "event_type", "ts")
      .groupBy("user_id", "event_type", "ts").agg(count(lit(1)).as("n"))
    g.groupBy("event_type").agg(
        sum("n").as("n_events"),
        expr("CAST(count_if(n >= 2) AS BIGINT)").as("n_dup_groups"),
        sum(expr("n - 1")).as("n_extra_rows"))
      .withColumn("dup_micro", expr("(n_extra_rows * 1000000L) div n_events"))
  }

  /** q247's oracle over a replay injection (every 13th event delivered
    * twice — organic exact-timestamp collisions don't exist at 1x). */
  val duplicateEventsSql: String =
    """WITH inj AS (SELECT user_id, event_type, ts FROM events
          UNION ALL
          SELECT user_id, event_type, ts FROM events WHERE event_id % 13 = 0),
      g AS (SELECT user_id, event_type, ts, CAST(count(*) AS BIGINT) AS n
          FROM inj GROUP BY 1, 2, 3)
      SELECT event_type, CAST(SUM(n) AS BIGINT) AS n_events,
        CAST(count(*) FILTER (WHERE n >= 2) AS BIGINT) AS n_dup_groups,
        CAST(SUM(n - 1) AS BIGINT) AS n_extra_rows,
        (CAST(SUM(n - 1) AS BIGINT) * 1000000) // CAST(SUM(n) AS BIGINT) AS dup_micro
      FROM g GROUP BY event_type"""

  /** Daily-rate autocorrelation (q226): Pearson r between each type's
    * daily counts and the same series lagged 1 and 7 days — the
    * seasonality-STRENGTH scalar behind q182's hour profile and q219's
    * anomaly flags (lag-7 ≫ lag-1 says weekly rhythm; both ≈ 0 says the
    * q219 baseline should not assume one). Pairs are (day, day+k) where
    * both observed — a day-keyed self-join over the same daily rollup
    * q199 uses, never a row-number lag (row lag silently bridges gaps).
    *
    * Determinism: all five moments are exact DECIMAL(38,0) sums; r's
    * numerator n·Σxy − Σx·Σy and the two variance terms are exact; the
    * final r = num / (sqrt(a)·sqrt(b)) is three IEEE ops on
    * identically-valued doubles (a·b could overflow 38 digits — the
    * split-sqrt form cannot). Moments ride the output so the exactness
    * is auditable.
    *
    * Scale shape: the (type × day) rollup is the only event-volume
    * exchange (shared localCheckpoint); self-joins and rollups run over
    * day-level rows. */
  def rateAutocorrelation(ev: DataFrame, lags: Seq[Int] = Seq(1, 7)): DataFrame = {
    val daily = ev.select(col("event_type"), expr("ts DIV 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds both sides of both lag joins
    val pairs = lags.map { k =>
      daily.as("a").join(daily.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("b.day") === col("a.day") + k)
        .select(col("a.event_type").as("event_type"), lit(k.toLong).as("lag"),
          col("a.n").as("x"), col("b.n").as("y"))
    }.reduce(_ unionAll _)
    pairs.groupBy("event_type", "lag").agg(
        count(lit(1)).as("n_pairs"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
      .withColumn("r", expr(
        """CAST(n_pairs * sxy - sx * sy AS DOUBLE)
           / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
              * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)))"""))
      .select(col("event_type"), col("lag"), col("n_pairs"),
        col("sx").cast("long").as("sum_x"), col("sy").cast("long").as("sum_y"),
        col("r"))
  }

  val rateAutocorrelationSql: String =
    """WITH daily AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
      pairs AS (
        SELECT a.event_type, CAST(1 AS BIGINT) AS lag, a.n AS x, b.n AS y
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.day = a.day + 1
        UNION ALL
        SELECT a.event_type, CAST(7 AS BIGINT) AS lag, a.n AS x, b.n AS y
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.day = a.day + 7),
      m AS (SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n_pairs,
            CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
            CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
            CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
            CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
            CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
          FROM pairs GROUP BY 1, 2)
      SELECT event_type, lag, n_pairs,
        CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
        CAST(n_pairs * sxy - sx * sy AS DOUBLE)
          / (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
             * sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))) AS r
      FROM m"""

  /** Rule-based RFM user segmentation (q200): per user — recency (days
    * since last activity, against the corpus max day), frequency (event
    * count), monetary (exact integer cents, the q177 discipline) —
    * bucketed into 3×3×3 segments and rolled up to segment counts +
    * cents volume. FIXED integer thresholds instead of corpus quantiles
    * BY DESIGN: exact terciles over per-user values would rank a
    * user-cardinality frame in one global window (the single-partition
    * funnel q179/q193 design out), while rule cuts keep the operator at
    * ONE user-keyed exchange, a broadcast max-day scalar, a stateless
    * CASE projection, and a ≤27-row rollup — the shape that survives
    * 1e9 users. The cut constants here sit at the testdata's engagement
    * terciles (its synthetic users are uniformly hyperactive — recency
    * 0–2 days, 62–99 events) so the query exercises real segmentation;
    * a deployment tunes them to its own profile. */
  def rfmSegments(ev: DataFrame): DataFrame = {
    val peru = ev.select(col("user_id"), expr("ts DIV 86400000000000").as("day"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
      .groupBy("user_id")
      .agg(max("day").as("last_day"), count(lit(1)).as("freq"),
        sum("cents").as("cents"))
    val maxd = peru.agg(max("last_day").as("max_day"))
    peru.crossJoin(broadcast(maxd))
      .withColumn("recency", col("max_day") - col("last_day"))
      .withColumn("r_seg", expr(
        "CASE WHEN recency <= 0 THEN 'hot' WHEN recency <= 1 THEN 'warm' ELSE 'cold' END"))
      .withColumn("f_seg", expr(
        "CASE WHEN freq >= 71 THEN 'high' WHEN freq >= 64 THEN 'mid' ELSE 'low' END"))
      .withColumn("m_seg", expr(
        "CASE WHEN cents >= 360000 THEN 'high' WHEN cents >= 310000 THEN 'mid' ELSE 'low' END"))
      .groupBy("r_seg", "f_seg", "m_seg")
      .agg(count(lit(1)).as("n_users"), sum("cents").as("seg_cents"))
  }

  val rfmSegmentsSql: String =
    """WITH peru AS (SELECT user_id,
            CAST(max(epoch_us(ts) // 86400000000) AS BIGINT) AS last_day,
            CAST(count(*) AS BIGINT) AS freq,
            CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
          FROM events GROUP BY user_id),
      m AS (SELECT max(last_day) AS max_day FROM peru),
      seg AS (SELECT
            CASE WHEN max_day - last_day <= 0 THEN 'hot'
                 WHEN max_day - last_day <= 1 THEN 'warm' ELSE 'cold' END AS r_seg,
            CASE WHEN freq >= 71 THEN 'high' WHEN freq >= 64 THEN 'mid' ELSE 'low' END AS f_seg,
            CASE WHEN cents >= 360000 THEN 'high' WHEN cents >= 310000 THEN 'mid' ELSE 'low' END AS m_seg,
            cents
          FROM peru, m)
      SELECT r_seg, f_seg, m_seg, CAST(count(*) AS BIGINT) AS n_users,
        CAST(SUM(cents) AS BIGINT) AS seg_cents
      FROM seg GROUP BY 1, 2, 3"""

  /** Top event-type path trigrams (q202): the most common 3-step
    * behavioral paths — every 3 consecutive events of a user, ordered by
    * (ts, event_id), forms a (t1, t2, t3) path; report the top-k by
    * frequency. The path-mining view above q166's 2-step transition
    * matrix (a funnel designer reads 3-step paths to find the detours
    * q78's fixed stages can't see).
    *
    * Scale shape: the q150 discipline — ONE user-keyed exchange carries
    * BOTH leads (Spark plans the two lead() calls in one Window over
    * one sort); the path rollup is (types³)-bounded and map-side
    * combines; top-k is a TakeOrderedAndProject over rollup rows on the
    * deterministic (n desc, path asc) total order. */
  def pathTrigrams(ev: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  def pathTrigramsSql(k: Int = 20): String =
    s"""WITH l AS (SELECT event_type AS t1,
          lead(event_type, 1) OVER w AS t2,
          lead(event_type, 2) OVER w AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
      FROM l WHERE t3 IS NOT NULL
      GROUP BY 1, 2, 3
      ORDER BY n DESC, t1, t2, t3 LIMIT $k"""

  /** Transition latency matrix (q214): for every adjacent (from → to)
    * event-type pair, how LONG the step takes — count, exact mean gap
    * (µs sums, integer division) and max gap. q166's matrix says WHICH
    * transitions happen; this says how long each takes — the dwell-time
    * view that finds the slow step a funnel's fixed stages can't
    * localize. Adjacency is per user ordered by (ts, event_id), q166's
    * exact ordering contract.
    *
    * Scale shape: the q150/q166 discipline — ONE user-keyed exchange
    * carries both lags (one Window, one sort); the rollup is
    * (types²)-bounded and map-side combines. Gap sums are µs BIGINTs
    * (pass int64 to ~292k user-years per cell). */
  def transitionLatency(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    ev.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("prev_ts", lag("ts", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .withColumn("gap_us", expr("(ts - prev_ts) DIV 1000"))
      .groupBy(col("prev_type").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(gap_us) div count(1) AS BIGINT)").as("mean_gap_us"),
        max("gap_us").as("max_gap_us"))
  }

  val transitionLatencySql: String =
    """WITH l AS (SELECT event_type,
          lag(event_type, 1) OVER w AS prev_type,
          epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT prev_type AS from_type, event_type AS to_type,
        CAST(count(*) AS BIGINT) AS n,
        CAST(SUM(gap_us) // COUNT(*) AS BIGINT) AS mean_gap_us,
        CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
      FROM l WHERE prev_type IS NOT NULL
      GROUP BY 1, 2"""

  /** Population floor for [[suppressSmallCells]] (q205). */
  val SuppressK = 10L

  /** Small-cell suppression (q205): the k-anonymity publishing gate a
    * grouped report passes through before leaving the platform — any
    * row whose population sits below `k` collapses into ONE combined
    * row (every key column → '~'), with counts and sums preserved
    * EXACTLY, so the published table never isolates a cohort smaller
    * than k users yet still reconciles to the unsuppressed totals. The
    * q205 query gates q200's RFM segments (population = n_users); the
    * operator is generic over any (keys, population, sums) rollup.
    *
    * Standard single-pass cell suppression: the combined row itself may
    * aggregate fewer than k rows-worth of cohorts but never exposes an
    * individual cohort below k. Cost: a stateless CASE + one re-rollup
    * over REPORT rows (the corpus was already reduced upstream) —
    * governance is free at any scale. */
  def suppressSmallCells(report: DataFrame, keyCols: Seq[String],
      popCol: String, sumCols: Seq[String], k: Long = SuppressK): DataFrame = {
    val masked = keyCols.foldLeft(report) { (df, c) =>
      df.withColumn(c, when(col(popCol) < k, lit("~")).otherwise(col(c)))
    }
    masked.groupBy(keyCols.map(col): _*)
      .agg(sum(popCol).as(popCol),
        sumCols.map(c => sum(c).as(c)): _*)
  }

  def suppressedRfmSql(k: Long = SuppressK): String =
    s"""WITH seg AS (${rfmSegmentsSql}),
      m AS (SELECT
            CASE WHEN n_users < $k THEN '~' ELSE r_seg END AS r_seg,
            CASE WHEN n_users < $k THEN '~' ELSE f_seg END AS f_seg,
            CASE WHEN n_users < $k THEN '~' ELSE m_seg END AS m_seg,
            n_users, seg_cents
          FROM seg)
      SELECT r_seg, f_seg, m_seg, CAST(SUM(n_users) AS BIGINT) AS n_users,
        CAST(SUM(seg_cents) AS BIGINT) AS seg_cents
      FROM m GROUP BY 1, 2, 3"""

  // -------------------------------------------------------------------
  // q272: transition-graph PageRank
  // -------------------------------------------------------------------

  /** PageRank damping (micro) and iteration count. */
  val PrDampMicro = 850000L
  val PrIters = 10

  /** q272: PageRank over the session-transition graph — which event
    * types are structurally central to user flows (a type can be
    * low-volume but high-centrality when every path routes through
    * it). Fixed-point micro iterations so both engines agree exactly:
    * pr'_i = (1−d)/N + d·Σ_j pr_j·n_ji/out_j, truncating division in a
    * fixed order, [[PrIters]] rounds from the uniform start.
    *
    * Scale shape: the transition rollup ([[sessionTransitions]] — one
    * session window + one (from,to) rollup) is the only data-volume
    * work; the graph is event-type-cardinality (k² ≤ 25 rows here), so
    * the power iteration runs driver-side over the collected matrix
    * (the coarse-trainer pattern) and the oracle unrolls the same
    * arithmetic in MATERIALIZED CTEs. Output is node-cardinality. */
  def transitionPagerank(ev: DataFrame): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val tr = sessionTransitions(ev)
      .select("from_type", "to_type", "n", "n_from")
      .as[(String, String, Long, Long)]
      .collect() // ≤ (event types)² rows — driver-bounded by construction
    val nodes = (tr.map(_._1) ++ tr.map(_._2)).distinct.sorted
    // empty transition graph (no session has 2+ events): zero rows, the
    // same answer the DuckDB twin gives — not a division by zero
    if (nodes.isEmpty)
      return spark.createDataset(Seq.empty[(String, Long, Long, Long)])
        .toDF("event_type", "pr_micro", "n_out", "rank")
    val idx = nodes.zipWithIndex.toMap
    val nN = nodes.length
    val out = Array.fill(nN)(0L)
    tr.foreach { case (f, _, _, nf) => out(idx(f)) = nf }
    val in = nodes.indices.map(i =>
      tr.filter(t => idx(t._2) == i).map(t => (idx(t._1), t._3)).sortBy(_._1))
    var pr = Array.fill(nN)(1000000L / nN)
    for (_ <- 1 to PrIters) {
      pr = Array.tabulate(nN) { i =>
        val flow = in(i).map { case (j, nji) => (pr(j) * nji) / out(j) }.sum
        (1000000L - PrDampMicro) / nN + (PrDampMicro * flow) / 1000000L
      }
    }
    val ranked = pr.zipWithIndex.sortBy { case (p, i) => (-p, nodes(i)) }
      .zipWithIndex.map { case ((p, i), r) =>
        (nodes(i), p, out(i), r + 1L)
      }
    spark.createDataset(ranked.toSeq)
      .toDF("event_type", "pr_micro", "n_out", "rank")
  }

  val transitionPagerankSql: String = {
    val base =
      s"""trq AS MATERIALIZED (${sessionTransitionsSql()}),
      nodes AS MATERIALIZED (
        SELECT DISTINCT t FROM (
          SELECT from_type AS t FROM trq UNION SELECT to_type FROM trq)),
      nn AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS k FROM nodes),
      outw AS MATERIALIZED (SELECT n.t,
            COALESCE((SELECT MAX(n_from) FROM trq WHERE from_type = n.t), 0)
              AS out_n
          FROM nodes n),
      pr0 AS MATERIALIZED (SELECT t, CAST(1000000 // k AS BIGINT) AS p
          FROM nodes, nn)"""
    val iters = (1 to PrIters).map { it =>
      val prev = s"pr${it - 1}"
      s"""fl$it AS MATERIALIZED (
          SELECT n.t,
            COALESCE(SUM((pj.p * tr.n) // o.out_n), 0) AS flow
          FROM nodes n
          LEFT JOIN trq tr ON tr.to_type = n.t
          LEFT JOIN $prev pj ON pj.t = tr.from_type
          LEFT JOIN outw o ON o.t = tr.from_type
          GROUP BY n.t),
        pr$it AS MATERIALIZED (
          SELECT f.t,
            CAST((1000000 - $PrDampMicro) // nn.k
              + ($PrDampMicro * f.flow) // 1000000 AS BIGINT) AS p
          FROM fl$it f, nn)"""
    }
    s"""WITH ${(base +: iters).mkString(",\n      ")}
      SELECT pr.t AS event_type, pr.p AS pr_micro,
        CAST(o.out_n AS BIGINT) AS n_out,
        CAST(row_number() OVER (ORDER BY pr.p DESC, pr.t) AS BIGINT) AS rank
      FROM pr$PrIters pr JOIN outw o ON o.t = pr.t"""
  }

  // -------------------------------------------------------------------
  // q273: l-diversity audit
  // -------------------------------------------------------------------

  /** q273: l-diversity audit over the RFM release cells — quasi-
    * identifier = (r_seg, f_seg), sensitive attribute = m_seg. A cell
    * can be k-anonymous (q205) and still leak: if every user in it
    * shares one spend band, membership reveals the sensitive value
    * (homogeneity attack). Per cell: population, l = distinct sensitive
    * values, the dominant value's share, and the l ≥ 2 flag.
    *
    * Scale shape: a rollup of q200's ALREADY-bounded segment rollup —
    * zero additional data-volume work; output ≤ 9 cells. */
  def lDiversityAudit(ev: DataFrame): DataFrame =
    rfmSegments(ev)
      .groupBy("r_seg", "f_seg")
      .agg(sum("n_users").as("n_users"),
        count(lit(1)).as("l"),
        max("n_users").as("top_m_users"))
      .withColumn("top_m_share_micro", expr("(top_m_users * 1000000) div n_users"))
      .withColumn("ok_l2", expr("CAST(CASE WHEN l >= 2 THEN 1 ELSE 0 END AS BIGINT)"))
      .drop("top_m_users")

  val lDiversityAuditSql: String =
    s"""WITH seg AS ($rfmSegmentsSql)
      SELECT r_seg, f_seg, CAST(SUM(n_users) AS BIGINT) AS n_users,
        CAST(count(*) AS BIGINT) AS l,
        CAST((MAX(n_users) * 1000000) // SUM(n_users) AS BIGINT)
          AS top_m_share_micro,
        CAST(CASE WHEN count(*) >= 2 THEN 1 ELSE 0 END AS BIGINT) AS ok_l2
      FROM seg GROUP BY 1, 2"""

  /** SCD2 history compression (q283): the warehouse type-2 dimension
    * build from event snapshots — per user, the JSON `k` attribute's
    * last value each active day, with consecutive equal-valued days
    * compressed to [valid_from_day, valid_to_day] intervals (the
    * gaps-and-islands pattern: an island breaks when the value changes
    * OR the daily snapshot has a gap, since an absent day is an unknown
    * state, not a carried-forward one). q25 resamples values onto a
    * grid; THIS op builds the slowly-changing-dimension table a join
    * against history needs (`FROM dim WHERE day BETWEEN valid_from_day
    * AND valid_to_day`).
    *
    * Determinism: "last value of the day" ties break on (ts desc,
    * event_id desc) — the q235 endpoint discipline.
    *
    * Scale shape: one (user, day) dedup window + one user-partitioned
    * day-ordered lag/cumsum window + one (user, island) rollup — every
    * exchange is user-keyed (the natural partitioning; no global sort),
    * per-user frames bounded by active days. */
  def scd2History(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev.select(col("user_id"),
        expr("ts DIV 86400000000000").as("day"),
        col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .withColumn("rn", row_number().over(Window.partitionBy("user_id", "day")
        .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1).select("user_id", "day", "k")
    val w = Window.partitionBy("user_id").orderBy("day")
    daily
      .withColumn("brk", when(lag("day", 1).over(w).isNull
          || col("day") =!= lag("day", 1).over(w) + 1
          || col("k") =!= lag("k", 1).over(w), 1L).otherwise(0L))
      .withColumn("grp", sum("brk").over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "grp", "k").agg(
        min("day").as("valid_from_day"), max("day").as("valid_to_day"),
        count(lit(1)).as("n_days"))
      .select("user_id", "k", "valid_from_day", "valid_to_day", "n_days")
  }

  val scd2HistorySql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
          epoch_us(ts) AS tus, event_id,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events),
      d AS (SELECT user_id, day, k FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id, day
            ORDER BY tus DESC, event_id DESC) AS rn FROM e) WHERE rn = 1),
      g AS (SELECT user_id, day, k,
          CASE WHEN lag(day) OVER w IS NULL OR day != lag(day) OVER w + 1
               OR k != lag(k) OVER w THEN 1 ELSE 0 END AS brk
        FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      i AS (SELECT user_id, day, k, SUM(brk) OVER (PARTITION BY user_id
          ORDER BY day ROWS UNBOUNDED PRECEDING) AS grp FROM g)
      SELECT user_id, k, CAST(MIN(day) AS BIGINT) AS valid_from_day,
        CAST(MAX(day) AS BIGINT) AS valid_to_day,
        CAST(count(*) AS BIGINT) AS n_days
      FROM i GROUP BY user_id, grp, k"""

  /** Temporal dimension join card (q285): every event joined to the
    * SCD2 interval valid on its day ([[scd2History]]'s output — the
    * consumer that table exists for: `fact JOIN dim ON key AND day
    * BETWEEN valid_from AND valid_to`). Per event type: events, events
    * covered by an interval (ALL of them — an event's day is by
    * construction an active day, the spec-locked invariant), events
    * whose own value was the day's last snapshot value, and the exact
    * micro share of the latter — how much intra-day churn the daily
    * grain hides.
    *
    * Scale shape: the join is EQUI on user_id with the interval
    * predicate as a residual — both sides exchange user-keyed (the
    * dimension's natural key; never a broadcast nested loop, gated in
    * the spec), per-user interval lists are bounded by active days. */
  def temporalDimJoin(ev: DataFrame): DataFrame = {
    val fact = ev.select(col("event_type"), col("user_id"),
      expr("ts DIV 86400000000000").as("day"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))
    // fact and dim share lineage (both derive from ev) — distinct join-key
    // names sidestep Spark's ambiguous-self-join disambiguation entirely
    // (the k/dim_k discipline applied to the key column too)
    val dim = scd2History(ev)
      .withColumnRenamed("k", "dim_k").withColumnRenamed("user_id", "dim_user_id")
    fact.join(dim,
        col("user_id") === col("dim_user_id") &&
          col("day") >= col("valid_from_day") && col("day") <= col("valid_to_day"),
        "left")
      .groupBy("event_type").agg(
        count(lit(1)).as("n_events"),
        expr("CAST(count_if(dim_k IS NOT NULL) AS BIGINT)").as("n_covered"),
        expr("CAST(count_if(k = dim_k) AS BIGINT)").as("n_last_value"))
      .withColumn("last_value_micro", expr(
        "CAST((CAST(n_last_value AS DECIMAL(38,0)) * 1000000) div n_events AS BIGINT)"))
      .select("event_type", "n_events", "n_covered", "n_last_value",
        "last_value_micro")
  }

  val temporalDimJoinSql: String =
    s"""WITH hist AS ($scd2HistorySql),
      fact AS (SELECT event_type, user_id, epoch_us(ts) // 86400000000 AS day,
          CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k FROM events)
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        CAST(count(*) FILTER (h.k IS NOT NULL) AS BIGINT) AS n_covered,
        CAST(count(*) FILTER (fact.k = h.k) AS BIGINT) AS n_last_value,
        CAST((CAST(count(*) FILTER (fact.k = h.k) AS HUGEINT) * 1000000)
          // count(*) AS BIGINT) AS last_value_micro
      FROM fact LEFT JOIN hist h ON h.user_id = fact.user_id
        AND fact.day BETWEEN h.valid_from_day AND h.valid_to_day
      GROUP BY event_type"""

  /** Experiment salt for q287's deterministic arm assignment. */
  val ExperimentSalt = "exp1:"

  /** A/B experiment readout card (q287): users deterministically split
    * into control/treatment by the md5-hex coin (the q101 salt-hash
    * discipline — the SAME assignment any service replica computes with
    * no coordination), then per arm: users, buyers, purchases, exact
    * revenue cents, and the micro conversion and revenue-per-user
    * rates — the experiment dashboard's primary readout. On this
    * corpus's hash split the arms are exchangeable (no real treatment),
    * so near-equal rates are themselves the A/A sanity check an
    * experimentation platform runs before trusting its pipeline.
    *
    * Scale shape: one user-keyed rollup (purchases + revenue per user —
    * the same exchange any per-user stat pays), arm derived ON the
    * rollup rows, then a 2-row arm rollup. */
  def experimentReadout(ev: DataFrame): DataFrame = {
    val hexVal = (c: String) => s"(instr('0123456789abcdef', $c) - 1)"
    val perUser = ev.groupBy("user_id").agg(
        expr("CAST(count_if(event_type = 'purchase') AS BIGINT)").as("n_purch"),
        expr("CAST(SUM(CASE WHEN event_type = 'purchase' " +
          "THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)").as("cents"))
      .withColumn("h",
        md5(concat(lit(ExperimentSalt), col("user_id").cast("string"))))
      .withColumn("arm", expr(
        s"CASE WHEN ${hexVal("substr(h, 1, 1)")} % 2 = 0 THEN 'control' ELSE 'treatment' END"))
    perUser.groupBy("arm").agg(
        count(lit(1)).as("n_users"),
        expr("CAST(count_if(n_purch > 0) AS BIGINT)").as("n_buyers"),
        sum("n_purch").as("n_purchases"),
        sum("cents").as("value_cents"))
      .withColumn("cvr_micro", expr(
        "CAST((CAST(n_buyers AS DECIMAL(38,0)) * 1000000) div n_users AS BIGINT)"))
      .withColumn("rpu_cents_micro", expr(
        "CAST((CAST(value_cents AS DECIMAL(38,0)) * 1000000) div n_users AS BIGINT)"))
      .select("arm", "n_users", "n_buyers", "n_purchases", "value_cents",
        "cvr_micro", "rpu_cents_micro")
  }

  val experimentReadoutSql: String =
    s"""WITH pu AS (SELECT user_id,
          CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purch,
          CAST(COALESCE(SUM(CAST(round(value * 100) AS BIGINT))
            FILTER (event_type = 'purchase'), 0) AS BIGINT) AS cents
        FROM events GROUP BY 1),
      armed AS (SELECT *,
          CASE WHEN (instr('0123456789abcdef',
              substr(md5('$ExperimentSalt' || CAST(user_id AS VARCHAR)), 1, 1)) - 1)
            % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm
        FROM pu)
      SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
        CAST(count(*) FILTER (n_purch > 0) AS BIGINT) AS n_buyers,
        CAST(SUM(n_purch) AS BIGINT) AS n_purchases,
        CAST(SUM(cents) AS BIGINT) AS value_cents,
        CAST((CAST(count(*) FILTER (n_purch > 0) AS HUGEINT) * 1000000)
          // count(*) AS BIGINT) AS cvr_micro,
        CAST((CAST(SUM(cents) AS HUGEINT) * 1000000) // count(*) AS BIGINT)
          AS rpu_cents_micro
      FROM armed GROUP BY arm"""

  /** Peak-concurrency card (q289): per day, how many 30-minute sessions
    * were open AT ONCE at the worst instant — the capacity number a
    * connection pool / state store is sized from (q235 counts events
    * per session; this counts sessions per INSTANT). Classic sweep-line:
    * sessions clip to day bounds, each clipped interval drops a +1 at
    * its start and a −1 at its end, and the peak is the max of the
    * running sum ordered (t asc, +1 before −1) — the tie rule makes a
    * back-to-back boundary instant count both sessions, and ties among
    * equal deltas commute so the max is order-independent.
    *
    * Scale shape: the q21 user-keyed session rollup, a ≤2-way day clip
    * explode, then a DAY-partitioned running-sum window — the sweep
    * never globally sorts; per-day point counts are bounded by daily
    * session volume. */
  def sessionConcurrency(ev: DataFrame, gapSec: Long = 1800L): DataFrame =
    concurrencyFromIntervals(withSessionIds(ev, gapSec)
      .groupBy("user_id", "sess_seq")
      .agg(min("t_us").as("s"), max("t_us").as("e")))

  /** The sweep over any (s, e)-µs interval frame — shared by the batch
    * op and the live card over [[graft.streaming.TypedFinalSession]]
    * rows ([[graft.streaming.SessionCards.concurrencyCard]]). */
  private[graft] def concurrencyFromIntervals(sess: DataFrame): DataFrame = {
    val DayUs = 86400000000L
    val clipped = sess.select(col("s"), col("e"),
        explode(expr(s"sequence(s DIV $DayUs, e DIV $DayUs)")).as("day"))
      .select(col("day"),
        greatest(col("s"), col("day") * DayUs).as("cs"),
        least(col("e"), (col("day") + 1) * DayUs - 1).as("ce"))
    val pts = clipped.select(col("day"), col("cs").as("t"), lit(1L).as("delta"))
      .unionByName(clipped.select(col("day"), col("ce").as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy("day").orderBy(col("t").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("run", sum("delta").over(w))
      .groupBy("day").agg(
        expr("CAST(count(1) DIV 2 AS BIGINT)").as("n_sessions"),
        max("run").as("peak_concurrency"))
  }

  def sessionConcurrencySql(gapSec: Long = 1800L): String =
    s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events),
      f AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL
              OR t_us - lag(t_us) OVER w > ${gapSec * 1000000L} THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      g AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM f),
      sess AS (SELECT user_id, sess_seq, MIN(t_us) AS s, MAX(t_us) AS e
            FROM g GROUP BY 1, 2),
      clipped AS (SELECT day,
            greatest(s, day * 86400000000) AS cs,
            least(e, (day + 1) * 86400000000 - 1) AS ce
          FROM (SELECT s, e, unnest(range(s // 86400000000, e // 86400000000 + 1)) AS day
                FROM sess)),
      pts AS (SELECT day, cs AS t, 1 AS delta FROM clipped
              UNION ALL SELECT day, ce, -1 FROM clipped),
      runs AS (SELECT day, SUM(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM pts)
      SELECT day, CAST(count(*) // 2 AS BIGINT) AS n_sessions,
        CAST(MAX(run) AS BIGINT) AS peak_concurrency
      FROM runs GROUP BY day"""

  /** Smoothing denominators for q291 (α = β = 1/[[HwDenom]]). */
  val HwDenom = 4L
  /** Forecast horizon in days. */
  val HwHorizon = 7L

  /** Holt double-exponential-smoothing forecast card (q291): per event
    * type, level+trend recursion over the FULL daily-count grid
    * (missing days are real zeros), in micro fixed point with explicit
    * FLOOR division at every step —
    *   l_t = (y_t·1e6 + 3·l_{t−1}) floordiv 4
    *   b_t = ((l_t − l_{t−1}) + 3·b_{t−1}) floordiv 4
    * — and the [[HwHorizon]]-day-ahead forecast l + h·b. The forecasting
    * layer the anomaly screens lean on: q219/q182 detect deviation from
    * season, q229 from transition structure; THIS extrapolates volume,
    * the capacity-planning number.
    *
    * Engine parity is the point of the division discipline: trend and
    * level go NEGATIVE, and both Scala's `/` and DuckDB's `//` truncate
    * toward zero on negative integers (measured: −7//4 = −1 in DuckDB —
    * it is NOT a floor). The driver recursion uses plain truncating
    * division and the oracle is a RECURSIVE CTE stepping the same
    * grid — bit-identical by construction.
    *
    * Scale shape: ONE (type, day) map-side rollup touches the corpus;
    * the recursion is driver arithmetic over the types×days-bounded
    * grid (the q261/q272 bounded-iteration discipline) — inherently
    * sequential in t, so no distributed form exists to miss. */
  def holtForecast(spark: SparkSession, ev: DataFrame): DataFrame = {
    import spark.implicits._
    val daily = ev.select(col("event_type"), expr("ts DIV 86400000000000").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect() // types × days — driver-bounded
    val (lo, hi) = (daily.map(_._2).min, daily.map(_._2).max)
    val byType = daily.groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val rows = byType.toSeq.sortBy(_._1).map { case (t, counts) =>
      var l = counts.getOrElse(lo, 0L) * 1000000L
      var b = 0L
      (lo + 1 to hi).foreach { d =>
        val y = counts.getOrElse(d, 0L) * 1000000L
        val l1 = (y + (HwDenom - 1) * l) / HwDenom
        b = ((l1 - l) + (HwDenom - 1) * b) / HwDenom
        l = l1
      }
      (t, hi, hi - lo + 1, l, b, l + HwHorizon * b)
    }
    rows.toDF("event_type", "last_day", "n_days", "level_micro",
      "trend_micro", "forecast_micro")
  }

  val holtForecastSql: String =
    s"""WITH RECURSIVE d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
      bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
      grid AS (SELECT t.event_type, g.day - b.lo AS idx,
            COALESCE(d.n, 0) * 1000000 AS y
          FROM (SELECT DISTINCT event_type FROM d) t
          CROSS JOIN bounds b
          CROSS JOIN LATERAL (SELECT unnest(range(b.lo, b.hi + 1)) AS day) g
          LEFT JOIN d ON d.event_type = t.event_type AND d.day = g.day),
      rec AS (
        SELECT event_type, idx, y AS l, CAST(0 AS BIGINT) AS b
          FROM grid WHERE idx = 0
        UNION ALL
        SELECT g.event_type, g.idx,
          (g.y + ${HwDenom - 1} * r.l) // $HwDenom,
          (((g.y + ${HwDenom - 1} * r.l) // $HwDenom - r.l) + ${HwDenom - 1} * r.b) // $HwDenom
        FROM rec r JOIN grid g
          ON g.event_type = r.event_type AND g.idx = r.idx + 1)
      SELECT r.event_type, b.hi AS last_day, b.hi - b.lo + 1 AS n_days,
        CAST(l AS BIGINT) AS level_micro, CAST(r.b AS BIGINT) AS trend_micro,
        CAST(l + $HwHorizon * r.b AS BIGINT) AS forecast_micro
      FROM rec r CROSS JOIN bounds b
      WHERE r.idx = b.hi - b.lo"""

  /** Event-lateness audit (q292): per event type, how out-of-order the
    * stream actually arrives — using event_id as the arrival-order
    * proxy (ids are assigned at ingest): an event is LATE if some
    * earlier-arriving event of the same user already carried a larger
    * event time, and its lateness is the gap to that running max. The
    * numbers that CHOOSE a watermark delay: `p95_late_us` is the delay
    * that keeps 95% of late events inside the watermark, `max_late_us`
    * what a lossless replay would need; every streaming op in this
    * engine (dupMonitor, scd2Monitor, sessions) takes that delay as its
    * contract.
    *
    * Scale shape: one user-keyed running-max window, then a (type,
    * lateness)-keyed count-of-counts rollup with a type-partitioned
    * cumulative window for the exact tie-aware p95 (the q235
    * discipline) — no global sort, no percentile UDAF. */
  def latenessAudit(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = ev.select(col("event_type"), col("user_id"), col("event_id"),
        expr("ts DIV 1000").as("t_us"))
      .withColumn("runmax", max("t_us").over(w))
      .withColumn("late_us",
        when(col("runmax") > col("t_us"), col("runmax") - col("t_us")).otherwise(0L))
    val levels = late.groupBy(col("event_type"), col("late_us"))
      .agg(count(lit(1)).as("cnt"))
    val cum = Window.partitionBy("event_type").orderBy("late_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    levels.withColumn("cum", sum("cnt").over(cum))
      .withColumn("n", sum("cnt").over(Window.partitionBy("event_type")))
      .groupBy("event_type").agg(
        max("n").as("n_events"),
        sum(when(col("late_us") > 0, col("cnt")).otherwise(0L)).as("n_late"),
        max(when(col("cnt") > 0, col("late_us"))).as("max_late_us"),
        min(when(expr("cum * 100 >= 95 * n"), col("late_us"))).as("p95_late_us"))
      .withColumn("late_micro", expr(
        "CAST((CAST(n_late AS DECIMAL(38,0)) * 1000000) div n_events AS BIGINT)"))
      .select("event_type", "n_events", "n_late", "max_late_us",
        "p95_late_us", "late_micro")
  }

  val latenessAuditSql: String =
    """WITH e AS (SELECT event_type, user_id, event_id, epoch_us(ts) AS t_us FROM events),
      l AS (SELECT event_type,
          CASE WHEN runmax > t_us THEN runmax - t_us ELSE 0 END AS late_us
        FROM (SELECT *, MAX(t_us) OVER (PARTITION BY user_id ORDER BY event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax FROM e)),
      lv AS (SELECT event_type, late_us, CAST(count(*) AS BIGINT) AS cnt
          FROM l GROUP BY 1, 2),
      c AS (SELECT *, SUM(cnt) OVER (PARTITION BY event_type ORDER BY late_us
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
            SUM(cnt) OVER (PARTITION BY event_type) AS n
          FROM lv)
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
        CAST(SUM(CASE WHEN late_us > 0 THEN cnt ELSE 0 END) AS BIGINT) AS n_late,
        CAST(MAX(CASE WHEN cnt > 0 THEN late_us END) AS BIGINT) AS max_late_us,
        CAST(MIN(CASE WHEN cum * 100 >= 95 * n THEN late_us END) AS BIGINT) AS p95_late_us,
        CAST((CAST(SUM(CASE WHEN late_us > 0 THEN cnt ELSE 0 END) AS HUGEINT) * 1000000)
          // MAX(n) AS BIGINT) AS late_micro
      FROM c GROUP BY event_type"""

  /** State-store sizing card (q295): for each of the engine's stateful
    * streaming operators, the key cardinality and entries-per-key this
    * corpus would hold — the memory-planning numbers that size a state
    * store BEFORE the stream starts. Completes the streaming-operations
    * planning trio: q292 chooses the watermark delay, q289 sizes the
    * connection pool, THIS sizes state. Keys and entry models follow
    * each operator's documented contract: the dup monitor keys
    * (user, type) and holds one entry per open (user, type, ts) group;
    * sessions and the funnel key by user with one record each; the SCD2
    * monitor keys by user and holds open/undecided days. Entries here
    * are corpus-wide totals — the watermark bounds the LIVE window, so
    * these are the conservative (replay-everything) ceilings.
    *
    * Scale shape: distinct counts via map-side-combined rollups (the
    * q290 single-aggregate discipline), one card row per operator,
    * cards union. */
  def stateSizingCard(ev: DataFrame): DataFrame = {
    val base = ev.select(col("user_id"), col("event_type"),
      expr("ts DIV 86400000000000").as("day"), col("ts"))
      .localCheckpoint() // four cards, one scan
    def card(op: String, keys: DataFrame, entries: DataFrame): DataFrame =
      keys.agg(count(lit(1)).as("n_keys"))
        .crossJoin(broadcast(entries.agg(count(lit(1)).as("n_entries"))))
        .select(lit(op).as("operator"), col("n_keys"), col("n_entries"))
    val users = base.select("user_id").distinct()
    val cards = Seq(
      card("dup_monitor",
        base.select("user_id", "event_type").distinct(),
        base.select("user_id", "event_type", "ts").distinct()),
      card("session_processor", users, users),
      card("scd2_monitor", users, base.select("user_id", "day").distinct()),
      card("funnel", users, users))
    cards.reduce(_ unionByName _)
      .withColumn("mean_entries_micro", expr(
        "CAST((CAST(n_entries AS DECIMAL(38,0)) * 1000000) div n_keys AS BIGINT)"))
      .select("operator", "n_keys", "n_entries", "mean_entries_micro")
  }

  val stateSizingCardSql: String =
    """WITH u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
      c AS (
        SELECT 'dup_monitor' AS operator,
          CAST(count(DISTINCT (user_id, event_type)) AS BIGINT) AS n_keys,
          CAST(count(DISTINCT (user_id, event_type, ts)) AS BIGINT) AS n_entries
        FROM events
        UNION ALL SELECT 'session_processor', n, n FROM u
        UNION ALL SELECT 'scd2_monitor', n,
          (SELECT CAST(count(DISTINCT (user_id, epoch_us(ts) // 86400000000)) AS BIGINT)
           FROM events) FROM u
        UNION ALL SELECT 'funnel', n, n FROM u)
      SELECT operator, n_keys, n_entries,
        CAST((CAST(n_entries AS HUGEINT) * 1000000) // n_keys AS BIGINT)
          AS mean_entries_micro
      FROM c"""

  val queries: Seq[QueryDef] = Seq(
    QueryDef("q295_state_sizing",
      (s, d) => stateSizingCard(events(s, d)), Some(stateSizingCardSql)),
    QueryDef("q292_lateness_audit",
      (s, d) => latenessAudit(events(s, d)), Some(latenessAuditSql)),
    QueryDef("q289_session_concurrency",
      (s, d) => sessionConcurrency(events(s, d)), Some(sessionConcurrencySql())),
    QueryDef("q291_holt_forecast",
      (s, d) => holtForecast(s, events(s, d)), Some(holtForecastSql)),
    QueryDef("q283_scd2_history",
      (s, d) => scd2History(events(s, d)), Some(scd2HistorySql)),
    QueryDef("q285_temporal_dim_join",
      (s, d) => temporalDimJoin(events(s, d)), Some(temporalDimJoinSql)),
    QueryDef("q287_experiment_readout",
      (s, d) => experimentReadout(events(s, d)), Some(experimentReadoutSql)),
    QueryDef("q272_transition_pagerank",
      (s, d) => transitionPagerank(events(s, d)),
      Some(transitionPagerankSql)),
    QueryDef("q273_l_diversity",
      (s, d) => lDiversityAudit(events(s, d)),
      Some(lDiversityAuditSql)),
    QueryDef("q205_suppressed_rfm",
      (s, d) => suppressSmallCells(rfmSegments(events(s, d)),
        Seq("r_seg", "f_seg", "m_seg"), "n_users", Seq("seg_cents")),
      Some(suppressedRfmSql())),

    QueryDef("q202_path_trigrams",
      (s, d) => pathTrigrams(events(s, d)),
      Some(pathTrigramsSql())),

    QueryDef("q214_transition_latency",
      (s, d) => transitionLatency(events(s, d)),
      Some(transitionLatencySql)),

    QueryDef("q199_rate_cusum",
      (s, d) => rateCusum(events(s, d)),
      Some(rateCusumSql)),

    QueryDef("q200_rfm_segments",
      (s, d) => rfmSegments(events(s, d)),
      Some(rfmSegmentsSql)),

    QueryDef("q78_funnel_stages",
      (s, d) => funnelStages(events(s, d)),
      Some(funnelStagesSql)),

    QueryDef("q80_value_outliers",
      (s, d) => valueOutliers(events(s, d)),
      Some(valueOutliersSql())),

    QueryDef("q150_attribution",
      (s, d) => attribution(events(s, d)),
      Some(attributionSql)),

    QueryDef("q192_attribution_models",
      (s, d) => attributionModels(events(s, d)),
      Some(attributionModelsSql)),

    QueryDef("q193_activity_concentration",
      (s, d) => activityConcentration(events(s, d)),
      Some(activityConcentrationSql)),

    QueryDef("q151_mad_outliers",
      (s, d) => madOutliers(events(s, d)),
      Some(madOutliersSql())),

    QueryDef("q81_session_patterns",
      (s, d) => sessionPatterns(events(s, d), PatternGapSec, "v.*c.*p"),
      Some(sessionPatternsSql(PatternGapSec, "v.*c.*p"))),

    QueryDef("q84_retention",
      (s, d) => retention(events(s, d)),
      Some(retentionSql)),

    QueryDef("q176_engagement",
      (s, d) => engagement(events(s, d)),
      Some(engagementSql)),

    QueryDef("q180_rate_spikes",
      (s, d) => rateSpikes(events(s, d)),
      Some(rateSpikesSql())),

    QueryDef("q186_burstiness",
      (s, d) => burstiness(events(s, d)),
      Some(burstinessSql)),

    QueryDef("q187_session_type_pmi",
      (s, d) => sessionTypePmi(events(s, d)),
      Some(sessionTypePmiSql())),

    QueryDef("q181_conversion_latency",
      (s, d) => conversionLatency(events(s, d)),
      Some(conversionLatencySql)),

    QueryDef("q182_hourly_seasonality",
      (s, d) => hourlySeasonality(events(s, d)),
      Some(hourlySeasonalitySql)),

    QueryDef("q219_seasonal_anomalies",
      (s, d) => seasonalityAnomalies(events(s, d)),
      Some(seasonalityAnomaliesSql)),

    QueryDef("q225_weekly_mix_drift",
      (s, d) => weeklyMixDrift(events(s, d)),
      Some(weeklyMixDriftSql)),

    QueryDef("q226_rate_autocorrelation",
      (s, d) => rateAutocorrelation(events(s, d)),
      Some(rateAutocorrelationSql)),

    QueryDef("q229_markov_baseline",
      (s, d) => markovBaseline(events(s, d)),
      Some(markovBaselineSql())),

    QueryDef("q293_twa_bars",
      (s, d) => graft.tebis.Datapoints.twaBars(asSeries(events(s, d)), 3600000L)
        .select(col("externalId").cast("long").as("user_id"), col("bucketTs"),
          col("held_ms"), col("twa_cents_micro")),
      Some(graft.tebis.Datapoints.twaBarsSql(3600000L,
        """pts AS (SELECT CAST(user_id AS VARCHAR) AS externalId,
            epoch_ms(ts) AS timestampMs, value FROM events)""",
        idSelect = "CAST(externalId AS BIGINT) AS user_id"))),

    QueryDef("q231_ohlc_bars",
      (s, d) => graft.tebis.Datapoints.ohlcBars(asSeries(events(s, d)), 3600000L)
        .select(col("externalId").cast("long").as("user_id"), col("bucketTs"),
          col("n"), col("low"), col("high"), col("open"), col("close")),
      // open/close via first_value/last_value over the same (t_ms, value)
      // total order the engine's min_by/max_by struct key encodes
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS t_ms, value FROM events),
        b AS (SELECT user_id, (t_ms // 3600000) * 3600000 AS bucketTs, t_ms, value FROM e),
        w AS (SELECT *,
                first_value(value) OVER (PARTITION BY user_id, bucketTs
                  ORDER BY t_ms, value) AS o,
                last_value(value) OVER (PARTITION BY user_id, bucketTs
                  ORDER BY t_ms, value
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS c
              FROM b)
        SELECT user_id, bucketTs, CAST(count(*) AS BIGINT) AS n,
          MIN(value) AS low, MAX(value) AS high, MIN(o) AS open, MIN(c) AS close
        FROM w GROUP BY 1, 2""")),

    QueryDef("q232_benford_audit",
      (s, d) => benfordAudit(events(s, d)),
      Some(benfordAuditSql)),

    QueryDef("q235_session_sizes",
      (s, d) => sessionSizes(events(s, d)),
      Some(sessionSizesSql())),

    QueryDef("q238_cohort_funnel",
      (s, d) => cohortFunnel(events(s, d)),
      Some(cohortFunnelSql)),

    QueryDef("q244_equidepth_bounds",
      (s, d) => equiDepthBoundaries(events(s, d)),
      Some(equiDepthBoundariesSql())),

    QueryDef("q247_duplicate_events",
      (s, d) => {
        val ev = events(s, d)
        duplicateEvents(ev.unionAll(ev.filter(expr("event_id % 13 = 0"))))
      },
      Some(duplicateEventsSql)),

    QueryDef("q236_entry_exit_types",
      (s, d) => entryExitTypes(events(s, d)),
      Some(entryExitTypesSql())),

    QueryDef("q177_cohort_ltv",
      (s, d) => cohortLtv(events(s, d)),
      Some(cohortLtvSql)),

    QueryDef("q25_resample_events",
      (s, d) => graft.tebis.Datapoints.resample(asSeries(events(s, d)), 3600000L)
        .select(col("externalId").cast("long").as("user_id"), col("gridTs"), col("value")),
      // ceil via `q + (r > 0)` (truncating division), sign-correct —
      // mirrors Datapoints.resample exactly
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS t_ms, value FROM events),
        l AS (SELECT user_id, t_ms, value,
                lead(t_ms) OVER (PARTITION BY user_id ORDER BY t_ms, value) AS next_ms
              FROM e),
        b AS (SELECT user_id, value,
                (t_ms // 3600000 + (CASE WHEN t_ms % 3600000 > 0 THEN 1 ELSE 0 END)) * 3600000 AS slot0,
                CASE WHEN next_ms IS NULL THEN (t_ms // 3600000 + (CASE WHEN t_ms % 3600000 > 0 THEN 1 ELSE 0 END)) * 3600000
                     ELSE (next_ms // 3600000 + (CASE WHEN next_ms % 3600000 > 0 THEN 1 ELSE 0 END)) * 3600000 - 3600000 END AS slotN
              FROM l)
        SELECT user_id, unnest(range(slot0, slotN + 1, 3600000)) AS gridTs, value
        FROM b WHERE slot0 <= slotN""")),

    QueryDef("q26_event_gaps",
      (s, d) => graft.tebis.Datapoints.gaps(asSeries(events(s, d)), 3600000L)
        .select(col("externalId").cast("long").as("user_id"),
          col("gap_start"), col("gap_end"), col("gap_ms")),
      Some("""SELECT user_id, gap_start, gap_end, gap_ms FROM (
          SELECT user_id, lag(epoch_ms(ts)) OVER w AS gap_start,
            epoch_ms(ts) AS gap_end,
            epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms
          FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))
        ) WHERE gap_start IS NOT NULL AND gap_ms > 3600000""")),

    QueryDef("q168_series_derivative",
      (s, d) => graft.tebis.Datapoints.derivative(asSeries(events(s, d)))
        .select(col("externalId").cast("long").as("user_id"),
          col("timestampMs").as("ts"), col("rate_per_s")),
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS t_ms, value FROM events),
        l AS (SELECT user_id, t_ms, value,
                lag(t_ms) OVER w AS p_ms, lag(value) OVER w AS p_v
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, value))
        SELECT user_id, t_ms AS ts,
          (value - p_v) * 1000.0 / CAST(t_ms - p_ms AS DOUBLE) AS rate_per_s
        FROM l WHERE p_ms IS NOT NULL AND t_ms > p_ms""")),

    QueryDef("q169_series_rolling_mean",
      (s, d) => graft.tebis.Datapoints.rollingMean(asSeries(events(s, d)))
        .select(col("externalId").cast("long").as("user_id"),
          col("timestampMs").as("ts"), col("n_in_frame"), col("mean_v")),
      Some("""WITH e AS (SELECT user_id, epoch_ms(ts) AS t_ms, value FROM events)
        SELECT user_id, t_ms AS ts,
          CAST(COUNT(*) OVER w AS BIGINT) AS n_in_frame,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
            / CAST(COUNT(*) OVER w AS DOUBLE) AS mean_v
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_ms, value
          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""")),

    QueryDef("q18_events_json",
      (s, d) => events(s, d)
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n")),
      // CAST the outer SUM: DuckDB's SUM(BIGINT) yields HUGEINT (int128)
      // while Spark's sum(LongType) is LONG — uncast, the hash gate fails
      // on type alone even when every value agrees.
      Some("""SELECT event_type,
        CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        count(*) AS n FROM events GROUP BY event_type""")),

    QueryDef("q19_tumbling_1h",
      (s, d) => tumbling(events(s, d), 3600L),
      Some(s"""SELECT ((epoch_us(ts) // 1000000 // 3600) * 3600) AS ws, event_type,
        count(*) AS n, ${dsumSql("value")} AS sum_value
        FROM events GROUP BY 1, 2""")),

    QueryDef("q20_sliding_1h_15m",
      (s, d) => sliding(events(s, d), 3600L, 900L),
      Some(s"""SELECT ((((epoch_us(ts) // 1000000) - k * 900) // 3600) * 3600) + k * 900 AS ws,
        count(*) AS n, ${dsumSql("value")} AS sum_value
        FROM events, range(0, 4) t(k) GROUP BY 1""")),

    QueryDef("q21_sessionize_30m",
      (s, d) => sessionize(events(s, d), 1800L),
      Some(s"""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t_us, value FROM events),
        f AS (SELECT *, CASE WHEN lag(t_us) OVER w IS NULL OR t_us - lag(t_us) OVER w > 1800000000
                THEN 1 ELSE 0 END AS new_sess
              FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        g AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq FROM f)
        SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq,
          MIN(t_us // 1000000) AS session_start, MAX(t_us // 1000000) AS session_end,
          count(*) AS n_events, ${dsumSql("value")} AS sum_value
        FROM g GROUP BY user_id, sess_seq""")),

    QueryDef("q166_session_transitions",
      (s, d) => sessionTransitions(events(s, d)),
      Some(sessionTransitionsSql())),

    QueryDef("q22_asof_purchase_click",
      (s, d) => asofJoin(events(s, d), "purchase", "click"),
      Some("""SELECT p.event_id AS left_event_id, p.user_id, epoch_us(p.ts) AS left_t_us,
          l.right_t_us, l.right_event_id
        FROM events p LEFT JOIN LATERAL (
          SELECT c.event_id AS right_event_id, epoch_us(c.ts) AS right_t_us
          FROM events c
          WHERE c.event_type = 'click' AND c.user_id = p.user_id AND epoch_us(c.ts) < epoch_us(p.ts)
          ORDER BY epoch_us(c.ts) DESC, c.event_id DESC LIMIT 1) l ON true
        WHERE p.event_type = 'purchase'""")),

    // Range join, banded: the oracle states the RANGE predicate directly
    // (DuckDB plans it as an IEJoin); the Spark side is the banding
    // rewrite above — same rows, equi-join shape.
    QueryDef("q55_proximity_pairs",
      (s, d) => proximityPairs(events(s, d), 300L),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events)
        SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id, b.t_us - a.t_us AS dt_us
        FROM e a JOIN e b ON a.user_id = b.user_id
          AND b.t_us - a.t_us BETWEEN 0 AND 300000000
          AND (a.t_us < b.t_us OR (a.t_us = b.t_us AND a.event_id < b.event_id))""")),

    // Same band-join semantics stated NAIVELY — the optimizer rule, not
    // hand banding, produces the equi-join plan (gated in PlanSpec).
    QueryDef("q63_range_join_auto",
      (s, d) => rangeJoinAuto(s, d, 1800L),
      Some("""WITH p AS (SELECT event_id AS purchase_id, epoch_us(ts) AS pt_us
                FROM events WHERE event_type = 'purchase'),
             c AS (SELECT event_id AS click_id, epoch_us(ts) AS ct_us
                FROM events WHERE event_type = 'click')
        SELECT purchase_id, click_id, ct_us - pt_us AS dt_us
        FROM p JOIN c ON ct_us > pt_us AND ct_us <= pt_us + 1800000000""")),

    // Spark 4 VARIANT path: props parses to a binary variant ONCE per row
    // and typed extraction happens on the encoded form — at scale the
    // variant column shuffles/aggregates as compact binary, the modern
    // alternative to repeated get_json_object string re-parsing (q18).
    // try_variant_get returns NULL (not an error) on path/type misses,
    // matching json_extract_string + CAST semantics in the oracle.
    QueryDef("q67_events_variant",
      (s, d) => events(s, d)
        .select(col("event_type"),
          expr("try_variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .groupBy("event_type")
        .agg(min("k").as("min_k"), max("k").as("max_k"), count(col("k")).as("n_k")),
      Some("""SELECT event_type,
          min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
          max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
          count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_k
        FROM events GROUP BY event_type""")),

    QueryDef("q65_trailing_range_window",
      (s, d) => trailingWindow(events(s, d), 3600L),
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t_us, value FROM events)
        SELECT event_id, user_id, t_us,
          count(*) OVER w AS n_win,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_win
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""")),

    // The HLL estimate can't hash-match DuckDB (different register
    // hashing), so the query is SELF-EVIDENCING: exact distinct count +
    // an integer-exact in-bound flag derived from the sketch
    // (|est − exact|·50 ≤ exact, i.e. within 2% — the OpsSpec bound),
    // with the oracle computing its exact side and TRUE. All output
    // columns hash-match; the estimate stays engine-local. The bare
    // sketch op remains [[approxDistinctUsers]] (the scale path — exact
    // countDistinct here is the verification harness, not the operator).
    QueryDef("q70_approx_distinct_hll",
      (s, d) => events(s, d).groupBy("event_type")
        .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"),
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n_rows"))
        .select(col("event_type"), col("exact_users"), col("n_rows"),
          (abs(col("est") - col("exact_users")) * 50 <= col("exact_users"))
            .as("hll_in_bound")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
          count(*) AS n_rows, TRUE AS hll_in_bound
        FROM events GROUP BY event_type"""))
  )
}
