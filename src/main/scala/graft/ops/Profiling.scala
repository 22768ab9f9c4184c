package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef.t

/** Table-profiling operators — the data-catalog layer of the pipeline
  * (per-column statistics, join-key skew diagnosis).
  *
  * The reference pipeline profiles nothing (it posts whatever the CSVs
  * contain), so this family is ★ extension: the cards a 100 TB ingest
  * computes FIRST, because every later plan choice — broadcast vs
  * shuffle, salting, AQE skew thresholds, partition counts — reads off
  * these numbers.
  */
object Profiling {

  /** Table access that is safe STANDALONE: the events table ships as
    * nanosecond-timestamp parquet, which Spark refuses to read unless
    * `spark.sql.legacy.parquet.nanosAsLong` is set — [[EventOps.events]]
    * owns that conf (and the UTC pin). Reading it via a bare parquet
    * scan here only worked when an EventOps query had already run in
    * the session; a standalone q282/q290 run failed on
    * PARQUET_TYPE_ILLEGAL. Session-order independence is part of the
    * library contract, so events route through the owning accessor. */
  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") EventOps.events(spark, dir) else t(spark, dir, name)

  /** Columns profiled by q281 — types with an engine-portable exact
    * min/max rendering (int64 → decimal string; timestamp → pinned
    * format; strings verbatim). Doubles are profiled by the dedicated
    * numeric ops (q79/q151/q223); their min/max string forms are not
    * portable across engines. */
  val ProfileCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "long", "l_partkey" -> "long", "l_linenumber" -> "long",
    "l_returnflag" -> "string", "l_linestatus" -> "string",
    "l_shipdate" -> "ts")

  /** Per-column profile card over `lineitem` (q281): rows, nulls, exact
    * distinct count, min and max in a pinned string rendering — the
    * generic "column statistics" pass a catalog stores and an optimizer
    * reads (NDVs drive join-order and broadcast decisions; min/max are
    * the zone-map bounds).
    *
    * Scale shape — measured, not assumed: the obvious one-pass form
    * (every `countDistinct` on one aggregate node) makes Catalyst
    * EXPAND the scan once per distinct column — a 7x row multiplication
    * through a single hash aggregate, 276 s at 100x. This form instead
    * pays ONE cheap scan for the additive stats (nulls/min/max partial-
    * agg perfectly) and gives each NDV its own column-pruned
    * groupBy-then-count rollup — map-side partials absorb the volume,
    * the second stage is NDV-bounded, and the branches run as
    * independent stages: 28.0 s at 100x (9.9x). The 6 card rows then
    * assemble by a broadcast join. On a real 100 TB table the exact
    * NDVs become HLL sketches (q70's op); the card's shape is
    * unchanged. */
  def columnProfile(li: DataFrame): DataFrame = {
    // r13: measured WITHOUT profileSrc on purpose — the NDV branches hash
    // native ints/strings (no md5 head), and the paired A/B read the
    // spread variant at 1.94x SLOWER (0.75 -> 1.45 s): the repartition tax
    // exceeds the win when per-row work is cheap. The spread stays on the
    // md5-bearing KMV twin (q299) only.
    val base = profileBase(li)
    exactNdvs(li).join(broadcast(base), "col_name")
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
  }

  /** The shared profiled-column source, spread across the cluster when it
    * arrives as an unsplittable single task (r13, guide §2.5): the sf
    * tables are single-row-group parquet, so every per-row hash/partial-
    * aggregate head below the first exchange otherwise runs on ONE core
    * (q299 measured parallelism 1.0 at local[32], 96% of task time in the
    * md5 stage). All six NDV branches and the additive card read this one
    * frame, so the repartition exchange is planned once and reused. At
    * scale the guard is a no-op — thousands of scan splits already
    * exceed defaultParallelism and no shuffle is added. */
  private def profileSrc(li: DataFrame): DataFrame =
    QueryDef.spreadIfNarrow(li.select(ProfileCols.map(c => col(c._1)): _*))

  /** Exact per-column NDVs, one column-pruned groupBy-then-count rollup
    * each (see [[columnProfile]]'s scale note) — shared by the exact
    * card and the q301 tolerance gate.
    *
    * NDV convention (suite-wide): NULL is NOT a distinct value — the
    * count(DISTINCT c) semantics both engines agree on once the NULL
    * group is filtered BEFORE the rollup (Spark's groupBy would keep
    * it; nulls are already reported separately as n_nulls). */
  private def exactNdvs(li: DataFrame): DataFrame =
    ProfileCols.map { case (c, _) =>
      li.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(count(lit(1)))
        .agg(count(lit(1)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
    }.reduce(_ unionByName _)

  /** The additive half of the profile card — rows/nulls/min/max in ONE
    * perfectly-partial-aggregating scan, unpivoted to a row per column.
    * Shared by the exact (q281) and sketch (q299) NDV twins. */
  private def profileBase(li: DataFrame): DataFrame = {
    def render(c: String, kind: String, f: Column => Column): Column = kind match {
      case "ts" => date_format(f(col(c)), "yyyy-MM-dd HH:mm:ss")
      case _    => f(col(c)).cast("string")
    }
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: ProfileCols.flatMap {
      case (c, kind) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        render(c, kind, min).as(s"${c}_min"),
        render(c, kind, max).as(s"${c}_max"))
    }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    val stackArgs = ProfileCols.map { case (c, _) =>
      s"'$c', ${c}_nulls, ${c}_min, ${c}_max"
    }.mkString(", ")
    wide.select(col("n_rows"), expr(
      s"stack(${ProfileCols.size}, $stackArgs) AS (col_name, n_nulls, min_str, max_str)"))
  }

  /** The pinned cross-engine string rendering of a profiled column — the
    * value the KMV sketches hash, identical in Spark and DuckDB. */
  private def renderSqlSpark(c: String, kind: String): String = kind match {
    case "ts" => s"date_format($c, 'yyyy-MM-dd HH:mm:ss')"
    case _    => s"CAST($c AS STRING)"
  }
  private def renderSqlDuck(c: String, kind: String): String = kind match {
    case "ts" => s"strftime($c, '%Y-%m-%d %H:%M:%S')"
    case _    => s"CAST($c AS VARCHAR)"
  }

  /** Sketch-backed column profile (q299): q281's card with the exact
    * NDV replaced by the KMV estimate ([[Corpus.KmvK]]-minimum md5
    * hashes — q230/q234's machinery). This is the 100 TB monitoring
    * form q281's scaladoc promises: the exact card pays one
    * groupBy-then-count rollup PER COLUMN (NDV-bounded but
    * full-key-shuffled — 285 s at 1000x); this card pays ONE scan whose
    * unpivoted hash stream feeds per-column KMV aggregators, so the
    * exchange carries `cols × k` longs at ANY table size, and sketches
    * from different shards merge losslessly (k-min of union). The md5
    * draw means both engines build the IDENTICAL sketch — the estimate
    * hash-matches the DuckDB oracle, making this a fully gated entry,
    * not a rows-only one. NDV convention matches q281: NULLs drop out
    * (md5 of NULL is NULL). The exact form stays the release gate; this
    * is the every-ingest card. */
  def columnProfileKmv(li: DataFrame, k: Int = Corpus.KmvK): DataFrame = {
    val src = profileSrc(li) // r13: parallelize the rows×cols md5 head
    val base = profileBase(src)
    val kmv = graft.functions.KmvSketch.sketch(k)
    val hashStack = ProfileCols.map { case (c, kind) =>
      s"'$c', CAST(conv(substr(md5(${renderSqlSpark(c, kind)}), 1, 15), 16, 10) AS BIGINT)"
    }.mkString(", ")
    val ndvs = src
      .select(expr(s"stack(${ProfileCols.size}, $hashStack) AS (col_name, h)"))
      .filter(col("h").isNotNull)
      .groupBy("col_name").agg(kmv(col("h")).as("sk"))
      .select(col("col_name"), size(col("sk")).cast("long").as("n_kept"),
        expr("element_at(sk, -1)").as("kth_hash"))
      .withColumn("n_distinct_est", expr(
        s"CASE WHEN n_kept < $k THEN n_kept ELSE " +
          s"CAST(((CAST(n_kept AS DECIMAL(38,0)) - 1) * 1152921504606846976) div kth_hash AS BIGINT) END"))
    ndvs.join(broadcast(base), "col_name")
      .select("col_name", "n_rows", "n_nulls", "n_distinct_est",
        "min_str", "max_str")
  }

  def columnProfileKmvSql(k: Int = Corpus.KmvK): String = {
    val branches = ProfileCols.map { case (c, kind) =>
      val (mn, mx) = kind match {
        case "ts" => (s"strftime(MIN($c), '%Y-%m-%d %H:%M:%S')",
          s"strftime(MAX($c), '%Y-%m-%d %H:%M:%S')")
        case _ => (s"CAST(MIN($c) AS VARCHAR)", s"CAST(MAX($c) AS VARCHAR)")
      }
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
          (SELECT CASE WHEN count(*) < $k THEN CAST(count(*) AS BIGINT)
              ELSE CAST(((CAST(count(*) AS HUGEINT) - 1) * 1152921504606846976)
                // MAX(h) AS BIGINT) END
            FROM (SELECT h FROM (
                SELECT DISTINCT CAST(('0x' || substr(md5(${renderSqlDuck(c, kind)}), 1, 15)) AS BIGINT) AS h
                FROM lineitem WHERE $c IS NOT NULL)
              ORDER BY h LIMIT $k)) AS n_distinct_est,
          $mn AS min_str, $mx AS max_str FROM lineitem"""
    }
    branches.mkString("\n      UNION ALL\n      ")
  }

  val columnProfileSql: String = {
    val branches = ProfileCols.map { case (c, kind) =>
      val (mn, mx) = kind match {
        case "ts" => (s"strftime(MIN($c), '%Y-%m-%d %H:%M:%S')",
          s"strftime(MAX($c), '%Y-%m-%d %H:%M:%S')")
        case _ => (s"CAST(MIN($c) AS VARCHAR)", s"CAST(MAX($c) AS VARCHAR)")
      }
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
          CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
          $mn AS min_str, $mx AS max_str FROM lineitem"""
    }
    branches.mkString("\n      UNION ALL\n      ")
  }

  /** Keys profiled by q282: (card label, table, key expression). */
  val SkewKeys: Seq[(String, String, String)] = Seq(
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
    ("documents.source", "documents", "source"))

  /** Join-key skew profiler (q282): per candidate join key — total rows,
    * distinct keys, the heaviest key's row count and identity, and the
    * exact micro skew factor (max over mean rows-per-key). The number
    * that decides salting (`ops/SkewJoin`) and the AQE skew-join
    * threshold BEFORE the join runs; a skew factor near 1e6 means
    * uniform, 100e6 means one key carries 100x its share.
    *
    * Scale shape: per key, one map-side-combined (key) rollup, then an
    * all-to-one rollup of ROLLUP rows (key cardinality, not table
    * cardinality), with the heaviest key recovered by a broadcast-size
    * max-match join — never a sort. Cards union; each table is scanned
    * once reading only its key column. */
  def keySkewProfile(spark: SparkSession, dir: String): DataFrame = {
    val cards = SkewKeys.map { case (label, table, key) =>
      val df = tbl(spark, dir, table)
      val typed = df.schema(key).dataType match {
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType => true
        case _ => false
      }
      keySkewCard(df, label, key, typed = typed)
    }
    cards.reduce(_ unionByName _)
      .withColumn("skew_micro", expr(
        "CAST((CAST(max_rows AS DECIMAL(38,0)) * n_keys * 1000000) div n_rows AS BIGINT)"))
      .select("key_name", "n_rows", "n_keys", "max_rows", "top_key", "skew_micro")
  }

  /** One skew card. `typed = true` keeps an integral key NATIVE through
    * the dominant groupBy exchange — the 1000x campaign measured the
    * generic all-keys-as-STRING form at 222.8 s with the 8-byte keys
    * inflated to decimal strings through 750M-row shuffles ("the price
    * of genericity", SCALE.md); the card's OUTPUT is unchanged because
    * the string rendering moves to the key-cardinality-sized argmax
    * step. Row-identity with the generic form is exact: integers render
    * injectively, and BOTH forms break max-count ties by the MINIMUM
    * STRING rendering (the typed path casts the tie candidates — a
    * handful of rows — before taking min), spec-locked in
    * ProfilingSpec including a 9-vs-10 tie fixture where numeric and
    * lexicographic min diverge. */
  private[graft] def keySkewCard(df: DataFrame, label: String, key: String,
      typed: Boolean): DataFrame = {
    val keyCol = if (typed) col(key) else col(key).cast("string")
    val kc = df.select(keyCol.as("k"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .localCheckpoint() // feeds the card rollup AND the argmax probe
    val card = kc.agg(
      sum("n").as("n_rows"), count(lit(1)).as("n_keys"), max("n").as("max_rows"))
    val top = kc.join(broadcast(card.select("max_rows")),
        col("n") === col("max_rows"))
      .agg(min(col("k").cast("string")).as("top_key"))
    card.crossJoin(top)
      .select(lit(label).as("key_name"), col("n_rows"), col("n_keys"),
        col("max_rows"), col("top_key"))
  }

  val keySkewProfileSql: String = {
    val branches = SkewKeys.map { case (label, table, key) =>
      s"""SELECT '$label' AS key_name, n_rows, n_keys, max_rows, top_key,
          CAST((CAST(max_rows AS HUGEINT) * n_keys * 1000000) // n_rows AS BIGINT)
            AS skew_micro
        FROM (
          SELECT CAST(SUM(n) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
            CAST(MAX(n) AS BIGINT) AS max_rows,
            MIN(CASE WHEN is_max THEN k END) AS top_key
          FROM (SELECT k, n, n = MAX(n) OVER () AS is_max
                FROM (SELECT CAST($key AS VARCHAR) AS k,
                        CAST(count(*) AS BIGINT) AS n
                      FROM $table GROUP BY 1)))"""
    }
    branches.mkString("\n      UNION ALL\n      ")
  }

  /** Candidate functional dependencies audited by q290:
    * (label, table, lhs, rhs). Mixed true/false candidates on purpose —
    * the card must separate them. */
  val FdCandidates: Seq[(String, String, String, String)] = Seq(
    ("orders: o_orderkey -> o_custkey", "orders", "o_orderkey", "o_custkey"),
    ("lineitem: l_orderkey -> l_partkey", "lineitem", "l_orderkey", "l_partkey"),
    ("events: user_id -> event_type", "events", "user_id", "event_type"),
    ("documents: source -> lang", "documents", "source", "lang"),
    ("nation: n_nationkey -> n_regionkey", "nation", "n_nationkey", "n_regionkey"))

  /** Functional-dependency audit (q290): for each candidate FD
    * `lhs -> rhs`, the share of LHS keys bound to MORE than one distinct
    * RHS value — 0 means the dependency holds and the schema can rely
    * on it (join elimination, normalization, dedup keys); the
    * profiling-family sibling of q281 (per-column stats) and q282
    * (per-key skew): per-RELATIONSHIP structure.
    *
    * Scale shape: per FD one `groupBy(lhs).agg(countDistinct(rhs))` —
    * Catalyst plans the SINGLE distinct as a two-phase partial-distinct
    * aggregate with no Expand, and the A/B against the explicit
    * distinct-pairs-then-regroup form measured 8.8 s vs 11.9 s at 100x
    * (`local[32]`): one logical aggregate beats two when the planner
    * can see the distinct. Then one 1-row card per FD; cards union. */
  /** One FD card over an explicit frame — the unit [[fdAudit]] unions.
    * NULL convention (both engines): a NULL rhs is NOT a distinct value
    * (countDistinct skips it; an all-NULL key scores n_rhs = 0 and never
    * violates), while a NULL lhs IS a key (groupBy keeps the group) —
    * the count(DISTINCT)/GROUP BY semantics, spec'd on a null-bearing
    * fixture in ProfilingNullSpec. */
  private[graft] def fdCard(df: DataFrame, label: String, lhs: String,
      rhs: String): DataFrame =
    // r13: spread variant measured 1.12x SLOWER (paired) — the partial
    // distinct hashes native pairs; left un-spread like q281
    df.groupBy(col(lhs).as("l")).agg(countDistinct(col(rhs)).as("n_rhs"))
      .agg(count(lit(1)).as("n_keys"),
        expr("CAST(count_if(n_rhs > 1) AS BIGINT)").as("n_violating"),
        max("n_rhs").as("max_rhs"))
      .select(lit(label).as("fd"), col("n_keys"), col("n_violating"),
        col("max_rhs"))

  def fdAudit(spark: SparkSession, dir: String): DataFrame = {
    val cards = FdCandidates.map { case (label, table, lhs, rhs) =>
      fdCard(tbl(spark, dir, table), label, lhs, rhs)
    }
    cards.reduce(_ unionByName _)
      .withColumn("violation_micro", expr(
        "CAST((CAST(n_violating AS DECIMAL(38,0)) * 1000000) div n_keys AS BIGINT)"))
      .withColumn("holds", col("n_violating") === 0L)
      .select("fd", "n_keys", "n_violating", "max_rhs", "violation_micro", "holds")
  }

  val fdAuditSql: String = {
    val branches = FdCandidates.map { case (label, table, lhs, rhs) =>
      s"""SELECT '$label' AS fd, n_keys, n_violating, max_rhs,
          CAST((CAST(n_violating AS HUGEINT) * 1000000) // n_keys AS BIGINT)
            AS violation_micro,
          n_violating = 0 AS holds
        FROM (SELECT CAST(count(*) AS BIGINT) AS n_keys,
            CAST(count(*) FILTER (n_rhs > 1) AS BIGINT) AS n_violating,
            CAST(MAX(n_rhs) AS BIGINT) AS max_rhs
          FROM (SELECT l, CAST(count(r) AS BIGINT) AS n_rhs
                FROM (SELECT DISTINCT $lhs AS l, $rhs AS r FROM $table)
                GROUP BY 1))"""
    }
    branches.mkString("\n      UNION ALL\n      ")
  }

  /** HLL relative standard deviation for the fast cards — 2%, tight
    * enough that a 4-sigma spec tolerance is still well inside the
    * exact-vs-estimate gap a planner cares about. */
  val HllRsd = 0.02

  /** "holds" tolerance for an HLL FD card at a given rsd: 4·rsd·√2 in
    * micro — four standard errors of the DIFFERENCE of two rsd-relative
    * estimates. Derived from the ARGUMENT, not a constant, so a caller
    * profiling at a different precision gets a matched verdict
    * threshold (r10 ADVICE: the fixed constant silently mismatched
    * non-default rsd). */
  def hllFdTolMicro(rsd: Double): Long = math.round(4 * rsd * math.sqrt(2) * 1e6)

  /** The default-rsd tolerance, kept for spec readability. */
  val HllFdTolMicro: Long = hllFdTolMicro(HllRsd)

  /** Fast column profile (q301): q281's card with HLL NDV estimates
    * (`approx_count_distinct`, the q70 discipline) folded into the SAME
    * single wide aggregate as the additive stats — ONE codegen'd scan,
    * ZERO extra passes, a fixed-size buffer per column that partial-
    * aggregates and merges like any counter. This is the form whose
    * 100 TB story needs no caveat: the exact card pays one full-key
    * rollup per column (285.1 s at 1000x), the md5-KMV card pays the
    * cross-engine hash tax (1267.7 s — q299 is the HASH-GATED twin, not
    * the fast path), a stacked xxhash64-KMV form pays the udaf
    * encoder boundary on cols×rows inputs (392.5 s, measured and
    * rejected) — while this card's marginal cost over just READING the
    * six columns is a few HLL updates per row. Engine-local estimates
    * ⇒ rows-only driver check + the spec's tolerance lock against the
    * exact NDVs. Deployments gate releases on q281, monitor every
    * ingest with this. */
  def columnProfileHll(li: DataFrame, rsd: Double = HllRsd): DataFrame = {
    def render(c: String, kind: String, f: Column => Column): Column = kind match {
      case "ts" => date_format(f(col(c)), "yyyy-MM-dd HH:mm:ss")
      case _    => f(col(c)).cast("string")
    }
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: ProfileCols.flatMap {
      case (c, kind) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        render(c, kind, min).as(s"${c}_min"),
        render(c, kind, max).as(s"${c}_max"),
        approx_count_distinct(col(c), rsd).as(s"${c}_ndv"))
    }
    val wide = li.agg(aggs.head, aggs.tail: _*)
    val stackArgs = ProfileCols.map { case (c, _) =>
      s"'$c', ${c}_nulls, ${c}_ndv, ${c}_min, ${c}_max"
    }.mkString(", ")
    wide.select(col("n_rows"), expr(
      s"stack(${ProfileCols.size}, $stackArgs) " +
        "AS (col_name, n_nulls, n_distinct_est, min_str, max_str)"))
      .select("col_name", "n_rows", "n_nulls", "n_distinct_est",
        "min_str", "max_str")
  }

  /** Fast FD audit (q302): the NDV(lhs) == NDV(lhs, rhs) identity on
    * two HLL estimates per candidate — ONE codegen'd scan per table,
    * fixed-size buffers, vs the exact audit's five full-key distinct
    * shuffles (576.0 s at 1000x). NULL convention matches the KMV twin:
    * null-bearing rows drop from both estimates
    * (`approx_count_distinct` skips NULL inputs; the pair side nulls
    * itself when either field is NULL). Rows-only gate + spec lock
    * (verdicts agree with the exact audit). */
  /** One spread (lhs, rhs) source per FD candidate — shared by the HLL
    * and exact branches so each table is repartitioned once and the
    * identical exchange is reused across branches (r13, guide §2.4/§2.5). */
  private def fdSrcs(spark: SparkSession, dir: String): Seq[(String, DataFrame, String, String)] =
    FdCandidates.map { case (label, table, lhs, rhs) =>
      (label,
        QueryDef.spreadIfNarrow(tbl(spark, dir, table).select(col(lhs), col(rhs))),
        lhs, rhs)
    }

  def fdAuditHll(spark: SparkSession, dir: String,
      rsd: Double = HllRsd): DataFrame = fdAuditHllOn(fdSrcs(spark, dir), rsd)

  private def fdAuditHllOn(srcs: Seq[(String, DataFrame, String, String)],
      rsd: Double): DataFrame = {
    val cards = srcs.map { case (label, src, lhs, rhs) =>
      src
        .agg(
          approx_count_distinct(col(lhs), rsd).as("n_keys_est"),
          approx_count_distinct(
            when(col(lhs).isNotNull && col(rhs).isNotNull,
              pairFingerprint(col(lhs), col(rhs))),
            rsd).as("n_pairs_est"))
        .select(lit(label).as("fd"), col("n_keys_est"), col("n_pairs_est"))
    }
    cards.reduce(_ unionByName _)
      .withColumn("excess_est", greatest(col("n_pairs_est") - col("n_keys_est"), lit(0L)))
      // degenerate-table guard (r10 ADVICE): an empty or all-NULL lhs
      // estimates n_keys_est = 0; the division would yield NULL in Spark
      // and diverge from the oracle's integer-div semantics, so a keyless
      // candidate reads excess 0 / holds (vacuously true)
      .withColumn("excess_micro", expr(
        "CASE WHEN n_keys_est = 0 THEN CAST(0 AS BIGINT) ELSE " +
          "CAST((CAST(excess_est AS DECIMAL(38,0)) * 1000000) div n_keys_est AS BIGINT) END"))
      .withColumn("holds_est", col("excess_micro") <= hllFdTolMicro(rsd))
      .select("fd", "n_keys_est", "n_pairs_est", "excess_est",
        "excess_micro", "holds_est")
  }

  /** Collision-free (lhs, rhs) pair fingerprint shared by the sketch FD
    * cards: LENGTH-PREFIXING the lhs pins where it ends, so a
    * string-typed lhs containing the separator can't collide —
    * ('a|b','c') renders '3:a|b|c' while ('a','b|c') renders '1:a|b|c'
    * (r10 ADVICE: the bare concat(lhs,'|',rhs) undercounted distinct
    * pairs on separator-bearing keys). `length` counts CHARACTERS in
    * both engines, so the prefix is identical cross-engine. */
  private def pairFingerprint(lhs: Column, rhs: Column): Column =
    concat(length(lhs.cast("string")).cast("string"), lit(":"),
      lhs.cast("string"), lit("|"), rhs.cast("string"))

  /** The KMV draw over a rendered string — `CAST(conv(substr(md5(s), 1,
    * 15), 16, 10) AS BIGINT)`, the exact expression the SQL twins spell,
    * as a Column so aggregate arguments can carry it (r13). */
  private def kmvHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  private def pairFingerprintDuck(lhs: String, rhs: String): String =
    s"CAST(length(CAST($lhs AS VARCHAR)) AS VARCHAR) || ':' || " +
      s"CAST($lhs AS VARCHAR) || '|' || CAST($rhs AS VARCHAR)"

  /** "holds" tolerance for a KMV FD card at a given k: 2/sqrt(k) in
    * micro — twice the KMV standard error, so a truly-holding FD
    * (excess 0) passes with ~97% confidence while gross violations
    * (excess of the same order as the key count) always fail. Derived
    * from the argument (r10 ADVICE), not a fixed constant. */
  def kmvFdTolMicro(k: Int): Long = math.round(2e6 / math.sqrt(k))

  /** The default-k tolerance, kept for spec readability. */
  val KmvFdTolMicro: Long = kmvFdTolMicro(Corpus.KmvK)

  /** Sketch-backed FD audit (q300): the set identity `lhs -> rhs holds
    * iff NDV(lhs) == NDV(lhs, rhs)` evaluated on two KMV sketches — the
    * estimated EXCESS (distinct pairs beyond distinct keys, i.e. the
    * total overbinding Σ(n_rhs−1)) replaces q290's exact per-key
    * distinct. The scale story is the point: the exact audit shuffles
    * every (lhs, rhs) occurrence to its key (576 s at 1000x on one
    * box); this card is ONE scan per candidate feeding two fixed-size
    * sketches — the exchange is 2k longs per FD at ANY table size, and
    * shard sketches merge. The md5 draw makes both engines' sketches
    * identical, so the card is fully oracle-gated. NULL convention:
    * null-bearing rows drop out of BOTH sketches (concat/cast propagate
    * NULL into the hash in both engines) — the monitoring twin trades
    * q290's exact NULL bookkeeping for mergeability; the exact form
    * stays the release gate. */
  def fdAuditKmv(spark: SparkSession, dir: String,
      k: Int = Corpus.KmvK): DataFrame = {
    val kmv = graft.functions.KmvSketch.sketch(k)
    def est(kept: String, kth: String) =
      s"CASE WHEN $kept < $k THEN $kept ELSE " +
        s"CAST(((CAST($kept AS DECIMAL(38,0)) - 1) * 1152921504606846976) div $kth AS BIGINT) END"
    val cards = FdCandidates.map { case (label, table, lhs, rhs) =>
      // r13: hashes moved INTO the aggregate arguments over the spread
      // source — aggregate inputs evaluate in the partial-agg operator
      // ABOVE the repartition exchange, so the rows×2 md5 head runs at
      // full parallelism (a named Project would be pushed back below the
      // exchange by ColumnPruning and stay serial). Same expressions as
      // before (md5 of the same strings), now via the Column API.
      QueryDef.spreadIfNarrow(tbl(spark, dir, table).select(col(lhs), col(rhs)))
        .agg(kmv(kmvHash(col(lhs).cast("string"))).as("skl"),
          kmv(kmvHash(pairFingerprint(col(lhs), col(rhs)))).as("skp"))
        .select(
          size(col("skl")).cast("long").as("kept_l"),
          expr("element_at(skl, -1)").as("kth_l"),
          size(col("skp")).cast("long").as("kept_p"),
          expr("element_at(skp, -1)").as("kth_p"))
        .withColumn("n_keys_est", expr(est("kept_l", "kth_l")))
        .withColumn("n_pairs_est", expr(est("kept_p", "kth_p")))
        .select(lit(label).as("fd"), col("n_keys_est"), col("n_pairs_est"))
    }
    cards.reduce(_ unionByName _)
      .withColumn("excess_est", greatest(col("n_pairs_est") - col("n_keys_est"), lit(0L)))
      // same degenerate-table guard as the HLL twin: 0 keys → excess 0
      .withColumn("excess_micro", expr(
        "CASE WHEN n_keys_est = 0 THEN CAST(0 AS BIGINT) ELSE " +
          "CAST((CAST(excess_est AS DECIMAL(38,0)) * 1000000) div n_keys_est AS BIGINT) END"))
      .withColumn("holds_est", col("excess_micro") <= kmvFdTolMicro(k))
      .select("fd", "n_keys_est", "n_pairs_est", "excess_est",
        "excess_micro", "holds_est")
  }

  val fdAuditKmvSql: String = {
    val k = Corpus.KmvK
    def kmvSub(table: String, hashExpr: String, notNull: String) =
      s"""(SELECT CASE WHEN count(*) < $k THEN CAST(count(*) AS BIGINT)
          ELSE CAST(((CAST(count(*) AS HUGEINT) - 1) * 1152921504606846976)
            // MAX(h) AS BIGINT) END
        FROM (SELECT h FROM (
            SELECT DISTINCT CAST(('0x' || substr(md5($hashExpr), 1, 15)) AS BIGINT) AS h
            FROM $table WHERE $notNull)
          ORDER BY h LIMIT $k))"""
    val branches = FdCandidates.map { case (label, table, lhs, rhs) =>
      val keys = kmvSub(table, s"CAST($lhs AS VARCHAR)", s"$lhs IS NOT NULL")
      val pairs = kmvSub(table, pairFingerprintDuck(lhs, rhs),
        s"$lhs IS NOT NULL AND $rhs IS NOT NULL")
      val micro = "CASE WHEN n_keys_est = 0 THEN CAST(0 AS BIGINT) ELSE " +
        "CAST((CAST(excess_est AS HUGEINT) * 1000000) // n_keys_est AS BIGINT) END"
      s"""SELECT '$label' AS fd, n_keys_est, n_pairs_est, excess_est,
          $micro AS excess_micro,
          $micro <= ${kmvFdTolMicro(k)} AS holds_est
        FROM (SELECT n_keys_est, n_pairs_est,
            GREATEST(n_pairs_est - n_keys_est, 0) AS excess_est
          FROM (SELECT $keys AS n_keys_est, $pairs AS n_pairs_est))"""
    }
    branches.mkString("\n      UNION ALL\n      ")
  }

  /** Driver-recordable gate for the HLL column profile (q301's QUERY
    * form, r11 — VERDICT ask 8): the fast card's engine-local NDV
    * estimates cannot cross-engine hash, so the recorded artifact read
    * `err: no_oracle` — this form QUANTIZES each estimate to a verdict
    * the oracle CAN check: `ndv_in_tol` = |est − exact| ≤ 4·rsd·exact
    * (the ProfilingSpec tolerance, now computed engine-side), alongside
    * the exact NDV. The oracle asserts the exact card + TRUE verdicts;
    * an out-of-band estimate flips the boolean and FAILS the hash — a
    * real recorded pass/fail, not a rows-only count. The pure fast form
    * ([[columnProfileHll]]) stays the production monitor (one codegen'd
    * scan, 169.1 s vs 285.1 exact at 1000x — SCALE.md r10); this gate
    * card deliberately pays the exact twin too, because a gate's job is
    * comparison. */
  def columnProfileHllGated(li: DataFrame, rsd: Double = HllRsd): DataFrame = {
    // r13: like q281, measured faster WITHOUT the spread (1.45x slower
    // with it) — HLL buffers over native values have no serial md5 head
    columnProfileHll(li, rsd)
      .join(exactNdvs(li), "col_name")
      .withColumn("ndv_in_tol",
        abs(col("n_distinct_est") - col("n_distinct")).cast("double")
          <= lit(4 * rsd) * col("n_distinct").cast("double"))
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "ndv_in_tol",
        "min_str", "max_str")
  }

  val columnProfileHllGatedSql: String = {
    val branches = ProfileCols.map { case (c, kind) =>
      val (mn, mx) = kind match {
        case "ts" => (s"strftime(MIN($c), '%Y-%m-%d %H:%M:%S')",
          s"strftime(MAX($c), '%Y-%m-%d %H:%M:%S')")
        case _ => (s"CAST(MIN($c) AS VARCHAR)", s"CAST(MAX($c) AS VARCHAR)")
      }
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
          CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
          TRUE AS ndv_in_tol,
          $mn AS min_str, $mx AS max_str FROM lineitem"""
    }
    branches.mkString("\n      UNION ALL\n      ")
  }

  /** Driver-recordable gate for the HLL FD audit (q302's QUERY form,
    * r11 — the q301 discipline on the relationship card): exact key and
    * pair cardinalities plus three engine-side verdicts — `holds_est`
    * (the fast audit's own FD verdict, which must agree with the exact
    * audit's tolerance read) and `keys_in_tol`/`pairs_in_tol` (each HLL
    * estimate within 4·rsd of its exact twin). The oracle recomputes
    * the exact side and asserts TRUE on the tolerance booleans, so a
    * drifted estimate or a flipped verdict fails the hash.
    * Cardinality convention: n_keys counts distinct non-NULL lhs;
    * n_pairs counts distinct (lhs, rhs) with BOTH non-NULL — exactly
    * the populations the two HLL estimates see. */
  def fdAuditHllGated(spark: SparkSession, dir: String,
      rsd: Double = HllRsd): DataFrame = {
    val srcs = fdSrcs(spark, dir) // r13: one spread source per candidate,
    val est = fdAuditHllOn(srcs, rsd) // shared by est + exact branches
      .select("fd", "n_keys_est", "n_pairs_est", "holds_est")
    val exact = srcs.map { case (label, src, lhs, rhs) =>
      src.agg(
        countDistinct(col(lhs)).as("n_keys"),
        countDistinct(
          when(col(lhs).isNotNull && col(rhs).isNotNull,
            pairFingerprint(col(lhs), col(rhs)))).as("n_pairs"))
        .select(lit(label).as("fd"), col("n_keys"), col("n_pairs"))
    }.reduce(_ unionByName _)
    est.join(exact, "fd")
      .withColumn("keys_in_tol",
        abs(col("n_keys_est") - col("n_keys")).cast("double")
          <= lit(4 * rsd) * col("n_keys").cast("double"))
      .withColumn("pairs_in_tol",
        abs(col("n_pairs_est") - col("n_pairs")).cast("double")
          <= lit(4 * rsd) * col("n_pairs").cast("double"))
      .select("fd", "n_keys", "n_pairs", "holds_est",
        "keys_in_tol", "pairs_in_tol")
  }

  /** q302-gated oracle: the exact cardinalities, the EXACT audit's
    * tolerance verdict as the expected `holds_est` (estimate-based and
    * exact-based thresholding agree because every shipped candidate is
    * either exactly functional (excess 0) or grossly violated — the
    * ProfilingSpec verdict-agreement lock, now recorded), and TRUE
    * tolerance booleans. */
  def fdAuditHllGatedSql(rsd: Double = HllRsd): String = {
    val tol = hllFdTolMicro(rsd)
    val branches = FdCandidates.map { case (label, table, lhs, rhs) =>
      s"""SELECT '$label' AS fd, n_keys, n_pairs,
          (CASE WHEN n_keys = 0 THEN 0
                ELSE CAST((CAST(GREATEST(n_pairs - n_keys, 0) AS HUGEINT) * 1000000)
                  // n_keys AS BIGINT) END) <= $tol AS holds_est,
          TRUE AS keys_in_tol, TRUE AS pairs_in_tol
        FROM (SELECT
            (SELECT CAST(count(DISTINCT $lhs) AS BIGINT) FROM $table) AS n_keys,
            (SELECT CAST(count(*) AS BIGINT) FROM
              (SELECT DISTINCT $lhs, $rhs FROM $table
               WHERE $lhs IS NOT NULL AND $rhs IS NOT NULL)) AS n_pairs)"""
    }
    branches.mkString("\n      UNION ALL\n      ")
  }

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q290_fd_audit",
      (s, d) => fdAudit(s, d), Some(fdAuditSql)),
    // r11: routed through the SQL TVF surface (GraftExtensions ships on
    // every session) — the TVF builder yields the SAME analyzed plan as
    // columnProfile(t(...)), so the oracle, hash, and bench cost are
    // unchanged while the driver's gate now exercises the SQL route.
    QueryDef("q281_column_profile",
      (s, d) => s.sql(s"SELECT * FROM column_profile('$d/lineitem.parquet')"),
      Some(columnProfileSql)),
    QueryDef("q282_key_skew_profile",
      (s, d) => keySkewProfile(s, d), Some(keySkewProfileSql)),
    QueryDef("q299_column_profile_kmv",
      (s, d) => columnProfileKmv(t(s, d, "lineitem")),
      Some(columnProfileKmvSql())),
    QueryDef("q300_fd_audit_kmv",
      (s, d) => fdAuditKmv(s, d), Some(fdAuditKmvSql)),
    // HLL twins, GATED form (r11): engine-local estimates can't
    // cross-engine hash directly, so the query rows carry engine-side
    // tolerance VERDICTS vs the exact twins — the oracle asserts the
    // exact card + TRUE verdicts, making these recorded pass/fail
    // checks (VERDICT r10 ask 8). The pure fast forms
    // (columnProfileHll / fdAuditHll) remain the production monitors.
    QueryDef("q301_column_profile_hll",
      (s, d) => columnProfileHllGated(t(s, d, "lineitem")),
      Some(columnProfileHllGatedSql)),
    QueryDef("q302_fd_audit_hll",
      (s, d) => fdAuditHllGated(s, d), Some(fdAuditHllGatedSql())))
}
