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
    val base = wide.select(col("n_rows"), expr(
      s"stack(${ProfileCols.size}, $stackArgs) AS (col_name, n_nulls, min_str, max_str)"))
    // NDV convention (suite-wide): NULL is NOT a distinct value — the
    // count(DISTINCT c) semantics both engines agree on once the NULL
    // group is filtered BEFORE the rollup (Spark's groupBy would keep
    // it; nulls are already reported separately as n_nulls)
    val ndvs = ProfileCols.map { case (c, _) =>
      li.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(count(lit(1)))
        .agg(count(lit(1)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_distinct"))
    }.reduce(_ unionByName _)
    ndvs.join(broadcast(base), "col_name")
      .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
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
      val kc = tbl(spark, dir, table)
        .select(col(key).cast("string").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .localCheckpoint() // feeds the card rollup AND the argmax probe
      val card = kc.agg(
        sum("n").as("n_rows"), count(lit(1)).as("n_keys"), max("n").as("max_rows"))
      val top = kc.join(broadcast(card.select("max_rows")),
          col("n") === col("max_rows"))
        .agg(min("k").as("top_key"))
      card.crossJoin(top)
        .select(lit(label).as("key_name"), col("n_rows"), col("n_keys"),
          col("max_rows"), col("top_key"))
    }
    cards.reduce(_ unionByName _)
      .withColumn("skew_micro", expr(
        "CAST((CAST(max_rows AS DECIMAL(38,0)) * n_keys * 1000000) div n_rows AS BIGINT)"))
      .select("key_name", "n_rows", "n_keys", "max_rows", "top_key", "skew_micro")
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

  def queries: Seq[QueryDef] = Seq(
    QueryDef("q290_fd_audit",
      (s, d) => fdAudit(s, d), Some(fdAuditSql)),
    QueryDef("q281_column_profile",
      (s, d) => columnProfile(t(s, d, "lineitem")), Some(columnProfileSql)),
    QueryDef("q282_key_skew_profile",
      (s, d) => keySkewProfile(s, d), Some(keySkewProfileSql)))
}
