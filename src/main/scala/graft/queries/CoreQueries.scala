package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tebis.Datapoints

/** Core relational surface (SURVEY §2a/§2b): scans, filter/projection,
  * casts, joins (broadcast/shuffle/anti/semi), aggregates, distinct,
  * window functions, sort/top-k, set ops, unpivot, rollup — each with a
  * DuckDB oracle. Plans are declarative DataFrame chains: Catalyst pushes
  * filters/projections to the parquet scan, AQE sizes shuffles, and small
  * dimensions are broadcast explicitly.
  */
object CoreQueries {
  import QueryDef._

  val SubquerySuiteSql: String =
    """SELECT c.c_custkey, c.c_name,
      (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND c.c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name LIKE 'NATION_1%')"""

  /** Relational integrity audit (q237): the referential/consistency
    * checks a warehouse runs before trusting a load — orphan facts
    * (lineitem rows whose order is missing, orders whose customer is
    * missing), temporal consistency (shipments dated before their
    * order), and domain constraints (non-positive quantities/prices,
    * discount outside [0, 1]) — one row per check with violation and
    * population counts. The relational-side sibling of the corpus
    * governance gates (q205/q212): counts, never samples, so the table
    * is stable and diffable across loads.
    *
    * Scale shape: orphan checks are key-equi anti-joins (corpus-sized
    * both sides — the shuffle is the check; AQE picks the strategy);
    * domain checks are scan-resident conditional counts; each check
    * reduces to ONE row before the union. */
  def integrityAudit(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val li = t(s, d, "lineitem"); val o = t(s, d, "orders"); val c = t(s, d, "customer")
    // ONE fact-side pass: the orphan check (null right side), the
    // temporal check (matched + ship < order) and the three domain
    // checks all fold into a single left join + one aggregate — the
    // first form paid two 60M-row joins and three extra scans for the
    // same six counts (measured 40.6 -> 17.3 s at 100x). The 1-row
    // result is checkpointed because six SELECTs read it.
    val liAgg = li
      .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      .join(o.select(col("o_orderkey").as("l_orderkey"), col("o_orderdate")),
        Seq("l_orderkey"), "left")
      .agg(
        count(lit(1)).as("n_total"),
        expr("CAST(count_if(o_orderdate IS NULL) AS BIGINT)").as("v_orphan"),
        expr("CAST(count_if(o_orderdate IS NOT NULL AND l_shipdate < o_orderdate) AS BIGINT)")
          .as("v_ship"),
        expr("CAST(count_if(l_quantity <= 0) AS BIGINT)").as("v_qty"),
        expr("CAST(count_if(l_extendedprice <= 0) AS BIGINT)").as("v_price"),
        expr("CAST(count_if(l_discount < 0 OR l_discount > 1) AS BIGINT)").as("v_disc"))
      .localCheckpoint()
    val oAgg = o.select("o_custkey")
      .join(c.select(col("c_custkey").as("o_custkey")), Seq("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(o.agg(count(lit(1)).as("n_total"))))
    def liRow(name: String, v: String) =
      liAgg.select(lit(name).as("check"), col(v).as("n_violations"), col("n_total"))
    liRow("lineitem_orphan_order", "v_orphan")
      .unionAll(oAgg.select(lit("order_orphan_customer").as("check"),
        col("n_violations"), col("n_total")))
      .unionAll(liRow("ship_before_order", "v_ship"))
      .unionAll(liRow("nonpositive_quantity", "v_qty"))
      .unionAll(liRow("nonpositive_price", "v_price"))
      .unionAll(liRow("discount_out_of_range", "v_disc"))
  }

  val integrityAuditSql: String =
    """WITH nli AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
      no AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders)
      SELECT 'lineitem_orphan_order' AS check,
        CAST((SELECT count(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
          AS BIGINT) AS n_violations,
        (SELECT n FROM nli) AS n_total
      UNION ALL SELECT 'order_orphan_customer',
        CAST((SELECT count(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
          AS BIGINT),
        (SELECT n FROM no)
      UNION ALL SELECT 'ship_before_order',
        CAST((SELECT count(*) FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE l.l_shipdate < o.o_orderdate) AS BIGINT),
        (SELECT n FROM nli)
      UNION ALL SELECT 'nonpositive_quantity',
        CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT),
        (SELECT n FROM nli)
      UNION ALL SELECT 'nonpositive_price',
        CAST((SELECT count(*) FROM lineitem WHERE l_extendedprice <= 0) AS BIGINT),
        (SELECT n FROM nli)
      UNION ALL SELECT 'discount_out_of_range',
        CAST((SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1) AS BIGINT),
        (SELECT n FROM nli)"""

  /** Revenue Pareto curve (q248): the share of total order revenue held
    * by the top 1% / 10% / 50% of customers — exact Lorenz points, the
    * orders-side concentration card next to q193's event-activity Gini
    * (revenue concentration drives whale-risk and LTV planning; a Gini
    * scalar hides WHERE the curve bends). Tie-aware: the cut is the
    * smallest per-customer revenue LEVEL at which the top group reaches
    * the count quantile, and every customer at the boundary level is in
    * (order statistics never split a tie — the q223/q244 discipline).
    *
    * Determinism: revenue rides exact cents (round(o_totalprice·100) —
    * one IEEE multiply+round, the q232 argument); shares are
    * DECIMAL-widened micro rationals.
    *
    * Scale shape: ONE customer-keyed rollup (cents per customer), then
    * (cents-level, n_customers, revenue) rollup rows; the cumulative
    * window descends over DISTINCT levels; three thresholded aggregates
    * share the pass; 3 rows from 1. */
  def paretoRevenue(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val perCust = t(s, d, "orders")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("rev"))
    val levels = perCust.groupBy("rev")
      .agg(count(lit(1)).as("n_cust"))
      .select(col("rev"), col("n_cust"),
        expr("CAST(rev AS DECIMAL(38,0)) * n_cust").as("rev_mass"))
    val w = Window.orderBy(col("rev").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = levels
      .withColumn("cum_cust", sum("n_cust").over(w))
      .withColumn("cum_rev", sum("rev_mass").over(w))
      .crossJoin(broadcast(levels.agg(sum("n_cust").as("n_all"),
        sum("rev_mass").as("rev_all"))))
      .localCheckpoint() // level rows; three threshold aggs read it
    def row(pctName: String, num: Int, den: Int) =
      cum.filter(expr(s"cum_cust * $den >= $num * n_all"))
        .agg(min("cum_cust").as("n_top_customers"),
          min("cum_rev").as("top_revenue"))
        .crossJoin(broadcast(cum.select("n_all", "rev_all").limit(1)))
        .select(lit(pctName).as("top_pct"),
          col("n_top_customers"), col("n_all").as("n_customers"),
          expr("CAST((CAST(top_revenue AS DECIMAL(38,0)) * 1000000) div rev_all AS BIGINT)")
            .as("revenue_share_micro"))
    row("1", 1, 100).unionAll(row("10", 1, 10)).unionAll(row("50", 1, 2))
  }

  val paretoRevenueSql: String = {
    def row(pctName: String, num: Int, den: Int) =
      s"""SELECT '$pctName' AS top_pct,
          CAST(MIN(cum_cust) AS BIGINT) AS n_top_customers,
          (SELECT CAST(SUM(n_cust) AS BIGINT) FROM lv) AS n_customers,
          CAST((CAST(MIN(cum_rev) AS HUGEINT) * 1000000)
            // (SELECT SUM(rev_mass) FROM lv) AS BIGINT) AS revenue_share_micro
        FROM cum WHERE cum_cust * $den >= $num * n_all"""
    s"""WITH pc AS (SELECT o_custkey,
            CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
          FROM orders GROUP BY 1),
      lv AS (SELECT rev, CAST(count(*) AS BIGINT) AS n_cust,
            CAST(rev AS HUGEINT) * count(*) AS rev_mass
          FROM pc GROUP BY 1),
      cum AS (SELECT rev, n_cust,
            SUM(n_cust) OVER (ORDER BY rev DESC) AS cum_cust,
            SUM(rev_mass) OVER (ORDER BY rev DESC) AS cum_rev,
            (SELECT SUM(n_cust) FROM lv) AS n_all FROM lv)
      ${row("1", 1, 100)} UNION ALL ${row("10", 1, 10)} UNION ALL ${row("50", 1, 2)}"""
  }

  /** Market-basket pair mining (q249): the top-20 part pairs by
    * within-order co-occurrence support, with exact micro lift vs
    * independence — the association-rule staple (Agrawal & Srikant 1994
    * reduced to its pair core) over the orders fact. Lift ranks by the
    * exact cross-multiplied rational (n_ab·N·1e6) div (n_a·n_b) — the
    * q114/q187 log-free discipline.
    *
    * Scale shape: baskets collapse to DISTINCT (order, part) rows
    * map-side; the pair join is order-keyed and bounded by basket
    * size² per order (TPC-H baskets are ~4 lines); item supports are a
    * second agg of the same rows, joined back at pair-rollup level;
    * top-20 is TakeOrderedAndProject on the deterministic
    * (support DESC, part_a, part_b) order. */
  def basketPairs(s: org.apache.spark.sql.SparkSession, d: String,
      k: Int = 20): org.apache.spark.sql.DataFrame = {
    val items = t(s, d, "lineitem").select("l_orderkey", "l_partkey")
      .distinct().localCheckpoint() // feeds supports AND both pair sides
    val nOrders = items.select("l_orderkey").distinct()
      .agg(count(lit(1)).as("n_orders"))
    val supp = items.groupBy("l_partkey").agg(count(lit(1)).as("n_item"))
    // top-k FIRST: the rank is (support, part ids) — no lift input — so
    // the support joins commute past the limit and touch k rows instead
    // of the ~basket²·orders pair rollup (measured 94.7 → 48.6 s at 100x)
    val topPairs = items.as("a").join(items.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .orderBy(col("n_pair").desc, col("part_a").asc, col("part_b").asc)
      .limit(k)
      .localCheckpoint() // k rows; both support joins broadcast it
    topPairs
      .join(supp.select(col("l_partkey").as("part_a"), col("n_item").as("n_a")), "part_a")
      .join(supp.select(col("l_partkey").as("part_b"), col("n_item").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift_micro", expr(
        "CAST((CAST(n_pair AS DECIMAL(38,0)) * n_orders * 1000000) div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
      .select("part_a", "part_b", "n_pair", "n_a", "n_b", "n_orders", "lift_micro")
  }

  def basketPairsSql(k: Int = 20): String =
    s"""WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      no AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM it),
      sup AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item FROM it GROUP BY 1),
      pr AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
            CAST(count(*) AS BIGINT) AS n_pair
          FROM it a JOIN it b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2)
      SELECT pr.part_a, pr.part_b, pr.n_pair,
        sa.n_item AS n_a, sb.n_item AS n_b, no.n_orders,
        CAST((CAST(pr.n_pair AS HUGEINT) * no.n_orders * 1000000)
          // (CAST(sa.n_item AS HUGEINT) * sb.n_item) AS BIGINT) AS lift_micro
      FROM pr JOIN sup sa ON sa.l_partkey = pr.part_a
        JOIN sup sb ON sb.l_partkey = pr.part_b
        CROSS JOIN no
      ORDER BY pr.n_pair DESC, pr.part_a, pr.part_b LIMIT $k"""

  val all: Seq[QueryDef] = Seq(

    QueryDef("q249_basket_pairs",
      (s, d) => basketPairs(s, d),
      Some(basketPairsSql())),

    QueryDef("q248_pareto_revenue",
      (s, d) => paretoRevenue(s, d),
      Some(paretoRevenueSql)),

    QueryDef("q237_integrity_audit",
      (s, d) => integrityAudit(s, d),
      Some(integrityAuditSql)),

    // S10/S11-style grouped aggregate over the fact table (TPC-H Q1 shape).
    // One shuffle, map-side partial aggregation; group cardinality is tiny.
    QueryDef("q01_pricing_summary",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty")),
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base,
        CAST(SUM(${revenueTermSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS sum_disc_price,
        ${davgSql("l_quantity")} AS avg_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // Predicate pushdown to the scan (TPC-H Q6 shape): filters reach
    // PushedFilters, only 4 columns read.
    QueryDef("q02_filter_revenue",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(
          sum((col("l_extendedprice").cast(DecimalType(12, 2)) * col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows")),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        count(*) AS n_rows FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""")),

    // Top-k = TakeOrderedAndProject (no full sort materialization); full
    // tie-break for determinism (S19/S20).
    QueryDef("q03_topk_orders",
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // Broadcast join onto small dimensions: no shuffle of customer.
    QueryDef("q04_region_rollup",
      (s, d) => t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal")),
      Some(s"""SELECT r_name, count(*) AS n_customers, ${dsumSql("c_acctbal")} AS sum_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey GROUP BY r_name""")),

    // Fact-fact shuffle join + distinct aggregate.
    // Deliberately the DIRECT join+distinct form, not a pre-aggregate-
    // below-the-join rewrite: while orders fits the broadcast threshold
    // (as AQE decides here) the join never shuffles lineitem AT ALL, and
    // the per-priority countDistinct partial-aggregates on (priority,
    // orderkey). The pre-agg form forces a full lineitem shuffle on
    // l_orderkey up front — measured 5x slower at sf0.1 (0.23 s vs
    // 1.14 s). When orders outgrows broadcast, SMJ shuffles lineitem on
    // the same key the pre-agg would have, so the direct form never
    // loses; Catalyst adapts per scale, the plan text doesn't.
    QueryDef("q05_priority_revenue",
      (s, d) => t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_orderkey")).as("n_orders"),
          sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue")),
      Some(s"""SELECT o_orderpriority, count(DISTINCT o_orderkey) AS n_orders,
        CAST(SUM(${revenueTermSql("l_extendedprice", "l_discount")}) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY o_orderpriority""")),

    // LEFT ANTI join — the reference's catalog-miss primitive (S12).
    QueryDef("q06_customers_no_orders",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal")),
      Some(s"""SELECT c_mktsegment, count(*) AS n_customers, ${dsumSql("c_acctbal")} AS sum_acctbal
        FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment""")),

    // LEFT SEMI join (EXISTS).
    QueryDef("q07_active_suppliers",
      (s, d) => t(s, d, "supplier")
        .join(
          t(s, d, "lineitem").filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp")),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
      Some("""SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey
        AND l_shipdate >= TIMESTAMP '1999-01-01')""")),

    // Exact distinct counts per key (S11).
    // Decomposed multi-distinct: two countDistincts on DIFFERENT columns
    // make Spark plan an Expand (every row duplicated per distinct
    // column, nulls padding the other) through the shuffle. Splitting
    // into per-pair distincts + a 100-row join instead shuffles map-side-
    // deduplicated narrow pairs with no row doubling — measured 1.5x
    // (0.84 s vs 1.23 s at sf0.1). Cost: lineitem is scanned three times,
    // but each scan reads ≤2 pruned columns, and the joins broadcast at
    // supplier cardinality. Results are identical; the oracle keeps the
    // direct GROUP BY count(DISTINCT ...) form.
    QueryDef("q08_supplier_distincts",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val p = li.select("l_suppkey", "l_partkey").distinct()
          .groupBy("l_suppkey").agg(count(lit(1)).as("n_parts"))
        val o = li.select("l_suppkey", "l_orderkey").distinct()
          .groupBy("l_suppkey").agg(count(lit(1)).as("n_orders"))
        val r = li.groupBy("l_suppkey").agg(count(lit(1)).as("n_rows"))
        p.join(o, "l_suppkey").join(r, "l_suppkey")
      },
      Some("""SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_orderkey) AS n_orders, count(*) AS n_rows
        FROM lineitem GROUP BY l_suppkey""")),

    // FULL OUTER join (the remaining join type): per-nation customer vs
    // rich-supplier balances — the acctbal cut empties some nations'
    // supplier side, so genuine outer rows (NULL totals) appear and the
    // USING-key coalesce is exercised in both engines. Plan: two partial-
    // aggregated groupBys then one shuffled full-outer on the key.
    QueryDef("q69_full_outer_accounts",
      (s, d) => {
        val c = t(s, d, "customer").groupBy(col("c_nationkey").as("nationkey"))
          .agg(dsum(col("c_acctbal")).as("cust_bal"), count(lit(1)).as("n_cust"))
        val sup = t(s, d, "supplier").filter(col("s_acctbal") > 5000)
          .groupBy(col("s_nationkey").as("nationkey"))
          .agg(dsum(col("s_acctbal")).as("supp_bal"), count(lit(1)).as("n_supp"))
        c.join(sup, Seq("nationkey"), "full_outer")
      },
      Some(s"""WITH c AS (SELECT c_nationkey AS nationkey, ${dsumSql("c_acctbal")} AS cust_bal,
                count(*) AS n_cust FROM customer GROUP BY 1),
             s AS (SELECT s_nationkey AS nationkey, ${dsumSql("s_acctbal")} AS supp_bal,
                count(*) AS n_supp FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
        SELECT nationkey, cust_bal, n_cust, supp_bal, n_supp
        FROM c FULL OUTER JOIN s USING (nationkey)""")),

    // Set operation: EXCEPT (distinct semantics in both engines).
    QueryDef("q09_customer_only_nations",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        EXCEPT SELECT s_nationkey AS nationkey FROM supplier""")),

    // Window: partitioned top-n via row_number (fully tie-broken).
    QueryDef("q10_top3_per_supplier",
      (s, d) => {
        val w = Window.partitionBy("l_suppkey")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        t(s, d, "lineitem")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("l_suppkey", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
      },
      Some("""SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
          row_number() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 3""")),

    // Window: running totals (exact decimal running sum) + sequence.
    QueryDef("q11_running_spend",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("order_seq"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_spend"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        row_number() OVER w AS order_seq,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""")),

    // Window: lag + date arithmetic.
    QueryDef("q12_order_gaps",
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderkey"),
          datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).as("days_since_prev"))
      },
      Some("""SELECT o_custkey, o_orderkey,
        CAST(date_diff('day', lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) AS INT) AS days_since_prev
        FROM orders""")),

    // TEBIS S4 header-split semantics (rpartition on last colon) as
    // codegen'd string expressions, exercised on constructed headers.
    QueryDef("q13_header_split",
      (s, d) => t(s, d, "part")
        .select(col("p_partkey"), concat(col("p_brand"), lit(" : "), col("p_type")).as("hdr"))
        .select(
          col("p_partkey"),
          Datapoints.externalIdExpr(col("hdr")).as("externalId"),
          Datapoints.seriesNameExpr(col("hdr")).as("seriesName")),
      Some("""SELECT p_partkey,
        trim(regexp_extract(p_brand || ' : ' || p_type, '^(.*):[^:]*$', 1)) AS externalId,
        trim(regexp_extract(p_brand || ' : ' || p_type, '([^:]*)$', 1)) AS seriesName
        FROM part""")),

    // TEBIS S6/S7 locale cast round-trip: comma-decimal strings -> double,
    // with unparsable cells dropped (try_cast + filter).
    QueryDef("q14_locale_cast",
      (s, d) => t(s, d, "orders")
        .select(
          col("o_orderkey"),
          regexp_replace(col("o_totalprice").cast(DecimalType(18, 2)).cast("string"), "\\.", ",").as("raw"))
        .select(col("o_orderkey"), Datapoints.valueExpr(col("raw")).as("value"))
        .filter(col("value").isNotNull),
      Some("""SELECT o_orderkey,
        CAST(REPLACE(REPLACE(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), '.', ','), ',', '.') AS DOUBLE) AS value
        FROM orders""")),

    // TEBIS S8 epoch millis.
    QueryDef("q15_epoch_ms",
      (s, d) => t(s, d, "orders")
        // parquet timestamps read as TIMESTAMP_NTZ; session TZ is UTC so the
        // cast pins the same instant the oracle's naive epoch_ms computes
        .select(col("o_orderkey"), unix_millis(col("o_orderdate").cast("timestamp")).as("ts_ms")),
      Some("SELECT o_orderkey, epoch_ms(o_orderdate) AS ts_ms FROM orders")),

    // S9 unpivot (wide->long melt) over the fact table: single Expand,
    // no shuffle.
    QueryDef("q16_unpivot_measures",
      (s, d) => t(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          "metric", "value"),
      Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem)
        UNPIVOT (value FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))""")),

    // Set operation: UNION ALL (the reference's implicit per-file union,
    // §2b set-ops row) — accounts of both parties, tagged.
    // Explicit GROUPING SETS (the general form under rollup q17 / cube
    // q24), with grouping_id() disambiguating real NULLs from subtotal
    // rows — same bit-vector semantics as DuckDB's GROUPING(). One Expand
    // + one partial-aggregated shuffle, like rollup/cube.
    QueryDef("q29_grouping_sets",
      (s, d) => t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
          dsum(col("l_quantity")).as("sum_qty")),
      Some(s"""SELECT l_returnflag, l_linestatus,
          CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
          count(*) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")),

    QueryDef("q28_union_all_accounts",
      (s, d) => t(s, d, "customer")
        .select(col("c_nationkey").cast("int").as("nationkey"), col("c_acctbal").as("acctbal"), lit("customer").as("party"))
        .unionAll(t(s, d, "supplier")
          .select(col("s_nationkey").cast("int").as("nationkey"), col("s_acctbal").as("acctbal"), lit("supplier").as("party")))
        .groupBy("nationkey", "party")
        .agg(count(lit(1)).as("n"), dsum(col("acctbal")).as("sum_acctbal")),
      Some(s"""SELECT nationkey, party, count(*) AS n, ${dsumSql("acctbal")} AS sum_acctbal FROM (
        SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS party FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, s_acctbal AS acctbal, 'supplier' AS party FROM supplier
        ) GROUP BY nationkey, party""")),

    // Set operation: INTERSECT (distinct semantics in both engines).
    QueryDef("q23_nations_intersect",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
        INTERSECT SELECT s_nationkey AS nationkey FROM supplier""")),

    // Multi-level aggregate: CUBE (all grouping-set combinations).
    QueryDef("q24_cube_flags",
      (s, d) => t(s, d, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty")),
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""")),

    // Reshape: PIVOT (long->wide, the inverse of q16's unpivot) with an
    // explicit value list so the plan is a single aggregate, no
    // distinct-scan of pivot values.
    QueryDef("q27_pivot_linestatus",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dsum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f").withColumnRenamed("O", "qty_o"),
      Some(s"""SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o
        FROM lineitem GROUP BY l_returnflag""")),

    // Multi-level aggregate: ROLLUP with exact sums.
    QueryDef("q17_rollup_flags",
      (s, d) => t(s, d, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty")),
      Some(s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows, ${dsumSql("l_quantity")} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // Per-key top-k WITHOUT the window sort: a typed Aggregator with a
    // bounded ≤k buffer runs as ObjectHashAggregate with map-side partial
    // aggregation — each input partition emits at most k rows per key
    // into the shuffle, vs the q10 window plan shuffling and sorting
    // EVERY row per key. Same rows as q10 by construction (shared total
    // order); the oracle is the window formulation.
    QueryDef("q54_topk_agg",
      (s, d) => {
        val tk = graft.functions.TopKPriced.topk(3)
        t(s, d, "lineitem")
          .groupBy("l_suppkey")
          .agg(tk(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber")).as("top"))
          .select(col("l_suppkey"), posexplode(col("top")).as(Seq("pos", "item")))
          .select(col("l_suppkey"), (col("pos") + 1).cast("int").as("rn"),
            col("item.orderkey").as("l_orderkey"),
            col("item.linenumber").as("l_linenumber"),
            col("item.price").as("l_extendedprice"))
      },
      Some("""SELECT l_suppkey, CAST(rn AS INT) AS rn, l_orderkey, l_linenumber, l_extendedprice FROM (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
          row_number() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 3"""))
  ) ++ rankStats

  /** Exact grouped order statistics. Spark's `percentile` is the EXACT
    * aggregate (sorted multiset, position p·(n−1), WEIGHTED linear
    * interpolation `(hi−pos)·v[lo] + (pos−lo)·v[hi]`) — one shuffle with
    * partial aggregation, never a global sort. DuckDB's quantile_cont
    * evaluates the numerically identical weighted form (the additive
    * `lo + (hi−lo)·frac` differs in the last ulp on some groups — see
    * CorpusSpec), so the hashes match bit-for-bit. NTILE is the
    * standard SQL bucket split (first n mod t tiles one larger) in both
    * engines; the window order is fully tie-broken so tile edges are
    * deterministic.
    *
    * Both key on l_suppkey, NOT a 3-value flag: exact percentiles buffer
    * each group's full value multiset and NTILE sorts whole groups, so
    * group cardinality must scale with the cluster — per-supplier groups
    * stay bounded while a coarse key would funnel a third of a 100 TB
    * table through one task (corpus-wide exact quantiles belong to a
    * sketch, not this operator). */
  private def rankStats: Seq[QueryDef] = Seq(
    QueryDef("q59_group_percentiles",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_suppkey")
        .agg(
          expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.25D, 0.5D, 0.95D))").as("ps"),
          count(lit(1)).as("n_rows"))
        .select(col("l_suppkey"),
          col("ps").getItem(0).as("p25"), col("ps").getItem(1).as("p50"),
          col("ps").getItem(2).as("p95"), col("n_rows")),
      Some("""SELECT l_suppkey,
        quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS p25,
        quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS p50,
        quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS p95,
        count(*) AS n_rows FROM lineitem GROUP BY l_suppkey""")),

    QueryDef("q60_group_ntile",
      (s, d) => {
        val w = Window.partitionBy("l_suppkey")
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        t(s, d, "lineitem")
          .withColumn("tile", ntile(4).over(w))
          .groupBy("l_suppkey", "tile")
          .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
      },
      Some(s"""SELECT l_suppkey, tile, count(*) AS n_rows, ${dsumSql("l_extendedprice")} AS sum_price
        FROM (SELECT l_suppkey, l_extendedprice,
          ntile(4) OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS tile
        FROM lineitem) GROUP BY l_suppkey, tile""")),

    // Exact per-group correlation + least-squares fit. The built-in
    // corr()/regr_slope() accumulate DOUBLES in partition order — not
    // reproducible across partitionings, let alone engines. Here x and y
    // are quantized to integer cents (exact via a decimal hop — `x * 100`
    // on the raw double could fall either side of the integer), the five
    // second-moment sums are exact BIGINT aggregates, and each sum is
    // cast int64→double ONCE (correctly rounded, identical in any
    // engine) before the closed forms run the identical exactly-rounded
    // expression tree — bit-identical results from a single
    // partial-aggregated shuffle. Why not decimal sums straight to
    // double: a decimal whose SCALED integer exceeds 2^53 (syy here)
    // double-rounds in engines that convert the scaled int then divide,
    // while others round once — a real observed last-ulp split. The
    // int64 path caps at ~9.2e18 cents² per group (~75k rows/group at
    // these magnitudes); past that, re-scale the quantization.
    QueryDef("q62_supplier_regression",
      (s, d) => {
        val xc = (col("l_quantity").cast(DecimalType(9, 2)) * lit(100)).cast("long")
        val yc = (col("l_extendedprice").cast(DecimalType(12, 2)) * lit(100)).cast("long")
        t(s, d, "lineitem")
          .select(col("l_suppkey"), xc.as("xc"), yc.as("yc"))
          .groupBy("l_suppkey")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col("xc")).as("sxc"), sum(col("yc")).as("syc"),
            sum(col("xc") * col("xc")).as("sxxc"),
            sum(col("yc") * col("yc")).as("syyc"),
            sum(col("xc") * col("yc")).as("sxyc"))
          .select(col("l_suppkey"), col("n_rows"),
            (col("sxc").cast("double") / 100.0).as("sx"),
            (col("syc").cast("double") / 100.0).as("sy"),
            (col("sxxc").cast("double") / 10000.0).as("sxx"),
            (col("syyc").cast("double") / 10000.0).as("syy"),
            (col("sxyc").cast("double") / 10000.0).as("sxy"))
          .withColumn("nn", col("n_rows").cast("double"))
          .withColumn("cov_n", col("nn") * col("sxy") - col("sx") * col("sy"))
          .withColumn("varx_n", col("nn") * col("sxx") - col("sx") * col("sx"))
          .withColumn("vary_n", col("nn") * col("syy") - col("sy") * col("sy"))
          .withColumn("slope", col("cov_n") / col("varx_n"))
          .select(col("l_suppkey"), col("n_rows"),
            (col("cov_n") / (sqrt(col("varx_n")) * sqrt(col("vary_n")))).as("corr_qp"),
            col("slope"),
            ((col("sy") - col("slope") * col("sx")) / col("nn")).as("intercept"))
      },
      Some("""WITH c AS (SELECT l_suppkey,
          CAST(CAST(l_quantity AS DECIMAL(9,2)) * 100 AS BIGINT) AS xc,
          CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS yc
          FROM lineitem),
        a AS (SELECT l_suppkey, count(*) AS n_rows,
          CAST(CAST(SUM(xc) AS BIGINT) AS DOUBLE) / 100.0 AS sx,
          CAST(CAST(SUM(yc) AS BIGINT) AS DOUBLE) / 100.0 AS sy,
          CAST(CAST(SUM(xc * xc) AS BIGINT) AS DOUBLE) / 10000.0 AS sxx,
          CAST(CAST(SUM(yc * yc) AS BIGINT) AS DOUBLE) / 10000.0 AS syy,
          CAST(CAST(SUM(xc * yc) AS BIGINT) AS DOUBLE) / 10000.0 AS sxy
          FROM c GROUP BY l_suppkey),
        b AS (SELECT l_suppkey, n_rows, sx, sy, CAST(n_rows AS DOUBLE) AS nn,
          CAST(n_rows AS DOUBLE) * sxy - sx * sy AS cov_n,
          CAST(n_rows AS DOUBLE) * sxx - sx * sx AS varx_n,
          CAST(n_rows AS DOUBLE) * syy - sy * sy AS vary_n FROM a)
        SELECT l_suppkey, n_rows,
          cov_n / (sqrt(varx_n) * sqrt(vary_n)) AS corr_qp,
          cov_n / varx_n AS slope,
          (sy - (cov_n / varx_n) * sx) / nn AS intercept
        FROM b""")),

    // MODE + MEDIAN per group. Spark's mode() is tie-nondeterministic
    // (and DuckDB's picks first-encountered), so the mode here is the
    // explicit argmax — count per value, rank by (count desc, value asc),
    // take rank 1 — which IS deterministic and engine-portable. The rank
    // window partitions by nation over the ≤|priorities| counted rows,
    // never the raw orders. Median reuses the exact interpolated
    // percentile whose DuckDB parity q59 established.
    QueryDef("q76_mode_median",
      (s, d) => {
        val o = t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("o_orderpriority"), col("o_totalprice"))
        val cnt = o.groupBy("n_name", "o_orderpriority").agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy("n_name").orderBy(col("cnt").desc, col("o_orderpriority").asc)
        val md = cnt.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
          .select(col("n_name"), col("o_orderpriority").as("mode_priority"))
        val med = o.groupBy("n_name").agg(
          expr("percentile(CAST(o_totalprice AS DOUBLE), 0.5D)").as("median_price"),
          count(lit(1)).as("n_orders"))
        md.join(med, "n_name")
      },
      Some("""WITH o AS (SELECT n.n_name, ord.o_orderpriority, ord.o_totalprice
            FROM orders ord JOIN customer c ON ord.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey),
        cnt AS (SELECT n_name, o_orderpriority, count(*) AS cnt FROM o GROUP BY 1, 2),
        md AS (SELECT n_name, o_orderpriority AS mode_priority,
                 row_number() OVER (PARTITION BY n_name ORDER BY cnt DESC, o_orderpriority) AS rk
               FROM cnt),
        med AS (SELECT n_name, quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5) AS median_price,
                  count(*) AS n_orders FROM o GROUP BY 1)
        SELECT md.n_name, md.mode_priority, med.median_price, med.n_orders
        FROM md JOIN med USING (n_name) WHERE md.rk = 1""")),

    // Rank-family window suite: percent_rank / cume_dist / nth_value /
    // first_value / last_value in one pass per supplier. The ordering is
    // fully tie-broken (price, orderkey, linenumber), so RANGE and ROWS
    // frames coincide and both engines see identical frames; full-frame
    // functions (nth/last) state ROWS UNBOUNDED..UNBOUNDED explicitly.
    // percent_rank/cume_dist are single-division doubles of exact ranks —
    // portable. One exchange on l_suppkey + per-group sort, like q60.
    QueryDef("q77_window_suite",
      (s, d) => {
        val wOrd = Window.partitionBy("l_suppkey")
          .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        val wFull = wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, d, "lineitem").select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          percent_rank().over(wOrd).as("pr"),
          cume_dist().over(wOrd).as("cd"),
          nth_value(col("l_extendedprice"), 3).over(wFull).as("third_price"),
          first_value(col("l_extendedprice")).over(wOrd).as("min_price"),
          last_value(col("l_extendedprice")).over(wFull).as("max_price"))
      },
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
          percent_rank() OVER w AS pr,
          cume_dist() OVER w AS cd,
          nth_value(l_extendedprice, 3) OVER
            (PARTITION BY l_suppkey ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_price,
          first_value(l_extendedprice) OVER w AS min_price,
          last_value(l_extendedprice) OVER
            (PARTITION BY l_suppkey ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS max_price
        FROM lineitem
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_extendedprice, l_orderkey, l_linenumber)""")),

    // Approximate percentiles — the 100 TB twin of q59's exact
    // `percentile`: the Greenwald–Khanna summary is a BOUNDED mergeable
    // buffer (≤ O(accuracy) entries per partial), so the shuffle carries
    // sketch bytes instead of every group value — corpus-wide quantiles
    // stop being the one aggregate that buffers the whole table. The
    // GK estimate itself can't hash-match DuckDB (differently-seeded
    // t-digest there — sketches never agree cross-engine), so the query
    // is SELF-EVIDENCING: it emits the exact percentiles plus an
    // in-bound flag derived from the sketch (|est − exact| ≤ 2%·exact,
    // generous vs the ε=1/1000 rank guarantee on this smooth price
    // distribution), the oracle computes its exact side with TRUE flags,
    // and every output column hash-matches while the estimate stays
    // engine-local. CorpusSpec still locks the tighter rank-error bound.
    QueryDef("q79_approx_percentiles",
      (s, d) => t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(CAST(l_extendedprice AS DOUBLE), array(0.5D, 0.95D), 1000)").as("ap"),
          expr("percentile(CAST(l_extendedprice AS DOUBLE), array(0.5D, 0.95D))").as("ex"),
          count(lit(1)).as("n_rows"))
        .select(col("l_returnflag"),
          col("ex").getItem(0).as("ex50"), col("ex").getItem(1).as("ex95"), col("n_rows"),
          (abs(col("ap").getItem(0) - col("ex").getItem(0)) <=
            lit(0.02) * col("ex").getItem(0)).as("gk50_in_bound"),
          (abs(col("ap").getItem(1) - col("ex").getItem(1)) <=
            lit(0.02) * col("ex").getItem(1)).as("gk95_in_bound")),
      Some("""SELECT l_returnflag,
          quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS ex50,
          quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS ex95,
          count(*) AS n_rows,
          TRUE AS gk50_in_bound, TRUE AS gk95_in_bound
        FROM lineitem GROUP BY l_returnflag""")),

    // Aggregate-function breadth: max_by/min_by (argmax/argmin), count_if,
    // bool_and/bool_or — each a single partial-aggregated shuffle. The
    // argmax ORDER KEY is made UNIQUE by packing (cents, orderkey,
    // linenumber) into one BIGINT (unique while orderkey < 1e9 at these
    // price magnitudes): a bare max_by(x, price) is tie-nondeterministic
    // in BOTH engines, the same trap as q76's mode().
    QueryDef("q85_agg_breadth",
      (s, d) => t(s, d, "lineitem")
        .withColumn("price_key", expr(
          """CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 10000000000
             + l_orderkey * 10 + l_linenumber"""))
        .groupBy("l_suppkey")
        .agg(
          expr("max_by(l_orderkey, price_key)").as("top_order"),
          expr("min_by(l_orderkey, price_key)").as("bottom_order"),
          expr("count_if(l_discount > 0.05)").as("n_discounted"),
          expr("bool_and(l_quantity > 0)").as("all_positive"),
          expr("bool_or(l_tax > 0.07)").as("any_high_tax")),
      Some("""WITH l AS (SELECT *,
            CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 10000000000
              + l_orderkey * 10 + l_linenumber AS price_key
          FROM lineitem)
        SELECT l_suppkey,
          max_by(l_orderkey, price_key) AS top_order,
          min_by(l_orderkey, price_key) AS bottom_order,
          CAST(count_if(l_discount > 0.05) AS BIGINT) AS n_discounted,
          bool_and(l_quantity > 0) AS all_positive,
          bool_or(l_tax > 0.07) AS any_high_tax
        FROM l GROUP BY 1""")),

    // ANSI subquery surface — correlated scalar subquery, correlated
    // EXISTS, and uncorrelated IN, as ONE literal SQL string planned by
    // both engines (the only query where Spark and DuckDB parse the same
    // text). Catalyst decorrelates all three: scalar -> left outer
    // aggregate join, EXISTS -> left semi, IN -> left semi — no per-row
    // subquery execution survives, so the shape is three joins keyed on
    // custkey/nationkey, exactly what you'd write by hand.
    QueryDef("q82_subquery_suite",
      (s, d) => {
        t(s, d, "customer").createOrReplaceTempView("customer")
        t(s, d, "orders").createOrReplaceTempView("orders")
        t(s, d, "nation").createOrReplaceTempView("nation")
        s.sql(SubquerySuiteSql)
      },
      Some(SubquerySuiteSql))
  )

}
