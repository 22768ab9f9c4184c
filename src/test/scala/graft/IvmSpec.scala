package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, Pipeline}

/** Incremental-view-maintenance + temporal-join batch (q284/q285). */
class IvmSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"
  def ev = EventOps.events(spark, dir)

  test("q284: the maintained view equals the straight recompute") {
    val maintained = Pipeline.viewMaintenance(ev)
    val direct = ev.select(col("event_type"),
        expr("ts DIV 86400000000000").as("day"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type", "day").agg(
        count(lit(1)).as("n_events"), sum("cents").as("value_cents"),
        countDistinct("user_id").as("n_users"))
    assert(maintained.except(direct).isEmpty && direct.except(maintained).isEmpty,
      "support-table maintenance must lose nothing vs the full rollup")
  }

  test("q284: a view-row merge (no support table) would undercount distincts — " +
      "the support table is load-bearing") {
    // users active on the same (type, day) in both base and delta would
    // double-count if views merged by adding n_users; prove the corpus
    // actually exercises that hazard (otherwise the spec is vacuous)
    val keyed = ev.select(col("event_type"),
      expr("ts DIV 86400000000000").as("day"), col("user_id"))
    val cut = keyed.agg(max("day")).collect()(0).getLong(0) - Pipeline.ViewDeltaDays
    val straddlers = keyed.filter(col("day") > cut)
      .join(keyed.filter(col("day") <= cut), Seq("event_type", "day", "user_id"))
    // (type, day) pairs can't straddle the day-based cut; the hazard is
    // WITHIN a delta day: same user twice on one (type, day)
    val dupInDelta = keyed.filter(col("day") > cut)
      .groupBy("event_type", "day", "user_id").count().filter(col("count") > 1)
    assert(straddlers.isEmpty)
    assert(dupInDelta.count() > 0,
      "corpus must contain repeated (type, day, user) rows for the distinct test to bite")
  }

  test("q285: every event is covered by exactly its day's interval") {
    val rows = EventOps.temporalDimJoin(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_covered") == r.getAs[Long]("n_events"),
        "an event's day is an active day by construction")
      assert(r.getAs[Long]("n_last_value") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_last_value") >= 1L,
        "each day's last event always matches its own snapshot")
    }
  }

  test("plans: q285 joins user-keyed equi (never nested-loop); q284 delta " +
      "merge is a union re-rollup above the checkpointed support") {
    def planOf(name: String): String =
      SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val p285 = planOf("q285_temporal_dim_join")
    assert(!p285.contains("BroadcastNestedLoopJoin") && !p285.contains("CartesianProduct"),
      "interval predicate must ride the user_id equi-join as a residual")
    val p284 = planOf("q284_view_maintenance")
    assert(p284.contains("Union"), "delta merges by union + re-rollup")
    assert(p284.contains("Scan ExistingRDD") || p284.contains("LocalTableScan")
      || p284.contains("Checkpoint"), "stored support must be a materialized artifact")
  }
}
