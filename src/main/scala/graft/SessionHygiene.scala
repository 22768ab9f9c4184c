package graft

import org.apache.spark.sql.SparkSession

/** Session cleanup between independent queries.
  *
  * Several operators pin intermediates via `localCheckpoint()` (see
  * `QueryDef.spread` for why a real materialization barrier is needed):
  * those blocks stay pinned until unpersisted, and a 46-query session
  * would otherwise accumulate them — harmless on a quiet 16g heap, but
  * exactly the debris that amplifies memory pressure under load. The
  * checkpoints are consumed by the CALLER's action (count/write), so the
  * operator itself cannot unpersist; the harness clears them between
  * queries instead.
  *
  * `localCheckpoint` (not reliable checkpoint) is the right primitive for
  * these intermediates: they are cheap to recompute from source on
  * executor loss, are used only within a single query's lifetime, and a
  * reliable checkpoint would pay an HDFS round-trip per query for
  * durability nothing needs.
  */
object SessionHygiene {
  /** Drop cached relations and every pinned RDD block (blocking, so the
    * memory is actually free before the next query starts). */
  def clear(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    // r13: drop per-query session tuning (QueryDef.cpuBound) so it cannot
    // leak into the NEXT query's plan. The leaked minPartitionSize=1b
    // disabled AQE partition coalescing for every query that ran after the
    // first similarity/dedup query — at local[32] that is 32 near-empty
    // tasks per exchange suite-wide (measured ~+0.1 s on q290 immediately
    // after one leaked query; compounding across a 311-query session).
    // Queries that need the tuning re-apply it in their own builders
    // (every cpuBound caller runs it per invocation), so resetting here
    // restores the intended per-query session shape.
    spark.conf.unset("spark.sql.adaptive.coalescePartitions.minPartitionSize")
    spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    spark.conf.unset("spark.sql.join.preferSortMergeJoin")
    spark.conf.unset("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")
  }
}
