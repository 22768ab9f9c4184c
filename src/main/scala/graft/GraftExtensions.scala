package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Spark-idiomatic installation of the graft surface: pass
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`) and every
  * custom expression resolves in plain `spark.sql(...)` on any session of
  * that context — no per-session `register` call, and the functions are
  * catalog-visible (`SHOW FUNCTIONS`, `DESCRIBE FUNCTION`) like
  * built-ins. The expression inventory is shared with the session-scoped
  * [[graft.functions.GraftFunctions.register]] route so the two can never
  * drift. Also injects [[graft.plans.BandedRangeJoinRule]], which re-plans
  * bounded range (theta) joins from BroadcastNestedLoopJoin into banded
  * shuffled equi-joins, and the `tebis_scan('/dir')` table-valued
  * function, so SQL-only users read TEBIS trees without touching the
  * DataFrame API:
  * `SELECT externalId, avg(value) FROM tebis_scan('/data') GROUP BY 1`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.BandedRangeJoinRule)
    ext.injectTableFunction((
      FunctionIdentifier("tebis_scan"),
      new ExpressionInfo("graft.sources.TebisDataSource", "tebis_scan"),
      (args: Seq[Expression]) => args match {
        // resolves through the registered "tebis" DataSourceV2 (one
        // partition per file, pruning/pushdown intact); the builder runs
        // at analysis time on the active session, yielding the source's
        // analyzed relation as the TVF's plan
        case Seq(Literal(path: UTF8String, StringType)) =>
          SparkSession.active.read.format("tebis").load(path.toString)
            .queryExecution.analyzed
        case _ =>
          throw new IllegalArgumentException(
            "tebis_scan expects exactly one STRING literal: tebis_scan('/path')")
      }))
  }
}
