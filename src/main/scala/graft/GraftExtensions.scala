package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

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
  * shuffled equi-joins. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.BandedRangeJoinRule)
  }
}
