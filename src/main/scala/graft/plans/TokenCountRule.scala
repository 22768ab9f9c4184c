package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Size, StringSplit}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.SpaceTokenCount

/** Catalyst optimizer rule (r13, guide §1.2 step 2 "per-task work"):
  * rewrite `size(split(s, ' '))` — the suite's universal token counter,
  * 27 call sites across 9 ops modules — into the codegen'd byte scan
  * [[graft.functions.SpaceTokenCount]], which never materializes the
  * token array (one UTF8String allocation per token per row in the
  * split form, zero in the scan form).
  *
  * Equivalence is exact, not approximate:
  *   - `split` with the default limit −1 keeps EVERY empty token
  *     (leading/interior/trailing), so the array size is always
  *     (number of spaces) + 1 — including the empty string, whose split
  *     is `[""]` (size 1 = 0 spaces + 1);
  *   - the pattern must be the LITERAL single space — a one-character
  *     regex with no metacharacters, matching exactly the 0x20 byte,
  *     which never occurs inside a multi-byte UTF-8 sequence;
  *   - NULL input: the rule only fires when `size` runs with
  *     `legacySizeOfNull = false` (the Spark 3+/4 default), where
  *     size(NULL) is NULL — exactly the UnaryExpression null
  *     propagation of the replacement. Under legacy −1 semantics the
  *     rule declines.
  * Installed via [[graft.GraftExtensions]]; the rewrite is visible in
  * every explain as `spacetokencount(text)` replacing
  * `size(split(text, ' ', -1))`, so plan claims are checkable. */
object TokenCountRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(str, Literal(p: UTF8String, StringType),
          Literal(-1, IntegerType)), false) if p.toString == " " =>
        SpaceTokenCount(str)
    }
}
