package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.Md5PrefixLong

/** Catalyst optimizer rule (r13, guide §1.2 step 2 "per-task work"):
  * rewrite `CAST(conv(substr(md5(x), 1, n), 16, 10) AS BIGINT)` — the
  * suite's universal uniform-hash draw (KMV sketches q299/q300/q230/q234,
  * classifier feature buckets, dedup fold assignment) — into the
  * codegen'd digest fold [[graft.functions.Md5PrefixLong]]. The chain
  * allocates, PER ROW: the 32-char hex rendering of the digest, a
  * substring copy, `conv`'s radix parse + decimal-string re-render, and
  * the final string→long parse; the replacement reads the same value as
  * one shift-or fold over the digest's top n nibbles.
  *
  * Equivalence is exact for 1 ≤ n ≤ 15:
  *   - the first n hex chars of md5's lowercase-hex output ARE the top
  *     n nibbles of the digest, most-significant first;
  *   - n ≤ 15 keeps the value < 2^60: `conv`'s unsigned-64 read, its
  *     decimal render, and the BIGINT cast parse are all exact and can
  *     never overflow/misparse, so ANSI, LEGACY and TRY eval modes agree
  *     (the rule therefore matches ANY Cast evalMode / Conv ansi flag);
  *   - NULL input: every link of the chain is null-propagating, as is
  *     the replacement's UnaryExpression null handling.
  * The rewrite keeps Md5's own child (already BinaryType after analysis)
  * so the analyzer-inserted string→binary cast — the bytes being hashed —
  * is untouched. Installed via [[graft.GraftExtensions]]; visible in
  * explain as `md5prefixlong(x)`, so plan claims are checkable. */
object Md5PrefixRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Cast(
            Conv(
              Substring(Md5(b), Literal(1, IntegerType), Literal(n: Int, IntegerType)),
              Literal(16, IntegerType), Literal(10, IntegerType), _),
            LongType, _, _) if n >= 1 && n <= 15 =>
        Md5PrefixLong(b, n)
    }
}
