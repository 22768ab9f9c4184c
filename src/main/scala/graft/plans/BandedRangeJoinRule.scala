package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: plan bounded range (theta) joins as banded
  * EQUI-joins instead of nested loops.
  *
  * An inner join whose only cross-side predicate is a bounded difference
  * `lo <= r.t - l.t <= hi` on LONG columns has no equi key, so Spark
  * plans it as BroadcastNestedLoopJoin — every row pair compared, O(n²)
  * work and a full broadcast of one side; at scale it is the single worst
  * plan the engine can emit. But any qualifying pair satisfies
  * `bucket(r.t) ∈ {bucket(l.t + lo), bucket(l.t + lo) + 1}` for buckets of
  * width `hi − lo`: the left side explodes into those two bucket keys, the
  * right side computes its single home bucket, and the join becomes an
  * equi-join on the bucket that Catalyst plans as a shuffled
  * hash/sort-merge join — fully partitionable. The ORIGINAL condition is
  * kept verbatim as the residual, so semantics (strictness, extra
  * conjuncts) are exactly preserved; the rewrite only narrows which pairs
  * are ever compared. This generalizes the hand-banded
  * [[graft.ops.EventOps.proximityPairs]] (q55) into a rule any plain SQL
  * theta join benefits from, installed via [[graft.GraftExtensions]].
  *
  * Bucketing uses truncating integer division (Spark `DIV`). The 2-bucket
  * cover holds for trunc as for floor: trunc is monotone and
  * trunc((x + w)/w) ≤ trunc(x/w) + 1 for any x (equality can fail when the
  * shift crosses zero — trunc's bucket 0 is double-width — but the cover
  * only needs ≤), so r.t ∈ [l.t+lo, l.t+hi] ⟹
  * trunc(r.t/w) ∈ {trunc((l.t+lo)/w), +1} (w = hi − lo; negative epochs
  * included — locked by spec).
  *
  * The rule deliberately does NOT fire when:
  *   - any cross-side EQUI predicate exists (Catalyst already has a
  *     shuffle key; the range belongs in the residual),
  *   - the bound is not finite on both sides (a half-open range has no
  *     band width),
  *   - the time columns are not LongType (no exact bucket arithmetic),
  *   - the plan already contains graft band buckets (fixed-point guard).
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketPrefix = "__graft_band_bucket"

  /** Decompose `e` as (attr, shift) meaning `value = attr + shift`. */
  private def asShifted(e: Expression): Option[(AttributeReference, Long)] = e match {
    case a: AttributeReference if a.dataType == LongType => Some((a, 0L))
    case Add(a: AttributeReference, Literal(k: Long, LongType), _) => Some((a, k))
    case Add(Literal(k: Long, LongType), a: AttributeReference, _) => Some((a, k))
    case Subtract(a: AttributeReference, Literal(k: Long, LongType), _) => Some((a, -k))
    case _ => None
  }

  /** One normalized range conjunct: `rt − lt ∈ (lower ? [k, ∞) : (−∞, k])`
    * with lt from the left child and rt from the right. */
  private case class RangeBound(lt: AttributeReference, rt: AttributeReference,
      lower: Boolean, k: Long)

  /** Normalize a comparison conjunct into a RangeBound, if it is one. */
  private def asBound(c: Expression, leftOut: AttributeSet, rightOut: AttributeSet): Option[RangeBound] = {
    // cmp(X, Y) with X = ax + kx, Y = ay + ky ⟹ ax − ay (>=|<=) ky − kx (±1 for strict)
    def norm(ax: AttributeReference, kx: Long, ay: AttributeReference, ky: Long,
        geq: Boolean, strictAdj: Long): Option[RangeBound] = {
      val k = ky - kx + strictAdj
      if (rightOut.contains(ax) && leftOut.contains(ay))
        Some(RangeBound(ay, ax, lower = geq, k = k)) // rt − lt >=|<= k
      else if (leftOut.contains(ax) && rightOut.contains(ay))
        Some(RangeBound(ax, ay, lower = !geq, k = -k)) // lt − rt >= k ⟺ rt − lt <= −k
      else None
    }
    c match {
      case GreaterThanOrEqual(x, y) =>
        for ((ax, kx) <- asShifted(x); (ay, ky) <- asShifted(y);
             b <- norm(ax, kx, ay, ky, geq = true, 0L)) yield b
      case GreaterThan(x, y) =>
        for ((ax, kx) <- asShifted(x); (ay, ky) <- asShifted(y);
             b <- norm(ax, kx, ay, ky, geq = true, 1L)) yield b
      case LessThanOrEqual(x, y) =>
        for ((ax, kx) <- asShifted(x); (ay, ky) <- asShifted(y);
             b <- norm(ax, kx, ay, ky, geq = false, 0L)) yield b
      case LessThan(x, y) =>
        for ((ax, kx) <- asShifted(x); (ay, ky) <- asShifted(y);
             b <- norm(ax, kx, ay, ky, geq = false, -1L)) yield b
      case _ => None
    }
  }

  private def isCrossEqui(c: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = c match {
    case EqualTo(x, y) =>
      (canEvaluate(x, left) && canEvaluate(y, right)) ||
        (canEvaluate(x, right) && canEvaluate(y, left))
    case EqualNullSafe(x, y) =>
      (canEvaluate(x, left) && canEvaluate(y, right)) ||
        (canEvaluate(x, right) && canEvaluate(y, left))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if (left.outputSet ++ right.outputSet).forall(!_.name.startsWith(BucketPrefix)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (conjuncts.exists(isCrossEqui(_, left, right))) j
      else {
        val bounds = conjuncts.flatMap(asBound(_, left.outputSet, right.outputSet))
        // tightest finite band per (lt, rt) attribute pair; when several
        // pairs qualify, prefer the NARROWEST band (fewest candidate
        // pairs survive the bucket join), tie-broken by exprId so the
        // chosen plan never depends on hash-map iteration order
        val band = bounds.groupBy(b => (b.lt.exprId, b.rt.exprId)).values.flatMap { bs =>
          val lowers = bs.filter(_.lower).map(_.k)
          val uppers = bs.filterNot(_.lower).map(_.k)
          if (lowers.nonEmpty && uppers.nonEmpty && lowers.max <= uppers.min)
            Some((bs.head.lt, bs.head.rt, lowers.max, uppers.min))
          else None
        }.toSeq.sortBy { case (lt, rt, lo, hi) => (hi - lo, lt.exprId.id, rt.exprId.id) }
          .headOption
        band match {
          case None => j
          case Some((lt, rt, lo, hi)) =>
            val w = Literal(math.max(hi - lo, 1L))
            val rBucket = Alias(IntegralDivide(rt, w), s"${BucketPrefix}_r")()
            val rightProj = Project(right.output :+ rBucket, right)
            val lShift = if (lo == 0L) lt: Expression else Add(lt, Literal(lo))
            val b0 = IntegralDivide(lShift, w)
            val lBucket = AttributeReference(s"${BucketPrefix}_l", LongType)()
            val genNode = Generate(
              Explode(CreateArray(Seq(b0, Add(b0, Literal(1L))))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(lBucket), child = left)
            val newCond = And(cond, EqualTo(lBucket, rBucket.toAttribute))
            Project(j.output, Join(genNode, rightProj, Inner, Some(newCond), hint))
        }
      }
  }
}
