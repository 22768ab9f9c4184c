package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BandedRangeJoinRule: bounded theta joins become banded equi-joins
  * (no BroadcastNestedLoopJoin), with semantics exactly preserved — and
  * the rule declines every case it cannot prove. */
class RangeJoinRuleSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    SparkSpec.spark // shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    s
  }

  // deterministic scattered longs, including negatives (epoch-before-1970)
  private def table(n: Int, seed: Long): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val t = ((i * 2654435761L + seed) % 2000L) - 1000L
      (i.toLong + seed, t)
    }.toDF("id", "t")
  }

  private def naive(a: Seq[(Long, Long)], b: Seq[(Long, Long)],
      p: (Long, Long) => Boolean): Set[(Long, Long)] =
    (for ((ia, ta) <- a; (ib, tb) <- b if p(ta, tb)) yield (ia, ib)).toSet

  private def collected(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def rows(df: DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("bounded range join: banded plan, no BNLJ, rows exactly preserved (negatives included)") {
    val a = table(150, 0); val b = table(170, 7)
    val j = a.as("a").join(b.as("b"),
      col("b.t") >= col("a.t") && col("b.t") <= col("a.t") + lit(10L))
      .select(col("a.id"), col("b.id"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"still a nested loop:\n$plan")
    assert(plan.contains("__graft_band_bucket"), "band buckets must appear in the plan")
    val expected = naive(rows(a), rows(b), (ta, tb) => tb >= ta && tb <= ta + 10)
    assert(collected(j) == expected && expected.nonEmpty)
  }

  test("strict bounds and reversed operand order are honored exactly") {
    val a = table(120, 3); val b = table(120, 11)
    // lt < rt AND lt + 9 > rt  (left attr written first on both)
    val j = a.as("a").join(b.as("b"),
      col("a.t") < col("b.t") && col("a.t") + lit(9L) > col("b.t"))
      .select(col("a.id"), col("b.id"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__graft_band_bucket"))
    val expected = naive(rows(a), rows(b), (ta, tb) => ta < tb && ta + 9 > tb)
    assert(collected(j) == expected && expected.nonEmpty)
  }

  test("declines: cross-side equi key present (range stays residual of the equi join)") {
    val a = table(80, 0).withColumn("k", col("id") % 5)
    val b = table(80, 0).withColumn("k", col("id") % 5)
    val j = a.as("a").join(b.as("b"),
      col("a.k") === col("b.k") &&
        col("b.t") >= col("a.t") && col("b.t") <= col("a.t") + lit(10L))
      .select(col("a.id"), col("b.id"))
    j.collect()
    assert(!j.queryExecution.executedPlan.toString.contains("__graft_band_bucket"))
  }

  test("declines: half-open range (no finite band width)") {
    val a = table(60, 0); val b = table(60, 5)
    val j = a.as("a").join(b.as("b"), col("b.t") >= col("a.t"))
      .select(col("a.id"), col("b.id"))
    j.collect()
    assert(!j.queryExecution.executedPlan.toString.contains("__graft_band_bucket"))
    assert(collected(j) == naive(rows(a), rows(b), (ta, tb) => tb >= ta))
  }

  test("declines: contradictory band (lo > hi) — empty result, no rewrite") {
    val a = table(40, 0); val b = table(40, 5)
    val j = a.as("a").join(b.as("b"),
      col("b.t") >= col("a.t") + lit(20L) && col("b.t") <= col("a.t") + lit(5L))
      .select(col("a.id"), col("b.id"))
    j.collect()
    assert(!j.queryExecution.executedPlan.toString.contains("__graft_band_bucket"))
    assert(collected(j).isEmpty)
  }

  test("zero-width band (equality expressed as two bounds) still equi-planned and exact") {
    val a = table(100, 0); val b = table(100, 13)
    val j = a.as("a").join(b.as("b"),
      col("b.t") >= col("a.t") && col("b.t") <= col("a.t"))
      .select(col("a.id"), col("b.id"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__graft_band_bucket"))
    assert(collected(j) == naive(rows(a), rows(b), (ta, tb) => tb == ta))
  }

  test("property: random bounds and data — banded rows == naive rows, every case") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      na <- Gen.choose(5, 60); nb <- Gen.choose(5, 60)
      sa <- Gen.choose(-900L, 900L); sb <- Gen.choose(-900L, 900L)
      lo <- Gen.choose(-40L, 40L); width <- Gen.choose(0L, 80L)
      strictLo <- Gen.oneOf(true, false); strictHi <- Gen.oneOf(true, false)
    } yield (na, nb, sa, sb, lo, lo + width, strictLo, strictHi)
    (0 until 40).foreach { i =>
      caseGen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach {
        case (na, nb, sa, sb, lo, hi, strictLo, strictHi) =>
          val a = table(na, sa); val b = table(nb, sb)
          val loC = col("a.t") + lit(lo); val hiC = col("a.t") + lit(hi)
          val cond =
            (if (strictLo) col("b.t") > loC else col("b.t") >= loC) &&
              (if (strictHi) col("b.t") < hiC else col("b.t") <= hiC)
          val j = a.as("a").join(b.as("b"), cond).select(col("a.id"), col("b.id"))
          j.collect()
          val plan = j.queryExecution.executedPlan.toString
          val expected = naive(rows(a), rows(b), (ta, tb) =>
            (if (strictLo) tb > ta + lo else tb >= ta + lo) &&
              (if (strictHi) tb < ta + hi else tb <= ta + hi))
          assert(collected(j) == expected, s"case $i rows diverge")
          // a non-degenerate band must actually be rewritten (degenerate =
          // empty band after strictness adjustment)
          val bandEmpty = (if (strictLo) lo + 1 else lo) > (if (strictHi) hi - 1 else hi)
          if (!bandEmpty)
            assert(plan.contains("__graft_band_bucket") && !plan.contains("BroadcastNestedLoopJoin"),
              s"case $i not banded:\n$plan")
      }
    }
  }

  test("plain SQL theta join through the extensions session is banded too") {
    table(90, 0).createOrReplaceTempView("ra")
    table(90, 21).createOrReplaceTempView("rb")
    val j = spark.sql(
      """SELECT ra.id AS ida, rb.id AS idb FROM ra JOIN rb
         ON rb.t BETWEEN ra.t AND ra.t + 10""")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__graft_band_bucket"))
    val expected = naive(rows(spark.table("ra")), rows(spark.table("rb")),
      (ta, tb) => tb >= ta && tb <= ta + 10)
    assert(collected(j) == expected && expected.nonEmpty)
  }
}
