package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Capped-probe IVF locks (q296–q298, SCALE.md lesson 4's answer):
  * the cap must only ever SHRINK the candidate set, vanish entirely
  * once it clears the largest cell, and price its recall on the same
  * truth axis as q243. */
class SimilarityCappedSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  test("capped candidate pairs are a subset of the uncapped pairs") {
    val capped = Similarity.ivfCappedScoredPairs(spark, dir, Similarity.IvfMemberCap)
      .select("id_a", "id_b")
    val uncapped = Similarity.ivfCappedScoredPairs(spark, dir, Int.MaxValue)
      .select("id_a", "id_b")
    assert(capped.except(uncapped).isEmpty, "capped ⊆ uncapped")
    assert(capped.count() < uncapped.count(),
      s"cap=${Similarity.IvfMemberCap} must actually bite at sf0.001 " +
        "(a vacuous gate proves nothing)")
  }

  test("cap >= largest cell: knnIvfCapped == knnIvf row-identical") {
    val capped = Similarity.knnIvfCapped(spark, dir, 3, cap = 1000000)
      .collect().map(_.toSeq).toSet
    val exact = Similarity.knnIvf(spark, dir, 3)
      .collect().map(_.toSeq).toSet
    assert(capped == exact, "an unreached cap must be a no-op")
  }

  test("LSH bucket cap (q304, r11): capped candidates ⊆ uncapped, the " +
      "cap bites, and an unreached cap is a row-identical no-op") {
    val capped = Similarity.lshCandidatePairs(spark, dir, Similarity.IvfMemberCap)
    val uncapped = Similarity.lshCandidatePairs(spark, dir)
    assert(capped.except(uncapped).isEmpty, "capped ⊆ uncapped")
    assert(capped.count() < uncapped.count(),
      s"cap=${Similarity.IvfMemberCap} must bite on the band buckets at sf0.001")
    val noop = Similarity.knnLshCapped(spark, dir, 3, cap = 1000000)
      .collect().map(_.toSeq).toSet
    val exact = Similarity.knnLsh(spark, dir, 3).collect().map(_.toSeq).toSet
    assert(noop == exact, "a cap above the largest bucket must be a no-op")
  }

  test("semantic-dedup blocker cap (q305, r11): capped keeps ⊇ uncapped " +
      "keeps (monotone — a cap can only ADMIT more), the cap bites, and " +
      "an unreached cap is a row-identical no-op") {
    import org.apache.spark.sql.functions.col
    def keptIds(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("kept")).select("vec_id").collect().map(_.getLong(0)).toSet
    val capped = keptIds(Similarity.semanticDedupCapped(spark, dir, cap = 2))
    val uncapped = keptIds(Similarity.semanticDedup(spark, dir))
    assert(uncapped.subsetOf(capped), "a capped blocker set can only admit more")
    assert(capped.size > uncapped.size,
      "cap=2 must actually bite at sf0.001 (a vacuous gate proves nothing)")
    val noop = Similarity.semanticDedupCapped(spark, dir, cap = 1000000)
      .collect().map(_.toSeq).toSet
    val exact = Similarity.semanticDedup(spark, dir).collect().map(_.toSeq).toSet
    assert(noop == exact, "a cap above the largest cell must be a no-op")
  }

  test("cap >= largest cell: capped IVF-PQ == q66 row-identical") {
    val capped = Similarity.knnIvfPq(spark, dir, 3, memberCap = 1000000)
      .collect().map(_.toSeq).toSet
    val exact = Similarity.knnIvfPq(spark, dir, 3)
      .collect().map(_.toSeq).toSet
    assert(capped == exact)
  }

  test("q298 curve: recall monotone in the cap; the unreachable-cap point " +
      "reproduces q243's nprobe=2 recall exactly") {
    val curve = Similarity.ivfCappedRecallCurve(spark, dir)
      .orderBy("cap").collect()
    assert(curve.length == 4)
    val recalls = curve.map(_.getAs[Long]("recall_micro"))
    // candidate sets are nested (the md5 rank is cap-independent) and both
    // rankings share the (sim desc, id asc) total order, so a truth member
    // in the smaller set's top-k can never leave the larger set's top-k
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not decrease with the cap: ${recalls.toSeq}")
    val q243 = Similarity.ivfRecallCurve(spark, dir)
      .filter(col("nprobe") === Similarity.IvfNprobe).collect()(0)
    val top = curve.last
    assert(top.getAs[Long]("cap") == 1000000L)
    assert(top.getAs[Long]("n_hit") == q243.getAs[Long]("n_hit") &&
      top.getAs[Long]("recall_micro") == q243.getAs[Long]("recall_micro"),
      "cap=1e6 reaches no cell, so the curve must end ON q243's point")
  }
}
