package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Locks the r13 rank-window → bounded-TopKSim swaps in the similarity
  * family to the ORIGINAL window formulations, row-for-row. The swap's
  * claim is that the aggregator realizes the identical total order
  * (sim DESC, id ASC) the window spelled — so the optimized operators
  * must equal a window twin built inline here (the pre-r13 shape), not
  * just satisfy behavioral properties. */
class TopKPlanSwapSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("knnBrute == rank-window twin (k = 5)") {
    val got = Similarity.knnBrute(spark, dir, 5)
    // the pre-r13 window formulation, inline
    val q = graft.ops.Similarity.quantized(spark, dir)
    val a = q.select(col("vec_id").as("id_a"), col("qv").as("qa"), col("nrm").as("na"))
    val b = q.select(col("vec_id").as("id_b"), col("qv").as("qb"), col("nrm").as("nb"))
    val sim = coalesce(
      try_divide(expr("CAST(quantized_dot(qa, qb) AS DOUBLE)"),
        sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
      lit(Double.NegativeInfinity))
    val w = Window.partitionBy("id_a").orderBy(col("sim").desc, col("id_b").asc)
    val twin = a.join(b, col("id_a") =!= col("id_b"))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("id_a").as("vec_id"), col("rank"), col("id_b").as("neighbor_id"), col("sim"))
    assert(got.count() > 0)
    assert(rows(got) == rows(twin))
  }

  test("knnLsh == rank-window twin over the same candidate sims (k = 3)") {
    val got = Similarity.knnLsh(spark, dir, 3)
    // rebuild the directed candidate sims exactly as knnLsh does, then
    // rank them with the pre-r13 window
    val directed = Similarity.lshDirectedSims(spark, dir)
    val w = Window.partitionBy("id_a").orderBy(col("sim").desc, col("id_b").asc)
    val twin = directed
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("id_a").as("vec_id"), col("rank"), col("id_b").as("neighbor_id"), col("sim"))
    assert(got.count() > 0)
    assert(rows(got) == rows(twin))
  }

  test("hardTriplets == rank-window twin") {
    val got = Similarity.hardTriplets(spark, dir)
    val q = graft.ops.Similarity.quantized(spark, dir)
    val a = q.select(col("vec_id").as("id_a"), col("qv").as("qa"),
      col("nrm").as("na"), col("label").as("label_a"))
    val b = q.select(col("vec_id").as("id_b"), col("qv").as("qb"),
      col("nrm").as("nb"), col("label").as("label_b"))
    val sim = coalesce(
      try_divide(expr("CAST(quantized_dot(qa, qb) AS DOUBLE)"),
        sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))),
      lit(Double.NegativeInfinity))
    val w = Window.partitionBy("id_a", "grp").orderBy(col("sim").desc, col("id_b").asc)
    val top = a.join(b, col("id_a") =!= col("id_b"))
      .withColumn("sim", sim)
      .withColumn("grp", when(col("label_a") === col("label_b"), "pos").otherwise("neg"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val twin = top.groupBy(col("id_a").as("vec_id"))
      .agg(
        max(when(col("grp") === "pos", col("id_b"))).as("pos_id"),
        max(when(col("grp") === "pos", col("sim"))).as("pos_sim"),
        max(when(col("grp") === "neg", col("id_b"))).as("neg_id"),
        max(when(col("grp") === "neg", col("sim"))).as("neg_sim"))
      .withColumn("margin", col("pos_sim") - col("neg_sim"))
    assert(got.count() > 0)
    assert(rows(got) == rows(twin))
  }
}
