package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, Layout, Similarity}

/** Governance-card batch (q286–q288): brute recomputes, conservation,
  * and the rendezvous-beats-modulo guarantee. */
class CardsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  test("q286 label confusion: assignment equals a driver-side brute argmin") {
    val card = Similarity.labelConfusion(spark, dir).collect()
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("label").cast("int"),
        expr(Similarity.quantExpr).as("qv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
    // centroids exactly as the op builds them: truncated per-dim means
    val cents = vecs.groupBy(_._1).view.mapValues { rows =>
      val dim = rows.head._2.length
      Array.tabulate(dim)(i => rows.map(_._2(i)).sum / rows.length)
    }.toMap
    def d2(v: Array[Long], c: Array[Long]): Long =
      v.map(x => x * x).sum + c.map(x => x * x).sum -
        2L * v.zip(c).map { case (a, b) => a * b }.sum
    val brute = vecs.map { case (l, v) =>
      val pred = cents.toSeq.map { case (cl, cv) => (d2(v, cv), cl) }.min._2
      (l.toLong, pred.toLong)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = card.map(r => (r.getAs[Int]("label").toLong,
      r.getAs[Long]("pred_label")) -> r.getAs[Long]("n")).toMap
    assert(got == brute, "confusion counts must equal the brute argmin")
    assert(card.map(_.getAs[Long]("n")).sum == vecs.length.toLong)
  }

  test("q287 experiment readout: arm rollup conserves users; rates bounded") {
    val rows = EventOps.experimentReadout(EventOps.events(spark, dir)).collect()
    assert(rows.map(_.getAs[String]("arm")).sorted.toSeq ==
      Seq("control", "treatment"))
    val users = EventOps.events(spark, dir).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_buyers") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("cvr_micro") <= 1000000L)
    }
  }

  test("q288 shard rebalance: rendezvous moves a fraction of what modulo moves") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val byScheme = Layout.shardRebalance(docs).collect()
      .map(r => r.getAs[String]("scheme") -> r).toMap
    val (mod, hrw) = (byScheme("modulo"), byScheme("rendezvous"))
    assert(mod.getAs[Long]("n_docs") == hrw.getAs[Long]("n_docs"))
    assert(hrw.getAs[Long]("n_moved") * 4 < mod.getAs[Long]("n_moved"),
      "HRW must move roughly 1/n vs modulo's (n-1)/n")
    // expectation bands: modulo ~16/17 of docs, HRW ~1/17
    val n = mod.getAs[Long]("n_docs").toDouble
    assert(mod.getAs[Long]("n_moved") > 0.8 * n)
    assert(hrw.getAs[Long]("n_moved") < 0.2 * n)
  }

  test("plans: q286 per-vector argmin is exchange-free; q288 is join-free") {
    def planOf(name: String): String =
      SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val p288 = planOf("q288_shard_rebalance")
    assert(!p288.contains("Join"), "q288 is a projection + 2-row rollup")
    val p287 = planOf("q287_experiment_readout")
    assert(!p287.contains("Join") && !p287.contains("Exchange rangepartitioning"))
    // q286: the only joins allowed are the labels²-bounded broadcast share join
    val p286 = planOf("q286_label_confusion")
    assert(!p286.contains("SortMergeJoin") && !p286.contains("CartesianProduct"),
      "q286 must never pairwise-join the vector table")
  }
}
