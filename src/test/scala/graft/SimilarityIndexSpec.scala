package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** r11 persisted-index locks (VERDICT asks 3 + 4): the bucketed index
  * answers byte-identically to the freshly built one while its cell
  * join plans with ZERO Exchange, and the q296 member cap composes into
  * the persisted path as a pure candidate-subset. */
class SimilarityIndexSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  private def idx = Similarity.persistedIvfIndexDir(spark, dir)

  test("persisted round-trip: knnIvfPersisted == knnIvf row-identical " +
      "(the q129 invariant survives the bucketed rewrite)") {
    val persisted = Similarity.knnIvfPersisted(spark, idx, 3)
      .collect().map(_.toSeq).toSet
    val fresh = Similarity.knnIvf(spark, dir, 3).collect().map(_.toSeq).toSet
    assert(persisted == fresh)
  }

  test("the persisted index is a bucketed table and its cell self-join " +
      "plans with ZERO ShuffleExchange (member side never re-shuffles)") {
    val i = idx // force the build
    val conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-based join path: a broadcast join would hide a
      // missing bucket claim (its member side is exchange-free anyway)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val pairs = Similarity.ivfScoredPairs(spark, i)
      val exchanges = pairs.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed cell join must not exchange, found:\n${pairs.queryExecution.sparkPlan}")
      // and the capped variant's window must ride the same bucketing
      val capped = Similarity.ivfScoredPairs(spark, i,
        memberCap = Similarity.IvfMemberCap)
      val cexch = capped.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(cexch.isEmpty,
        "the per-cell cap window partitions by the bucket key — no exchange")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
  }

  test("capped persisted pairs ⊆ uncapped persisted pairs, and the cap " +
      "bites (q303's candidate algebra on the PRODUCTION index path)") {
    val capped = Similarity.ivfScoredPairs(spark, idx,
      memberCap = Similarity.IvfMemberCap).select("id_a", "id_b")
    val uncapped = Similarity.ivfScoredPairs(spark, idx).select("id_a", "id_b")
    assert(capped.except(uncapped).isEmpty, "capped ⊆ uncapped")
    assert(capped.count() < uncapped.count(),
      "the shipped cap must actually bite at sf0.001")
  }

  test("capped persisted == capped from-scratch (q303 == q296 row for " +
      "row: the draw depends only on vec_id and cell, not on the path)") {
    val persisted = Similarity.knnIvfPersisted(spark, idx, 3,
      memberCap = Similarity.IvfMemberCap).collect().map(_.toSeq).toSet
    val fresh = Similarity.knnIvfCapped(spark, dir, 3)
      .collect().map(_.toSeq).toSet
    assert(persisted == fresh)
  }

  test("streamed split view: quadrant decomposition == union form row-" +
      "identical, and the BASE side never shuffles (broadcast appends)") {
    import graft.ops.Similarity
    val q = Similarity.quantized(spark, dir).select("vec_id", "qv", "nrm")
      .localCheckpoint()
    val sidx = java.nio.file.Files.createTempDirectory("split-idx").toString
    Similarity.saveIvfIndexOn(spark, q.filter(expr("vec_id % 2 = 0")), sidx)
    // the streamed layout without a stream: assignment rows of the odd
    // half land as one appends batch partition (what appendStream writes)
    val cents = spark.read.parquet(s"$sidx/centroids")
    Similarity.assignCells(q.filter(expr("vec_id % 2 = 1")), cents,
        Similarity.IvfNprobe)
      .write.parquet(s"$sidx/appends/batch_id=0")
    val viaSplit = graft.streaming.IndexStream.knn(spark, sidx, 3)
      .collect().map(_.toSeq).toSet
    val viaUnion = Similarity.knnIvfOnAssignments(spark,
        graft.streaming.IndexStream.assignments(spark, sidx), 3)
      .collect().map(_.toSeq).toSet
    assert(viaSplit == viaUnion,
      "join must distribute over the base/appends union")
    val conf = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val base = Similarity.assignmentsRead(spark, sidx)
      val app = graft.streaming.StreamState.read(spark, s"$sidx/appends").get
      val pairs = Similarity.ivfScoredPairsSplit(spark, base, app)
      val exch = pairs.queryExecution.sparkPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exch.isEmpty,
        s"split view must not shuffle the base:\n${pairs.queryExecution.sparkPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", conf)
  }

  test("streamed-index query surface honors the member cap (IndexStream" +
      ".knn capped ⊆ uncapped on a base-only index)") {
    val capped = graft.streaming.IndexStream.knn(spark, idx, 3,
      memberCap = 1000000).collect().map(_.toSeq).toSet
    val uncapped = graft.streaming.IndexStream.knn(spark, idx, 3)
      .collect().map(_.toSeq).toSet
    assert(capped == uncapped, "an unreached cap must be a no-op here too")
  }
}
