package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** Recall of the approximate similarity indexes vs exact brute force at
  * sf0.01 (500 x 64-d vectors, near-isotropic — the hard case: recall is
  * bounded by candidate volume when embeddings lack cluster structure;
  * real clustered corpora prune far harder at the same recall). */
class SimilarityRecallSpec extends AnyFunSuite {
  private val spark = SparkSpec.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val truth: Set[(Long, Long)] =
    Similarity.knnBrute(spark, dir, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet

  private def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    truth.intersect(approx).size.toDouble / truth.size
  }

  test("multi-table LSH recall@3 >= 0.9") {
    val r = recallOf(Similarity.knnLsh(spark, dir, 3).collect())
    info(f"lsh recall@3 = $r%.3f (${Similarity.LshTables} tables x ${Similarity.LshBits} bits)")
    assert(r >= 0.9, f"LSH recall $r%.3f < 0.9")
  }

  test("IVF recall@3 rises with nprobe; >= 0.9 at probe fraction 3/4") {
    // With the DERIVED cell count k ~ sqrt(n), recall on near-isotropic
    // data tracks the probe FRACTION nprobe/k (candidate volume), so the
    // ladder is expressed in fractions of k, not fixed cell counts —
    // the bound stays meaningful at any corpus size.
    val k = Similarity.ivfCentroidsFor(
      spark.read.parquet(s"$dir/embeddings.parquet").count())
    val probes = Seq(math.max(2, k / 8), math.max(4, k / 4), (3 * k + 3) / 4)
    val rs = probes.map { np =>
      val r = recallOf(Similarity.knnIvf(spark, dir, 3, nprobe = np).collect())
      info(f"ivf recall@3 (k=$k nprobe=$np%2d) = $r%.3f")
      SessionHygiene.clear(spark)
      np -> r
    }
    assert(rs.sliding(2).forall { case Seq(a, b) => a._2 < b._2 },
      s"recall must rise with nprobe: $rs")
    assert(rs.last._2 >= 0.9, f"IVF recall ${rs.last._2}%.3f < 0.9 at nprobe=${rs.last._1}")
  }

  test("derived-k recall holds at 10x: sf0.1 trains k=ceil(sqrt(n)) cells, >= 0.9 at probe fraction 3/4") {
    val dir10 = "/root/testdata/sf0.1"
    val n10 = spark.read.parquet(s"$dir10/embeddings.parquet").count()
    val k = Similarity.ivfCentroidsFor(n10)
    assert(k > Similarity.IvfCentroids, s"10x corpus must derive a larger k (got $k)")
    val truth10 = Similarity.knnBrute(spark, dir10, 3).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    SessionHygiene.clear(spark)
    val rows = Similarity.knnIvf(spark, dir10, 3, nprobe = (3 * k + 3) / 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val r = truth10.intersect(rows).size.toDouble / truth10.size
    info(f"ivf recall@3 at 10x (n=$n10 k=$k nprobe=${(3 * k + 3) / 4}) = $r%.3f")
    SessionHygiene.clear(spark)
    assert(r >= 0.9, f"derived-k recall $r%.3f < 0.9 at 10x")
  }

  test("IVF-PQ: uncut ADC equals plain IVF; the default cut stays close") {
    val ivfRows = Similarity.knnIvf(spark, dir, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ivf = recallOf(Similarity.knnIvf(spark, dir, 3).collect())
    SessionHygiene.clear(spark)
    // ADC only ORDERS candidates; with the cut wider than any cell the
    // exact re-rank sees the identical candidate set, so the result must
    // EQUAL plain IVF row-for-row — locks reconstruction/scoring bugs out
    val uncut = Similarity.knnIvfPq(spark, dir, 3, candidates = 1000000).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(uncut == ivfRows, "uncut IVF-PQ must reproduce plain IVF exactly")
    SessionHygiene.clear(spark)
    val pq = recallOf(Similarity.knnIvfPq(spark, dir, 3).collect())
    info(f"ivf-pq recall@3 = $pq%.3f vs ivf $ivf%.3f (ADC keeps ${Similarity.PqCandidates})")
    SessionHygiene.clear(spark)
    // the production cut loses only ADC-misranked tail: near-isotropic
    // data is the reconstruction worst case, so allow 0.1 of slack
    assert(pq >= ivf - 0.1, f"ivf-pq recall $pq%.3f vs ivf $ivf%.3f")
  }

  test("k-means training is partitioning-invariant (integer sums commute)") {
    import org.apache.spark.sql.functions.{col, expr}
    def cents(parts: Int) = {
      val q = Similarity.quantized(spark, dir).select("vec_id", "qv", "nrm")
        .repartition(parts).localCheckpoint()
      val c = Similarity.kmeansCentroids(q, 16, 2).orderBy("cent_id")
        .select(col("cent_id"), expr("cast(cqv AS ARRAY<BIGINT>)").as("cqv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      SessionHygiene.clear(spark)
      c.toSeq
    }
    // per-dimension integer sums are order- and partitioning-independent,
    // so the trained index must be bit-identical however the data splits
    assert(cents(3) == cents(13))
  }

  test("centroid caches are semantics-free: warm re-run equals a cold run") {
    Similarity.coarseCache.clear()
    Similarity.pqCodebookCache.clear()
    val cold = Similarity.clusterProfile(spark, dir).collect().map(_.toString).sorted
    SessionHygiene.clear(spark)
    assert(Similarity.coarseCache.nonEmpty, "cold run must seed the cache")
    val warm = Similarity.clusterProfile(spark, dir).collect().map(_.toString).sorted
    assert(cold.sameElements(warm), "cached centroids changed the result")
    SessionHygiene.clear(spark)
    val pqCold = Similarity.knnIvfPq(spark, dir, 3).collect().map(_.toString).sorted
    SessionHygiene.clear(spark)
    val pqWarm = Similarity.knnIvfPq(spark, dir, 3).collect().map(_.toString).sorted
    assert(pqCold.sameElements(pqWarm), "cached PQ codebooks changed the result")
    SessionHygiene.clear(spark)
  }

  test("recall-curve truth memo is semantics-free: warm re-run equals a cold run") {
    // q243's truth table is a pure function of (corpus, k, sampleMod) and
    // is persisted via Memo; the warm path must be answer-identical to
    // the cold build (the oracle gates cold — this locks warm).
    graft.ops.Memo.clear()
    val cold = Similarity.ivfRecallCurve(spark, dir).collect().map(_.toString).sorted
    SessionHygiene.clear(spark)
    val warm = Similarity.ivfRecallCurve(spark, dir).collect().map(_.toString).sorted
    assert(cold.sameElements(warm), "memoized truth table changed the curve")
    SessionHygiene.clear(spark)
  }

  test("coarse cache invalidates when the directory's parquet content changes") {
    import org.apache.spark.sql.functions.expr
    val tmp = java.nio.file.Files.createTempDirectory("graft-stale").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    src.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val (_, c1, k1) = Similarity.coarseIndex(spark, tmp)
    val cents1 = c1.orderBy("cent_id").collect().map(_.toString).toSeq
    SessionHygiene.clear(spark)
    // Same ROW COUNT — so the derived k, and with it the old
    // (dir, k, iters) cache key, is IDENTICAL — but different content:
    // without the content fingerprint in the key, the second call would
    // serve the first corpus's centroids for the mutated data.
    src.withColumn("embedding", expr("transform(embedding, x -> -x)"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val (_, c2, k2) = Similarity.coarseIndex(spark, tmp)
    val cents2 = c2.orderBy("cent_id").collect().map(_.toString).toSeq
    assert(k1 == k2, "mutation must keep the derived k (the collision under test)")
    assert(cents1 != cents2, "mutated directory must retrain, not serve stale centroids")
    SessionHygiene.clear(spark)
  }

  test("trained centroids beat the untrained init at equal nprobe") {
    val untrained = recallOf(Similarity.knnIvf(spark, dir, 3, iters = 0, nprobe = 4).collect())
    SessionHygiene.clear(spark)
    val trained = recallOf(Similarity.knnIvf(spark, dir, 3, iters = 2, nprobe = 4).collect())
    info(f"ivf recall@3 nprobe=4: trained=$trained%.3f untrained=$untrained%.3f")
    assert(trained > untrained)
  }

  test("ivf incremental append: two smaller appends equal one (assignment is per-vector)") {
    import org.apache.spark.sql.functions._
    val q = Similarity.quantized(spark, dir)
      .select("vec_id", "qv", "nrm").localCheckpoint()
    val base = q.filter(expr("vec_id % 2 = 0"))
    val i1 = java.nio.file.Files.createTempDirectory("ivf-incr-1").toString
    Similarity.saveIvfIndexOn(spark, base, i1)
    Similarity.appendToIvfIndex(spark, i1, q.filter(expr("vec_id % 2 = 1")))
    val i2 = java.nio.file.Files.createTempDirectory("ivf-incr-2").toString
    Similarity.saveIvfIndexOn(spark, base, i2)
    Similarity.appendToIvfIndex(spark, i2, q.filter(expr("vec_id % 4 = 1")))
    Similarity.appendToIvfIndex(spark, i2, q.filter(expr("vec_id % 4 = 3")))
    def res(idx: String) = Similarity.knnIvfPersisted(spark, idx, 3)
      .collect().map(_.toString).sorted.toSeq
    assert(res(i1) == res(i2), "append batching must not change any answer")
    SessionHygiene.clear(spark)
  }

  test("IVF-composed audits restrict the brute ones: q153 pairs a subset with identical scores; q155 sims bounded") {
    import org.apache.spark.sql.functions._
    // q153's pair source (IVF candidates at the q44 threshold) must be a
    // subset of the brute sim>=0.4 pair set, and on the shared pairs the
    // distortion columns must be IDENTICAL (same vectors, same planes).
    val idx = Similarity.persistedIvfIndexDir(spark, dir)
    val ivfAudit = Similarity.rpDistortionOn(spark, dir,
      Similarity.ivfNearDupPairs(spark, idx, 0.4)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    SessionHygiene.clear(spark)
    val brute = Similarity.rpDistortion(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(ivfAudit.nonEmpty, "the IVF candidate set must surface some near-dup pairs")
    assert(ivfAudit.keySet.subsetOf(brute.keySet), "IVF pairs must be brute pairs")
    ivfAudit.foreach { case (k, v) =>
      assert(brute(k) == v, s"pair $k: distortion must be bit-identical, ${brute(k)} != $v") }
    SessionHygiene.clear(spark)
    // q155: per anchor, the candidate-restricted hardest pos/neg can
    // never out-score the exact sweep's.
    val exact = Similarity.hardTriplets(spark, dir).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    SessionHygiene.clear(spark)
    val ivfTrip = Similarity.hardTripletsOn(spark, dir,
      Similarity.ivfScoredPairs(spark, idx)).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    ivfTrip.foreach { case (id, (pos, neg)) =>
      val (ep, en) = exact(id)
      pos.foreach(p => assert(p <= ep.get + 1e-12, s"anchor $id: ivf pos $p > exact ${ep.get}"))
      neg.foreach(n => assert(n <= en.get + 1e-12, s"anchor $id: ivf neg $n > exact ${en.get}"))
    }
    SessionHygiene.clear(spark)
  }

  test("q197 embed curation == driver recompute of prune + fill over the q95 survivors") {
    import org.apache.spark.sql.functions._
    val d001 = "/root/testdata/sf0.001"
    // stage-1 survivors and their cells straight from the gated q95 op
    val surv = Similarity.semanticDedup(spark, d001).filter(col("kept"))
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qRows = Similarity.quantized(spark, d001)
      .select("vec_id", "label", "qv", "nrm").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2), r.getLong(3)))
      .filter(t => surv.contains(t._1))
    // stage 2, by hand: integer truncated-mean centroids per label over
    // survivors; IEEE cosine; drop the OutlierK least-prototypical
    val cents = qRows.groupBy(_._2).map { case (l, rows) =>
      val dim = rows.head._3.size
      val cv = (0 until dim).map { i =>
        val xs = rows.map(_._3(i))
        Math.floorDiv(xs.sum, xs.size.toLong)
      }
      l -> (cv, cv.map(x => x * x).sum)
    }
    val simOf = qRows.map { case (id, l, qv, nrm) =>
      val (cv, nc) = cents(l)
      val dot = qv.zip(cv).map { case (a, b) => a * b }.sum
      (id, l, dot.toDouble / (math.sqrt(nrm.toDouble) * math.sqrt(nc.toDouble)))
    }
    val dropped = simOf.groupBy(_._2).values.flatMap(
      _.sortBy(t => (t._3, t._1)).take(Similarity.OutlierK).map(_._1)).toSet
    val pruned = qRows.map(_._1).filterNot(dropped).toSet
    // stage 3, by hand: greedy fill per cluster by (score desc, id asc)
    val scoredRows = graft.ops.TextStats.scored(
      spark.read.parquet(s"$d001/documents.parquet").select("doc_id", "source", "text"),
      Seq("source")).select("doc_id", "source", "n_tokens", "score").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .filter(t => pruned.contains(t._1))
    val kcDistinct = pruned.map(surv(_)).toSet.size.toLong
    val share = Similarity.ClusterMixBudgetTokens / kcDistinct
    val expect = scoredRows.groupBy(t => surv(t._1)).toSeq.flatMap { case (cl, rows) =>
      var cum = 0L
      rows.sortBy(t => (-t._4, t._1)).toSeq.flatMap { case (id, src, nt, _) =>
        cum += nt
        if (cum <= share) Some((id, cl, src, nt, cum, share)) else None
      }
    }.toSet
    val got = Similarity.embedCuration(spark, d001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got.nonEmpty, "curated manifest must be non-empty")
    assert(got == expect, s"driver recompute mismatch:\nonly-got=${got -- expect}\nonly-exp=${expect -- got}")
    SessionHygiene.clear(spark)
  }

  test("q196 silhouette: literal and broadcast forms agree at 10 labels and at an adversarial 200") {
    import org.apache.spark.sql.functions._
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long, Long, Long)] =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
    // testdata (10 labels): the default dispatch takes the literal path;
    // the broadcast form must agree row for row (the oracle gates the
    // literal form, so this transitively gates the fallback).
    val (q, rollup) = Similarity.silhouetteInputs(spark, dir)
    assert(rollup.select("label").distinct().count() <= Similarity.SilhouetteLiteralMaxLabels)
    val lit10 = rowsOf(Similarity.labelSilhouetteLiteral(spark, q, rollup))
    val bc10 = rowsOf(Similarity.labelSilhouetteBroadcast(spark, q, rollup))
    assert(lit10 == bc10, s"forms diverge at 10 labels:\n$lit10\n$bc10")
    SessionHygiene.clear(spark)
    // adversarial label cardinality: 200 labels x 2000 vectors x 16 dims.
    // The chained-CASE literal plan here is exactly the codegen-pressure
    // shape the threshold exists for — both forms must still agree.
    val adv = java.nio.file.Files.createTempDirectory("sil200").toString
    val rnd = new scala.util.Random(196)
    val rows = (0 until 2000).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f), i % 200)
    }
    spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$adv/embeddings.parquet")
    val (q2, rollup2) = Similarity.silhouetteInputs(spark, adv)
    assert(rollup2.select("label").distinct().count() > Similarity.SilhouetteLiteralMaxLabels)
    val lit200 = rowsOf(Similarity.labelSilhouetteLiteral(spark, q2, rollup2))
    val bc200 = rowsOf(Similarity.labelSilhouetteBroadcast(spark, q2, rollup2))
    assert(lit200.size == 200 && lit200 == bc200, "forms diverge at 200 labels")
    // and the public entry dispatches to the broadcast form here
    val dispatched = rowsOf(Similarity.labelSilhouette(spark, adv))
    assert(dispatched == bc200)
    SessionHygiene.clear(spark)
  }

  test("semantic packing: conserves the corpus and beats id-order coherence") {
    import org.apache.spark.sql.functions._
    val card = Similarity.semanticPacking(spark, dir).collect()
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(card.map(_.getAs[Long]("n_docs")).sum === nVecs,
      "every vector lands in exactly one cell chain")
    card.foreach { r =>
      assert(r.getAs[Long]("n_adj") === r.getAs[Long]("n_docs") - 1,
        "a chain of n docs has n-1 adjacent pairs")
      val m = r.getAs[Long]("mean_adj_cos_micro")
      assert(m >= -1000000L && m <= 1000000L)
      val minBins = (r.getAs[Long]("n_tokens") + Similarity.SemPackCapacity - 1) /
        Similarity.SemPackCapacity
      assert(r.getAs[Long]("n_bins") <= minBins,
        "start-offset binning never uses more bins than ceil(tokens/capacity)")
    }
    // the recovered effect: within-cell semantic ordering must be more
    // coherent than packing the same corpus in vec_id order
    val q = Similarity.quantized(spark, dir).orderBy("vec_id")
      .select("vec_id", "qv", "nrm").collect()
    def cos(a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row): Double = {
      val (va, vb) = (a.getSeq[Long](1), b.getSeq[Long](1))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum.toDouble
      dot / (math.sqrt(a.getLong(2).toDouble) * math.sqrt(b.getLong(2).toDouble))
    }
    val idOrder = q.zip(q.tail).map { case (a, b) => cos(a, b) }
    val baseline = idOrder.sum / idOrder.length
    val semantic = {
      val totAdj = card.map(_.getAs[Long]("n_adj")).sum
      card.map(r => r.getAs[Long]("mean_adj_cos_micro").toDouble / 1e6 *
        r.getAs[Long]("n_adj")).sum / totAdj
    }
    assert(semantic > baseline + 0.02,
      s"semantic chain ($semantic) must beat id-order packing ($baseline)")
    SessionHygiene.clear(spark)
  }
}
