package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGries
import graft.ops.Corpus

/** Semantic specs for the corpus-level token operators (heavy hitters,
  * TF-IDF, inverted index) and the grouped order statistics. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  test("misra-gries: guaranteed superset of true heavy hitters, even tiny buffers") {
    // unit-level: a stream where 'x' holds 30% — must survive m=4
    val mg = new MisraGries(4)
    val stream = (Seq.fill(30)("x") ++ (1 to 70).map(i => s"t${i % 23}"))
    // fold in two halves merged, to exercise reduce AND merge paths
    val (l, r) = stream.splitAt(41)
    val summary = mg.merge(l.foldLeft(mg.zero)(mg.reduce), r.foldLeft(mg.zero)(mg.reduce))
    assert(summary.size <= 4 && summary.contains("x"))

    // corpus-level with a deliberately small buffer: every token with
    // freq > n/(m+1) must be in the candidate set
    val m = 8
    val toks = Corpus.tokenStream(docs)
    val cands = toks.agg(MisraGries.candidates(m)(col("term")))
      .collect()(0).getSeq[String](0).toSet
    val n = toks.count()
    val truth = toks.groupBy("term").count()
      .filter(col("count") > lit(n.toDouble / (m + 1)))
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(cands), s"lost heavy hitters: ${truth -- cands}")
  }

  test("heavy tokens: sketch-then-recount == direct groupBy-having, ObjectHashAggregate plan") {
    val sketched = Corpus.heavyTokens(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val toks = Corpus.tokenStream(docs)
    val n = toks.count()
    val direct = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") >= n.toDouble / Corpus.HeavyDivisor)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(sketched == direct && sketched.nonEmpty)

    val mgPlan = toks.agg(MisraGries.candidates(Corpus.HeavyBufferSize)(col("term")))
      .queryExecution.executedPlan.toString
    assert(mgPlan.contains("ObjectHashAggregate"),
      "MG summary must partial-aggregate map-side (ObjectHashAggregate), not shuffle raw tokens")
  }

  test("tfidf: per-doc top-k ranked by score desc, score == tf * n_docs / df") {
    val nDocs = docs.count().toDouble
    val rows = Corpus.tfidfTopK(spark, dir, 3).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length <= 3) && rows.nonEmpty)
    rows.foreach { r =>
      val expected = r.getAs[Long]("tf").toDouble * nDocs / r.getAs[Long]("df")
      assert(r.getAs[Double]("score") == expected)
    }
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Double]("score")).sliding(2).forall {
        case Array(a, b) => a >= b; case _ => true
      })
    }
  }

  test("token frequency score: tf-weighted identity vs per-occurrence recompute") {
    val got = Corpus.tokenFrequencyScore(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_tf"), r.getAs[Double]("avg_tf")))).toMap
    // driver-side recompute straight from occurrences (the pre-aggregated
    // tf·cnt form must equal the naive per-occurrence sum)
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val cnt = texts.flatMap(_._2.split(" ")).groupBy(identity).view.mapValues(_.length.toLong).toMap
    texts.foreach { case (id, text) =>
      val toks = text.split(" ")
      val sumTf = toks.map(cnt).sum
      assert(got(id) == ((toks.length.toLong, sumTf, sumTf.toDouble / toks.length)), s"doc $id")
    }
    // the score separates common-token docs from rare-token docs
    assert(got.values.map(_._3).toSet.size > 1)
  }

  test("q112 length histogram: power-of-two buckets partition the corpus exactly") {
    val rows = Corpus.lengthHistogram(spark, dir).collect()
    val lens = docs.collect().map(r =>
      r.getAs[String]("source") -> r.getAs[String]("text").split(" ").length.toLong)
    // driver recompute: bucket = binary digit count = floor(log2 n) + 1
    val expect = lens.groupBy { case (s, n) => (s, 64 - java.lang.Long.numberOfLeadingZeros(n)) }
      .map { case (k, vs) => k ->
        ((vs.size.toLong, vs.map(_._2).sum, vs.map(_._2).min, vs.map(_._2).max)) }
    val got = rows.map(r => (r.getAs[String]("source"), r.getAs[Long]("len_bucket").toInt) ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("min_tok"), r.getAs[Long]("max_tok")))).toMap
    assert(got == expect)
    // bucket b covers [2^(b-1), 2^b): every min/max sits inside its band
    rows.foreach { r =>
      val b = r.getAs[Long]("len_bucket").toInt
      assert(r.getAs[Long]("min_tok") >= (1L << (b - 1)) &&
        r.getAs[Long]("max_tok") < (1L << b), s"bucket $b band")
    }
  }

  test("q113 packing efficiency: integer ceilings, packed <= naive, waste in [0,1)") {
    val got = Corpus.packingEfficiency(spark, dir).collect()
    val c = Corpus.PackCapacity
    val lens = docs.collect().map(r =>
      r.getAs[String]("source") -> r.getAs[String]("text").split(" ").length.toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.map(_.getAs[String]("source")).toSet == lens.keySet)
    got.foreach { r =>
      val ns = lens(r.getAs[String]("source"))
      val naive = ns.map(n => (n + c - 1) / c).sum
      val packed = (ns.sum + c - 1) / c
      assert(r.getAs[Long]("n_docs") == ns.size.toLong)
      assert(r.getAs[Long]("n_tokens") == ns.sum)
      assert(r.getAs[Long]("naive_rows") == naive)
      assert(r.getAs[Long]("packed_rows") == packed)
      assert(packed <= naive)
      val waste = r.getAs[Double]("naive_waste_pct")
      assert(waste == (naive * c - ns.sum).toDouble / (naive * c))
      assert(waste >= 0.0 && waste < 1.0)
    }
  }

  test("q114 pmi collocations: top-k quantized ratios match driver recompute") {
    val texts = docs.collect().map(_.getAs[String]("text"))
    val bi = texts.flatMap { t => val w = t.split(" "); w.zip(w.tail) }
    val c12 = bi.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1a = c12.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val c1b = c12.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = c12.values.sum
    val expect = c12.filter(_._2 >= Corpus.PmiMinCount).map { case ((a, b), c) =>
      (a, b) -> ((c, (BigInt(c) * n * Corpus.LmScale / (BigInt(c1a(a)) * c1b(b))).toLong))
    }.toSeq.sortBy { case ((a, b), (_, p)) => (-p, a, b) }.take(Corpus.PmiTopK)
    val got = Corpus.pmiCollocations(spark, dir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        ((r.getAs[Long]("c12"), r.getAs[Long]("pmi_q")))).toSeq
    assert(got == expect)
    // ranked by the quantized ratio, descending — monotone in true PMI
    assert(got.map(_._2._2).sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
  }

  test("q115 phrase search: top-trigram hits match driver recompute, positions 1-based") {
    val texts = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    def tris(t: String): Seq[(String, Int)] = {
      val w = t.split(" ")
      if (w.length < 3) Seq.empty
      else (0 to w.length - 3).map(i => (w.slice(i, i + 3).mkString(" "), i + 1))
    }
    val all = texts.flatMap { case (id, t) => tris(t).map { case (p, pos) => (id, p, pos) } }
    val top = all.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (p, n) => (-n, p) }.head._1
    val expect = all.filter(_._2 == top).groupBy(_._1)
      .map { case (id, hs) => id -> ((hs.size.toLong, hs.map(_._3).min.toLong)) }
    val got = Corpus.topPhraseSearch(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("first_pos")))).toMap
    assert(got == expect)
    // the parametric API agrees with the derived-phrase query
    import spark.implicits._
    val viaApi = Corpus.phraseSearch(
      spark.read.parquet(s"$dir/documents.parquet"), Seq(top).toDF("phrase"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_hits"), r.getAs[Long]("first_pos")))).toMap
    assert(viaApi == expect)
  }

  test("q117 tokenizer fertility reconciles with the q110 per-doc encode") {
    val perDoc = Corpus.bpeEncode(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_ws_tokens"), r.getAs[Long]("n_bpe_tokens")))).toMap
    val srcOf = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source")).toMap
    val expect = perDoc.groupBy { case (id, _) => srcOf(id) }.map { case (s, m) =>
      val ws = m.values.map(_._1).sum; val bpe = m.values.map(_._2).sum
      s -> ((m.size.toLong, ws, bpe, bpe.toDouble / ws))
    }
    val got = Corpus.tokenizerFertility(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_ws"),
          r.getAs[Long]("n_bpe"), r.getAs[Double]("fertility")))).toMap
    assert(got == expect)
    // merges compress: fertility is below the character-split ceiling and >= 1
    got.values.foreach { case (_, _, _, f) => assert(f >= 1.0) }
  }

  test("q118 ngram diversity == driver recompute; ratios bounded") {
    val n = Corpus.DiversityNgram
    val rows = docs.collect().map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val grams = rows.flatMap { case (s, t) =>
      val w = t.split(" ")
      if (w.length < n) Seq.empty
      else (0 to w.length - n).map(i => (s, w.slice(i, i + n).mkString(" ")))
    }
    val expect = grams.groupBy(_._1).map { case (s, gs) =>
      val byGram = gs.groupBy(_._2).view.mapValues(_.size.toLong)
      s -> ((byGram.size.toLong, gs.size.toLong, byGram.values.max))
    }
    val got = Corpus.ngramDiversity(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_distinct"), r.getAs[Long]("n_total"), r.getAs[Long]("top_cnt")))).toMap
    assert(got == expect)
    Corpus.ngramDiversity(spark, dir).collect().foreach { r =>
      val (dr, ts) = (r.getAs[Double]("distinct_ratio"), r.getAs[Double]("top_share"))
      assert(dr > 0.0 && dr <= 1.0 && ts > 0.0 && ts <= 1.0)
    }
  }

  test("q119 freq-of-freq: buckets partition the vocabulary; occurrences conserve") {
    val toks = docs.collect().flatMap(_.getAs[String]("text").split(" "))
    val cnt = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expect = cnt.values.groupBy(c => 64 - java.lang.Long.numberOfLeadingZeros(c))
      .map { case (b, cs) => b.toLong -> ((cs.size.toLong, cs.sum)) }
    val got = Corpus.freqOfFreq(spark, dir).collect()
      .map(r => r.getAs[Long]("freq_bucket") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Long]("n_occurrences")))).toMap
    assert(got == expect)
    assert(got.values.map(_._1).sum == cnt.size.toLong) // vocabulary partitioned
    assert(got.values.map(_._2).sum == toks.length.toLong) // occurrences conserved
  }

  test("q189 heaps curve: hand-computed fixture; totals reconcile with the corpus") {
    import spark.implicits._
    // buckets = binary digits of doc_id+1: id 0 → 1, ids 1-2 → 2, id 3 → 3
    val d = Seq((0L, "a a"), (1L, "a b"), (2L, "c"), (3L, "a d"))
      .toDF("doc_id", "text")
    val got = Corpus.heapsCurve(d).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("cum_docs"),
          r.getAs[Long]("cum_tokens"), r.getAs[Long]("cum_vocab")))).toMap
    assert(got == Map(
      1L -> ((1L, 1L, 2L, 1L)),   // "a a": vocab {a}
      2L -> ((2L, 3L, 5L, 3L)),   // +"a b","c": vocab {a,b,c}
      3L -> ((1L, 4L, 7L, 4L))))  // +"a d": vocab {a,b,c,d}
    // corpus-level reconciliation: the last row's cumulatives are the totals
    val rows = Corpus.heapsCurve(docs).collect().sortBy(_.getAs[Long]("bucket"))
    val all = docs.collect().map(_.getAs[String]("text"))
    val last = rows.last
    assert(last.getAs[Long]("cum_docs") == all.length.toLong)
    assert(last.getAs[Long]("cum_tokens") == all.map(_.split(" ").length.toLong).sum)
    assert(last.getAs[Long]("cum_vocab") == all.flatMap(_.split(" ")).distinct.length.toLong)
    // cumulatives are monotone by construction
    rows.sliding(2).foreach { case Array(p, n) =>
      assert(p.getAs[Long]("cum_vocab") <= n.getAs[Long]("cum_vocab"))
      assert(p.getAs[Long]("cum_tokens") < n.getAs[Long]("cum_tokens"))
    }
  }

  test("q116 cms counts: estimates match driver-built sketch, never undercount") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val toks = docs.collect().flatMap(_.getAs[String]("text").split(" "))
    val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    // driver-built sketch: same md5-prefix buckets, same counter sums
    val sketch = toks.flatMap(t => (0 until Corpus.CmsDepth).map(r =>
      (r, md5hex(s"$r|$t").take(Corpus.CmsHexChars))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val top = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(Corpus.CmsReportK)
    val expect = top.map { case (t, n) =>
      t -> ((n, (0 until Corpus.CmsDepth)
        .map(r => sketch((r, md5hex(s"$r|$t").take(Corpus.CmsHexChars)))).min))
    }.toMap
    val got = Corpus.cmsCounts(spark, dir).collect()
      .map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("exact_n"), r.getAs[Long]("cms_n")))).toMap
    assert(got == expect)
    // the CMS guarantee: a sketch can only OVERcount
    got.values.foreach { case (n, est) => assert(est >= n) }
  }

  test("source drift: TV matches per-source driver recompute, bounded in [0,1)") {
    val got = Corpus.sourceDrift(spark, dir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_tokens_src"), r.getAs[Double]("tv")))).toMap
    val texts = docs.collect().map(r => r.getAs[String]("source") -> r.getAs[String]("text"))
    val bySrc = texts.groupBy(_._1).view
      .mapValues(_.flatMap(_._2.split(" ")).groupBy(identity).view.mapValues(_.length.toLong).toMap)
      .toMap
    val corpus = bySrc.values.flatten.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nTotal = corpus.values.sum
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, cnts) =>
      val nSrc = cnts.values.sum
      // present-terms TV, exact integers until the one final division
      val num = cnts.map { case (t, c) => (BigInt(c) * nTotal - BigInt(corpus(t)) * nSrc).abs }.sum
      val tv = num.toDouble / (2.0 * nSrc.toDouble * nTotal.toDouble)
      assert(got(src)._1 == nSrc, s"$src token count")
      assert(got(src)._2 == tv, s"$src tv exact match")
      assert(tv >= 0.0 && tv < 1.0)
    }
  }

  test("inverted index: df == postings length, postings sorted-distinct, volume conserved") {
    val idx = Corpus.invertedIndex(spark, dir).collect()
    idx.foreach { r =>
      val p = r.getSeq[Long](2)
      assert(r.getAs[Long]("df") == p.length)
      assert(p == p.distinct.sorted)
    }
    val pairCount = Corpus.tokenStream(docs).distinct().count()
    assert(idx.map(_.getSeq[Long](2).length.toLong).sum == pairCount)
  }

  test("group percentiles: spark `percentile` matches the explicit interpolation formula") {
    val got = SparkEntry.queries("q59_group_percentiles")(spark, dir).collect()
      .map(r => r.getAs[Long]("l_suppkey") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    val lines = graft.queries.QueryDef.t(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_extendedprice").cast("double"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    lines.groupBy(_._1).foreach { case (key, vs) =>
      val sorted = vs.map(_._2).sorted
      // the engines' shared interpolation is the WEIGHTED form
      // (hi−pos)·lo + (pos−lo)·hi — the additive lo + (hi−lo)·frac form
      // differs in the last ulp on some groups
      def interp(p: Double): Double = {
        val pos = p * (sorted.length - 1)
        val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
        if (lo == hi) sorted(lo)
        else (hi - pos) * sorted(lo) + (pos - lo) * sorted(hi)
      }
      val (p25, p50, p95) = got(key)
      assert(p25 == interp(0.25) && p50 == interp(0.5) && p95 == interp(0.95))
    }
  }

  test("q79 approx percentiles honor the GK rank-error bound vs exact order stats") {
    // The query output is now self-evidencing (exact + flags); the raw
    // estimates for the TIGHTER rank-error bound come from the same
    // sketch expression the query uses.
    val rows = graft.queries.QueryDef.t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("approx_percentile(CAST(l_extendedprice AS DOUBLE), array(0.5D, 0.95D), 1000)").as("ap"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("ap").getItem(0).as("ap50"),
        col("ap").getItem(1).as("ap95"), col("n_rows"))
      .collect()
    // and the shipped query's in-bound flags must all be TRUE
    SparkEntry.queries("q79_approx_percentiles")(spark, dir).collect().foreach { r =>
      assert(r.getAs[Boolean]("gk50_in_bound") && r.getAs[Boolean]("gk95_in_bound"),
        s"${r.getString(0)} flag false")
    }
    val byFlag = graft.queries.QueryDef.t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    assert(rows.map(_.getString(0)).toSet == byFlag.keySet)
    rows.foreach { r =>
      val sorted = byFlag(r.getString(0))
      val n = sorted.length
      // accuracy=1000 guarantees rank error <= n/1000; assert with slack 2x
      def rankOk(v: Double, q: Double): Boolean = {
        val rank = sorted.count(_ <= v)
        math.abs(rank - q * n) <= math.max(2.0 * n / 1000.0, 1.0)
      }
      assert(rankOk(r.getAs[Double]("ap50"), 0.5), s"${r.getString(0)} ap50")
      assert(rankOk(r.getAs[Double]("ap95"), 0.95), s"${r.getString(0)} ap95")
      assert(r.getAs[Long]("n_rows") == n.toLong)
    }
  }

  test("group ntile: tiles balanced (sizes differ by <= 1, larger tiles first)") {
    val rows = SparkEntry.queries("q60_group_ntile")(spark, dir).collect()
    rows.groupBy(_.getAs[Long]("l_suppkey")).values.foreach { rs =>
      val byTile = rs.sortBy(_.getAs[Int]("tile")).map(_.getAs[Long]("n_rows"))
      assert(byTile.max - byTile.min <= 1)
      assert(byTile.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    }
  }

  test("supplier regression: corr/slope/intercept match exact driver-side recompute") {
    val got = SparkEntry.queries("q62_supplier_regression")(spark, dir).collect()
      .map(r => r.getAs[Long]("l_suppkey") ->
        (r.getAs[Double]("corr_qp"), r.getAs[Double]("slope"), r.getAs[Double]("intercept"))).toMap
    val lines = graft.queries.QueryDef.t(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"), col("l_extendedprice"))
      .collect().map { r =>
        def cents(d: Double): Long =
          (BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
        (r.getLong(0), cents(r.getDouble(1)), cents(r.getDouble(2)))
      }
    lines.groupBy(_._1).foreach { case (key, vs) =>
      val nn = vs.length.toDouble
      val sx = vs.map(_._2).sum.toDouble / 100.0
      val sy = vs.map(_._3).sum.toDouble / 100.0
      val sxx = vs.map(v => v._2 * v._2).sum.toDouble / 10000.0
      val syy = vs.map(v => v._3 * v._3).sum.toDouble / 10000.0
      val sxy = vs.map(v => v._2 * v._3).sum.toDouble / 10000.0
      val covN = nn * sxy - sx * sy
      val varxN = nn * sxx - sx * sx; val varyN = nn * syy - sy * sy
      val (corr, slope, intercept) = got(key)
      assert(corr == covN / (math.sqrt(varxN) * math.sqrt(varyN)))
      assert(slope == covN / varxN)
      assert(intercept == (sy - (covN / varxN) * sx) / nn)
      assert(corr > -1.0 && corr < 1.0) // synthetic price ⟂ quantity: near 0, never ±1
    }
  }

  test("label centroids: dimensionality preserved, n_vecs partitions the table") {
    val c = graft.ops.Similarity.labelCentroids(spark, dir).collect()
    assert(c.forall(_.getSeq[Long](1).length == graft.ops.Similarity.Dim))
    val total = graft.queries.QueryDef.t(spark, dir, "embeddings").count()
    assert(c.map(_.getAs[Long]("n_vecs")).sum == total)
  }

  test("q123 hybrid search: rrf fusion reconciles with its two channels") {
    import graft.ops.Similarity
    val sparse = Corpus.bm25TopK(spark, dir, Corpus.Bm25Terms, Corpus.RrfPoolK).collect()
      .sortBy(r => (-r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("doc_id")).zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val q = Similarity.quantized(spark, dir)
      .select("vec_id", "qv", "nrm").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Long]]("qv").toArray, r.getAs[Long]("nrm")))
    val minId = q.map(_._1).min
    val (_, qq, nq) = q.find(_._1 == minId).get
    val dense = q.filter(_._1 != minId).map { case (id, qv, nrm) =>
      val dot = qv.zip(qq).map { case (a, b) => a * b }.sum
      id -> dot.toDouble / (math.sqrt(nrm.toDouble) * math.sqrt(nq.toDouble))
    }.sortBy { case (id, sim) => (-sim, id) }.take(Corpus.RrfPoolK)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    def rrf(id: Long): Long =
      sparse.get(id).map(r => Corpus.RrfScale / (Corpus.RrfConst + r)).getOrElse(0L) +
        dense.get(id).map(r => Corpus.RrfScale / (Corpus.RrfConst + r)).getOrElse(0L)
    val expect = (sparse.keySet ++ dense.keySet).toSeq
      .map(id => (id, rrf(id))).sortBy { case (id, s) => (-s, id) }
      .take(Corpus.RrfTopK).toMap
    val got = Corpus.hybridSearch(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rrf_q")).toMap
    assert(got == expect)
    // fusion must actually mix: the top-10 draws from both channels
    val gotIds = got.keySet
    assert(gotIds.exists(sparse.contains) && gotIds.exists(dense.contains))
  }

  test("q122 label outliers: bottom-k per label matches driver recompute") {
    import graft.ops.Similarity
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 1000000).toLong).toArray))
    val byLabel = vecs.groupBy(_._2)
    val expect = byLabel.toSeq.flatMap { case (lbl, vs) =>
      val dim = vs.head._3.length
      // Scala Long / truncates toward zero — same as Spark DIV / DuckDB //
      val cv = (0 until dim).map { p => vs.map(_._3(p)).sum / vs.length }.toArray
      val nc = cv.map(x => x * x).sum
      vs.map { case (id, _, qv) =>
        val dot = qv.zip(cv).map { case (a, b) => a * b }.sum
        val nrm = qv.map(x => x * x).sum
        (lbl, id, dot.toDouble / (math.sqrt(nrm.toDouble) * math.sqrt(nc.toDouble)))
      }.sortBy { case (_, id, sim) => (sim, id) }.take(Similarity.OutlierK)
        .zipWithIndex.map { case ((l, id, sim), i) => (l, i + 1, id, sim) }
    }.toSet
    val got = Similarity.labelOutliers(spark, dir).collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("sim"))).toSet
    assert(got == expect)
    // outliers sit strictly below their label's centroid-similarity median
    assert(got.nonEmpty && got.forall { case (_, _, _, sim) => sim < 1.0 })
  }

  test("cluster profile: partitions the embedded corpus, quality reconciles with q39") {
    val prof = graft.ops.Similarity.clusterProfile(spark, dir).collect()
    // every embedding lands in exactly one cluster and every vec_id has a
    // document row, so the cluster doc counts partition the embeddings table
    val nEmb = graft.queries.QueryDef.t(spark, dir, "embeddings").count()
    assert(prof.map(_.getAs[Long]("n_docs")).sum == nEmb)
    prof.foreach { r =>
      val avg = r.getAs[Double]("avg_quality")
      assert(avg >= 0.0 && avg <= 1.0)
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("top_source_docs") <= r.getAs[Long]("n_docs"))
    }
    // the pass counts use the exact q39 predicate: their total equals the
    // quality filter's pass count restricted to embedded documents
    val passIds = graft.ops.Sampling.qualityFilter(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val embIds = graft.queries.QueryDef.t(spark, dir, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(prof.map(_.getAs[Long]("n_pass")).sum == (passIds & embIds).size)
  }

  test("cluster mix: equal integer shares, window-sum integrity, budget respected") {
    val rows = graft.ops.Similarity.clusterMix(spark, dir).collect()
    val budget = graft.ops.Similarity.ClusterMixBudgetTokens
    val shares = rows.map(_.getAs[Long]("share_tokens")).distinct
    assert(shares.length == 1, "every cluster gets the same uniform share")
    assert(rows.map(_.getAs[Long]("n_tokens")).sum <= budget)
    rows.groupBy(_.getAs[Long]("cluster")).foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("cum_tokens"))
      assert(sorted.last.getAs[Long]("cum_tokens") <= shares.head, s"cluster $c share")
      // the cum column is a consistent running sum of the kept docs
      sorted.foldLeft(0L) { (prev, r) =>
        val cum = r.getAs[Long]("cum_tokens")
        assert(cum == prev + r.getAs[Long]("n_tokens"), s"cluster $c cum chain")
        cum
      }
    }
    // mixes over the same trained cells as the profile: cluster ids agree
    val profClusters = graft.ops.Similarity.clusterProfile(spark, dir)
      .select("cluster").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("cluster")).toSet.subsetOf(profClusters))
  }

  test("bpe train: learned merges match an exact-greedy driver recompute") {
    val got = graft.ops.Corpus.bpeTrain(spark, dir).collect()
      .map(r => (r.getAs[Int]("iter"), r.getAs[String]("pair"), r.getAs[Long]("freq")))
      .sortBy(_._1)
    // exact Sennrich learn-loop on the driver: greedy left-to-right merge
    // application (scan i: merge at i, skip 2) — the semantics the fixed
    // BpeReplacePasses replace chain must reproduce on this corpus
    var vocab: Map[Vector[String], Long] = docs.select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .filter(_.length >= 2)
      .groupBy(identity).view.mapValues(_.size.toLong)
      .map { case (w, n) => w.map(_.toString).toVector -> n }.toMap
    def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val expect = (1 to graft.ops.Corpus.BpeTrainMerges).map { it =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      val ((a, b), freq) = counts.minBy { case ((x, y), n) => (-n, s"$x $y") }
      vocab = vocab.groupMapReduce { case (syms, _) => mergeWord(syms, a, b) }(_._2)(_ + _)
      (it, s"$a $b", freq)
    }
    assert(got.toSeq == expect)
  }

  test("bpe encode: per-doc token counts match an exact-greedy driver recompute") {
    val got = graft.ops.Corpus.bpeEncode(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_ws_tokens"),
        r.getAs[Long]("n_bpe_tokens")))
      .sortBy(_._1)
    // encode with the merges the spec-locked trainer learned, applying
    // each via the exact greedy left-to-right semantics — the number the
    // fixed-pass replace chain must reproduce for EVERY word in the corpus
    val merges = graft.ops.Corpus.bpeTrain(spark, dir).collect()
      .sortBy(_.getAs[Int]("iter"))
      .map { r => val Array(a, b) = r.getAs[String]("pair").split(" "); (a, b) }
    def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    val nTok = scala.collection.mutable.Map.empty[String, Long]
    def encode(w: String): Long = nTok.getOrElseUpdate(w, {
      var syms = w.map(_.toString).toVector
      merges.foreach { case (a, b) => syms = mergeWord(syms, a, b) }
      syms.length.toLong
    })
    val expect = docs.select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ", -1)
        (r.getLong(0), toks.length.toLong, toks.map(encode).sum)
      }.sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
    // merges only ever shrink a segmentation: chars >= bpe >= ws tokens
    got.foreach { case (id, ws, bpe) => assert(bpe >= ws, s"doc $id") }
  }

  test("bpe merge pairs: ranked counts match the Sennrich get_stats recompute") {
    val got = graft.ops.Corpus.bpeMergePairs(spark, dir, k = 20).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // driver recompute, straight from the paper's definition: count every
    // adjacent character pair in every word OCCURRENCE (so weight by the
    // word's corpus frequency)
    val exact = docs.select("text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .filter(_.length >= 2)
      .flatMap(w => w.sliding(2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = exact.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    assert(got.toSeq == expect)
    // the argmax of this statistic is the next BPE merge: assert it is
    // unique at the top so the training step would be deterministic
    assert(got.head._2 > got(1)._2 || got.head._1 < got(1)._1)
  }

  test("rake keyphrases: classic deg/freq scoring on a hand-computed fixture") {
    import spark.implicits._
    // stopwords {the, a, of, and, to}: phrases "deep learning" and
    // "deep net"; deep: freq 2, deg 4 -> 2e6; learning/net: freq 1,
    // deg 2 -> 2e6; both phrases score 4e6, tie broken by phrase text
    val d = Seq((1L, "deep learning of the deep net")).toDF("doc_id", "text")
    val rows = graft.ops.Corpus.rakeKeyphrases(d).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(4)))
    assert(rows.toSeq == Seq((1L, "deep learning", 4000000L), (2L, "deep net", 4000000L)),
      s"got ${rows.toSeq}")
  }

  test("session transitions: counts conserve against per-session event counts") {
    import org.apache.spark.sql.functions._
    val ev = graft.ops.EventOps.events(spark, dir)
    val total = graft.ops.EventOps.sessionTransitions(ev)
      .agg(sum("n")).head().getLong(0)
    val expected = graft.ops.EventOps.sessionize(ev, 1800L)
      .agg(sum(col("n_events") - 1)).head().getLong(0)
    assert(total == expected, s"transitions $total != sum(n_events - 1) $expected")
    // row-stochastic: per from_type, sum(n) == n_from on every row
    val rows = graft.ops.EventOps.sessionTransitions(ev).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(2)).sum == rs.head.getLong(3)) }
  }

  private def docs = graft.queries.QueryDef.t(spark, dir, "documents")
}
