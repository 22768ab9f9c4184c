package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Cleaning, Sampling, Similarity}

/** Semantic specs for the cleaning / mixing operators — exercised on
  * REAL newline-delimited fixtures (the oracle queries run them with the
  * corpus delimiter token, so the '\n' path is only covered here) plus
  * invariants on the testdata corpus. */
class CleaningSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  def fixture(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("cleanLines on real newlines: line + doc filters, rejoin order") {
    val d = fixture(
      1L -> "keep this line alive\nno\nanother good line here\nbad slow line inside",
      2L -> "lorem ipsum marker doc\nperfectly fine line", // doc-blocked below
      3L -> "x y", // sole line too short -> doc vanishes
      4L -> "one single fine line")
    val got = Cleaning.cleanLines(d, delim = "\n", minWords = 3,
      lineBlockToken = "slow", docBlockPhrase = "lorem ipsum")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines_in"), r.getAs[Long]("n_lines_kept"),
          r.getAs[String]("text_clean")))).toMap
    assert(got.keySet == Set(1L, 4L)) // 2 doc-blocked, 3 emptied out
    assert(got(1L) == ((4L, 2L, "keep this line alive\nanother good line here")))
    assert(got(4L) == ((1L, 1L, "one single fine line")))
  }

  test("redactPii: every pattern class found and replaced, multiples counted") {
    val d = fixture(
      1L -> "mail a.user+tag@sub.example.org and b@x.io, call +44-202-5550, visit 192.168.1.254 now",
      2L -> "no pii at all in here",
      3L -> "nested user+1-555-1234@x.io case") // phone-shaped local part
    val got = Cleaning.redactPii(d, col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"), r.getAs[Long]("n_ips"),
          r.getAs[String]("text_redacted")))).toMap
    assert(got(1L) == ((2L, 1L, 1L,
      "mail <EMAIL> and <EMAIL>, call <PHONE>, visit <IP> now")))
    assert(got(2L) == ((0L, 0L, 0L, "no pii at all in here")))
    // counts are STAGED: the email consumes its phone-shaped local part,
    // so n_phones reports the substitutions actually made (0), not a
    // match against the raw text (1)
    assert(got(3L) == ((1L, 0L, 0L, "nested <EMAIL> case")))
  }

  test("redactCards: Luhn-valid card redacted, near-miss and short runs preserved") {
    // 4532015112830366 is the canonical Luhn-valid test number; flipping
    // its last digit breaks the checksum; "1234" is not card-shaped
    val d = fixture(
      1L -> "pay 4532015112830366 not 4532015112830367 or 1234 today",
      2L -> "no digits here at all")
    val got = Cleaning.redactCards(d, col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_card_candidates"), r.getAs[Long]("n_valid_cards"),
          r.getAs[String]("text_redacted")))).toMap
    assert(got(1L) == ((2L, 1L, "pay <CARD> not 4532015112830367 or 1234 today")))
    assert(got(2L) == ((0L, 0L, "no digits here at all")))
  }

  test("dedupLines: corpus-wide first occurrence wins; emptied docs survive") {
    val d = fixture(
      1L -> "shared header\nunique one\nshared footer",
      2L -> "shared header\nunique two\nshared footer",
      3L -> "shared header") // everything duplicated -> empty doc
    val got = Cleaning.dedupLines(d, delim = "\n").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[String]("text_dedup")))).toMap
    assert(got(1L) == ((3L, 3L, "shared header\nunique one\nshared footer")))
    assert(got(2L) == ((3L, 1L, "unique two")))
    assert(got(3L) == ((1L, 0L, "")))
    // conservation: every distinct line kept exactly once corpus-wide
    assert(got.values.map(_._2).sum == 4L)
  }

  test("boilerplateStrip: per-source frequency threshold; all occurrences drop") {
    import spark.implicits._
    // srcA: 4 docs, "nav bar" in 3 of them (df=3 >= 3 and 3*20 >= 4) -> boiler.
    // "rare line" df=1 -> kept. srcB: same "nav bar" text but df=1 there -> kept
    // (the per-SOURCE scoping q94 cannot express).
    val d = Seq(
      (1L, "srcA", "nav bar\nreal content one"),
      (2L, "srcA", "nav bar\nreal content two\nnav bar"),
      (3L, "srcA", "nav bar"),
      (4L, "srcA", "rare line\nreal content three"),
      (5L, "srcB", "nav bar\nother text")
    ).toDF("doc_id", "source", "text")
    val got = Cleaning.boilerplateStrip(d, delim = "\n").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_kept"), r.getAs[String]("text_clean")))).toMap
    assert(got(1L) == (("srcA", 2L, 1L, "real content one")))
    // BOTH occurrences inside doc 2 drop (q94 would have kept the first)
    assert(got(2L) == (("srcA", 3L, 1L, "real content two")))
    assert(got(3L) == (("srcA", 1L, 0L, ""))) // emptied doc survives
    assert(got(4L) == (("srcA", 2L, 2L, "rare line\nreal content three")))
    assert(got(5L) == (("srcB", 2L, 2L, "nav bar\nother text"))) // df=1 in srcB
  }

  test("q95 semantic dedup: verdicts match a per-cell brute-force recheck") {
    val rows = Similarity.semanticDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"), r.getAs[Boolean]("kept")))
    assert(rows.length == graft.queries.QueryDef.t(spark, dir, "embeddings").count())
    assert(rows.exists(!_._3), "corpus has planted near-dups; some must drop")
    // recompute the earlier-similar-mate predicate from raw vectors
    val q = Similarity.quantized(spark, dir).select("vec_id", "qv").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1)).toMap
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      dot / (math.sqrt(a.map(x => x * x).sum.toDouble) * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    rows.groupBy(_._2).foreach { case (_, cell) =>
      val sorted = cell.sortBy(_._1)
      sorted.foreach { case (id, _, kept) =>
        val blockedBy = sorted.takeWhile(_._1 < id)
          .exists(e => cos(q(e._1), q(id)) >= Similarity.SemDedupThreshold)
        assert(kept == !blockedBy, s"vec $id verdict")
      }
    }
  }

  test("q102 epoch mixing: repeats fill shares exactly; boundary degenerates to q96") {
    val docs = graft.queries.QueryDef.t(spark, dir, "documents")
    val sel = Sampling.sourceMixEpochs(docs, weight = Sampling.srcNameWeight).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("share_tokens"), r.getAs[Long]("epochs")))
    assert(sel.nonEmpty && sel.exists(_._5 >= 2), "factor 3 must force multi-epoch sources")
    val avail = docs.collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("text").split(" ").length.toLong)
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    sel.groupBy(_._2).foreach { case (src, rows) =>
      val share = rows.head._4
      val e = share / avail(src)
      // epoch counts are e or e+1, and the e+1 extras stay within the remainder
      assert(rows.forall(r => r._5 == e || r._5 == e + 1), s"$src epoch band")
      val used = rows.map(r => r._3 * r._5).sum
      assert(used <= share, s"$src within share")
      val extra = rows.filter(_._5 == e + 1).map(_._3).sum
      assert(extra <= share - e * avail(src), s"$src remainder respected")
      if (e >= 1) assert(rows.map(_._1).toSet ==
        docs.filter(org.apache.spark.sql.functions.col("source") === src)
          .collect().map(_.getAs[Long]("doc_id")).toSet, s"$src full epochs keep every doc")
    }
  }

  test("q96 source mix: shares respected and filled greedily by quality") {
    val docs = graft.queries.QueryDef.t(spark, dir, "documents")
    val sel = Sampling.sourceMix(docs, weight = Sampling.srcNameWeight).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens"), r.getAs[Long]("share_tokens")))
    assert(sel.nonEmpty)
    // a budget far above the corpus total selects everything, exposing
    // the full per-source quality ranking for the maximality check
    val scored = Sampling.sourceMix(docs, budgetTokens = 10_000_000L,
      weight = Sampling.srcNameWeight).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cum_tokens")))
    sel.groupBy(_._2).foreach { case (src, rows) =>
      val share = rows.head._5
      val used = rows.map(_._3).sum
      assert(used <= share, s"$src within budget")
      assert(rows.map(_._4).max == used, s"$src cum_tokens consistent")
      // greedy maximality: the next doc in quality order would overflow
      val all = scored.filter(_._2 == src).sortBy(_._4)
      val next = all.drop(rows.length).headOption
      next.foreach(n => assert(used + n._3 > share, s"$src maximally filled"))
    }
    // weights derive from the source index: src<n> share ∝ n%3+1
    val shares = sel.groupBy(_._2).map { case (s, r) => s -> r.head._5 }
    shares.foreach { case (src, share) =>
      val w = src.drop(3).toLong % 3 + 1
      val totw = (0 until 20).map(_ % 3 + 1).sum
      assert(share == Sampling.MixBudgetTokens * w / totw, s"$src share formula")
    }
  }
}
