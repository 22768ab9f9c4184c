package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.tebis._

/** Property-based invariants (SURVEY §5 test plan #2), driven by
  * ScalaCheck generators over a fixed seed sweep (no scalatestplus
  * bridge in the offline dep set). */
class PropertySpec extends AnyFunSuite {
  def forAll[T](gen: Gen[T], n: Int = 100)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }
  def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  val cellGen: Gen[String] = Gen.oneOf(
    Gen.choose(-1e6, 1e6).map(d => d.toString.replace('.', ',')),
    Gen.const(""), Gen.const("abc"), Gen.const("1e3"), Gen.const("inf"),
    Gen.alphaNumStr.map(_.take(6)))

  val fileGen: Gen[(Int, Int, Vector[Vector[String]])] = for {
    nSeries <- Gen.choose(1, 8)
    nRows <- Gen.choose(0, 30)
    rows <- Gen.listOfN(nRows, Gen.listOfN(nSeries, cellGen).map(_.toVector)).map(_.toVector)
  } yield (nSeries, nRows, rows)

  def render(nSeries: Int, rows: Vector[Vector[String]]): String = {
    val hdr = ";" + (1 to nSeries).map(i => s"id$i : name$i").mkString(";")
    val unit = "u" + ";x" * nSeries
    val dataRows = rows.zipWithIndex.map { case (r, i) => s"${1000 + i};${r.mkString(";")}" }
    (hdr +: unit +: dataRows).mkString("\n") + "\n"
  }

  test("unpivot invariant: datapoints == valid cells (S6/S7 semantics)") {
    forAll(fileGen) { case (nSeries, _, rows) =>
      val parsed = TebisCsv.parseContent("f.csv", render(nSeries, rows))
      assert(parsed.error.isEmpty)
      val expected = rows.flatten.count(c =>
        c.nonEmpty && TebisCsv.parsePythonFloat(c.replace(',', '.')).isDefined)
      assert(parsed.datapointCount == expected)
    }
  }

  test("series count == distinct externalIds with >=1 surviving datapoint") {
    forAll(fileGen) { case (nSeries, _, rows) =>
      val parsed = TebisCsv.parseContent("f.csv", render(nSeries, rows))
      val nonEmpty = parsed.columns.filter(_.datapoints.nonEmpty).map(_.externalId).distinct.size
      assert(parsed.seriesCount == nonEmpty)
      assert(parsed.seriesCount <= nSeries)
    }
  }

  test("timestamps are epoch-seconds * 1000 of the row's first cell") {
    forAll(fileGen) { case (nSeries, _, rows) =>
      val parsed = TebisCsv.parseContent("f.csv", render(nSeries, rows))
      parsed.columns.flatMap(_.datapoints).foreach { dp =>
        assert(dp.timestampMs % 1000 == 0)
        val sec = dp.timestampMs / 1000
        assert(sec >= 1000 && sec < 1000 + rows.length)
      }
    }
  }

  test("csv scanner round-trip: fields survive quoting") {
    val fieldGen = Gen.listOf(Gen.oneOf(Gen.alphaNumStr,
      Gen.const("a;b"), Gen.const("x\"y"), Gen.const(""))).map(_.take(6))
    forAll(fieldGen) { fields =>
      whenever(fields.nonEmpty) {
        def quote(f: String) = "\"" + f.replace("\"", "\"\"") + "\""
        val line = fields.map(quote).mkString(";")
        val parsed = TebisCsv.parseCsv(line)
        assert(parsed.length == 1 && parsed.head == fields.toVector)
      }
    }
  }

  test("python float parity on doubles round-trip") {
    forAll(Gen.choose(-1e12, 1e12)) { d =>
      assert(TebisCsv.parsePythonFloat(d.toString).contains(d))
      assert(TebisCsv.parsePythonFloat(d.toString.replace('.', ',').replace(",", ".")).isDefined)
    }
  }

  /** Random document corpora: (doc_id, source, text) with 1..60 tokens. */
  val corpusGen: Gen[List[(Long, String, String)]] = for {
    n <- Gen.choose(10, 60)
    docs <- Gen.listOfN(n, for {
      src <- Gen.choose(0, 3).map(i => s"s$i")
      toks <- Gen.choose(1, 60)
      words <- Gen.listOfN(toks, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
    } yield (src, words.mkString(" ")))
  } yield docs.zipWithIndex.map { case ((src, text), i) => (i.toLong, src, text) }

  // Dense-bin assertion relies on every generated doc fitting one bin:
  // corpusGen caps docs at 60 tokens < the 64-token capacity. A doc over
  // capacity legitimately skips bin ids (first-token-bin semantics) —
  // that case is covered by OpsSpec's q72 test, which gates density on
  // max doc length.
  test("packing conserves tokens/docs per source and bins stay dense (random corpora)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    forAll(corpusGen, n = 6) { rows =>
      val docs = rows.toDF("doc_id", "source", "text")
      val bins = graft.ops.Corpus.packSequences(docs, capacity = 64L).collect()
      val bySource = bins.groupBy(_.getAs[String]("source"))
      val truth = rows.groupBy(_._2)
      assert(bySource.keySet == truth.keySet)
      truth.foreach { case (src, ds) =>
        val rs = bySource(src)
        assert(rs.map(_.getAs[Long]("n_tokens")).sum ==
          ds.map(_._3.split(" ").length.toLong).sum)
        assert(rs.map(_.getAs[Long]("n_docs")).sum == ds.length.toLong)
        val ids = rs.map(_.getAs[Long]("bin")).sorted
        assert(ids.head == 0L && ids.zip(ids.tail).forall { case (a, b) => b == a + 1 })
      }
    }
  }

  /** Random multi-line corpora for the cleaning ops: lines drawn from a
    * small vocab (so cross-document duplicate lines are common), with
    * occasional "slow" block tokens; some docs embed a doc-block phrase. */
  val linedCorpusGen: Gen[List[(Long, String)]] = for {
    shared <- Gen.listOfN(4, lineGen)
    n <- Gen.choose(3, 15)
    docs <- Gen.listOfN(n, for {
      nl <- Gen.choose(1, 6)
      own <- Gen.listOfN(nl, Gen.frequency(2 -> lineGen, 1 -> Gen.oneOf(shared)))
    } yield own.mkString("\n"))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private lazy val lineGen: Gen[String] = for {
    nw <- Gen.choose(1, 6)
    ws <- Gen.listOfN(nw, Gen.frequency(
      6 -> Gen.oneOf("aa", "bb", "cc", "dd"), 1 -> Gen.const("slow")))
  } yield ws.mkString(" ")

  /** Random (source, toks, mult) cap tables for the water-filling
    * frontier — skew drawn wide so capped/uncapped frontiers of every
    * shape appear, including all-capped-but-one and none-capped. */
  val capsGen: Gen[List[(String, Long, Long)]] = for {
    n <- Gen.choose(1, 12)
    rows <- Gen.listOfN(n, for {
      toks <- Gen.choose(1L, 5000L)
      mult <- Gen.choose(1L, 4L)
    } yield (toks, mult))
  } yield rows.zipWithIndex.map { case ((t, m), i) => (s"s$i", t, m) }

  /** Plain-Scala greedy water-filling: repeatedly cap every source whose
    * cap is below the current uniform share until a fixpoint — the
    * textbook iterative form the closed-form window chain must equal. */
  private def greedyWaterfill(rows: List[(String, Long, Long)]): Map[String, Long] = {
    val caps = rows.map { case (s, t, m) => s -> t * m }.toMap
    val budget = rows.map(_._2).sum
    var capped = Map.empty[String, Long]
    var free = caps.keySet
    var changed = true
    while (changed && free.nonEmpty) {
      changed = false
      val rem = budget - capped.values.sum
      val share = rem / free.size // floor — any source strictly below it is capped
      val newly = free.filter(s => caps(s) <= share && caps(s) * free.size <= rem)
      // textbook: cap the SMALLEST first, then recompute (one at a time
      // keeps the share arithmetic exact)
      newly.toSeq.sortBy(s => (caps(s), s)).headOption.foreach { s =>
        capped += s -> caps(s); free -= s; changed = true
      }
    }
    val rem = budget - capped.values.sum
    val m = free.size
    val freeSorted = free.toSeq.sortBy(s => (caps(s), s))
    val base = if (m == 0) 0L else rem / m
    val extra = if (m == 0) 0L else rem % m
    capped ++ freeSorted.zipWithIndex.map { case (s, i) =>
      s -> (base + (if (i < extra) 1L else 0L))
    }
  }

  test("unimax closed-form frontier == iterative greedy water-filling (random caps)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    forAll(capsGen, n = 30) { rows =>
      val out = graft.ops.Sampling.unimaxAllocFromCaps(
          rows.toDF("source", "toks", "mult")).collect()
        .map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc")).toMap
      val ref = greedyWaterfill(rows)
      assert(out == ref, s"caps=$rows\nclosed=$out\ngreedy=$ref")
      assert(out.values.sum == rows.map(_._2).sum, "budget spent exactly")
    }
  }

  test("neyman allocation == plain-Scala largest-remainder reference (random strata)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val stratum: Gen[List[Long]] = Gen.oneOf(
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, Gen.choose(1L, 50L))),
      // zero-variance stratum: constant length
      Gen.choose(1, 6).flatMap(n => Gen.choose(1L, 50L).map(v => List.fill(n)(v))))
    val gen: Gen[(Long, List[(String, List[Long])])] = for {
      k <- Gen.choose(1, 8)
      xs <- Gen.listOfN(k, stratum)
      budget <- Gen.choose(1L, 500L)
      allConst <- Gen.prob(0.15) // sometimes force the Σw=0 fallback path
    } yield (budget,
      xs.zipWithIndex.map { case (l, i) =>
        (s"s$i", if (allConst) l.map(_ => 7L) else l) })
    def seats(names: Seq[String], w: Map[String, Long], budget: Long): Map[String, Long] = {
      val tw = names.map(w).sum
      val fl = names.map(s => s -> (budget * w(s)) / tw).toMap
      val rem = names.map(s => s -> (budget * w(s)) % tw).toMap
      val extra = budget - fl.values.sum
      names.sortBy(s => (-rem(s), s)).zipWithIndex
        .map { case (s, i) => s -> (fl(s) + (if (i < extra) 1L else 0L)) }.toMap
    }
    forAll(gen, n = 40) { case (budget, strata) =>
      val ms = strata.map { case (s, xs) =>
        (s, xs.size.toLong, xs.sum, xs.map(x => x * x).sum) }
      val names = ms.map(_._1)
      val wNey = ms.map { case (s, n, sx, sxx) =>
        s -> math.floor(math.sqrt((n * sxx - sx * sx).toDouble)).toLong }.toMap
      val wUsed = if (names.map(wNey).sum == 0L)
        ms.map { case (s, n, _, _) => s -> n }.toMap else wNey
      val refN = seats(names, wUsed, budget)
      val refP = seats(names, ms.map { case (s, n, _, _) => s -> n }.toMap, budget)
      val out = graft.ops.Sampling.neymanAllocFromMoments(
          ms.toDF("source", "n_docs", "sx", "sxx"), budget).collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("w_neyman"), r.getAs[Long]("alloc"), r.getAs[Long]("alloc_prop")))
        .toMap
      assert(out.view.mapValues(_._1).toMap == wNey, s"weights differ: $ms")
      assert(out.view.mapValues(_._2).toMap == refN, s"neyman alloc differs: $ms budget=$budget")
      assert(out.view.mapValues(_._3).toMap == refP, s"prop alloc differs: $ms budget=$budget")
      assert(out.values.map(_._2).sum == budget && out.values.map(_._3).sum == budget,
        "both allocations spend the budget exactly")
    }
  }

  test("grouped rank-sum AUC == brute-force all-pairs AUC with half-credit ties (random)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val gen: Gen[List[(String, Long, Long)]] = for {
      k <- Gen.choose(1, 3)
      n <- Gen.choose(2, 60)
      rows <- Gen.listOfN(n, for {
        src <- Gen.choose(0, k - 1).map(i => s"s$i")
        lvl <- Gen.choose(-5L, 5L) // narrow range → heavy ties
        pos <- Gen.oneOf(0L, 1L)
      } yield (src, lvl, pos))
    } yield rows
    forAll(gen, n = 40) { rows =>
      val out = graft.ops.TextStats.aucFromScored(
          rows.toDF("source", "lvl", "pos")).collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
            Option(r.get(r.fieldIndex("auc_micro"))).map(_.asInstanceOf[Long])))
        .toMap
      rows.groupBy(_._1).foreach { case (src, rs) =>
        val posL = rs.filter(_._3 == 1L).map(_._2)
        val negL = rs.filter(_._3 == 0L).map(_._2)
        val (p, n) = (posL.size.toLong, negL.size.toLong)
        val expected =
          if (p == 0 || n == 0) None
          else {
            // brute force: 2U = Σ_pairs (2·[pos>neg] + [pos==neg])
            val u2 = (for (a <- posL; b <- negL)
              yield if (a > b) 2L else if (a == b) 1L else 0L).sum
            Some((BigInt(u2) * 1000000 / (2 * p * n)).toLong)
          }
        assert(out(src) == ((p, n, expected)),
          s"src=$src rows=$rs got=${out(src)} want=${(p, n, expected)}")
      }
    }
  }

  test("winnowing guarantee: a planted >= w+k-1 token run is caught in both docs (random)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val word: Gen[String] = Gen.choose(0, 400).map(i => s"w$i")
    val gen = for {
      runLen <- Gen.choose(graft.ops.Dedup.WinW + graft.ops.Dedup.WinK - 1, 12)
      run <- Gen.listOfN(runLen, word)
      pre1 <- Gen.listOfN(5, word); post1 <- Gen.listOfN(5, word)
      pre2 <- Gen.listOfN(7, word); post2 <- Gen.listOfN(3, word)
    } yield (
      (pre1 ++ run ++ post1).mkString(" "),
      (pre2 ++ run ++ post2).mkString(" "))
    forAll(gen, n = 25) { case (a, b) =>
      val rows = graft.ops.Dedup.winnowing(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text")).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[Long]("n_dup_sel"), r.getAs[Long]("n_grams"), r.getAs[Long]("n_selected")))
        .toMap
      assert(rows(1L)._1 >= 1 && rows(2L)._1 >= 1,
        s"planted run escaped: a='$a' b='$b' rows=$rows")
      rows.values.foreach { case (_, m, sel) =>
        assert(sel <= math.max(m - graft.ops.Dedup.WinW + 1, 1),
          "cannot select more than one fingerprint per window")
      }
    }
  }

  test("cleanLines is idempotent: a second pass keeps every line (random corpora)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    forAll(linedCorpusGen, n = 6) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val once = graft.ops.Cleaning.cleanLines(docs, delim = "\n",
        minWords = 2, lineBlockToken = "slow", docBlockPhrase = "aa aa aa aa")
      val c1 = once.collect()
      c1.foreach { r =>
        val (in, kept) = (r.getAs[Long]("n_lines_in"), r.getAs[Long]("n_lines_kept"))
        assert(kept >= 1 && kept <= in)
        // every surviving line independently satisfies the predicates
        r.getAs[String]("text_clean").split("\n").foreach { ln =>
          val ws = ln.split(" ")
          assert(ws.length >= 2 && !ws.contains("slow"))
        }
      }
      val c2 = graft.ops.Cleaning.cleanLines(
        once.select($"doc_id", $"text_clean".as("text")), delim = "\n",
        minWords = 2, lineBlockToken = "slow", docBlockPhrase = "aa aa aa aa")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_lines_in"), r.getAs[Long]("n_lines_kept"),
            r.getAs[String]("text_clean")))).toMap
      assert(c2.keySet == c1.map(_.getAs[Long]("doc_id")).toSet)
      c1.foreach { r =>
        val (in2, kept2, text2) = c2(r.getAs[Long]("doc_id"))
        assert(in2 == r.getAs[Long]("n_lines_kept") && kept2 == in2)
        assert(text2 == r.getAs[String]("text_clean"))
      }
    }
  }

  test("dedupLines keeps each distinct line exactly once and is idempotent (random corpora)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    forAll(linedCorpusGen, n = 6) { rows =>
      val docs = rows.toDF("doc_id", "text")
      val out = graft.ops.Cleaning.dedupLines(docs, delim = "\n").collect()
      // conservation: kept lines across the corpus == distinct input lines
      val distinctLines = rows.flatMap(_._2.split("\n")).distinct.length
      assert(out.map(_.getAs[Long]("n_kept")).sum == distinctLines.toLong)
      // first occurrence wins: doc 0's lines (its own firsts) all survive
      val firstSeenIn = rows.flatMap { case (id, t) =>
        t.split("\n").map(_ -> id) }.groupBy(_._1).map { case (l, os) => l -> os.map(_._2).min }
      out.foreach { r =>
        val id = r.getAs[Long]("doc_id")
        r.getAs[String]("text_dedup").split("\n").filter(_.nonEmpty).foreach { ln =>
          assert(firstSeenIn(ln) == id, s"line '$ln' kept in $id")
        }
      }
      // idempotence: re-deduping the non-empty survivors drops nothing
      val survivors = out.filter(_.getAs[Long]("n_kept") > 0)
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text_dedup")))
      val again = graft.ops.Cleaning.dedupLines(
        survivors.toSeq.toDF("doc_id", "text"), delim = "\n").collect()
      again.foreach(r => assert(
        r.getAs[Long]("n_kept") == r.getAs[Long]("n_lines"), s"doc ${r.get(0)} re-dedup"))
    }
  }

  test("redactPii reaches a fixed point: a second pass finds nothing (random pii text)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val piiTextGen: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.oneOf("aa", "bb", "cc"),
      1 -> Gen.const("user.x+tag@sub.example.org"),
      1 -> Gen.const("+47-555-0100"),
      1 -> Gen.const("192.168.0.17"))).map(_.take(12).mkString(" "))
    forAll(Gen.listOfN(8, piiTextGen), n = 6) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = graft.ops.Cleaning.redactPii(docs, $"text")
      val c1 = once.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      // counts match the planted tokens (space-separated, so no overlap)
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = if (t.isEmpty) Array.empty[String] else t.split(" ")
        assert(c1(i.toLong).getAs[Long]("n_emails") == toks.count(_.contains("@")).toLong)
        assert(c1(i.toLong).getAs[Long]("n_phones") == toks.count(_.startsWith("+")).toLong)
        assert(c1(i.toLong).getAs[Long]("n_ips") == toks.count(_ == "192.168.0.17").toLong)
      }
      val c2 = graft.ops.Cleaning.redactPii(
        once.select($"doc_id", $"text_redacted".as("text")), $"text").collect()
      c2.foreach { r =>
        assert(r.getAs[Long]("n_emails") == 0L && r.getAs[Long]("n_phones") == 0L &&
          r.getAs[Long]("n_ips") == 0L)
      }
    }
  }

  test("chunking tiles every document exactly (random corpora)") {
    val spark = SparkSpec.spark
    import spark.implicits._
    forAll(corpusGen, n = 6) { rows =>
      val docs = rows.map(r => (r._1, r._3)).toDF("doc_id", "text")
      val chunks = graft.ops.Corpus.chunkOverlap(docs).collect()
        .groupBy(_.getAs[Long]("doc_id"))
      rows.foreach { case (id, _, text) =>
        val nTok = text.split(" ").length
        val rs = chunks(id).sortBy(_.getAs[Long]("chunk_id"))
        assert(rs.length == 1 + (nTok - 1) / graft.ops.Corpus.ChunkStride)
        rs.foreach { c =>
          val start = c.getAs[Long]("start")
          assert(c.getAs[Long]("chunk_tokens") ==
            math.min(graft.ops.Corpus.ChunkSize.toLong, nTok - start + 1))
        }
        // coverage: chunks start at 1 and the last reaches the end
        assert(rs.head.getAs[Long]("start") == 1L)
        val last = rs.last
        assert(last.getAs[Long]("start") + last.getAs[Long]("chunk_tokens") - 1 == nTok.toLong)
      }
    }
  }
}
