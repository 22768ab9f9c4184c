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
