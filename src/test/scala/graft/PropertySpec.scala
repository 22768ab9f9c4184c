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
}
