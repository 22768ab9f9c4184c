package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tebis._

/** Pure-parser parity tests for the TEBIS semantics locked in SURVEY §1.2
  * and FIXTURES.md §A (fixtures recreated by schema, not copied). */
class TebisParseSpec extends AnyFunSuite {

  // --- csv scanner ---
  test("parseCsv: delimiters, blank lines, CRLF, quotes") {
    assert(TebisCsv.parseCsv("a;b\nc;d\n") == Vector(Vector("a", "b"), Vector("c", "d")))
    assert(TebisCsv.parseCsv("a;b\r\nc;d") == Vector(Vector("a", "b"), Vector("c", "d")))
    assert(TebisCsv.parseCsv("a\n\nb") == Vector(Vector("a"), Vector("b"))) // blank row skipped
    assert(TebisCsv.parseCsv(";") == Vector(Vector("", "")))
    assert(TebisCsv.parseCsv("\"a;b\";c") == Vector(Vector("a;b", "c")))
    assert(TebisCsv.parseCsv("\"a\"\"b\";c") == Vector(Vector("a\"b", "c"))) // doubled quote
    assert(TebisCsv.parseCsv("a\"b;c") == Vector(Vector("a\"b", "c"))) // mid-field quote literal
    assert(TebisCsv.parseCsv("\"a\nb\";c") == Vector(Vector("a\nb", "c"))) // newline in quotes
  }

  // --- header rpartition ---
  test("splitHeaderCell: rpartition on last colon, trimmed") {
    assert(TebisCsv.splitHeaderCell("33 : TEST3") == SeriesHeader("33", "TEST3"))
    assert(TebisCsv.splitHeaderCell("a:b : c") == SeriesHeader("a:b", "c"))
    assert(TebisCsv.splitHeaderCell("nocolon") == SeriesHeader("", "nocolon"))
    assert(TebisCsv.splitHeaderCell(" extIdOne: name1") == SeriesHeader("extIdOne", "name1"))
    assert(TebisCsv.splitHeaderCell("x:") == SeriesHeader("x", ""))
  }

  // --- python float/int parity ---
  test("parsePythonFloat parity") {
    assert(TebisCsv.parsePythonFloat("0.164797").contains(0.164797))
    assert(TebisCsv.parsePythonFloat("1e5").contains(100000.0))
    assert(TebisCsv.parsePythonFloat(" 1.5 ").contains(1.5))
    assert(TebisCsv.parsePythonFloat("-.5").contains(-0.5))
    assert(TebisCsv.parsePythonFloat("5.").contains(5.0))
    assert(TebisCsv.parsePythonFloat("inf").contains(Double.PositiveInfinity))
    assert(TebisCsv.parsePythonFloat("-Infinity").contains(Double.NegativeInfinity))
    assert(TebisCsv.parsePythonFloat("nan").exists(_.isNaN))
    assert(TebisCsv.parsePythonFloat("1_000.5").contains(1000.5)) // py underscores
    assert(TebisCsv.parsePythonFloat("1d").isEmpty) // java-ism rejected
    assert(TebisCsv.parsePythonFloat("0x1p3").isEmpty)
    assert(TebisCsv.parsePythonFloat("1.5.6").isEmpty) // "1,5,6" after replace
    assert(TebisCsv.parsePythonFloat("").isEmpty)
    assert(TebisCsv.parsePythonFloat("abc").isEmpty)
    assert(TebisCsv.parsePythonFloat("1_").isEmpty)
  }

  test("parsePythonInt parity") {
    assert(TebisCsv.parsePythonInt("1550092501").contains(1550092501L))
    assert(TebisCsv.parsePythonInt(" 12 ").contains(12L))
    assert(TebisCsv.parsePythonInt("-3").contains(-3L))
    assert(TebisCsv.parsePythonInt("1_0").contains(10L))
    assert(TebisCsv.parsePythonInt("12.0").isEmpty)
    assert(TebisCsv.parsePythonInt("abc").isEmpty)
  }

  // --- golden files per FIXTURES.md §A ---
  def singleSeries: String = {
    val rows = (1 to 60).map(i => s"${1550092500 + i};0,164797").mkString("\n")
    s";33 : TEST3\nZeitstempel;bar\n$rows\n"
  }

  test("golden A.1: single series, 60 points, s->ms, comma decimal") {
    val f = TebisCsv.parseContent("f.csv", singleSeries)
    assert(f.error.isEmpty)
    assert(f.columns.map(c => (c.externalId, c.name)) == Seq(("33", "TEST3")))
    assert(f.datapointCount == 60)
    assert(f.seriesCount == 1)
    val dps = f.datapoints
    assert(dps.head == Datapoint("33", 1550092501000L, 0.164797))
    assert(dps.last.timestampMs == 1550092560000L)
  }

  test("golden A.3 shape: empty unit cell, 2 series, empty value cells dropped") {
    val content =
      ";136 : TEST1;137 : TEST2\nZeitstempel;;h\n" +
        "1550092621;63,106735;87063,000000\n" +
        "1550092622;;87063,000000\n" + // empty cell -> dropped
        "1550092623;abc;87064,5\n" // unparsable -> dropped
    val f = TebisCsv.parseContent("f.csv", content)
    assert(f.error.isEmpty)
    assert(f.datapointCount == 4)
    assert(f.datapoints.toSet == Set(
      Datapoint("136", 1550092621000L, 63.106735),
      Datapoint("137", 1550092621000L, 87063.0),
      Datapoint("137", 1550092622000L, 87063.0),
      Datapoint("137", 1550092623000L, 87064.5)))
  }

  test("golden A.4 nonfloat.csv: non-empty first header cell => whole file fails") {
    val content = "timestamp; extIdOne: name1;extIdTwo:name2\nignore; speeed; impact\n1550092563;1222;4444\n"
    val f = TebisCsv.parseContent("nonfloat.csv", content)
    assert(f.error.isDefined) // IndexError parity
    assert(f.datapoints.isEmpty)
  }

  test("non-integer timestamp at surviving value => whole file fails (S8 asymmetry)") {
    val content = ";1 : A\nu;bar\n1550092621;1,0\nBAD;2,0\n"
    val f = TebisCsv.parseContent("f.csv", content)
    assert(f.error.exists(_.contains("ValueError")))
    // but a bad timestamp whose value cell is empty/unparsable never trips:
    val ok = TebisCsv.parseContent("f.csv", ";1 : A\nu;bar\n1550092621;1,0\nBAD;\n")
    assert(ok.error.isEmpty && ok.datapointCount == 1)
  }

  test("duplicate header collapses to last column (DictReader parity)") {
    val content = ";33 : A;33 : A\nu;bar;bar\n100;1,0;2,0\n"
    val f = TebisCsv.parseContent("f.csv", content)
    assert(f.error.isEmpty)
    assert(f.columns.size == 1) // one unique key
    assert(f.datapoints == Seq(Datapoint("33", 100000L, 2.0))) // last wins
  }

  test("short rows fill missing cells as dropped") {
    val content = ";1 : A;2 : B\nu;x;y\n100;1,0\n200;3,0;4,0\n"
    val f = TebisCsv.parseContent("f.csv", content)
    assert(f.error.isEmpty)
    assert(f.datapoints.toSet == Set(
      Datapoint("1", 100000L, 1.0), Datapoint("1", 200000L, 3.0), Datapoint("2", 200000L, 4.0)))
  }

  test("row longer than header dead-letters the file, headers preserved (restkey parity)") {
    val content = ";1 : A;2 : B\nu;x;y\n100;1,0\n200;3,0;4,0;9,9\n"
    val f = TebisCsv.parseContent("f.csv", content)
    assert(f.error.exists(_.contains("AttributeError")))
    assert(f.datapoints.isEmpty)
    // every real column was processed before the None restkey raised, so
    // their series still reach the catalog
    assert(f.headers.map(_.externalId) == Seq("1", "2"))
  }

  test("blank first line means empty fieldnames -> file fails (DictReader parity)") {
    val f = TebisCsv.parseContent("f.csv", "\n;1 : A\nu;x\n100;1,0\n")
    assert(f.error.exists(_.contains("AttributeError")))
    assert(f.headers.isEmpty)
    // a file of only blank lines parses to nothing, successfully
    assert(TebisCsv.parseContent("e.csv", "\n\n\n").error.isEmpty)
  }

  test("empty / header-only files parse to zero points, no error") {
    assert(TebisCsv.parseContent("e.csv", "").datapointCount == 0)
    val hdrOnly = TebisCsv.parseContent("h.csv", ";33 : A\n")
    assert(hdrOnly.error.isEmpty && hdrOnly.datapointCount == 0 && hdrOnly.columns.size == 1)
  }

  test("python whitespace: NBSP-padded cells parse (latin-1 exports)") {
    assert(TebisCsv.parsePythonFloat(" 1,5".replace(',', '.')).contains(1.5))
    assert(TebisCsv.parsePythonInt(" 1550092501 ").contains(1550092501L))
    val f = TebisCsv.parseContent("f.csv", ";1 : A\nu;x\n 100;1,5\n")
    assert(f.error.isEmpty && f.datapoints == Seq(Datapoint("1", 100000L, 1.5)))
  }

  test("universal newlines: CRLF inside quoted fields becomes LF (py open parity)") {
    val f = TebisCsv.parseContent("f.csv", ";\"a\r\nb : N\"\nu;x\n100;1,5\n")
    assert(f.columns.map(_.name) == Seq("N"))
    assert(f.columns.map(_.externalId) == Seq("a\nb")) // \r\n -> \n, then rpartition
  }

  test("int overflow maps to ValueError path, not a crash") {
    assert(TebisCsv.parsePythonInt("99999999999999999999999").isEmpty)
    val f = TebisCsv.parseContent("f.csv", ";1 : A\nu;x\n99999999999999999999999;1,5\n")
    assert(f.error.exists(_.contains("ValueError")))
  }

  test("latin-1 content: degree sign in unit row is ignored correctly") {
    val content = ";69 : TEST4\nZeitstempel;°C\n1550092561;70,414284\n"
    val f = TebisCsv.parseContent("f.csv", content)
    assert(f.error.isEmpty && f.datapoints == Seq(Datapoint("69", 1550092561000L, 70.414284)))
  }
}
