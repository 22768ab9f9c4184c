package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions` installation route: a session built with
  * [[GraftExtensions]] resolves every custom function in plain SQL with
  * no per-session register call — the cluster-deployment story
  * (`--conf spark.sql.extensions=graft.GraftExtensions`). */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects all custom functions, SQL-resolvable") {
    val orig = SparkSpec.spark // ensures the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s2 ne orig, "must be a fresh session for extensions to apply")
      val dot = s2.sql(
        "SELECT quantized_dot(CAST(array(1, 2, 3) AS ARRAY<BIGINT>), CAST(array(4, 5, 6) AS ARRAY<BIGINT>)) AS d")
        .collect()(0).getLong(0)
      assert(dot == 4 + 10 + 18)
      // every injected function resolves (FunctionRegistry lookup)
      graft.functions.GraftFunctions.builders.foreach { case (name, _) =>
        assert(s2.catalog.functionExists(name), s"$name must be catalog-visible")
      }
      // the tebis_scan TVF: SQL-only TEBIS reading through the DSv2 source
      val dir = java.nio.file.Files.createTempDirectory("tvf")
      java.nio.file.Files.write(dir.resolve("TEBIS_T_100.csv"),
        ";5 : S\nu;bar\n1000;1,5\n1001;2,5\n".getBytes(
          java.nio.charset.Charset.forName(graft.tebis.TebisCsv.Encoding)))
      val tvf = s2.sql(
        s"SELECT externalId, count(*) AS n, sum(value) AS s FROM tebis_scan('$dir') GROUP BY 1")
        .collect()
      assert(tvf.length == 1 && tvf(0).getString(0) == "5"
        && tvf(0).getLong(1) == 2 && tvf(0).getDouble(2) == 4.0)
    } finally {
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
