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

  test("star-family TVFs resolve in plain SQL and answer identically to " +
      "their Scala entry points (r11 — the SQL surface of the pipeline layer)") {
    val spark = SparkSpec.spark // carries the extensions conf
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(spark.sql(s"SELECT * FROM dedup_reps('$dir/documents.parquet')"))
      == rows(graft.ops.Dedup.exact(
        spark.read.parquet(s"$dir/documents.parquet"))))
    assert(rows(spark.sql(s"SELECT * FROM quality_gate('$dir/documents.parquet')"))
      == rows(graft.ops.Sampling.qualityFilter(
        spark.read.parquet(s"$dir/documents.parquet"))))
    assert(rows(spark.sql(s"SELECT * FROM chunk_geometry('$dir/documents.parquet')"))
      == rows(graft.ops.Chunking.chunkGeometry(
        spark.read.parquet(s"$dir/documents.parquet"))))
    assert(rows(spark.sql(s"SELECT * FROM chunk_dup_card('$dir/documents.parquet')"))
      == rows(graft.ops.Chunking.chunkDupCard(
        spark.read.parquet(s"$dir/documents.parquet"))))
    assert(rows(spark.sql(s"SELECT * FROM column_profile('$dir/lineitem.parquet')"))
      == rows(graft.ops.Profiling.columnProfile(
        spark.read.parquet(s"$dir/lineitem.parquet"))))
    // TVFs compose like any relation: aggregate over a TVF
    val n = spark.sql(
      s"SELECT count(*) FROM dedup_reps('$dir/documents.parquet')")
      .collect()(0).getLong(0)
    assert(n > 0, "aggregating over a TVF must work like any relation")
  }

  test("r12 TVFs (multi-arg): near-dup mine, persisted knn, dataset " +
      "card, source mix — identical to their Scala entry points") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(spark.sql(
        s"SELECT * FROM dedup_near_pairs('$dir/documents.parquet', 0.8)"))
      == rows(graft.ops.Dedup.minhashLshPairs(
        spark.read.parquet(s"$dir/documents.parquet"), 0.8)))
    val idx = graft.ops.Similarity.persistedIvfIndexDir(spark, dir)
    assert(rows(spark.sql(s"SELECT * FROM knn_ivf_persisted('$idx', 3)"))
      == rows(graft.ops.Similarity.knnIvfPersisted(spark, idx, 3)))
    assert(rows(spark.sql(s"SELECT * FROM dataset_card('$dir/documents.parquet')"))
      == rows(graft.ops.Corpus.datasetCard(spark, dir)))
    assert(rows(spark.sql(
        s"SELECT * FROM source_mix('$dir/documents.parquet', 1000000)"))
      == rows(graft.ops.Sampling.sourceMix(
        spark.read.parquet(s"$dir/documents.parquet"), 1000000L)))
    // a malformed arg list fails with the usage string, not a planner error
    val ex = intercept[Exception] {
      spark.sql("SELECT * FROM knn_ivf_persisted('/nope')").collect()
    }
    assert(ex.getMessage.contains("knn_ivf_persisted expects"))
  }

  test("r13 TVFs: decontaminate, bm25_topk, sessionize, knn_stream — " +
      "identical to their Scala entry points; integral parameters " +
      "REFUSE fractional literals instead of truncating (ADVICE r12)") {
    val spark = SparkSpec.spark
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(spark.sql(
        s"SELECT * FROM decontaminate('$dir/documents.parquet', 0.8)"))
      == rows(graft.ops.Dedup.decontaminate(
        spark.read.parquet(s"$dir/documents.parquet"), 0.8)))
    assert(rows(spark.sql(s"SELECT * FROM bm25_topk(" +
        s"'$dir/documents.parquet', 'join filter window', 10)"))
      == rows(graft.ops.Corpus.bm25TopK(spark, dir,
        Seq("join", "filter", "window"), 10)))
    assert(rows(spark.sql(s"SELECT * FROM sessionize('$dir/events.parquet', 1800)"))
      == rows(graft.ops.EventOps.sessionize(
        graft.ops.EventOps.events(spark, dir), 1800L)))
    val sidx = graft.ops.Similarity.streamedSplitIndexDir(spark, dir)
    assert(rows(spark.sql(s"SELECT * FROM knn_stream('$sidx', 3)"))
      == rows(graft.streaming.IndexStream.knn(spark, sidx, 3)))
    assert(rows(spark.sql(s"SELECT * FROM knn_stream('$sidx', 3, 8)"))
      == rows(graft.streaming.IndexStream.knn(spark, sidx, 3, memberCap = 8)))
    // the r12 Num extractor silently truncated 3.7 -> 3; integral params
    // now match integral literal TYPES, so a fractional k is the usage
    // error, never a silent floor
    val exK = intercept[Exception] {
      spark.sql(s"SELECT * FROM knn_ivf_persisted('$sidx', 3.7)").collect()
    }
    assert(exK.getMessage.contains("knn_ivf_persisted expects"))
    val exB = intercept[Exception] {
      spark.sql(s"SELECT * FROM source_mix('$dir/documents.parquet', 0.5)")
        .collect()
    }
    assert(exB.getMessage.contains("source_mix expects"))
    // a LONG budget above Int range still parses (the Double round-trip
    // would have lost precision past 2^53 — the literal type carries it)
    assert(spark.sql(s"SELECT * FROM source_mix('$dir/documents.parquet', " +
      "9007199254740995)").collect().nonEmpty)
  }
}
