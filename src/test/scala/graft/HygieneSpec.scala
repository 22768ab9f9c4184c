package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pinned-block lifecycle: operators that localCheckpoint intermediates
  * (Dedup q41/q42) leave pinned RDDs after their action — the harness
  * (Bench/Verify) must release them between queries, and does. */
class HygieneSpec extends AnyFunSuite {
  private val spark = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("SessionHygiene.clear releases every pinned localCheckpoint block") {
    SessionHygiene.clear(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    SparkEntry.queries("q42_dedup_minhash_lsh")(spark, sf).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "expected q42's localCheckpoint intermediates to be pinned after the action")
    SessionHygiene.clear(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "hygiene must leave zero pinned RDD blocks")
  }

  test("no oracle SQL carries an interpolated Scala null (val-init-order trap)") {
    // Twice this round a string-interpolated oracle captured a
    // not-yet-initialized val (`s"WITH $quantCte"` before quantCte's
    // declaration) and silently baked the literal text "null" into the
    // SQL. Engine SQL spells the SQL constant in UPPERCASE everywhere,
    // so a lowercase standalone `null` token can only be the trap.
    val bad = "\\bnull\\b".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(bad.findFirstIn(sql).isEmpty,
        s"$name's oracle contains a lowercase 'null' — an uninitialized " +
          "val was interpolated; make the SQL a def or lazy val")
    }
  }

  test("Catalog.save releases its own checkpoint blocks") {
    import spark.implicits._
    SessionHygiene.clear(spark)
    val dir = java.nio.file.Files.createTempDirectory("cat").toString
    val cat = Seq(graft.tebis.TimeSeriesMeta("a", "a", "d")).toDS()
    graft.tebis.Catalog.save(cat, s"$dir/catalog.parquet")
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "save() must unpersist the snapshot it pinned")
  }
}
