package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for suites (one JVM-wide session, lazy). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the shipped session shape (Verify/Bench install it too): every
      // query must run where the TVF surface exists — q281 routes
      // through column_profile('...')
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bucketed-table specs write managed tables; keep them out of cwd
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toUri.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
