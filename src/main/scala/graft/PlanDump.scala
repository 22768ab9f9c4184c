package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries — the r13 plan
  * evidence (`plans/r13/<query>_{before,after}.txt`). Session config
  * matches Bench exactly so the dumped plan is the one the bench runs
  * (same extensions, same shuffle partitions, AQE on).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [query ...]
  *   - suffix: "before" | "after" (file name tag)
  *   - no query names = every declared query.
  * Plans are captured AFTER one execution of the query (noop sink) so
  * AQE's final plan is what lands in the file, not the unresolved
  * isFinalPlan=false shell.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args.take(3)
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.codegen.cache.maxEntries", "16384")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        // r14 fix: the noop write used here before wraps the frame in a
        // NEW QueryExecution, so `df.queryExecution` stayed un-executed
        // and the dump showed the INITIAL adaptive plan
        // (isFinalPlan=false) — AQE's runtime decisions (join-strategy
        // conversion, AQEShuffleRead coalescing) never appeared.
        // collect() drives THIS Dataset's own QueryExecution to the
        // final plan (dump tool only — Bench keeps the noop sink).
        df.collect()
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      SessionHygiene.clear(spark)
    }
    spark.stop()
  }
}
