package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-scale measurement main (SCALE.md campaign tooling, not a
  * query): drives [[graft.streaming.CorpusStream.dedupeNearToShards]]
  * over a real file source at an arbitrary corpus scale and batch count.
  *
  * Usage (sbt): `runMain graft.ScaleDrive <corpusDir> <nBatches>` —
  * splits `<corpusDir>/documents.parquet` into `<nBatches>` parquet
  * files, streams the first half one file per micro-batch, stops,
  * compacts the band/shingle state (the maintenance path the
  * `compactState` scaladoc promises), then restarts the SAME checkpoint
  * over the second half — so the run also proves admission state
  * survives a stop + compaction + restart at scale. Reports per-batch
  * wall times and admission totals.
  */
object ScaleDrive {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val nBatches = args(1).toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = java.nio.file.Files.createTempDirectory("scale-drive").toString
    val staged = s"$scratch/staged"; val in = s"$scratch/in"; val out = s"$scratch/out"
    val state = s"$scratch/state"; val ckpt = s"$scratch/ckpt"

    // one parquet FILE per intended micro-batch (maxFilesPerTrigger=1)
    val docs = spark.read.parquet(s"$corpusDir/documents.parquet")
      .select("doc_id", "source", "text")
    docs.withColumn("b", pmod(col("doc_id"), lit(nBatches.toLong)))
      .repartition(nBatches, col("b")).drop("b")
      .write.mode("overwrite").parquet(staged)
    val total = docs.count()
    val files = new java.io.File(staged).listFiles()
      .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def stage(fs: Array[java.io.File]): Unit = fs.foreach { f =>
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(in, f.getName)); ()
    }
    println(s"[scale-drive] corpus=$corpusDir docs=$total batches=${files.length}")

    def drive(label: String): Seq[Double] = {
      val stream = spark.readStream
        .schema("doc_id LONG, source STRING, text STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(in)
      val t0 = System.nanoTime()
      val q = graft.streaming.CorpusStream.dedupeNearToShards(
        stream, state, out, ckpt, 0.8,
        trigger = Some(Trigger.ProcessingTime(0)))
      val times = try {
        q.processAllAvailable()
        q.recentProgress.toSeq.filter(_.numInputRows > 0)
          .map(_.durationMs.get("triggerExecution").toDouble / 1e3)
      } finally q.stop()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[scale-drive] $label: wall=$wall%.1f s, batch seconds: [" +
        times.map(t => f"$t%.1f").mkString(",") + "]")
      times
    }

    val half = files.length / 2
    stage(files.take(half))
    drive(s"first $half batches")
    val tC = System.nanoTime()
    graft.streaming.CorpusStream.compactState(spark, state, half.toLong)
    println(f"[scale-drive] compactState(upTo=$half) took ${(System.nanoTime() - tC) / 1e9}%.1f s")
    stage(files.drop(half))
    drive(s"last ${files.length - half} batches (post-compaction restart)")

    val admitted = spark.read.parquet(out).count()
    val stateRows = spark.read.parquet(s"$state/bands").count()
    val stateParts = new java.io.File(s"$state/bands").listFiles()
      .count(f => f.getName.startsWith("batch_id="))
    println(s"[scale-drive] admitted=$admitted/$total bandState=$stateRows rows in $stateParts partitions")
    spark.stop()
  }
}
