package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generation-compacted batch-id-partitioned streaming state (r11 —
  * VERDICT ask 2).
  *
  * Every foreachBatch stream family persists its cross-batch state as
  * one parquet partition per micro-batch (`stateDir/batch_id=N`,
  * mode=overwrite — the replay-idempotence discipline). That layout is
  * what makes replays safe, but it grows ONE PARTITION PER BATCH
  * FOREVER: at the reference extractor's 8 s live trigger that is ~10k
  * directories/day, and every state read's `batch_id < N` prune pays a
  * listing linear in batch count — a listing storm within a week.
  *
  * This object collapses history into GENERATIONS while keeping every
  * replay guarantee:
  *
  *   - state = `stateDir/base/gen=H` (all batches < H, merged) plus the
  *     live partitions `batch_id >= H`. H is the compaction horizon.
  *   - READERS resolve H from the newest COMPLETE generation (Spark's
  *     `_SUCCESS` marker — a crashed compaction write is simply not a
  *     generation) and IGNORE partitions below H, so a replayed
  *     already-compacted batch that rewrites `batch_id=N` (N < H) is a
  *     no-op by construction: its rows are invisible, its content
  *     already lives in the base. The stream-side guard ([[horizon]])
  *     additionally skips the wasted write.
  *   - COMPACTION is crash-safe by never mutating in place: merge
  *     (base gen ∪ partitions in [old H, upTo)) into the NEW directory
  *     `base/gen=upTo`, and only then delete the superseded
  *     directories. A crash mid-write leaves an incomplete (ignored)
  *     generation; a crash mid-delete leaves garbage below the horizon
  *     that readers already ignore and a re-run removes. Re-running
  *     always converges.
  *
  * The caller contract is unchanged from the per-family scaladocs:
  * compact between batches with `upToBatch` at most the last COMMITTED
  * batch id + 1 (an uncommitted batch must stay above the horizon so
  * its own replay stays above it too).
  */
object StreamState {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The compaction horizon H of a state table: the newest COMPLETE
    * base generation, 0 when never compacted. Batches < H live in the
    * base; partitions < H are superseded garbage. */
  def horizon(spark: SparkSession, stateDir: String): Long = {
    val base = new Path(s"$stateDir/base")
    val fs = fsOf(spark, base)
    if (!fs.exists(base)) return 0L
    fs.listStatus(base).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("gen="))
      .filter(p => fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("gen=").toLong)
      .sorted.lastOption.getOrElse(0L)
  }

  /** All live state rows of a table: base generation ∪ partitions at or
    * above the horizon, optionally pruned to `batch_id < current` (the
    * per-batch readers' own-writes guard; base rows are always < any
    * replayable batch id by the compaction contract). None while the
    * table has no data at all. The returned frame carries only DATA
    * columns — batch_id, a physical detail, is dropped. */
  def read(spark: SparkSession, stateDir: String,
      current: Long = Long.MaxValue): Option[DataFrame] = {
    val root = new Path(stateDir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return None
    val h = horizon(spark, stateDir)
    // prune on the LISTING, not a column: the per-batch partition dirs
    // are read explicitly (never the root — the base/ subdir would trip
    // Spark's partition discovery), so excluded batches cost a name
    // comparison, not a footer read
    val liveDirs = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch_id="))
      .filter { p =>
        val id = p.getName.stripPrefix("batch_id=").toLong
        id >= h && id < current
      }
    val live =
      if (liveDirs.isEmpty) None
      else Some(spark.read.parquet(liveDirs.map(_.toString).toSeq: _*))
    val base =
      if (h == 0L) None
      else Some(spark.read.parquet(s"$stateDir/base/gen=$h"))
    (live, base) match {
      case (Some(l), Some(b)) => Some(l.unionByName(b))
      case (l, b) => l.orElse(b)
    }
  }

  /** The last batch id the streaming CHECKPOINT has committed — read
    * from the checkpoint's `commits/` log (a commit file exists iff the
    * batch completed fully, so a restart resumes AFTER it). This is the
    * safe compaction horizon made mechanical: `compact(...,
    * lastCommittedBatch + 1)` can never fold a batch that might still
    * replay, which the per-family scaladocs otherwise leave to the
    * caller's discipline. None before the first commit. */
  def lastCommittedBatch(spark: SparkSession,
      checkpointDir: String): Option[Long] = {
    val p = new Path(s"$checkpointDir/commits")
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else fs.listStatus(p).map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit))
      .map(_.toLong).maxOption
  }

  /** [[compact]] up to the checkpoint-committed horizon — the
    * between-batches maintenance call a deployment crons: everything
    * the checkpoint guarantees will never replay folds into the base;
    * a no-op before the first commit. */
  def compactCommitted(spark: SparkSession, stateDir: String,
      checkpointDir: String, merge: DataFrame => DataFrame = identity,
      numFiles: Int = 1): Unit =
    lastCommittedBatch(spark, checkpointDir).foreach { n =>
      compact(spark, stateDir, n + 1, merge, numFiles)
    }

  /** Compact a batch-id-keyed SHARD OUTPUT directory (the admitted-data
    * twin of state compaction): identity merge, `numFiles` sized to the
    * data (shards are corpus-scale where state is key-scale). Readers
    * that resolve through [[read]] see the identical row set; a
    * replayed compacted batch that recreates its `batch_id=N` directory
    * is ignored on read and skipped by the families' write guards. The
    * reference's 8 s live trigger mints ~10k shard directories/day —
    * the same listing storm the state side had. */
  def compactShards(spark: SparkSession, outDir: String, upToBatch: Long,
      numFiles: Int = 8): Unit =
    compact(spark, outDir, upToBatch, identity, numFiles)

  /** Compact a state table up to (excluding) `upToBatch`: merge the
    * current base generation and every partition in [H, upToBatch)
    * through `merge` (identity for row-per-fact tables; a re-aggregate
    * for partial-sum tables; a re-trim for sketch tables) into
    * `base/gen=upToBatch`, then delete the superseded directories.
    * No-op when nothing below `upToBatch` exists. `numFiles` sizes the
    * base write (state is usually small; a 100 TB deployment passes its
    * own parallelism). */
  def compact(spark: SparkSession, stateDir: String, upToBatch: Long,
      merge: DataFrame => DataFrame = identity, numFiles: Int = 1): Unit = {
    require(upToBatch > 0, s"upToBatch must be positive, got $upToBatch")
    val root = new Path(stateDir)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) return
    val h = horizon(spark, stateDir)
    if (upToBatch <= h) return // already compacted past this point
    val parts = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch_id="))
    val folding = parts.filter { p =>
      val id = p.getName.stripPrefix("batch_id=").toLong
      id >= h && id < upToBatch
    }
    if (folding.isEmpty && h == 0L) return // nothing to fold, no base
    val pieces =
      folding.toSeq.map(p => spark.read.parquet(p.toString)) ++
        (if (h > 0L) Seq(spark.read.parquet(s"$stateDir/base/gen=$h")) else Nil)
    val merged = merge(pieces.reduce(_ unionByName _))
    merged.coalesce(numFiles).write.mode("overwrite")
      .parquet(s"$stateDir/base/gen=$upToBatch")
    // the new generation is complete (its _SUCCESS exists) — everything
    // below the new horizon is now superseded: every other generation
    // dir (the old valid one AND any incomplete crash leftovers), the
    // folded partitions, and any replay-garbage partitions under h
    val baseDir = new Path(s"$stateDir/base")
    fs.listStatus(baseDir).filter(_.isDirectory).map(_.getPath)
      .filter(p => p.getName.startsWith("gen=") && p.getName != s"gen=$upToBatch")
      .foreach(p => fs.delete(p, true))
    parts.filter(_.getName.stripPrefix("batch_id=").toLong < upToBatch)
      .foreach(p => fs.delete(p, true))
  }
}
