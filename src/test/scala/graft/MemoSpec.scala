package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Memo

/** r13 (VERDICT ask 2): [[Memo.sharedFrame]] — the cross-JVM
  * build-once protocol generalized from the IVF index scratch dirs to
  * any heavy memoized artifact. "Second session" is simulated the
  * SimilarityIndexSpec way: dropping the in-JVM memo forces the
  * shared-dir protocol to run again from scratch. */
class MemoSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  test("sharedFrame: one build per corpus version across sessions " +
      "(adopt by fingerprint); a stale fingerprint rebuilds through " +
      "tmp+swap with a grace copy") {
    val name = "memo-spec-art"
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-memo-shared-" +
      s"$name-" + dir.replaceAll("[^A-Za-z0-9._-]", "_")
    // idempotency across test runs: clear any previous artifact + lock
    def rmrf(p: String): Unit = {
      val f = new java.io.File(p)
      def del(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(del)); x.delete(); ()
      }
      if (f.exists) del(f)
    }
    Seq(path, s"$path.old", s"$path.lock").foreach(rmrf)
    var builds = 0
    def get() = Memo.sharedFrame(spark, dir, "documents", name) {
      builds += 1
      spark.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "source").orderBy("doc_id").limit(7)
    }
    val r1 = get().collect().map(_.toSeq).toSet
    assert(builds == 1 && r1.size == 7)
    // same session, same corpus: in-JVM memo short-circuits
    assert(get().collect().map(_.toSeq).toSet == r1 && builds == 1)
    // "second session": in-JVM memo dropped — the finished shared build
    // is ADOPTED (fingerprint match + _SUCCESS), never rebuilt
    Memo.clear()
    def fileStamps() = new java.io.File(path).listFiles()
      .map(f => (f.getName, f.lastModified)).toSet
    val before = fileStamps()
    assert(get().collect().map(_.toSeq).toSet == r1)
    assert(builds == 1, "a matching finished build must be adopted")
    assert(fileStamps() == before, "adoption must not touch the artifact")
    // corpus-version change (simulated by a stale fingerprint): the
    // next session rebuilds — through tmp+swap, leaving the superseded
    // artifact as a one-cycle .old grace copy for racing readers
    // tamper through the Hadoop FS (the local FS is checksummed — a raw
    // java.nio write would leave a stale .crc sidecar and fail the read)
    val hp = new org.apache.hadoop.fs.Path(s"$path/_graft_fingerprint")
    graft.util.FsUtil.writeSmallFile(
      graft.util.FsUtil.fsOf(spark, hp), hp, "stale")
    Memo.clear()
    assert(get().collect().map(_.toSeq).toSet == r1)
    assert(builds == 2, "a stale fingerprint must rebuild")
    assert(new java.io.File(s"$path.old").exists,
      "the superseded artifact must survive as a grace copy")
    assert(!new java.io.File(s"$path.lock").exists,
      "the build lock must be released")
    Seq(path, s"$path.old").foreach(rmrf)
  }
}
