package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Chunking

/** RAG/chunking family (q275–q279): conservation invariants, the
  * closed-form==exploded identity, the overlap≥gram recall guarantee,
  * and plan gates. */
class ChunkingSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"
  def docs = spark.read.parquet(s"$dir/documents.parquet")

  def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q275 geometry: conservation invariants hold per source") {
    val rows = Chunking.chunkGeometry(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, nChunks, nShort) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_chunks"), r.getAs[Long]("n_short"))
      assert(nChunks >= nDocs, "every doc yields at least one chunk")
      assert(nShort <= nDocs, "only the per-doc tail chunk can run short")
      assert(r.getAs[Long]("mean_len_micro") <= Chunking.ChunkChars * 1000000L)
    }
  }

  test("q275/q278 identity: exploded geometry equals the closed form at the shared stride") {
    val geo = Chunking.chunkGeometry(docs)
      .select("source", "n_chunks", "chunk_chars")
    val sweep = Chunking.strideSweep(docs)
      .filter(col("stride") === Chunking.ChunkStride)
      .select("source", "n_chunks", "chunk_chars")
    assert(geo.except(sweep).isEmpty && sweep.except(geo).isEmpty,
      "closed-form chunk counts/chars must equal the materialized chunks'")
  }

  test("q276 dup card: chunk totals agree with q275's and dup mass is consistent") {
    val dup = Chunking.chunkDupCard(docs)
      .select("source", "n_chunks").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val geo = Chunking.chunkGeometry(docs)
      .select("source", "n_chunks").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dup == geo, "fp rollup must conserve the chunk stream")
    Chunking.chunkDupCard(docs).collect().foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("n_multi_doc") <= r.getAs[Long]("n_distinct"))
    }
  }

  test("q277 recall guarantee: overlap >= gram width makes every query self-hit") {
    assert(Chunking.WordChunk - Chunking.WordStride >= Chunking.QueryGramWords,
      "policy invariant: chunk overlap must cover the query gram")
    val rows = Chunking.retrievalContainment(docs).collect()
    assert(rows.nonEmpty, "the mod-37 query set must be non-empty at sf0.001")
    rows.foreach { r =>
      assert(r.getAs[Long]("self_hit") == 1L,
        s"query doc ${r.get(0)} must retrieve its own span")
      assert(r.getAs[Long]("n_hit_docs") >= 1L)
      assert(r.getAs[Long]("n_hit_chunks") <= r.getAs[Long]("n_hit_grams"))
    }
  }

  test("q279 boundary card: split counts bounded; short docs contribute nothing") {
    val short = docs.filter(col("n_chars") <= Chunking.ChunkChars)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    val onlyShort = short -- Chunking.boundaryIntegrity(docs)
      .select("source").collect().map(_.getString(0)).toSet
    // a source whose docs are ALL short must be absent from the card
    val withLong = docs.filter(col("n_chars") > Chunking.ChunkChars)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(onlyShort.forall(s => !withLong.contains(s)))
    Chunking.boundaryIntegrity(docs).collect().foreach { r =>
      assert(r.getAs[Long]("n_split") <= r.getAs[Long]("n_boundaries"))
    }
  }

  test("q294 capstone: columns equal the standalone family cards") {
    val rep = Chunking.ragReleaseReport(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val geo = Chunking.chunkGeometry(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val dup = Chunking.chunkDupCard(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val tear = Chunking.boundaryIntegrity(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rep.keySet == geo.keySet)
    rep.foreach { case (s, r) =>
      assert(r.getAs[Long]("n_chunks") == geo(s).getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("chunk_chars") == geo(s).getAs[Long]("chunk_chars"))
      assert(r.getAs[Long]("dup_share_micro") == dup(s).getAs[Long]("dup_share_micro"))
      assert(r.getAs[Long]("n_multi_doc") == dup(s).getAs[Long]("n_multi_doc"))
      assert(r.getAs[Long]("split_micro") ==
        tear.get(s).map(_.getAs[Long]("split_micro")).getOrElse(0L))
    }
  }

  test("plans: q277 broadcasts the query-fp side; the cards never join") {
    val p277 = planOf("q277_retrieval_containment")
    assert(p277.contains("BroadcastHashJoin"), "query fps must broadcast")
    assert(!p277.contains("SortMergeJoin"), "gram stream must not sort-merge")
    Seq("q275_chunk_geometry", "q276_chunk_dup_card", "q278_stride_sweep",
        "q279_boundary_integrity").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("Join"), s"$q must be join-free")
      assert(p.linesIterator.count(_.contains("HashAggregate")) >= 2,
        s"$q rollup must be partial+final")
    }
  }
}
