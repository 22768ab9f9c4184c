package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef._

/** Similarity search over `embeddings` (★ SURVEY §2c): cosine top-k —
  * brute force as the exact baseline, sign-bit LSH bucketing as the
  * scale path.
  *
  * Determinism: embeddings are quantized to integers (floor(x * 1e6)), so
  * dot products and norms are EXACT integer arithmetic — order-independent
  * and bit-identical in any engine; the final cosine is one double
  * division of identical operands. This is what makes cosine top-k
  * oracle-able at all (float accumulation order would differ).
  *
  * Scale: brute force is O(n²) — fine as a re-rank stage or for one-side-
  * small joins (Spark picks broadcast nested-loop automatically there).
  * The LSH variant buckets on projection sign bits so candidate
  * generation is an equi-join: shuffle-partitionable, skew-safe for
  * roughly isotropic embeddings, the 100 TB path. */
object Similarity {

  /** floor(x * 1e6) quantization of the float vector. */
  val quantExpr = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
  val quantSql = "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"

  /** Quantized vectors + exact integer norms. The norm and all pairwise
    * dot products go through the codegen'd QuantizedDot expression — the
    * built-in zip_with/aggregate lambda pipeline evaluates interpretively
    * and was ~50x slower on the O(n²) join hot path. */
  def quantized(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    QueryDef.cpuBound(spark)
    // spread the (often single-file) vector table before the O(n²) work
    QueryDef.spread(t(spark, dir, "embeddings"))
      .select(col("vec_id"), expr(quantExpr).as("qv"), col("label"))
      .withColumn("nrm", expr("quantized_dot(qv, qv)"))
  }

  private val simCol =
    expr("CAST(quantized_dot(qa, qb) AS DOUBLE)") /
      (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))

  private def pairFrames(q: DataFrame) = (
    q.select(col("vec_id").as("id_a"), col("qv").as("qa"), col("nrm").as("na")),
    q.select(col("vec_id").as("id_b"), col("qv").as("qb"), col("nrm").as("nb")))

  /** All near-duplicate pairs (id_a < id_b) with cosine >= threshold. */
  def nearDupPairs(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    val (a, b) = pairFrames(quantized(spark, dir))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", simCol)
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Exact brute-force cosine top-k per vector. */
  def knnBrute(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val (a, b) = pairFrames(quantized(spark, dir))
    val w = Window.partitionBy("id_a").orderBy(col("sim").desc, col("id_b").asc)
    a.join(b, col("id_a") =!= col("id_b"))
      .withColumn("sim", simCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_a").as("vec_id"), col("rank"), col("id_b").as("neighbor_id"), col("sim"))
  }

  val LshBits = 8

  /** Sign-bit LSH bucket over the first `LshBits` dimensions (axis-aligned
    * hyperplane hashes — valid for roughly isotropic embeddings). */
  val bucketExpr: String =
    (1 to LshBits).map(i => s"CASE WHEN element_at(qv, $i) >= 0 THEN '1' ELSE '0' END")
      .mkString("concat(", ", ", ")")
  val bucketSql: String =
    (1 to LshBits).map(i => s"CASE WHEN qv[$i] >= 0 THEN '1' ELSE '0' END").mkString(" || ")

  /** Approximate top-k: candidates restricted to the same LSH bucket
    * (equi-join on bucket), exact cosine re-rank within. */
  def knnLsh(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val q = quantized(spark, dir).withColumn("bucket", expr(bucketExpr))
    val a = q.select(col("vec_id").as("id_a"), col("qv").as("qa"), col("nrm").as("na"), col("bucket"))
    val b = q.select(col("vec_id").as("id_b"), col("qv").as("qb"), col("nrm").as("nb"), col("bucket"))
    val w = Window.partitionBy("id_a").orderBy(col("sim").desc, col("id_b").asc)
    a.join(b, Seq("bucket"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("sim", simCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_a").as("vec_id"), col("rank"), col("id_b").as("neighbor_id"), col("sim"))
  }

  val IvfCentroids = 16

  /** IVF-style cell assignment: the first `nCents` vectors (by id) act as
    * deterministic centroids (a seeded sample stand-in for k-means —
    * portable across engines); each vector joins the cell of its
    * max-cosine centroid. Centroids broadcast; assignment is a narrow
    * n x nCents pass, never n². */
  def ivfAssign(q: DataFrame, nCents: Int): DataFrame = {
    val cents = q.filter(col("vec_id") < nCents)
      .select(col("vec_id").as("cent_id"), col("qv").as("cqv"), col("nrm").as("cnrm"))
    val w = Window.partitionBy("vec_id").orderBy(col("csim").desc, col("cent_id").asc)
    q.crossJoin(broadcast(cents))
      .withColumn("csim",
        expr("CAST(quantized_dot(qv, cqv) AS DOUBLE)") /
          (sqrt(col("nrm").cast("double")) * sqrt(col("cnrm").cast("double"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("nrm"), col("cent_id").as("cell"))
  }

  /** Approximate top-k with IVF cells (nprobe=1): candidates share the
    * assigned cell, exact cosine re-rank within. */
  def knnIvf(spark: SparkSession, dir: String, k: Int, nCents: Int = IvfCentroids): DataFrame = {
    val q = ivfAssign(quantized(spark, dir), nCents)
    val a = q.select(col("vec_id").as("id_a"), col("qv").as("qa"), col("nrm").as("na"), col("cell"))
    val b = q.select(col("vec_id").as("id_b"), col("qv").as("qb"), col("nrm").as("nb"), col("cell"))
    val w = Window.partitionBy("id_a").orderBy(col("sim").desc, col("id_b").asc)
    a.join(b, Seq("cell"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("sim", simCol)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id_a").as("vec_id"), col("rank"), col("id_b").as("neighbor_id"), col("sim"))
  }

  private val simSql =
    """CAST(list_sum(list_transform(range(1, len(a.qv) + 1), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
       / (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE)))"""

  private val quantCte =
    s"""q AS (SELECT vec_id, $quantSql AS qv FROM embeddings),
        n AS (SELECT vec_id, qv, CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS nrm FROM q)"""

  val queries: Seq[QueryDef] = Seq(
    QueryDef("q44_embed_near_dup",
      (s, d) => nearDupPairs(s, d, 0.4),
      Some(s"""WITH $quantCte
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, $simSql AS sim
        FROM n a JOIN n b ON a.vec_id < b.vec_id
        WHERE $simSql >= 0.4""")),

    QueryDef("q45_knn_brute",
      (s, d) => knnBrute(s, d, 5),
      Some(s"""WITH $quantCte,
        p AS (SELECT a.vec_id, b.vec_id AS neighbor_id, $simSql AS sim
              FROM n a JOIN n b ON a.vec_id <> b.vec_id),
        r AS (SELECT vec_id, neighbor_id, sim,
              row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank FROM p)
        SELECT vec_id, rank, neighbor_id, sim FROM r WHERE rank <= 5""")),

    QueryDef("q46_knn_lsh",
      (s, d) => knnLsh(s, d, 3),
      Some(s"""WITH $quantCte,
        nb AS (SELECT vec_id, qv, nrm, $bucketSql AS bucket FROM n),
        p AS (SELECT a.vec_id, b.vec_id AS neighbor_id, $simSql AS sim
              FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id),
        r AS (SELECT vec_id, neighbor_id, sim,
              row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank FROM p)
        SELECT vec_id, rank, neighbor_id, sim FROM r WHERE rank <= 3""")),

    QueryDef("q47_knn_ivf",
      (s, d) => knnIvf(s, d, 3),
      Some(s"""WITH $quantCte,
        cent AS (SELECT vec_id AS cent_id, qv AS cqv, nrm AS cnrm FROM n WHERE vec_id < $IvfCentroids),
        asg AS (SELECT vec_id, qv, nrm, cent_id,
              row_number() OVER (PARTITION BY vec_id ORDER BY
                CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cqv[i])) AS DOUBLE)
                  / (sqrt(CAST(nrm AS DOUBLE)) * sqrt(CAST(cnrm AS DOUBLE))) DESC, cent_id) AS rn
              FROM n CROSS JOIN cent),
        cells AS (SELECT vec_id, qv, nrm, cent_id AS cell FROM asg WHERE rn = 1),
        p AS (SELECT a.vec_id, b.vec_id AS neighbor_id, $simSql AS sim
              FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        r AS (SELECT vec_id, neighbor_id, sim,
              row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank FROM p)
        SELECT vec_id, rank, neighbor_id, sim FROM r WHERE rank <= 3"""))
  )
}
