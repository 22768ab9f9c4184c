package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef
import graft.queries.QueryDef._

/** Data-layout clustering: Z-order (Morton) keys for multi-dimensional
  * file clustering. At 100 TB the dominant cost of any selective query is
  * the files it CANNOT skip: a layout sorted on one column clusters that
  * column perfectly and leaves every other filter a full scan. Writing
  * sorted by the interleaved Z-key instead shrinks per-file min/max ranges
  * on BOTH dimensions (~sqrt(nFiles) each), so footer/metadata pruning
  * works for either predicate — the standard lakehouse clustering
  * technique (see Delta/Iceberg OPTIMIZE ZORDER; implemented here from
  * the Morton-code definition).
  *
  * The key is a pure per-row integer fold (codegen'd, no shuffle); the
  * layout effect — writers produce zkey-ordered files via
  * `df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)` — is
  * asserted by LayoutSpec against a real two-layout parquet write. */
object Layout {

  /** Bits interleaved per dimension; 16+16 → the key fits in an int64
    * with room to widen to 3 dimensions before overflow. */
  val ZBits = 16

  /** Bit-spread step masks: after the four doubling steps, the 16 input
    * bits sit at even positions 0,2,…,30 of an int64. */
  private val SpreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  private def spread(v: String, shiftSql: (String, Int) => String): String =
    SpreadSteps.foldLeft(s"(CAST($v AS BIGINT) & 65535)") { case (e, (sh, mask)) =>
      s"(($e | ${shiftSql(e, sh)}) & $mask)"
    }

  /** Morton interleave of the low [[ZBits]] bits of two non-negative
    * integer columns: bit i of `x` lands at key bit 2i, bit i of `y` at
    * 2i+1. Branch-free parallel-prefix bit spread (the textbook
    * magic-mask form — 4 shift/or/and steps per dimension instead of a
    * 16-iteration fold; codegen CSE evaluates each step once), identical
    * output to the fold definition [[zorderKeyFoldExpr]] (LayoutSpec
    * locks the equivalence).
    *
    * Callers must first bucket both values onto grids of COMPARABLE
    * bit-width (scale `(v - min) * G / (max - min)`, or a range-partition
    * rank at scale — min/max are one metadata-cheap agg): interleaving
    * raw values whose magnitudes differ puts the wide dimension's bits
    * above all of the narrow one's, and the key degenerates to a
    * single-column sort. Clustering needs only coarse rank, not full
    * precision — LayoutSpec drives both dims onto an 8-bit grid. */
  def zorderKeyExpr(x: String, y: String): String = {
    val sx = spread(x, (e, s) => s"shiftleft($e, $s)")
    val sy = spread(y, (e, s) => s"shiftleft($e, $s)")
    s"($sx + 2 * $sy)"
  }

  /** DuckDB twin of [[zorderKeyExpr]] (same spread, `<<` syntax). */
  def zorderKeySql(x: String, y: String): String = {
    val sx = spread(x, (e, s) => s"($e << $s)")
    val sy = spread(y, (e, s) => s"($e << $s)")
    s"($sx + 2 * $sy)"
  }

  /** Definitional fold form — one bit at a time; the semantic spec for
    * [[zorderKeyExpr]], locked equal by LayoutSpec. */
  def zorderKeyFoldExpr(x: String, y: String): String =
    s"""aggregate(sequence(0, ${ZBits - 1}), 0L,
        (acc, i) -> acc + shiftleft(shiftright(CAST($x AS BIGINT), i) & 1, 2 * i)
                        + shiftleft(shiftright(CAST($y AS BIGINT), i) & 1, 2 * i + 1))"""

  /** Coarse Z-bucket granularity: zkey >> 18 ⇒ buckets of 512×512 cells
    * in (x, y) space — file-sized regions at the bench scale. */
  val ZBucketShift = 18

  /** Cluster a frame for writing: range-partition into `nFiles` by the
    * Morton key of two PRE-SCALED grid columns and sort within each
    * partition, so every written file covers a compact z-range — narrow
    * per-file min/max on BOTH dimensions (the LayoutSpec-verified
    * pruning payoff). The zkey is dropped before the write; it exists
    * only to order the layout. */
  def zorderWrite(df: DataFrame, xGrid: String, yGrid: String, nFiles: Int): DataFrame =
    df.withColumn("__zkey", expr(zorderKeyExpr(xGrid, yGrid)))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")

  /** Per-Z-bucket clustering stats over `orders`, keyed on
    * (customer, order epoch-day): the manifest a zkey-ordered writer
    * produces, and the evidence that each bucket is narrow in BOTH
    * dimensions. Integer-only — portable. */
  def zorderStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(o_custkey & 65535 AS BIGINT)").as("x"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') & 65535 AS BIGINT)").as("y"))
      .withColumn("zkey", expr(zorderKeyExpr("x", "y")))
      .groupBy(expr(s"CAST(shiftright(zkey, $ZBucketShift) AS BIGINT)").as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_cust"), max(col("x")).as("max_cust"),
        min(col("y")).as("min_day"), max(col("y")).as("max_day"))

  val zorderStatsSql: String =
    s"""WITH z AS (SELECT o_orderkey,
          (o_custkey & 65535) AS x,
          (date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) & 65535) AS y
        FROM orders),
      k AS (SELECT o_orderkey, x, y, ${zorderKeySql("x", "y")} AS zkey FROM z)
      SELECT CAST(zkey >> $ZBucketShift AS BIGINT) AS zbucket, count(*) AS n,
        CAST(min(x) AS BIGINT) AS min_cust, CAST(max(x) AS BIGINT) AS max_cust,
        CAST(min(y) AS BIGINT) AS min_day, CAST(max(y) AS BIGINT) AS max_day
      FROM k GROUP BY 1"""

  /** Shard counts compared by q288's scale-out simulation. */
  val ShardsBefore = 16
  val ShardsAfter = 17

  /** Shard-rebalance planning card (q288): how many documents MOVE when
    * the shard count grows [[ShardsBefore]] → [[ShardsAfter]], under the
    * two standard placement schemes — modulo hashing (everything
    * reshuffles: moved share ≈ (n−1)/n) and rendezvous/HRW hashing
    * (Thaler & Ravishankar 1998: only the new node's fair share ≈ 1/n
    * moves). THE reason stateful services (and shard-keyed storage
    * layouts) never place by modulo; this card puts the exact number on
    * this corpus. Hashes are the engine's md5-hex coin (the q101
    * discipline), so placement is engine-portable and a service replica
    * can recompute it standalone.
    *
    * Scale shape: stateless per-row projection — per doc, the mod
    * placement is arithmetic and each rendezvous placement is an
    * `array_max` over (hash, node) structs of [[ShardsAfter]] md5s —
    * then ONE 2-row rollup. No exchange beyond the final card. */
  def shardRebalance(docs: DataFrame): DataFrame = {
    def hrwPick(n: Int): String = {
      val structs = (0 until n).map(node =>
        s"struct(md5(concat('hrw:$node:', CAST(doc_id AS STRING))) AS h, $node AS node)")
        .mkString("array(", ", ", ")")
      s"array_max($structs).node"
    }
    val scored = docs.select(col("doc_id"),
      expr(s"doc_id % $ShardsBefore").as("mod_before"),
      expr(s"doc_id % $ShardsAfter").as("mod_after"),
      expr(hrwPick(ShardsBefore)).as("hrw_before"),
      expr(hrwPick(ShardsAfter)).as("hrw_after"))
    val card = scored.agg(
      count(lit(1)).as("n_docs"),
      expr("CAST(count_if(mod_before != mod_after) AS BIGINT)").as("moved_mod"),
      expr("CAST(count_if(hrw_before != hrw_after) AS BIGINT)").as("moved_hrw"))
    card.select(lit("modulo").as("scheme"), col("n_docs"),
        col("moved_mod").as("n_moved"))
      .unionByName(card.select(lit("rendezvous").as("scheme"), col("n_docs"),
        col("moved_hrw").as("n_moved")))
      .withColumn("moved_micro", expr(
        "CAST((CAST(n_moved AS DECIMAL(38,0)) * 1000000) div n_docs AS BIGINT)"))
      .select("scheme", "n_docs", "n_moved", "moved_micro")
  }

  val shardRebalanceSql: String = {
    def hrwPick(n: Int): String = {
      val structs = (0 until n).map(node =>
        s"{'h': md5('hrw:$node:' || CAST(doc_id AS VARCHAR)), 'node': $node}")
        .mkString("[", ", ", "]")
      s"list_max($structs)['node']"
    }
    s"""WITH sc AS (SELECT doc_id,
          doc_id % $ShardsBefore AS mod_before, doc_id % $ShardsAfter AS mod_after,
          ${hrwPick(ShardsBefore)} AS hrw_before, ${hrwPick(ShardsAfter)} AS hrw_after
        FROM documents),
      card AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
          CAST(count(*) FILTER (mod_before != mod_after) AS BIGINT) AS moved_mod,
          CAST(count(*) FILTER (hrw_before != hrw_after) AS BIGINT) AS moved_hrw
        FROM sc)
      SELECT scheme, n_docs, n_moved,
        CAST((CAST(n_moved AS HUGEINT) * 1000000) // n_docs AS BIGINT) AS moved_micro
      FROM (SELECT 'modulo' AS scheme, n_docs, moved_mod AS n_moved FROM card
            UNION ALL
            SELECT 'rendezvous', n_docs, moved_hrw FROM card)"""
  }

  val queries: Seq[QueryDef] = Seq(
    QueryDef("q288_shard_rebalance",
      (s, d) => shardRebalance(t(s, d, "documents")),
      Some(shardRebalanceSql)),
    QueryDef("q75_zorder_stats",
      (s, d) => zorderStats(s, d),
      Some(zorderStatsSql)))
}
