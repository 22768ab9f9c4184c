package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Layout

/** Z-order layout: key correctness against a reference Morton encoder,
  * and the actual file-skipping payoff — a zkey-sorted parquet layout
  * must prune on BOTH dimensions where a single-column sort prunes on
  * one. This is the property the 100 TB story rests on, asserted against
  * real written files' min/max footers (read back per-file). */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  private def mortonRef(x: Long, y: Long): Long =
    (0 until Layout.ZBits).foldLeft(0L) { (acc, i) =>
      acc + (((x >> i) & 1L) << (2 * i)) + (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zorder key matches the reference Morton encoder on random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.tabulate(200)(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val df = spark.createDataFrame(pts).toDF("x", "y")
      .withColumn("zkey", expr(Layout.zorderKeyExpr("x", "y")))
      .withColumn("zfold", expr(Layout.zorderKeyFoldExpr("x", "y")))
    df.collect().foreach { r =>
      assert(r.getAs[Long]("zkey") == mortonRef(r.getAs[Long]("x"), r.getAs[Long]("y")))
      // magic-mask spread == definitional one-bit-at-a-time fold
      assert(r.getAs[Long]("zfold") == r.getAs[Long]("zkey"))
    }
    // interleave is a bijection on the 16+16-bit grid: distinct points,
    // distinct keys
    assert(df.select("zkey").distinct().count() == pts.distinct.length)
  }

  test("zkey-sorted layout prunes files on BOTH dims; custkey-sorted only on one") {
    val raw = graft.queries.QueryDef.t(spark, dir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(o_custkey & 65535 AS BIGINT)").as("x"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') & 65535 AS BIGINT)").as("y"))
    val nFiles = 16
    // scale both dims onto the same 8-bit grid before interleaving (the
    // contract in zorderKeyExpr's doc): custkey spans ~8 bits here while
    // epoch-day spans ~12 — raw interleave would be a day sort in disguise
    val (xLo, xHi) = (raw.agg(min("x")).head.getLong(0), raw.agg(max("x")).head.getLong(0))
    val (yLo, yHi) = (raw.agg(min("y")).head.getLong(0), raw.agg(max("y")).head.getLong(0))
    val orders = raw
      .withColumn("xs", (col("x") - xLo) * 255 / math.max(xHi - xLo, 1L))
      .withColumn("ys", (col("y") - yLo) * 255 / math.max(yHi - yLo, 1L))

    def writeLayout(sorted: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] = {
      val out = java.nio.file.Files.createTempDirectory("graft-layout").toString
      sorted.write.mode("overwrite").parquet(out)
      // per-file min/max = exactly what parquet footer pruning sees
      spark.read.parquet(out)
        .groupBy(input_file_name())
        .agg(min("x"), max("x"), min("y"), max("y"))
        .collect().toSeq
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    }

    val zFiles = writeLayout(
      Layout.zorderWrite(orders, "xs", "ys", nFiles).drop("xs", "ys"))
    val cFiles = writeLayout(
      orders.drop("xs", "ys").repartitionByRange(nFiles, col("x")).sortWithinPartitions("x"))
    assert(zFiles.size >= 8 && cFiles.size >= 8) // layouts actually split

    def survivors(files: Seq[(Long, Long, Long, Long)],
        xr: Option[(Long, Long)], yr: Option[(Long, Long)]): Int =
      files.count { case (x0, x1, y0, y1) =>
        xr.forall { case (a, b) => x1 >= a && x0 <= b } &&
          yr.forall { case (a, b) => y1 >= a && y0 <= b }
      }

    // probe windows ~1/8 of each dimension's populated range
    val xWin = (xLo, xLo + (xHi - xLo) / 8)
    val yWin = (yLo, yLo + (yHi - yLo) / 8)

    // single-column layout: perfect on its own column, useless on the other
    assert(survivors(cFiles, Some(xWin), None) <= cFiles.size / 2)
    assert(survivors(cFiles, None, Some(yWin)) == cFiles.size,
      "custkey sort cannot prune a date predicate")
    // z-order: strictly better than no-pruning on BOTH single-dim probes
    assert(survivors(zFiles, Some(xWin), None) <= zFiles.size / 2,
      s"zorder must prune x-probes: ${survivors(zFiles, Some(xWin), None)}/${zFiles.size}")
    assert(survivors(zFiles, None, Some(yWin)) <= zFiles.size / 2,
      s"zorder must prune y-probes: ${survivors(zFiles, None, Some(yWin))}/${zFiles.size}")
    // and the combined box probe touches a small corner of the layout
    assert(survivors(zFiles, Some(xWin), Some(yWin)) <= zFiles.size / 4)
  }
}
