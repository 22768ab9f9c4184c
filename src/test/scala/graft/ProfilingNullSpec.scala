package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Profiling

/** Null-bearing fixtures for the profiling family's NDV convention
  * (ADVICE r9): NULL is never a distinct VALUE (count(DISTINCT)
  * semantics — q281 NDVs, q290 rhs counts) but IS a grouping KEY
  * (GROUP BY semantics — q290 lhs). The shipped corpora are null-free,
  * so these fixtures are what actually exercise the convention. */
class ProfilingNullSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark

  test("q281 columnProfile on a null-bearing frame: n_nulls counted, " +
      "NDV excludes the NULL group") {
    import spark.implicits._
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val li = Seq[(java.lang.Long, java.lang.Long, java.lang.Long, String, String, Timestamp)](
      (1L, 10L, 1L, "A", "F", ts),
      (1L, null, 2L, "A", "O", ts),
      (2L, 10L, null, null, "O", null),
      (null, 20L, 1L, "R", null, ts))
      .toDF("l_orderkey", "l_partkey", "l_linenumber", "l_returnflag",
        "l_linestatus", "l_shipdate")
    val prof = Profiling.columnProfile(li).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(prof.keySet == Profiling.ProfileCols.map(_._1).toSet)
    // per column: (n_nulls, n_distinct) with NULL excluded from NDV
    val expected = Map(
      "l_orderkey" -> (1L, 2L), "l_partkey" -> (1L, 2L),
      "l_linenumber" -> (1L, 2L), "l_returnflag" -> (1L, 2L),
      "l_linestatus" -> (1L, 2L), "l_shipdate" -> (1L, 1L))
    expected.foreach { case (c, (nulls, ndv)) =>
      assert(prof(c).getAs[Long]("n_nulls") == nulls, s"$c nulls")
      assert(prof(c).getAs[Long]("n_distinct") == ndv,
        s"$c NDV must not count the NULL group")
      assert(prof(c).getAs[Long]("n_rows") == 4L)
    }
    // min/max ignore NULLs natively in both engines
    assert(prof("l_orderkey").getAs[String]("min_str") == "1")
    assert(prof("l_orderkey").getAs[String]("max_str") == "2")
  }

  test("q290 fdCard on a null-bearing frame: NULL lhs is a key, NULL rhs " +
      "is not a value, an all-NULL-rhs key scores n_rhs = 0") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (1L, 10L),          // key 1: one distinct rhs — holds
      (2L, 10L), (2L, 20L),          // key 2: two distinct rhs — violates
      (3L, null), (3L, null),        // key 3: all-NULL rhs — n_rhs 0, holds
      (4L, 30L), (4L, null),         // key 4: NULL alongside a value — 1
      (null, 40L), (null, 50L))      // NULL key: a real group — violates
      .toDF("lhs", "rhs")
    val r = Profiling.fdCard(df, "fx", "lhs", "rhs").collect()(0)
    assert(r.getAs[Long]("n_keys") == 5L, "NULL lhs is its own key")
    assert(r.getAs[Long]("n_violating") == 2L, "keys 2 and NULL violate")
    assert(r.getAs[Long]("max_rhs") == 2L)
  }
}
