package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryDef.t

/** Locks the two r13 expression-rewrite optimizer rules to GROUND TRUTH
  * computed on the driver with java.security/String primitives — not to
  * the SQL chains they replace (the shared session installs
  * GraftExtensions, so the chains themselves are rewritten; comparing
  * against them would be circular). Also gates that each rule actually
  * FIRES in the optimized plan of the shapes the suite uses. */
class RewriteRulesSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  /** Driver-side twin of Md5PrefixLong: value of the first n hex chars
    * of md5(s) as an unsigned integer. */
  private def md5Prefix(s: String, n: Int): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    (0 until n).foldLeft(0L) { (acc, i) =>
      val b = d(i >> 1) & 0xff
      (acc << 4) | (if ((i & 1) == 0) b >> 4 else b & 0xf)
    }
  }

  test("md5-prefix chain == driver MessageDigest ground truth (n = 4, 15)") {
    val docs = t(spark, dir, "documents")
      .select(col("text")).filter(col("text").isNotNull).limit(200)
      // adversarial rows: empty string, doubled spaces, unicode, long text
      .unionAll(spark.createDataFrame(Seq(
        Tuple1(""), Tuple1("  "), Tuple1("héllo wörld ✓"),
        Tuple1("a" * 10000))).toDF("text"))
    val got = docs
      .withColumn("h15", expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("h4", expr("CAST(conv(substr(md5(text), 1, 4), 16, 10) AS BIGINT)"))
      .collect()
    assert(got.length > 200)
    got.foreach { r =>
      val s = r.getString(0)
      assert(r.getLong(1) == md5Prefix(s, 15), s"h15 mismatch on ${s.take(40)}")
      assert(r.getLong(2) == md5Prefix(s, 4), s"h4 mismatch on ${s.take(40)}")
    }
  }

  test("md5-prefix chain: NULL propagates; registered function agrees") {
    val row = spark.sql(
      """SELECT CAST(conv(substr(md5(CAST(NULL AS STRING)), 1, 15), 16, 10) AS BIGINT) AS h,
                md5_prefix_long('abc', 15) AS f""").collect().head
    assert(row.isNullAt(0))
    assert(row.getLong(1) == md5Prefix("abc", 15))
  }

  test("Md5PrefixRule fires: the chain plans as md5prefixlong, no conv left") {
    val plan = t(spark, dir, "documents")
      .select(expr("CAST(conv(substr(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("md5prefixlong"), plan)
    assert(!plan.contains("conv("), plan)
  }

  test("space_token_count == driver split ground truth (split keeps empties)") {
    val docs = t(spark, dir, "documents")
      .select(col("text")).filter(col("text").isNotNull).limit(200)
      .unionAll(spark.createDataFrame(Seq(
        Tuple1(""), Tuple1(" "), Tuple1("  a  b "), Tuple1("héllo wörld ✓"))).toDF("text"))
    val got = docs
      .withColumn("n", expr("size(split(text, ' '))"))
      .collect()
    got.foreach { r =>
      val s = r.getString(0)
      assert(r.getInt(1) == s.split(" ", -1).length, s"token count mismatch on '${s.take(40)}'")
    }
  }

  test("TokenCountRule fires: size(split(s, ' ')) plans as spacetokencount") {
    val plan = t(spark, dir, "documents")
      .select(expr("size(split(text, ' '))").as("n"))
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("spacetokencount"), plan)
    // the rule must NOT touch non-space or non-literal splits
    val other = t(spark, dir, "documents")
      .select(expr("size(split(text, ','))").as("n"))
      .queryExecution.optimizedPlan.toString()
    assert(!other.contains("spacetokencount"), other)
  }
}
