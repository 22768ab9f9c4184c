package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions
import graft.ops.Dedup
import graft.queries.QueryDef.t

/** Locks the custom codegen'd expressions to their composed-built-ins
  * semantic specs. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  test("quantized_dot == aggregate(zip_with(...)) on embeddings") {
    GraftFunctions.register(spark)
    val q = t(spark, dir, "embeddings")
      .select(col("vec_id"), expr(graft.ops.Similarity.quantExpr).as("qv"))
      .withColumn("fast", expr("quantized_dot(qv, qv)"))
      .withColumn("slow", expr("aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, (a, x) -> a + x)"))
    assert(q.filter(col("fast") =!= col("slow")).count() == 0)
    assert(q.count() > 0)
  }

  test("word_shingles == array_distinct(transform(...)) lambda formulation") {
    GraftFunctions.register(spark)
    val docs = t(spark, dir, "documents")
    val fast = Dedup.shingled(docs).orderBy("doc_id").collect().map(_.getSeq[String](1))
    val slow = Dedup.shingledViaLambdas(docs).orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(fast.length == slow.length)
    fast.zip(slow).foreach { case (f, s) => assert(f == s) }
  }

  test("word_gram_md5 == transform(sequence, md5(concat_ws(slice))) lambda twin") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{col, expr, split}
    val g = graft.ops.Chunking.QueryGramWords
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val fast = toks.select(col("doc_id"), expr(s"word_gram_md5(w, $g)").as("fps"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    val slow = toks.select(col("doc_id"), expr(
        s"""CASE WHEN size(w) >= $g THEN
              transform(sequence(1, size(w) - ${g - 1}), i -> md5(concat_ws(' ', slice(w, i, $g))))
            ELSE CAST(array() AS ARRAY<STRING>) END""").as("fps"))
      .orderBy("doc_id").collect().map(_.getSeq[String](1))
    assert(fast.length == slow.length && fast.nonEmpty)
    fast.zip(slow).foreach { case (f, s) => assert(f == s) }
  }

  test("any_word_gram_in_bloom == exists(transform(sequence, " +
      "xxhash64(concat_ws(slice)))) might_contain twin") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.{col, expr}
    val w = graft.ops.Conversations.BenchSpanWords
    val bloom = graft.streaming.SftStream.benchBloomBytes(spark)
    val b64 = java.util.Base64.getEncoder.encodeToString(bloom)
    // real corpus + adversarial fixtures: doubled spaces (empty tokens),
    // leading/trailing spaces, short texts, a planted benchmark passage
    val planted = graft.ops.Conversations.BenchPassages.head
    val fixtures = spark.createDataFrame(Seq(
      (-1L, s"prefix words $planted suffix words"),
      (-2L, "too short"),
      (-3L, "a  doubled  space text that is long enough for a gram here ok"),
      (-4L, s" leading space $planted"),
      (-5L, ""))).toDF("doc_id", "text")
    val docs = t(spark, dir, "documents").select("doc_id", "text")
      .unionByName(fixtures)
    val both = docs
      .withColumn("fast", expr(s"any_word_gram_in_bloom(text, $w, '$b64')"))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("slow", expr(
        s"""CASE WHEN size(toks) >= $w THEN
              exists(transform(sequence(1, size(toks) - ${w - 1}),
                  i -> xxhash64(concat_ws(' ', slice(toks, i, $w)))),
                h -> might_contain(unbase64('$b64'), h))
            ELSE false END"""))
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
    assert(both.filter(col("fast")).count() >= 2, "planted passages must hit")
    assert(both.count() > 5)
  }

  test("quantized_dot null semantics match the zip_with spec") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)),    // 11
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)),  // null elem
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](3L, 4L)) // length mismatch
    ).toDF("a", "b")
      .withColumn("fast", expr("quantized_dot(a, b)"))
      .withColumn("slow", expr("aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"))
    val rows = df.collect()
    assert(rows.forall(r => r.isNullAt(2) == r.isNullAt(3)))
    assert(rows(0).getLong(2) == 11L && rows(1).isNullAt(2) && rows(2).isNullAt(2))
  }

  test("rolling_hash == aggregate/substr lambda formulation") {
    GraftFunctions.register(spark)
    val docs = t(spark, dir, "documents")
    val fast = graft.ops.TextStats.fingerprintRolling(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = graft.ops.TextStats.fingerprintRollingViaLambdas(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow && fast.nonEmpty)
    // edge rows: empty string hashes to 0; codepoint (not byte) iteration
    import spark.implicits._
    val edge = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "é€"))
      .toDF("doc_id", "text")
    val f = graft.ops.TextStats.fingerprintRolling(edge)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = graft.ops.TextStats.fingerprintRollingViaLambdas(edge)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f == s)
    assert(f(1L) == 0L && f(2L) == 97L && f(3L) == 97L * 31 + 98)
  }

  test("minhash_sig == transform/array_min lambda formulation") {
    GraftFunctions.register(spark)
    val sh = Dedup.shingled(t(spark, dir, "documents").limit(50))
    val cmp = sh
      .withColumn("fast", expr(s"minhash_sig(grams, ${Dedup.NumHashes})"))
      .withColumn("slow", expr(Dedup.minhashSigExpr))
    assert(cmp.filter(not(col("fast") === col("slow"))).count() == 0)
  }

  test("minhash_bands == explicit sig + band-key lambda formulation") {
    GraftFunctions.register(spark)
    val sh = Dedup.shingled(t(spark, dir, "documents").limit(50))
    val cmp = sh
      .withColumn("fast", expr(s"minhash_bands(grams, ${Dedup.NumHashes}, ${Dedup.Rows})"))
      .withColumn("sig", expr(Dedup.minhashSigExpr))
      .withColumn("slow", expr(Dedup.bandKeysExpr))
    assert(cmp.filter(not(col("fast") === col("slow"))).count() == 0)
  }

  test("winnow_select == transform/aggregate lambda formulation (as a SET)") {
    GraftFunctions.register(spark)
    val base = t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= Dedup.WinK)
    val fast = base.withColumn("v",
        expr(s"array_sort(winnow_select(toks, ${Dedup.WinK}, ${Dedup.WinW}, ${Dedup.WinPack}L))"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](2))
    val slow = base.withColumn("v", expr(s"array_sort(${Dedup.winnowSelLambdaExpr})"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](2))
    assert(fast.length == slow.length && fast.length > 0)
    fast.zip(slow).foreach { case (f, s) => assert(f == s) }
  }

  test("sorted_intersect_count == size(array_intersect) on sorted distinct arrays") {
    GraftFunctions.register(spark)
    val sh = Dedup.shingled(t(spark, dir, "documents").limit(80))
      .withColumn("sorted", sort_array(col("grams")))
    val pairs = sh.as("a").crossJoin(sh.as("b")).limit(2000)
      .select(col("a.sorted").as("x"), col("b.sorted").as("y"))
      .withColumn("fast", expr("sorted_intersect_count(x, y)"))
      .withColumn("slow", size(array_intersect(col("x"), col("y"))).cast("long"))
    assert(pairs.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("simhash32 == 32-term lambda formulation") {
    val docs = t(spark, dir, "documents").limit(50)
    val fast = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val slow = Dedup.simhashViaLambdas(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fast == slow)
  }

  test("lsh_keys == composed per-plane quantized_dot formulation") {
    GraftFunctions.register(spark)
    val S = graft.ops.Similarity
    val q = t(spark, dir, "embeddings")
      .select(col("vec_id"), expr(S.quantExpr).as("qv"))
      .withColumn("fast", expr(s"lsh_keys(qv, ${S.LshSeed}, ${S.LshTables}, ${S.LshBits}, ${S.Dim})"))
      .withColumn("slow", expr(S.lshKeysExpr))
    assert(q.filter(not(col("fast") <=> col("slow"))).count() == 0)
    assert(q.count() > 0)
  }

  test("lsh_keys malformed-vector parity: wrong length, null elements, NULL vector") {
    GraftFunctions.register(spark)
    val S = graft.ops.Similarity
    import spark.implicits._
    // wrong-length vector, a vector with a null slot, and a fully-NULL
    // vector: composed form yields all-zero-bit keys (NULL dot -> CASE
    // else-branch); fused must match — in particular the NULL vector must
    // BUCKET (all-zero keys), not null-propagate and vanish from explode
    val q = Seq(
      (1L, "array(1L, 2L, 3L)"),
      (2L, s"transform(sequence(1, ${S.Dim}), i -> CASE WHEN i = 7 THEN CAST(NULL AS BIGINT) ELSE CAST(i AS BIGINT) END)"),
      (3L, "CAST(NULL AS ARRAY<BIGINT>)")
    ).map { case (id, arr) =>
      spark.range(1).select(lit(id).as("vec_id"), expr(arr).cast("array<bigint>").as("qv"))
    }.reduce(_ unionByName _)
      .withColumn("fast", expr(s"lsh_keys(qv, ${S.LshSeed}, ${S.LshTables}, ${S.LshBits}, ${S.Dim})"))
      .withColumn("slow", expr(S.lshKeysExpr))
    assert(q.filter(not(col("fast") <=> col("slow"))).count() == 0)
    val ks = q.select("fast").collect().flatMap(_.getSeq[String](0))
    assert(ks.forall(_.endsWith(":" + "0" * S.LshBits)))
  }

  test("pq_adc_sum == aggregate-lambda lookup formulation; bounds -> NULL") {
    GraftFunctions.register(spark)
    // flat = 2 spaces x 3 entries; codes pick one entry per space
    val df = spark.range(1).selectExpr(
      "CAST(array(10, 20, 30, 40, 50, 60) AS ARRAY<BIGINT>) AS flat",
      "CAST(array(2, 0) AS ARRAY<BIGINT>) AS codes")
      .withColumn("fast", expr("pq_adc_sum(flat, codes)"))
      .withColumn("slow", expr(
        """aggregate(sequence(0, size(codes) - 1), 0L,
           (acc, s) -> acc + element_at(flat,
             CAST(s * (size(flat) DIV size(codes)) + element_at(codes, s + 1) + 1 AS INT)))"""))
    val r = df.select("fast", "slow").collect()(0)
    assert(r.getLong(0) == 30L + 40L && r.getLong(0) == r.getLong(1))
    // out-of-range code and ragged table -> NULL, never a wrong lookup
    val bad = spark.range(1).selectExpr(
      "pq_adc_sum(CAST(array(1, 2) AS ARRAY<BIGINT>), CAST(array(5) AS ARRAY<BIGINT>)) AS oob",
      "pq_adc_sum(CAST(array(1, 2, 3) AS ARRAY<BIGINT>), CAST(array(0, 1) AS ARRAY<BIGINT>)) AS ragged")
      .collect()(0)
    assert(bad.isNullAt(0) && bad.isNullAt(1))
  }
}
