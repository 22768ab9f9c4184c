package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, Profiling}

/** Profiling/catalog batch (q280–q283): recompute checks, SCD2
  * interval algebra, and plan gates. */
class ProfilingSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q280 char coverage: contiguous ranks, monotone cumulative share ending at 1") {
    val rows = graft.ops.Corpus.charCoverage(spark, dir)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
    val cums = rows.map(_.getAs[Long]("cum_micro"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, "cumshare monotone")
    assert(cums.last == 1000000L, "full alphabet covers everything")
    assert(rows.forall(_.getAs[String]("ch") != " "), "space is the pre-tokenizer's")
  }

  test("q281 column profile: NDVs match direct recompute; zone-map bounds ordered") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val prof = Profiling.columnProfile(li).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(prof.keySet == Profiling.ProfileCols.map(_._1).toSet)
    val okNdv = li.select(countDistinct("l_orderkey")).collect()(0).getLong(0)
    assert(prof("l_orderkey").getAs[Long]("n_distinct") == okNdv)
    prof.values.foreach { r =>
      assert(r.getAs[Long]("n_nulls") == 0L, "TPC-H columns carry no nulls")
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[String]("min_str") <= r.getAs[String]("max_str")
        || r.getAs[String]("col_name") == "l_orderkey", // numeric strings sort oddly
        s"bounds ordered for ${r.getAs[String]("col_name")}")
    }
  }

  test("q282 key skew: factor >= 1e6 and the top key really is the heaviest") {
    val rows = Profiling.keySkewProfile(spark, dir).collect()
    assert(rows.length == Profiling.SkewKeys.length)
    rows.foreach(r => assert(r.getAs[Long]("skew_micro") >= 1000000L,
      "max per-key rows can never be below the mean"))
    val ev = rows.find(_.getAs[String]("key_name") == "events.user_id").get
    val brute = EventOps.events(spark, dir)
      .groupBy(col("user_id").cast("string").as("k")).count()
      .orderBy(col("count").desc, col("k")).limit(1).collect()(0)
    assert(ev.getAs[String]("top_key") == brute.getString(0))
    assert(ev.getAs[Long]("max_rows") == brute.getLong(1))
  }

  test("q282 typed fast path: row-identical to the generic STRING-keyed card") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ev = EventOps.events(spark, dir)
    Seq((li, "lineitem.l_orderkey", "l_orderkey"),
        (ev, "events.user_id", "user_id")).foreach { case (df, label, key) =>
      val typed = Profiling.keySkewCard(df, label, key, typed = true)
        .collect().map(_.toSeq).toSet
      val generic = Profiling.keySkewCard(df, label, key, typed = false)
        .collect().map(_.toSeq).toSet
      assert(typed == generic, s"$label: typed and generic cards must agree")
    }
  }

  test("q282 typed path tie-break fixture: max-count ties resolve by the " +
      "STRING min in both paths (9 vs 10 diverge numerically)") {
    import spark.implicits._
    val df = Seq(9L, 9L, 10L, 10L, 3L).toDF("k2")
    val typed = Profiling.keySkewCard(df, "fx", "k2", typed = true).collect()(0)
    val generic = Profiling.keySkewCard(df, "fx", "k2", typed = false).collect()(0)
    assert(typed.getAs[String]("top_key") == "10",
      "lexicographic min of the tie set {\"10\", \"9\"} is \"10\"")
    assert(typed.toSeq == generic.toSeq)
  }

  test("q299/q300 sketch twins: estimates land within the KMV guarantee " +
      "of the exact cards; FD verdicts agree on the shipped corpus") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = Profiling.columnProfile(li).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[Long]("n_distinct")).toMap
    Profiling.columnProfileKmv(li).collect().foreach { r =>
      val (c, est) = (r.getAs[String]("col_name"), r.getAs[Long]("n_distinct_est"))
      val ex = exact(c)
      // 4/sqrt(256) = 4 standard errors — generous, deterministic corpus
      assert(math.abs(est - ex) <= math.max(1L, ex / 4),
        s"$c: KMV est $est vs exact $ex")
    }
    val exactFd = Profiling.fdAudit(spark, dir).collect()
      .map(r => r.getAs[String]("fd") -> r.getAs[Boolean]("holds")).toMap
    Profiling.fdAuditKmv(spark, dir).collect().foreach { r =>
      val fd = r.getAs[String]("fd")
      assert(r.getAs[Boolean]("holds_est") == exactFd(fd),
        s"$fd: sketch verdict must match the exact audit on this corpus")
    }
    // HLL fast twins: same card shapes, rsd-scaled tolerance locks
    Profiling.columnProfileHll(li).collect().foreach { r =>
      val (c, est) = (r.getAs[String]("col_name"), r.getAs[Long]("n_distinct_est"))
      val ex = exact(c)
      assert(math.abs(est - ex) <= math.max(1L, ex / 10),
        s"$c: HLL est $est vs exact $ex (rsd ${Profiling.HllRsd})")
    }
    Profiling.fdAuditHll(spark, dir).collect().foreach { r =>
      val fd = r.getAs[String]("fd")
      assert(r.getAs[Boolean]("holds_est") == exactFd(fd),
        s"$fd: HLL verdict must match the exact audit")
    }
  }

  test("r11 gated HLL cards: every engine-side tolerance verdict is TRUE " +
      "on the shipped corpus (the driver-recordable form of the lock above)") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    Profiling.columnProfileHllGated(li).collect().foreach { r =>
      assert(r.getAs[Boolean]("ndv_in_tol"),
        s"${r.getAs[String]("col_name")}: HLL NDV drifted out of 4-sigma")
    }
    val exactFd = Profiling.fdAudit(spark, dir).collect()
      .map(r => r.getAs[String]("fd") -> r.getAs[Boolean]("holds")).toMap
    Profiling.fdAuditHllGated(spark, dir).collect().foreach { r =>
      val fd = r.getAs[String]("fd")
      assert(r.getAs[Boolean]("keys_in_tol"), s"$fd: keys estimate out of band")
      assert(r.getAs[Boolean]("pairs_in_tol"), s"$fd: pairs estimate out of band")
      assert(r.getAs[Boolean]("holds_est") == exactFd(fd),
        s"$fd: gated verdict must match the exact audit")
    }
  }

  test("FD pair fingerprint is collision-free on separator-bearing keys " +
      "(('a|b','c') vs ('a','b|c') — the r10 ADVICE fixture)") {
    import spark.implicits._
    val df = Seq(("a|b", "c"), ("a", "b|c")).toDF("l", "r")
    df.createOrReplaceTempView("fp_fx")
    // the HLL pair input: 2 distinct fingerprints, never 1
    val n = df.select(expr(
      "concat(CAST(length(CAST(l AS STRING)) AS STRING), ':', " +
        "CAST(l AS STRING), '|', CAST(r AS STRING))").as("fp"))
      .distinct().count()
    assert(n == 2, "length prefix must separate the colliding pair")
  }

  test("degenerate FD table (all-NULL lhs): est excess reads 0 / holds, " +
      "never a NULL three-valued verdict (the r10 ADVICE div-zero guard)") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)]((null, 1L), (null, 2L))
      .toDF("l", "r")
    val kmv = graft.functions.KmvSketch.sketch(256)
    val est = df.select(
        expr("CAST(conv(substr(md5(CAST(l AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("hl"))
      .agg(kmv(col("hl")).as("skl"))
      .select(size(col("skl")).cast("long").as("n_keys_est"))
      .withColumn("excess_micro", expr(
        "CASE WHEN n_keys_est = 0 THEN CAST(0 AS BIGINT) ELSE " +
          "CAST((CAST(1 AS DECIMAL(38,0)) * 1000000) div n_keys_est AS BIGINT) END"))
      .collect()(0)
    assert(est.getAs[Long]("n_keys_est") == 0L)
    assert(est.getAs[Long]("excess_micro") == 0L, "guarded division must yield 0")
  }

  test("KMV sketches skip NULL hashes (null-bearing FD fixture, both twins)") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (1L, 10L), (2L, 10L), (2L, 20L), (3L, null), (null, 40L))
      .toDF("l", "r")
    df.createOrReplaceTempView("kmv_null_fx")
    // 3 non-null keys {1,2,3}; pairs exclude null-bearing rows: {1|10, 2|10, 2|20}
    Seq(false, true).foreach { fast =>
      val hl =
        if (fast) "CASE WHEN l IS NULL THEN CAST(NULL AS BIGINT) ELSE CAST(xxhash64(CAST(l AS STRING)) AS BIGINT) & 1152921504606846975 END"
        else "CAST(conv(substr(md5(CAST(l AS STRING)), 1, 15), 16, 10) AS BIGINT)"
      val hp =
        if (fast) "CASE WHEN l IS NULL OR r IS NULL THEN CAST(NULL AS BIGINT) ELSE CAST(xxhash64(concat(CAST(l AS STRING), '|', CAST(r AS STRING))) AS BIGINT) & 1152921504606846975 END"
        else "CAST(conv(substr(md5(concat(CAST(l AS STRING), '|', CAST(r AS STRING))), 1, 15), 16, 10) AS BIGINT)"
      val kmv = graft.functions.KmvSketch.sketch(256)
      val row = df.select(expr(hl).as("hl"), expr(hp).as("hp"))
        .agg(kmv(col("hl")).as("skl"), kmv(col("hp")).as("skp"))
        .select(size(col("skl")), size(col("skp"))).collect()(0)
      assert(row.getInt(0) == 3, s"fast=$fast: 3 distinct non-null keys")
      assert(row.getInt(1) == 3, s"fast=$fast: 3 distinct non-null pairs")
    }
  }

  test("q283 SCD2: day conservation and non-overlapping, maximal islands") {
    val ev = EventOps.events(spark, dir)
    val hist = EventOps.scd2History(ev).collect()
    val dailyDays = ev.select(col("user_id"), expr("ts DIV 86400000000000").as("day"))
      .distinct().count()
    assert(hist.map(_.getAs[Long]("n_days")).sum == dailyDays,
      "every active (user, day) lands in exactly one interval")
    hist.groupBy(_.getAs[Long]("user_id")).foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(_.getAs[Long]("valid_from_day"))
      sorted.foreach(r => assert(
        r.getAs[Long]("valid_from_day") <= r.getAs[Long]("valid_to_day")))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        val (aTo, bFrom) = (a.getAs[Long]("valid_to_day"), b.getAs[Long]("valid_from_day"))
        assert(bFrom > aTo, "intervals must not overlap")
        if (bFrom == aTo + 1)
          assert(a.getAs[Long]("k") != b.getAs[Long]("k"),
            "contiguous equal-valued intervals must have merged")
      }
    }
  }

  test("q282/q290 run standalone: no dependence on another module's session conf") {
    // a fresh session has ISOLATED SQL conf — nanosAsLong is unset, the
    // state a standalone library caller starts from; the ops must set
    // what they need via the owning events accessor (they once died
    // here with PARQUET_TYPE_ILLEGAL on the ns-timestamp events file)
    val s2 = spark.newSession()
    s2.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    assert(s2.conf.get("spark.sql.legacy.parquet.nanosAsLong") != "true")
    assert(Profiling.keySkewProfile(s2, "/root/testdata/sf0.1").count() == 4)
    assert(Profiling.fdAudit(s2, "/root/testdata/sf0.1").count() == 5)
  }

  test("plans: q282 argmax joins broadcast; q283 windows stay user-partitioned") {
    val p282 = planOf("q282_key_skew_profile")
    assert(p282.contains("BroadcastHashJoin") || p282.contains("BroadcastNestedLoopJoin"))
    assert(!p282.contains("SortMergeJoin"), "1-row card side must broadcast")
    val p283 = planOf("q283_scd2_history")
    assert(!p283.contains("Join"), "SCD2 is window algebra, join-free")
    assert(!p283.contains("Exchange rangepartitioning"),
      "windows are user-keyed, never a global sort")
    // q281: the NDV branches avoid the multi-distinct EXPAND (the 276 s
    // 100x scale-killer); the 6-row card assembles by broadcast
    val p281 = planOf("q281_column_profile")
    assert(!p281.contains("Expand"), "NDVs must be per-column rollups, never expand")
    assert(p281.contains("BroadcastHashJoin") && !p281.contains("SortMergeJoin"))
    assert(!p281.contains("Exchange rangepartitioning"))
  }
}
