package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{EventOps, Layout, Similarity}

/** Governance-card batch (q286–q288): brute recomputes, conservation,
  * and the rendezvous-beats-modulo guarantee. */
class CardsSpec extends AnyFunSuite {
  lazy val spark = SparkSpec.spark
  val dir = "/root/testdata/sf0.001"

  test("q286 label confusion: assignment equals a driver-side brute argmin") {
    val card = Similarity.labelConfusion(spark, dir).collect()
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("label").cast("int"),
        expr(Similarity.quantExpr).as("qv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray))
    // centroids exactly as the op builds them: truncated per-dim means
    val cents = vecs.groupBy(_._1).view.mapValues { rows =>
      val dim = rows.head._2.length
      Array.tabulate(dim)(i => rows.map(_._2(i)).sum / rows.length)
    }.toMap
    def d2(v: Array[Long], c: Array[Long]): Long =
      v.map(x => x * x).sum + c.map(x => x * x).sum -
        2L * v.zip(c).map { case (a, b) => a * b }.sum
    val brute = vecs.map { case (l, v) =>
      val pred = cents.toSeq.map { case (cl, cv) => (d2(v, cv), cl) }.min._2
      (l.toLong, pred.toLong)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = card.map(r => (r.getAs[Int]("label").toLong,
      r.getAs[Long]("pred_label")) -> r.getAs[Long]("n")).toMap
    assert(got == brute, "confusion counts must equal the brute argmin")
    assert(card.map(_.getAs[Long]("n")).sum == vecs.length.toLong)
  }

  test("q287 experiment readout: arm rollup conserves users; rates bounded") {
    val rows = EventOps.experimentReadout(EventOps.events(spark, dir)).collect()
    assert(rows.map(_.getAs[String]("arm")).sorted.toSeq ==
      Seq("control", "treatment"))
    val users = EventOps.events(spark, dir).select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_buyers") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("cvr_micro") <= 1000000L)
    }
  }

  test("q288 shard rebalance: rendezvous moves a fraction of what modulo moves") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val byScheme = Layout.shardRebalance(docs).collect()
      .map(r => r.getAs[String]("scheme") -> r).toMap
    val (mod, hrw) = (byScheme("modulo"), byScheme("rendezvous"))
    assert(mod.getAs[Long]("n_docs") == hrw.getAs[Long]("n_docs"))
    assert(hrw.getAs[Long]("n_moved") * 4 < mod.getAs[Long]("n_moved"),
      "HRW must move roughly 1/n vs modulo's (n-1)/n")
    // expectation bands: modulo ~16/17 of docs, HRW ~1/17
    val n = mod.getAs[Long]("n_docs").toDouble
    assert(mod.getAs[Long]("n_moved") > 0.8 * n)
    assert(hrw.getAs[Long]("n_moved") < 0.2 * n)
  }

  test("q289 session concurrency: brute sweep-line recompute on the busiest day") {
    val rows = EventOps.sessionConcurrency(EventOps.events(spark, dir)).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("peak_concurrency") >= 1L
      && r.getAs[Long]("peak_concurrency") <= r.getAs[Long]("n_sessions")))
    // brute: sessions from q21's rollup, clipped and swept in Scala
    val DayUs = 86400000000L
    val sess = EventOps.sessionize(EventOps.events(spark, dir), 1800L)
      .select((col("session_start") * 1000000L).as("s"),
        (col("session_end") * 1000000L).as("e")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val busiest = rows.maxBy(_.getAs[Long]("peak_concurrency"))
    val day = busiest.getAs[Long]("day")
    val pts = sess.filter { case (s, e) => s / DayUs <= day && day <= e / DayUs }
      .flatMap { case (s, e) =>
        Seq((math.max(s, day * DayUs), 1L), (math.min(e, (day + 1) * DayUs - 1), -1L))
      }.sortBy { case (t, d) => (t, -d) }
    val peak = pts.scanLeft(0L) { case (acc, (_, d)) => acc + d }.max
    assert(busiest.getAs[Long]("peak_concurrency") == peak,
      "op peak must equal the brute sweep")
  }

  test("q290 FD audit: true dependencies hold, known violations bite") {
    val byFd = graft.ops.Profiling.fdAudit(spark, dir).collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    assert(byFd("orders: o_orderkey -> o_custkey").getAs[Boolean]("holds"))
    assert(byFd("nation: n_nationkey -> n_regionkey").getAs[Boolean]("holds"))
    assert(!byFd("lineitem: l_orderkey -> l_partkey").getAs[Boolean]("holds"),
      "an order has many parts — the FD must be reported violated")
    byFd.values.foreach { r =>
      assert(r.getAs[Boolean]("holds") == (r.getAs[Long]("n_violating") == 0L))
      assert(r.getAs[Long]("max_rhs") >= 1L)
    }
  }

  test("q291 Holt forecast: constant series is a fixed point (level == c, trend == 0)") {
    import spark.implicits._
    // 4 events/day for 10 days, one type: the recursion must sit still
    val synth = (0 until 40).map { i =>
      val day = i / 4
      (day.toLong * 86400000000000L + (i % 4) * 1000000000L + 1L,
        "steady", i.toLong)
    }.toDF("ts", "event_type", "event_id")
    val out = EventOps.holtForecast(spark, synth).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("level_micro") == 4000000L)
    assert(out(0).getAs[Long]("trend_micro") == 0L)
    assert(out(0).getAs[Long]("forecast_micro") == 4000000L)
    // real data: the card's internal identity
    EventOps.holtForecast(spark, EventOps.events(spark, dir)).collect().foreach { r =>
      assert(r.getAs[Long]("forecast_micro") ==
        r.getAs[Long]("level_micro") + EventOps.HwHorizon * r.getAs[Long]("trend_micro"))
    }
  }

  test("q292 lateness audit: bounds hold and a brute recompute agrees per type") {
    val ev = EventOps.events(spark, dir)
    val rows = EventOps.latenessAudit(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_late") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("p95_late_us") <= r.getAs[Long]("max_late_us"))
    }
    // brute: per user in event_id order, count late arrivals by type
    val raw = ev.select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts DIV 1000").as("t_us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val lateByType = raw.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(_._2)
      sorted.zipWithIndex.collect { case ((_, _, t, ts), i)
        if i > 0 && sorted.take(i).map(_._4).max > ts => t }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_late") ==
        lateByType.getOrElse(r.getAs[String]("event_type"), 0L))
    }
  }

  test("q292 lateness audit: planted disorder is measured exactly") {
    import spark.implicits._
    // this corpus assigns event_ids in event-time order (the audit
    // honestly reads all-zeros there), so the measuring arithmetic is
    // gated on PLANTED disorder: user 1 arrives in-order, user 2 has
    // one event 5s late and one 2s late behind a running max at t=100s
    val ns = 1000000000L
    val ev = Seq(
      (1L, 1L, "a", 10L * ns), (1L, 2L, "a", 20L * ns), // in order
      (2L, 10L, "a", 100L * ns),
      (2L, 11L, "a", 95L * ns),  // 5s late vs 100
      (2L, 12L, "b", 110L * ns),
      (2L, 13L, "b", 108L * ns)  // 2s late vs 110
    ).toDF("user_id", "event_id", "event_type", "ts")
    val got = EventOps.latenessAudit(ev).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_late"), r.getAs[Long]("max_late_us")))).toMap
    assert(got("a") == ((1L, 5000000L)), "user 2's 95s event is 5s late")
    assert(got("b") == ((1L, 2000000L)), "user 2's 108s event is 2s late")
  }

  test("q293 TWA bars: held-time conservation and a constant-series identity") {
    import spark.implicits._
    val step = 3600000L
    // constant series: whatever the spacing, TWA == the constant
    val const = Seq(("s", 0L, 2.5), ("s", 10L, 2.5), ("s", 7200000L, 2.5))
      .toDF("externalId", "timestampMs", "value")
    graft.tebis.Datapoints.twaBars(const, step).collect().foreach { r =>
      assert(r.getAs[Long]("twa_cents_micro") == 250000000L)
    }
    // hand case: v=100 holds [0, 1800000), v=200 holds to bucket end
    val two = Seq(("s", 0L, 1.0), ("s", 1800000L, 2.0))
      .toDF("externalId", "timestampMs", "value")
    val got = graft.tebis.Datapoints.twaBars(two, step).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("held_ms") == step)
    assert(got(0).getAs[Long]("twa_cents_micro") == 150000000L,
      "half the hour at 100c, half at 200c -> 150c")
    // real data: per-bucket held time never exceeds the bucket
    val bars = graft.tebis.Datapoints.twaBars(
      EventOps.asSeries(EventOps.events(spark, dir)), step)
    assert(bars.filter(col("held_ms") > step).isEmpty)
    assert(bars.filter(col("held_ms") <= 0L).isEmpty)
  }

  test("q295 state sizing: models agree with each operator's documented contract") {
    val ev = EventOps.events(spark, dir)
    val byOp = EventOps.stateSizingCard(ev).collect()
      .map(r => r.getAs[String]("operator") -> r).toMap
    assert(byOp.keySet ==
      Set("dup_monitor", "session_processor", "scd2_monitor", "funnel"))
    val users = ev.select("user_id").distinct().count()
    assert(byOp("session_processor").getAs[Long]("n_keys") == users)
    assert(byOp("funnel").getAs[Long]("n_entries") == users,
      "the funnel's documented ceiling is one record per user")
    // scd2 entries == the batch op's day conservation total (one entry
    // per active (user, day) — the same number IvmSpec locks for q283)
    val activeDays = ev.select(col("user_id"),
      expr("ts DIV 86400000000000")).distinct().count()
    assert(byOp("scd2_monitor").getAs[Long]("n_entries") == activeDays)
    byOp.values.foreach(r => assert(
      r.getAs[Long]("mean_entries_micro") >= 1000000L,
      "every key holds at least one entry"))
  }

  test("plans: q286 per-vector argmin is exchange-free; q288 is join-free") {
    def planOf(name: String): String =
      SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val p288 = planOf("q288_shard_rebalance")
    assert(!p288.contains("Join"), "q288 is a projection + 2-row rollup")
    val p287 = planOf("q287_experiment_readout")
    assert(!p287.contains("Join") && !p287.contains("Exchange rangepartitioning"))
    // q286: the only joins allowed are the labels²-bounded broadcast share join
    val p286 = planOf("q286_label_confusion")
    assert(!p286.contains("SortMergeJoin") && !p286.contains("CartesianProduct"),
      "q286 must never pairwise-join the vector table")
  }
}
