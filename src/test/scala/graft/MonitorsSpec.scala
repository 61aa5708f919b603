package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Monitors

/** Streaming CUSUM monitor: the fold matches the recursive reference
  * across micro-batch boundaries, a level shift alarms, and the
  * identity agrees with the batch `events_cusum` form on the same
  * deviations. */
class MonitorsSpec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int) = java.sql.Date.valueOf(f"2024-02-${i}%02d")

  test("cusum fold equals the recursive max(0,.) reference across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Date, Long)]
    val out = Monitors.cusumMonitor(
      input.toDF().toDF("key", "day", "n"), targetX100 = 1000L,
      thresholdX100 = 2000L)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cusum_mon").start()

    // two keys interleaved, split across batches mid-series
    val a = Seq(9L, 12L, 11L, 8L, 30L, 31L, 29L) // level shift at day 5
    val b = Seq(10L, 10L, 10L, 10L, 10L, 10L, 10L) // dead on target
    input.addData((a.take(4).zipWithIndex.map { case (n, i) => ("a", day(i + 1), n) } ++
      b.take(4).zipWithIndex.map { case (n, i) => ("b", day(i + 1), n) }): _*)
    q.processAllAvailable()
    input.addData((a.drop(4).zipWithIndex.map { case (n, i) => ("a", day(i + 5), n) } ++
      b.drop(4).zipWithIndex.map { case (n, i) => ("b", day(i + 5), n) }): _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("cusum_mon")
      .as[graft.streaming.CusumPoint].collect()
      .groupBy(_.key).view.mapValues(_.sortBy(_.day.toLocalDate.toEpochDay)).toMap

    def reference(ns: Seq[Long]): Seq[(Long, Long)] = {
      var cp = 0L; var cn = 0L
      ns.map { n =>
        val dev = 100L * n - 1000L
        cp = math.max(0L, cp + dev)
        cn = math.max(0L, cn - dev)
        (cp, cn)
      }
    }
    for ((key, ns) <- Seq("a" -> a, "b" -> b)) {
      val got = rows(key)
      assert(got.length == ns.length)
      got.zip(reference(ns)).foreach { case (p, (cp, cn)) =>
        assert(p.cusum_pos == cp, s"$key day ${p.day} pos")
        assert(p.cusum_neg == cn, s"$key day ${p.day} neg")
      }
    }
    // the shifted key alarms after the level shift, the on-target
    // key never does
    assert(rows("a").exists(_.alarm_hi))
    assert(rows("b").forall(p => !p.alarm_hi && !p.alarm_lo))
    // on-target key: every statistic is exactly zero
    assert(rows("b").forall(p => p.cusum_pos == 0L && p.cusum_neg == 0L))
  }

  test("misra-gries heavy hitters: fold parity, bounded state, exact certificate") {
    implicit val sqlCtx = spark.sqlContext
    val k = 3
    val input = MemoryStream[(String, String)]
    val out = Monitors.heavyHittersByGroup(
      input.toDF().toDF("group", "item"), k)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("mg_hh").start()

    // a heavy item, a medium one, and a spray of singletons, split
    // across two batches; plus a second group to prove state isolation
    val b1 = Seq.fill(9)("hot") ++ Seq.fill(4)("warm") ++
      Seq("a", "b", "c", "d")
    val b2 = Seq.fill(7)("hot") ++ Seq.fill(3)("warm") ++
      Seq("e", "f", "g")
    input.addData(b1.map("g1" -> _) ++ Seq("g2" -> "solo"): _*)
    q.processAllAvailable()
    input.addData(b2.map("g1" -> _): _*)
    q.processAllAvailable()
    q.stop()

    // the monitor re-emits the summary each batch; the final state is
    // the rows with the max n_processed per group
    val all = spark.table("mg_hh").as[graft.streaming.HeavyHitter].collect()
    val g1 = all.filter(_.group == "g1")
    val last = g1.filter(_.n_processed == g1.map(_.n_processed).max)
    assert(last.length <= k, "state must hold at most k counters")

    // driver-side Misra-Gries reference with the same per-batch
    // sorted arrival order
    var counters = Map.empty[String, Long]; var decr = 0L
    for (batch <- Seq(b1, b2); item <- batch.sorted) {
      counters.get(item) match {
        case Some(c) => counters = counters.updated(item, c + 1)
        case None if counters.size < k => counters += item -> 1L
        case None =>
          decr += 1
          counters = counters.flatMap { case (i, c) =>
            if (c > 1) Some(i -> (c - 1)) else None }
      }
    }
    assert(last.map(h => h.item -> h.est_count).toMap == counters)
    assert(last.forall(_.max_err == decr))

    // exact certificate: 0 <= true - est <= max_err for every
    // surviving item, and every item above n/(k+1) must survive
    val n = (b1 ++ b2).size.toLong
    val exact = (b1 ++ b2).groupBy(identity).view.mapValues(_.size.toLong)
    last.foreach { h =>
      val t = exact(h.item)
      assert(h.est_count <= t && t - h.est_count <= h.max_err,
        s"${h.item}: est ${h.est_count} true $t err ${h.max_err}")
      assert(h.n_processed == n)
    }
    exact.filter(_._2 * (k + 1) > n).keys.foreach { hh =>
      assert(last.exists(_.item == hh),
        s"$hh exceeds n/(k+1) and must be in the summary")
    }
    // group isolation: g2's lone item is untouched by g1's churn
    val g2 = all.filter(_.group == "g2")
    assert(g2.map(h => (h.item, h.est_count, h.n_processed)).toSet ==
      Set(("solo", 1L, 1L)))
  }

  test("cusum state survives a checkpointed query restart") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("cusum-ckpt").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def writeBatch(name: String, rows: Seq[(String, String, Long)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (k, d, n) =>
          s"""{"key":"$k","day":"$d","n":$n}""" }.mkString("\n").getBytes)
    def run(): Unit = {
      val src = spark.readStream
        .schema("key STRING, day DATE, n LONG").json(in)
      val q = Monitors.cusumMonitor(src, targetX100 = 1000L,
          thresholdX100 = 2000L)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/ckpt")
        .format("parquet").option("path", s"$root/out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    val ns = Seq(9L, 12L, 30L, 31L, 29L)
    writeBatch("b1.json", ns.take(2).zipWithIndex.map {
      case (n, i) => ("k", f"2024-03-${i + 1}%02d", n) })
    run()
    writeBatch("b2.json", ns.drop(2).zipWithIndex.map {
      case (n, i) => ("k", f"2024-03-${i + 3}%02d", n) })
    run() // RESTART: state must resume from the checkpoint, not reset
    val got = spark.read.parquet(s"$root/out")
      .as[graft.streaming.CusumPoint].collect()
      .sortBy(_.day.toLocalDate.toEpochDay)
    assert(got.length == ns.length)
    var cp = 0L
    got.zip(ns).foreach { case (p, n) =>
      cp = math.max(0L, cp + (100L * n - 1000L))
      assert(p.cusum_pos == cp,
        s"day ${p.day}: restart must CONTINUE the fold, not restart it")
    }
    // the level shift only alarms because pre-restart state carried:
    // a reset fold over just batch 2 would sit at 2900+3000+2800-3000
    // vs threshold crossing later
    assert(got.exists(_.alarm_hi))
  }

  test("a downward shift trips alarm_lo, not alarm_hi") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Date, Long)]
    val out = Monitors.cusumMonitor(
      input.toDF().toDF("key", "day", "n"), targetX100 = 1000L,
      thresholdX100 = 1500L)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("cusum_down").start()
    input.addData(Seq(10L, 10L, 2L, 1L, 2L).zipWithIndex
      .map { case (n, i) => ("k", day(i + 1), n) }: _*)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("cusum_down").as[graft.streaming.CusumPoint]
      .collect().sortBy(_.day.toLocalDate.toEpochDay)
    assert(rows.last.alarm_lo && !rows.last.alarm_hi)
    assert(rows.forall(!_.alarm_hi))
  }

  test("gk quantile monitor: every estimate's exact rank is within eps_n") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val vals = Tables.events(spark, dir).where(col("value").isNotNull)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val input = MemoryStream[(String, Long)]
    val out = Monitors.gkQuantileMonitor(
      input.toDF().toDF("key", "v"), epsBp = 100)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("gk_mon").start()
    val (b1, b2) = vals.splitAt(vals.length / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val all = spark.table("gk_mon").as[graft.streaming.QuantilePoint].collect()
    val last = all.groupBy(_.key).view.mapValues(_.maxBy(_.n)).toMap
    val exact = vals.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(last.keySet == exact.keySet)
    for ((key, p) <- last) {
      val xs = exact(key)
      assert(p.n == xs.length, s"$key: full count must survive the split")
      assert(p.p50_x100 <= p.p90_x100 && p.p90_x100 <= p.p99_x100)
      assert(p.summary_size < xs.length || xs.length < 8,
        s"$key: the summary must be a sketch, not the data")
      for ((phi, est) <- Seq(5000L -> p.p50_x100, 9000L -> p.p90_x100,
        9900L -> p.p99_x100)) {
        val r = (phi * p.n + 9999L) / 10000L
        // exact rank interval of the estimate under duplicates
        val lo = xs.count(_ < est).toLong + 1
        val hi = xs.count(_ <= est).toLong
        assert(lo <= r + p.eps_n && hi >= r - p.eps_n,
          s"$key phi=$phi: est $est rank [$lo,$hi] target $r eps ${p.eps_n}")
      }
    }
  }

  test("gk quantile state survives a checkpointed query restart") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("gk-ckpt").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def writeBatch(name: String, vs: Seq[Long]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        vs.map(v => s"""{"key":"k","v":$v}""").mkString("\n").getBytes)
    def run(): Unit = {
      val src = spark.readStream.schema("key STRING, v LONG").json(in)
      val q = Monitors.gkQuantileMonitor(src, epsBp = 100)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/ckpt")
        .format("parquet").option("path", s"$root/out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    val rnd = new scala.util.Random(1234)
    val all = (1 to 600).map(_ => rnd.nextInt(100000).toLong)
    writeBatch("b1.json", all.take(300)); run()
    writeBatch("b2.json", all.drop(300)); run() // RESTART
    import spark.implicits._
    val p = spark.read.parquet(s"$root/out")
      .as[graft.streaming.QuantilePoint].collect().maxBy(_.n)
    assert(p.n == 600L, "restart must resume the fold, not recount")
    val xs = all.sorted
    for ((phi, est) <- Seq(5000L -> p.p50_x100, 9000L -> p.p90_x100,
      9900L -> p.p99_x100)) {
      val r = (phi * 600L + 9999L) / 10000L
      val lo = xs.count(_ < est).toLong + 1
      val hi = xs.count(_ <= est).toLong
      assert(lo <= r + p.eps_n && hi >= r - p.eps_n,
        s"phi=$phi: est $est rank [$lo,$hi] target $r eps ${p.eps_n}")
    }
  }

  test("attribution monitor: streamed replay equals the batch query mid-split") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        if (r.isNullAt(4)) None else Some(r.getAs[Double]("value"))))
      .sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
    val input = MemoryStream[(Long, java.sql.Timestamp, Long, String, Option[Double])]
    val out = Monitors.attributionMonitor(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type", "value"))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attr_mon").start()
    // split mid-series: per-user carry MUST cross the batch boundary
    val (b1, b2) = ev.splitAt(ev.length / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val credits = spark.table("attr_mon")
      .as[graft.streaming.AttributionPoint].collect()
    val got = credits.groupBy(_.touch_type).view.mapValues(cs =>
      (cs.length.toLong, cs.map(_.value_x100).sum)).toMap
    val expect = SparkEntry.queries("events_attribution")(spark, dir)
      .collect().map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_x100"))).toMap
    assert(got == expect,
      "streamed per-purchase credits must aggregate to the batch query")
    // every purchase credits exactly once
    assert(credits.length == ev.count(_._4 == "purchase"))
    assert(credits.map(_.event_id).distinct.length == credits.length)
  }

  test("attribution state survives a checkpointed query restart") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("attr-ckpt").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def writeBatch(name: String, rows: Seq[(Long, String, Long, String, Double)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (u, ts, eid, typ, v) =>
          s"""{"user_id":$u,"ts":"$ts","event_id":$eid,""" +
            s""""event_type":"$typ","value":$v}""" }.mkString("\n").getBytes)
    def run(): Unit = {
      val src = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, event_id LONG, " +
          "event_type STRING, value DOUBLE")
        .json(in)
      val q = Monitors.attributionMonitor(src)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/ckpt")
        .format("parquet").option("path", s"$root/out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    // batch 1: user 7 clicks (state), user 8 only views
    writeBatch("b1.json", Seq(
      (7L, "2024-05-01 10:00:00", 1L, "click", 0.0),
      (8L, "2024-05-01 10:05:00", 2L, "view", 0.0)))
    run()
    // RESTART: user 7's purchase must credit the pre-restart click,
    // user 9's purchase has no touch anywhere -> direct
    writeBatch("b2.json", Seq(
      (7L, "2024-05-02 09:00:00", 3L, "purchase", 12.34),
      (9L, "2024-05-02 09:30:00", 4L, "purchase", 5.00)))
    run()
    val got = spark.read.parquet(s"$root/out")
      .as[graft.streaming.AttributionPoint].collect()
      .map(p => p.event_id -> (p.user_id, p.touch_type, p.value_x100)).toMap
    assert(got == Map(
      3L -> ((7L, "click", 1234L)),
      4L -> ((9L, "direct", 500L))),
      "restart must resume the per-user touch state from the checkpoint")
  }

  test("histogram drift matches a driver fold and alarms on a planted shift") {
    implicit val sqlCtx = spark.sqlContext
    // reference: uniform mass over bins 0..3 (v in [0, 8000) cents)
    val ref = Seq.fill(4)(2500L) ++ Seq.fill(12)(0L)
    val input = MemoryStream[(String, Long)]
    val out = Monitors.histogramDriftMonitor(
      input.toDF().toDF("key", "v"), ref, alarmL1Bp = 5000L)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("drift_mon").start()
    // batch 1: on-reference sample — 3 values per reference bin
    val onRef = (0 until 4).flatMap(b => Seq.fill(3)(("k", b * 2000L + 100L)))
    input.addData(onRef: _*)
    q.processAllAvailable()
    // batch 2: the planted shift — all new mass lands in bin 15
    input.addData(Seq.fill(12)(("k", 999999L)): _*)
    q.processAllAvailable()
    q.stop()
    def fold(vs: Seq[Long]): (Long, Long, Long, Long) = {
      val bins = new Array[Long](16)
      vs.foreach(v => bins(math.min(15L, math.max(v, 0L) / 2000L).toInt) += 1)
      val n = bins.sum
      val d = bins.zip(ref).map { case (b, r) => math.abs(10000L * b / n - r) }
      (n, d.sum, d.indexOf(d.max).toLong, d.max)
    }
    val rows = spark.table("drift_mon").as[graft.streaming.DriftPoint]
      .collect().sortBy(_.n)
    assert(rows.length == 2)
    val exp1 = fold(onRef.map(_._2))
    assert((rows(0).n, rows(0).drift_l1_bp, rows(0).worst_bin,
      rows(0).worst_drift_bp) == exp1)
    assert(!rows(0).alarm, s"on-reference batch must not alarm: ${rows(0)}")
    // cumulative: batch 2's reading folds BOTH batches' values
    val exp2 = fold(onRef.map(_._2) ++ Seq.fill(12)(999999L))
    assert((rows(1).n, rows(1).drift_l1_bp, rows(1).worst_bin,
      rows(1).worst_drift_bp) == exp2)
    assert(rows(1).alarm && rows(1).worst_bin == 15L,
      s"half the mass moved to bin 15 — must alarm there: ${rows(1)}")
  }

  test("histogram drift state survives a checkpointed query restart") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("drift-ckpt").toString
    val in = s"$root/in"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val ref = Seq(10000L) ++ Seq.fill(15)(0L) // all mass expected in bin 0
    def writeBatch(name: String, vs: Seq[Long]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/$name"),
        vs.map(v => s"""{"key":"k","v":$v}""").mkString("\n").getBytes)
    def run(): Unit = {
      val src = spark.readStream.schema("key STRING, v LONG").json(in)
      val q = Monitors.histogramDriftMonitor(src, ref, alarmL1Bp = 5000L)
        .writeStream.outputMode(OutputMode.Append())
        .option("checkpointLocation", s"$root/ckpt")
        .format("parquet").option("path", s"$root/out")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    writeBatch("b1.json", Seq.fill(6)(100L)) // 6 on-reference values
    run()
    writeBatch("b2.json", Seq.fill(6)(50000L)) // RESTART: 6 in bin 15
    run()
    val got = spark.read.parquet(s"$root/out")
      .as[graft.streaming.DriftPoint].collect().sortBy(_.n)
    assert(got.map(_.n).toSeq == Seq(6L, 12L),
      "restart must CONTINUE the bin counts, not reset them")
    // post-restart: 6/12 in bin 0 (5000 bp vs 10000 ref) + 6/12 in
    // bin 15 (5000 bp vs 0 ref) -> L1 = 10000, only provable if the
    // pre-restart counts survived
    assert(got(1).drift_l1_bp == 10000L && got(1).alarm)
    assert(!got(0).alarm)
  }
}
