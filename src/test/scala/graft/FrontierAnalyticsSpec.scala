package graft

import org.apache.spark.sql.functions._

/** Round-13/14 operators: 2-D skyline (brute-force dominance recheck
  * + two-phase plan shape), lag-k autocorrelation (exact recompute
  * from the collected daily series), attribution (per-user replay),
  * golden-record survivorship (mode election recheck), interval
  * sweep, BFS levels, conjunctive retrieval, snapshot diff,
  * CDC survivorship, equi-depth histogram, and χ² term selection.
  * The DuckDB oracle pins engine parity; these pin the MATH and the
  * PLAN.
  */
class FrontierAnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("part_skyline: survivors are exactly the undominated points") {
    val out = SparkEntry.queries("part_skyline")(spark, dir)
      .collect().map(r => (r.getAs[Double]("price"),
        r.getAs[Long]("size"), r.getAs[Long]("n_parts")))
    // brute-force reference over the collapsed (price, size) points
    val pts = Tables.part(spark, dir)
      .groupBy(col("p_retailprice"), col("p_size")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getAs[Double](0),
        r.getAs[Int](1).toLong, r.getAs[Long](2)))
    def dominated(a: (Double, Long, Long)) = pts.exists { b =>
      b._1 <= a._1 && b._2 >= a._2 && (b._1 < a._1 || b._2 > a._2)
    }
    val expect = pts.filterNot(dominated)
      .groupBy(p => (p._1, p._2)).view
      .mapValues(_.map(_._3).sum).toMap
    assert(out.nonEmpty)
    assert(out.map(p => (p._1, p._2)).toSet == expect.keySet,
      "skyline point set must equal the brute-force undominated set")
    out.foreach { p => assert(p._3 == expect((p._1, p._2))) }
    // frontier is strictly monotone: price asc => size strictly asc
    out.sortBy(_._1).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._2, "frontier must be strictly monotone")
      case _ =>
    }
  }

  test("frontier2d: randomized point sets match brute force, any bucket width") {
    import spark.implicits._
    val rnd = new scala.util.Random(1337)
    for ((bucketDiv, trial) <- Seq(1L, 7L, 100L).zipWithIndex) {
      val pts = (1 to 300).map(_ =>
        (rnd.nextInt(50).toLong, rnd.nextInt(40).toLong))
      val df = pts.toDF("px", "py")
      val got = graft.ops.Skyline.frontier2d(df, col("px"), col("py"),
          c => (c.cast("long") / bucketDiv).cast("long"))
        .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"),
          r.getAs[Long]("n_rows"))).toSet
      val collapsed = pts.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expect = collapsed.keys.filterNot { a =>
        collapsed.keys.exists(b =>
          b._1 <= a._1 && b._2 >= a._2 && (b._1 < a._1 || b._2 > a._2))
      }.map(p => (p._1, p._2, collapsed(p))).toSet
      assert(got == expect, s"trial $trial bucketDiv $bucketDiv")
    }
  }

  test("part_skyline plan: bucket summary broadcasts, no cartesian") {
    val df = SparkEntry.queries("part_skyline")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the per-bucket summary must join as a broadcast build side")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      "skyline must never plan an unkeyed or shuffled join")
  }

  test("events_autocorr: moments recompute exactly from the daily series") {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay ->
        r.getAs[Long]("x")).toMap
    val out = SparkEntry.queries("events_autocorr")(spark, dir).collect()
    assert(out.length == 7)
    out.foreach { r =>
      val k = r.getAs[Long]("k")
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d + k).map(y => (x, y))
      }
      val n = pairs.size.toLong
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      assert(r.getAs[Long]("n_pairs") == n, s"k=$k n")
      val num = n * sxy - sx * sy
      val denX = n * sxx - sx * sx; val denY = n * syy - sy * sy
      assert(r.getAs[Long]("num") == num, s"k=$k num")
      assert(r.getAs[Long]("den_x") == denX && r.getAs[Long]("den_y") == denY)
      val r2 = (BigInt(10000) * BigInt(num) * BigInt(num) /
        (BigInt(denX) * BigInt(denY)).max(BigInt(1))).toLong * num.sign
      assert(r.getAs[Long]("r2_bp") == r2, s"k=$k r2_bp")
      // r² is a correlation: the effect size can never exceed 10000 bp
      assert(math.abs(r.getAs[Long]("r2_bp")) <= 10000L)
    }
  }

  test("events_attribution: per-user replay reproduces every credit") {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v100"))
      .collect()
    val touches = Set("click", "view", "signup")
    val credits = ev.groupBy(_.getAs[Long]("user_id")).toSeq.flatMap {
      case (_, rows) =>
        var lastTouch: Option[String] = None
        rows.sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
            r.getAs[Long]("event_id")))
          .flatMap { r =>
            val t = r.getAs[String]("event_type")
            val credit = if (t == "purchase")
              Some(lastTouch.getOrElse("direct") -> r.getAs[Long]("v100"))
            else None
            if (touches(t)) lastTouch = Some(t)
            credit
          }
    }
    val expect = credits.groupBy(_._1).view
      .mapValues(cs => (cs.size.toLong, cs.map(_._2).sum)).toMap
    val out = SparkEntry.queries("events_attribution")(spark, dir).collect()
      .map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_x100"))).toMap
    assert(out == expect)
    // every purchase is credited exactly once — totals must reconcile
    assert(out.values.map(_._1).sum ==
      ev.count(_.getAs[String]("event_type") == "purchase"))

    // FIRST-touch twin: replay with a sticky first touch
    val firstCredits = ev.groupBy(_.getAs[Long]("user_id")).toSeq.flatMap {
      case (_, rows) =>
        var firstTouch: Option[String] = None
        rows.sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
            r.getAs[Long]("event_id")))
          .flatMap { r =>
            val t = r.getAs[String]("event_type")
            val credit = if (t == "purchase")
              Some(firstTouch.getOrElse("direct") -> r.getAs[Long]("v100"))
            else None
            if (touches(t) && firstTouch.isEmpty) firstTouch = Some(t)
            credit
          }
    }
    val expectFirst = firstCredits.groupBy(_._1).view
      .mapValues(cs => (cs.size.toLong, cs.map(_._2).sum)).toMap
    val outFirst = SparkEntry.queries("events_attribution_first")(spark, dir)
      .collect().map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("revenue_x100"))).toMap
    assert(outFirst == expectFirst)
    // the two models must visibly disagree on this fixture — that
    // divergence is the argument attribution reporting carries
    assert(outFirst != out, "first- and last-touch must differ here")
  }

  test("events_drift_ks: cumulative gaps and the max-gap statistic recompute") {
    val out = SparkEntry.queries("events_drift_ks")(spark, dir)
      .orderBy("bin").collect()
    assert(out.nonEmpty)
    val totA = out.map(_.getAs[Long]("n_a")).sum
    val totB = out.map(_.getAs[Long]("n_b")).sum
    var ca = 0L; var cb = 0L
    val gaps = out.map { r =>
      ca += r.getAs[Long]("n_a"); cb += r.getAs[Long]("n_b")
      val sa = 10000L * ca / math.max(totA, 1L)
      val sb = 10000L * cb / math.max(totB, 1L)
      assert(r.getAs[Long]("cum_share_a_bp") == sa)
      assert(r.getAs[Long]("cum_share_b_bp") == sb)
      assert(r.getAs[Long]("gap_bp") == sa - sb)
      sa - sb
    }
    val ks = gaps.map(math.abs).max
    assert(out.forall(_.getAs[Long]("ks_bp") == ks))
    // both halves fully accumulate: the last cumulative share is 100%
    assert(out.last.getAs[Long]("cum_share_a_bp") == 10000L)
    assert(out.last.getAs[Long]("cum_share_b_bp") == 10000L)
  }

  test("customer_gini: the statistic recomputes from the sorted revenue vector") {
    val row = SparkEntry.queries("customer_gini")(spark, dir).collect().head
    val rev = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("x"))
      .collect().map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("x")).toMap
    val xs = Tables.customer(spark, dir).select(col("c_custkey")).collect()
      .map(r => r.getLong(0))
      .map(k => (rev.getOrElse(k, 0L), k)).sorted.map(_._1)
    val n = xs.length.toLong
    val sx = xs.sum
    val ix = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = (BigInt(10000) * (2 * ix - BigInt(n + 1) * sx) /
      (BigInt(n) * sx).max(BigInt(1))).toLong
    assert(row.getAs[Long]("n_customers") == n)
    assert(row.getAs[Long]("total_x100") == sx)
    assert(row.getAs[Long]("gini_bp") == gini)
    // a revenue distribution over customers is concentrated but not
    // degenerate: G strictly inside (0, 10000)
    assert(gini > 0L && gini < 10000L)
  }

  test("events_twap: duration-weighted means recompute from the raw series") {
    val out = SparkEntry.queries("events_twap")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val ev = Tables.events(spark, dir)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("ts"), col("event_id"),
        greatest((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(0L)).as("v"))
      .collect()
    val byType = ev.groupBy(_.getAs[String]("event_type"))
    assert(out.keySet == byType.keySet)
    byType.foreach { case (t, rows) =>
      val sorted = rows.sortBy(r => (r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[Long]("event_id")))
      val secs = sorted.map(r =>
        math.floorDiv(r.getAs[java.sql.Timestamp]("ts").getTime, 1000L))
      val vs = sorted.map(_.getAs[Long]("v"))
      val weighted = secs.zip(secs.drop(1)).zip(vs)
        .map { case ((t0, t1), v) => (BigInt(v) * (t1 - t0), t1 - t0) }
      val vw = weighted.map(_._1).sum
      val ts = weighted.map(_._2).sum
      val r = out(t)
      assert(r.getAs[Long]("n_readings") == sorted.length)
      assert(r.getAs[Long]("n_open") == 1L, "exactly the last reading is open")
      assert(r.getAs[Long]("total_sec") == ts)
      assert(r.getAs[Long]("twap_x100") ==
        (vw / BigInt(ts).max(BigInt(1))).toLong)
      assert(r.getAs[Long]("naive_mean_x100") == vs.sum / sorted.length)
    }
  }

  test("golden record: attribute elections match a driver-side recount") {
    val out = SparkEntry.queries("corpus_golden_record")(spark, dir).collect()
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect()
    // cluster labels from the same pair graph the query rides
    val comp = SparkEntry.queries("dedup_clusters")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep_doc_id")).toMap
    val byCluster = docs.groupBy(r =>
      comp.getOrElse(r.getAs[Long]("doc_id"), r.getAs[Long]("doc_id")))
    assert(out.length == byCluster.size)
    def mode(vs: Seq[String]): String =
      vs.groupBy(identity).toSeq
        .sortBy { case (v, g) => (-g.size, v) }.head._1
    out.foreach { r =>
      val members = byCluster(r.getAs[Long]("cluster"))
      assert(r.getAs[Long]("n_members") == members.length)
      assert(r.getAs[Long]("rep_doc_id") ==
        members.map(_.getAs[Long]("doc_id")).min)
      assert(r.getAs[Long]("best_n_chars") ==
        members.map(_.getAs[Long]("n_chars")).max)
      assert(r.getAs[String]("canon_lang") ==
        mode(members.map(_.getAs[String]("lang")).toSeq))
      assert(r.getAs[String]("canon_source") ==
        mode(members.map(_.getAs[String]("source")).toSeq))
    }
    // survivorship covers the whole corpus: member counts sum to |docs|
    assert(out.map(_.getAs[Long]("n_members")).sum == docs.length)
  }

  private def micros(t: java.sql.Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L) % 1000000L

  test("cdc_golden_record: elections recompute per entity; mode and recency disagree") {
    val rows = graft.cdc.Routing.validateSplit(
        graft.cdc.Fixtures.employeeCdcLog(spark, dir)).valid
      .where(col("action") =!= "delete")
      .select(col("emp_id"), col("event_id"), col("last_updated_at"),
        col("emp_dob"), col("emp_salary")).collect()
    val expect = rows.groupBy(_.getAs[Long]("emp_id")).map { case (id, vs) =>
      val dobMode = vs.groupBy(_.getAs[String]("emp_dob")).toSeq
        .sortBy { case (d, g) => (-g.length, d) }.head._1
      val latest = vs.maxBy(r =>
        (micros(r.getAs[java.sql.Timestamp]("last_updated_at")),
          r.getAs[Long]("event_id")))
      id -> (vs.length.toLong, dobMode, latest.getAs[String]("emp_dob"),
        vs.map(_.getAs[Long]("emp_salary")).max,
        latest.getAs[Long]("emp_salary"))
    }
    val got = SparkEntry.queries("cdc_golden_record")(spark, dir).collect()
      .map { r =>
        assert(r.getAs[Boolean]("elections_agree") ==
          (r.getAs[String]("dob_mode") == r.getAs[String]("dob_recency")))
        r.getAs[Long]("emp_id") -> (r.getAs[Long]("n_versions"),
          r.getAs[String]("dob_mode"), r.getAs[String]("dob_recency"),
          r.getAs[Long]("salary_max"), r.getAs[Long]("salary_latest"))
      }.toMap
    assert(got == expect)
    // the two survivorship rules genuinely split on this history —
    // both elections occurring AND disagreeing is the measured result
    assert(got.values.exists(v => v._2 != v._3), "some entity must disagree")
    assert(got.values.exists(v => v._2 == v._3), "some entity must agree")
  }

  test("events_concurrency: brute-force sweep over replayed sessions agrees") {
    val gap = 1800L * 1000000L
    val dayUs = 86400L * 1000000L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id")).collect()
      .map(r => (r.getAs[Long]("user_id"), micros(r.getAs[java.sql.Timestamp]("ts")),
        r.getAs[Long]("event_id")))
    // replay sessionization: 30-min-gap islands per user
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(e => (e._2, e._3)).map(_._2)
      val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
      var start = ts.head; var prev = ts.head
      ts.tail.foreach { t =>
        if (t - prev > gap) { out += ((start, prev)); start = t }
        prev = t
      }
      out += ((start, prev))
      out
    }.toSeq
    // midnight split + per-day inclusive sweep (+1 before -1 on ties)
    val segs = sessions.flatMap { case (t0, t1) =>
      (math.floorDiv(t0, dayUs) to math.floorDiv(t1, dayUs)).map { d =>
        (d, math.max(t0, d * dayUs), math.min(t1, (d + 1) * dayUs))
      }
    }
    val expect = segs.groupBy(_._1).map { case (d, ss) =>
      val bounds = ss.flatMap(s => Seq((s._2, 1L), (s._3, -1L)))
        .sortBy(b => (b._1, -b._2))
      var run = 0L; var mx = 0L
      bounds.foreach { b => run += b._2; mx = math.max(mx, run) }
      java.time.LocalDate.ofEpochDay(d).toString -> (mx, ss.size.toLong)
    }
    val got = SparkEntry.queries("events_concurrency")(spark, dir)
      .selectExpr("CAST(day AS STRING) AS day", "max_concurrent",
        "n_active_sessions")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("max_concurrent"), r.getAs[Long]("n_active_sessions"))).toMap
    assert(got == expect)
    // the fixture actually overlaps — a sweep that never exceeds 1
    // would also pass a vacuous equality
    assert(got.values.map(_._1).max > 1L)
  }

  test("interval sweep: one-hot-day skew fixture matches brute force, ties inclusive") {
    import spark.implicits._
    val dayUs = java.time.LocalDate.parse("2024-03-01").toEpochDay * 86400L * 1000000L
    val rnd = new scala.util.Random(4242)
    // coarse 5-min grid forces boundary ties, incl. end-meets-start;
    // a few intervals close exactly at next midnight (bucket 24)
    val ivs = (1 to 300).map { i =>
      val a = rnd.nextInt(288).toLong * 300000000L
      val b = a + (rnd.nextInt(24) + 1).toLong * 300000000L
      (a, math.min(b, 86400000000L))
    } ++ Seq((86100000000L, 86400000000L), (86100000000L, 86400000000L))
    val bounds = ivs.flatMap { case (a, b) =>
      Seq(("2024-03-01", dayUs + a, 1L), ("2024-03-01", dayUs + b, -1L))
    }.toDF("d", "us", "delta")
      .select(col("d").cast("date").as("day"),
        timestamp_micros(col("us")).as("t"), col("delta"))
    val out = graft.ops.Intervals.maxConcurrentPerDay(bounds).collect()
    assert(out.length == 1)
    val sorted = ivs.flatMap(iv => Seq((iv._1, 1L), (iv._2, -1L)))
      .sortBy(b => (b._1, -b._2))
    var run = 0L; var mx = 0L
    sorted.foreach { b => run += b._2; mx = math.max(mx, run) }
    assert(out.head.getAs[Long]("max_concurrent") == mx)
    assert(out.head.getAs[Long]("n_bounds") == 2L * ivs.size)
  }

  test("interval sweep: randomized multi-day bounds match per-day brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(2468)
    val day0 = java.time.LocalDate.parse("2024-06-01")
    val dayUs = 86400L * 1000000L
    // segments pre-split per day (the operator's input contract),
    // coarse grid for ties, several days with very uneven load
    val segs = (1 to 400).map { _ =>
      val d = rnd.nextInt(5) // day skew: ~half land on day 0
      val dd = if (d >= 3) 0 else d
      val a = rnd.nextInt(280).toLong * 300000000L
      val b = math.min(a + (rnd.nextInt(30) + 1).toLong * 300000000L, dayUs)
      (day0.plusDays(dd).toString, a, b)
    }
    val bounds = segs.flatMap { case (day, a, b) =>
      val base = java.time.LocalDate.parse(day).toEpochDay * dayUs
      Seq((day, base + a, 1L), (day, base + b, -1L))
    }.toDF("d", "us", "delta")
      .select(col("d").cast("date").as("day"),
        timestamp_micros(col("us")).as("t"), col("delta"))
    val got = graft.ops.Intervals.maxConcurrentPerDay(bounds).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("max_concurrent"), r.getAs[Long]("n_bounds"))).toMap
    val expect = segs.groupBy(_._1).map { case (day, ss) =>
      val bs = ss.flatMap(s => Seq((s._2, 1L), (s._3, -1L))).sortBy(b => (b._1, -b._2))
      var run = 0L; var mx = 0L
      bs.foreach { b => run += b._2; mx = math.max(mx, run) }
      day -> (mx, 2L * ss.size)
    }
    assert(got == expect)
  }

  test("equidepth ntile arithmetic: randomized tie-heavy vectors split like SQL ntile") {
    // the integer reproduction of ntile's uneven-split rule must hold
    // for any n (incl. n % 16 != 0) and under heavy value ties, where
    // only the (v, id) total order keeps bucket boundaries exact
    val rnd = new scala.util.Random(1357)
    for (n <- Seq(16, 17, 100, 1003)) {
      val vs = (0 until n).map(i => (rnd.nextInt(5).toLong, i.toLong)).sorted
      val k = 16; val q = n / k; val r = n % k
      // driver ntile from rank
      def bucket(rank: Int): Int =
        if (rank <= r * (q + 1)) (rank - 1) / (q + 1) + 1
        else r + (rank - 1 - r * (q + 1)) / math.max(q, 1) + 1
      val depths = (1 to n).groupBy(bucket).view.mapValues(_.size).toMap
      assert(depths.values.max - depths.values.min <= 1, s"n=$n depth")
      assert(depths.keys.max == math.min(k, n), s"n=$n buckets")
      // and the first r buckets hold exactly one extra row
      if (q > 0)
        assert((1 to k).count(b => depths(b) == q + 1) == (if (r == 0) 0 else r),
          s"n=$n uneven split")
    }
  }

  test("bfsHops: planted graph levels, isolated seed, randomized vs Scala BFS") {
    import spark.implicits._
    // planted: a path, a reverse edge into a seed, a side pair, and an
    // isolated seed (99) that must surface at dist 0, not vanish
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (20L, 1L), (10L, 11L)).toDF("a", "b")
    val seeds = Seq(1L, 10L, 99L).toDF("v")
    val got = graft.ops.Graph.bfsHops(edges, seeds, maxHops = 3).collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Long]("dist")).toMap
    assert(got == Map(1L -> 0L, 10L -> 0L, 99L -> 0L, 2L -> 1L, 20L -> 1L,
      11L -> 1L, 3L -> 2L, 4L -> 3L))

    def scalaBfs(es: Seq[(Long, Long)], ss: Seq[Long], hops: Int): Map[Long, Long] = {
      val adj = (es ++ es.map(e => (e._2, e._1))).groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      var dist = ss.distinct.map(_ -> 0L).toMap
      var frontier = ss.distinct.toSet
      for (h <- 1 to hops) {
        frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        dist ++= frontier.map(_ -> h.toLong)
      }
      dist
    }
    val rnd = new scala.util.Random(77)
    val res = (1 to 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val rss = (1 to 5).map(_ => rnd.nextInt(80).toLong).distinct
    val rgot = graft.ops.Graph.bfsHops(res.toDF("a", "b"), rss.toDF("v"), 3)
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("dist"))).toMap
    assert(rgot == scalaBfs(res, rss, 3))
  }

  test("temporalReach: planted time-respecting semantics + randomized vs Scala fold") {
    import spark.implicits._
    // planted: chain (5,10) reaches; a decreasing edge (7 after 10)
    // does not; same-time spread counts; a seed's own t0 gates its
    // first hop; and a LONGER path departing earlier beats the direct
    // edge — the case hop-frozen BFS cannot express
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 10L), (3L, 4L, 7L), (2L, 6L, 5L),
      (10L, 11L, 50L), (10L, 12L, 150L),
      (1L, 21L, 1L), (21L, 22L, 2L), (22L, 20L, 3L), (1L, 20L, 9L))
    val seeds = Seq((1L, 0L), (10L, 100L))
    val got = graft.ops.Graph.temporalReach(
        edges.toDF("a", "b", "t"), seeds.toDF("v", "t0"), maxHops = 3)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("arr")).toMap
    assert(got == Map(1L -> 0L, 10L -> 100L, 2L -> 5L, 3L -> 10L,
      6L -> 5L, 12L -> 150L, 21L -> 1L, 22L -> 2L, 20L -> 3L),
      s"got $got")
    assert(!got.contains(4L), "edge firing before arrival must not spread")
    assert(!got.contains(11L), "first hop must depart at-or-after the seed t0")
    assert(got(20L) == 3L, "the 3-hop early-departing path must beat the 1-hop")

    def ref(es: Seq[(Long, Long, Long)], ss: Seq[(Long, Long)],
        hops: Int): Map[Long, Long] = {
      val sym = es ++ es.map(e => (e._2, e._1, e._3))
      var arr = ss.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      for (_ <- 1 to hops) {
        val cand = sym.flatMap { case (a, b, t) =>
          arr.get(a).filter(t >= _).map(_ => (b, t))
        }.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
        arr = (arr.keySet ++ cand.keySet).map { v =>
          v -> math.min(arr.getOrElse(v, Long.MaxValue),
            cand.getOrElse(v, Long.MaxValue))
        }.toMap
      }
      arr
    }
    val rnd = new scala.util.Random(8642)
    val res = (1 to 100).map(_ => (rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong, rnd.nextInt(20).toLong)).filter(e => e._1 != e._2)
    val rss = Seq((3L, 0L), (17L, 5L), (99L, 2L))
    val rgot = graft.ops.Graph.temporalReach(
        res.toDF("a", "b", "t"), rss.toDF("v", "t0"), maxHops = 3)
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("arr"))).toMap
    assert(rgot == ref(res, rss, 3))
  }

  test("cheapestPaths: planted weighted graph + randomized vs Scala Bellman-Ford") {
    import spark.implicits._
    // planted: the 3-hop cheap route (1+1+1=3) must beat the direct
    // expensive edge (10); a node past the hop bound stays unreached;
    // an isolated seed surfaces at 0
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 10L),
      (4L, 5L, 1L), (6L, 7L, 2L))
    val got = graft.ops.Graph.cheapestPaths(
        edges.toDF("a", "b", "w"), Seq(1L, 99L).toDF("v"), maxHops = 3)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Long]("dist")).toMap
    assert(got == Map(1L -> 0L, 99L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 11L), s"got $got")
    assert(got(4L) == 3L, "3-hop cheap route must beat the direct w=10 edge")
    // 5's CHEAP route (1-2-3-4-5 = 4) needs 4 hops — over the bound —
    // so its best <=3-hop cost rides the expensive direct edge: the
    // hop bound visibly binds without dropping the node
    assert(got(5L) == 11L)

    def ref(es: Seq[(Long, Long, Long)], ss: Seq[Long], hops: Int): Map[Long, Long] = {
      val sym = es ++ es.map(e => (e._2, e._1, e._3))
      var dist = ss.distinct.map(_ -> 0L).toMap
      for (_ <- 1 to hops) {
        val cand = sym.flatMap { case (a, b, w) => dist.get(a).map(d => (b, d + w)) }
          .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
        dist = (dist.keySet ++ cand.keySet).map { v =>
          v -> math.min(dist.getOrElse(v, Long.MaxValue),
            cand.getOrElse(v, Long.MaxValue))
        }.toMap
      }
      dist
    }
    val rnd = new scala.util.Random(9753)
    val res = (1 to 120).map(_ => (rnd.nextInt(40).toLong,
      rnd.nextInt(40).toLong, (rnd.nextInt(9) + 1).toLong)).filter(e => e._1 != e._2)
    val rss = Seq(2L, 13L, 77L)
    val rgot = graft.ops.Graph.cheapestPaths(
        res.toDF("a", "b", "w"), rss.toDF("v"), maxHops = 3)
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("dist"))).toMap
    assert(rgot == ref(res, rss, 3))
  }

  test("events_assortativity: moments recompute from a full driver-side graph rebuild") {
    import graft.ops.Sampling.{P, A, B, Buckets}
    def bucket(id: Long): Long = ((id % P + P) % P * A + B) % P % Buckets
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        date_trunc("hour", col("ts")).as("h")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("h").getTime))
    val cells = ev.map(e => ((e._2, e._3), e._1)).distinct
    val capped = cells.groupBy(_._1).values.flatMap { members =>
      members.map(_._2).sortBy(u => (bucket(u), u)).take(50)
        .map(u => (members.head._1, u))
    }.toSeq
    val edges = capped.groupBy(_._1).values.flatMap { us =>
      val ids = us.map(_._2).sorted
      for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    }.groupBy(identity).filter(_._2.size >= 4).keys.toSeq
    val sym = edges ++ edges.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xs = sym.map(e => deg(e._1)); val ys = sym.map(e => deg(e._2))
    val m = sym.size.toLong
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val num = m * sxy - sx * sy
    val denX = m * sxx - sx * sx; val denY = m * syy - sy * sy
    // Full 5-column moment form: the raw DECIMAL(38,0) combinations
    // are spec-gated here (the driver's typed hash can't carry
    // DECIMAL-vs-HUGEINT, so the registered query emits BIGINT only)
    val out = ExtensionQueries.assortativityMoments(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    def dec(c: String): Long =
      r.getAs[java.math.BigDecimal](c).longValueExact()
    assert(r.getAs[Long]("m") == m && dec("num") == num)
    assert(dec("den_x") == denX && dec("den_y") == denY)
    assert(denX == denY, "symmetrization must equalize the denominators")
    assert(r.getAs[Long]("r_bp_signed") ==
      (BigInt(10000) * BigInt(num).abs / BigInt(denX).max(BigInt(1))).toLong
        * num.sign)
    assert(math.abs(r.getAs[Long]("r_bp_signed")) <= 10000L,
      "a correlation effect size cannot exceed 10000 bp")
    // Registered (driver-gated) query = the BIGINT projection of the
    // same moments, nothing more
    val reg = SparkEntry.queries("events_assortativity")(spark, dir)
    assert(reg.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
      Seq(("m", "long"), ("r_bp_signed", "long")))
    val regRow = reg.collect()
    assert(regRow.length == 1)
    assert(regRow.head.getAs[Long]("m") == m)
    assert(regRow.head.getAs[Long]("r_bp_signed") ==
      r.getAs[Long]("r_bp_signed"))
  }

  test("assortativity r_bp: planted near-overflow moments stay exact " +
    "(the r14 10000·num² form overflowed DECIMAL(38,0) here)") {
    import spark.implicits._
    // num ~ 9.2e17: squaring it (8.5e35) times 10000 leaves DECIMAL(38,0);
    // the linear form's widest intermediate is 9.2e21. The expected value
    // is BigInt-exact driver-side arithmetic over the same integers.
    val cases = Seq(
      (BigInt("922337203685477580"), BigInt("1844674407370955161")),
      (BigInt("-922337203685477580"), BigInt("1844674407370955161")),
      (BigInt("999999999999999999"), BigInt("1000000000000000000")),
      (BigInt("0"), BigInt("0")),
      (BigInt("7"), BigInt("13")))
    val df = cases.map { case (n, d) => (n.toString, d.toString) }
      .toDF("num_s", "den_s")
      .select(expr("CAST(num_s AS DECIMAL(38,0))").as("num"),
        expr("CAST(den_s AS DECIMAL(38,0))").as("den_x"))
      .withColumn("r_bp_signed",
        expr(graft.ops.Graph.assortativityRbpSql("div")))
    val got = df.select("r_bp_signed").collect().map(_.getLong(0))
    val want = cases.map { case (n, d) =>
      (BigInt(10000) * n.abs / d.max(BigInt(1))).toLong * n.signum
    }
    assert(got.toSeq == want,
      s"planted near-overflow r_bp diverged: got ${got.toSeq} want $want")
  }

  test("ri_audit: orphan counts recompute from collected key sets") {
    def col1(df: org.apache.spark.sql.DataFrame, c: String): Array[Long] =
      df.select(col(c).cast("long")).collect().map(_.getLong(0))
    def setOf(df: org.apache.spark.sql.DataFrame, c: String): Set[Long] =
      col1(df, c).toSet
    val expect = Map(
      "lineitem->orders" -> (col1(Tables.lineitem(spark, dir), "l_orderkey"),
        setOf(Tables.orders(spark, dir), "o_orderkey")),
      "lineitem->part" -> (col1(Tables.lineitem(spark, dir), "l_partkey"),
        setOf(Tables.part(spark, dir), "p_partkey")),
      "orders->customer" -> (col1(Tables.orders(spark, dir), "o_custkey"),
        setOf(Tables.customer(spark, dir), "c_custkey")),
      "customer->nation" -> (col1(Tables.customer(spark, dir), "c_nationkey"),
        setOf(Tables.nation(spark, dir), "n_nationkey")),
      "supplier->nation" -> (col1(Tables.supplier(spark, dir), "s_nationkey"),
        setOf(Tables.nation(spark, dir), "n_nationkey")),
      "cdc_employees->customer" ->
        (col1(Tables.events(spark, dir), "user_id").map(_ - 2L),
          setOf(Tables.customer(spark, dir), "c_custkey"))
    ).map { case (fk, (child, parents)) =>
      fk -> (child.length.toLong, child.count(k => !parents(k)).toLong)
    }
    val got = SparkEntry.queries("ri_audit")(spark, dir).collect()
      .map(r => r.getAs[String]("fk") ->
        (r.getAs[Long]("n_child"), r.getAs[Long]("n_orphans"))).toMap
    assert(got == expect)
    // TPC-H edges hold by construction; the derived CDC employee edge
    // genuinely breaks — the audit must DISCRIMINATE, not pin zeros
    assert(got.filterKeys(_ != "cdc_employees->customer").values
      .forall(_._2 == 0L))
    assert(got("cdc_employees->customer")._2 > 0L)
  }

  test("pk_audit: duplicate counts recompute; only the content key collides") {
    val got = SparkEntry.queries("pk_audit")(spark, dir).collect()
      .map(r => r.getAs[String]("key") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
          r.getAs[Long]("n_dup_rows"))).toMap
    // driver recompute of the discriminating content key
    val fps = Tables.documents(spark, dir).select(col("text")).collect()
      .map(r => r.getString(0).trim.toLowerCase.replaceAll("\\s+", " "))
      .map(n => java.security.MessageDigest.getInstance("MD5")
        .digest(n.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(got("documents.fingerprint") ==
      ((fps.length.toLong, fps.distinct.length.toLong,
        (fps.length - fps.distinct.length).toLong)))
    // prefix blocking key: near-dups share 8-token prefixes, so this
    // content key must collide at every SF — the discriminating row
    val pfx = Tables.documents(spark, dir).select(col("text")).collect()
      .map(_.getString(0).trim.toLowerCase.split("\\s+").take(8).mkString(" "))
    assert(got("documents.prefix8_key") ==
      ((pfx.length.toLong, pfx.distinct.length.toLong,
        (pfx.length - pfx.distinct.length).toLong)))
    assert(got("documents.prefix8_key")._3 > 0L,
      "near-dup prefixes must collide — a blocking key is not a PK")
    // the synthetic lineitem does NOT keep TPC-H's composite PK —
    // the audit reports the measured collision count, recomputed here
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(r => (r.getLong(0), r.get(1)))
    assert(got("lineitem.(orderkey,linenumber)") ==
      ((li.length.toLong, li.distinct.length.toLong,
        (li.length - li.distinct.length).toLong)))
    assert(got("lineitem.(orderkey,linenumber)")._3 > 0L)
    // the single-column physical keys hold exactly
    Seq("orders.o_orderkey", "customer.c_custkey", "events.event_id",
      "documents.doc_id").foreach { k =>
      assert(got(k)._3 == 0L && got(k)._1 == got(k)._2, k)
    }
    assert(got("documents.doc_id")._1 ==
      Tables.documents(spark, dir).count())
    assert(got("events.event_id")._1 == Tables.events(spark, dir).count())
  }

  test("globalRunningSum: randomized tie-heavy prefix sums match a driver fold") {
    import spark.implicits._
    val rnd = new scala.util.Random(3141)
    val rows = (1 to 500).map(i =>
      (rnd.nextInt(5).toLong, i.toLong, (rnd.nextInt(9) + 1).toLong))
    val got = graft.ops.Linkage.globalRunningSum(
        rows.toDF("v", "id", "w"), col("w"), col("v"), col("id"))
      .select(col("id"), col("cum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    val expect = rows.sortBy(r => (r._1, r._2)).map { r =>
      acc += r._3; r._2 -> acc
    }.toMap
    assert(got == expect)
  }

  test("lineitem_weighted_price: crossings recompute from the sorted prefix sums") {
    val rows = Tables.lineitem(spark, dir)
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("p"),
        col("l_quantity").cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._3, r._4))
    val total = rows.map(_._2).sum
    def crossing(pct: Long): Long = {
      val target = (pct * total + 99) / 100
      var cum = 0L
      rows.find { r => cum += r._2; cum >= target }.get._1
    }
    val got = SparkEntry.queries("lineitem_weighted_price")(spark, dir)
      .collect().map(r => r.getAs[Long]("pct") ->
        (r.getAs[Long]("price_x100"), r.getAs[Long]("total_units"))).toMap
    assert(got == Map(25L -> (crossing(25), total),
      50L -> (crossing(50), total), 75L -> (crossing(75), total)))
    assert(got(25L)._1 <= got(50L)._1 && got(50L)._1 <= got(75L)._1)
    // the weighted median genuinely differs from the row median —
    // the reason the weighted form exists
    val rowMedian = rows((rows.length - 1) / 2)._1
    assert(got(50L)._1 != rowMedian || total == rows.length.toLong)
  }

  test("text_conjunctive: per-doc recount of the posting intersection") {
    val terms = Seq("dup", "spark", "merge")
    val expect = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect().flatMap { r =>
        val toks = r.getString(1).trim.toLowerCase.split("\\s+")
        val counts = terms.map(t => toks.count(_ == t).toLong)
        if (counts.forall(_ > 0)) Some(r.getLong(0) -> counts.sum) else None
      }.toMap
    val got = SparkEntry.queries("text_conjunctive")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tf_total")).toMap
    assert(got == expect)
    // the filter discriminates: some docs carry a subset of the terms
    // but not all three, so the intersection is a strict subset
    val some = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .collect().count { r =>
        val toks = r.getString(1).trim.toLowerCase.split("\\s+").toSet
        terms.exists(toks.contains)
      }
    assert(got.nonEmpty && got.size < some)
  }

  test("cdc_snapshot_diff: statuses recompute from two reconstructions") {
    val t1us = micros(java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    val cols = Seq("emp_FN", "emp_LN", "emp_dob", "emp_city", "emp_salary")
    val rows = graft.cdc.Routing.validateSplit(
        graft.cdc.Fixtures.employeeCdcLog(spark, dir)).valid
      .select((Seq("emp_id", "event_id", "last_updated_at", "action") ++ cols)
        .map(col): _*).collect()
    val expect = rows.groupBy(_.getAs[Long]("emp_id")).flatMap { case (id, vs) =>
      val sorted = vs.sortBy(r =>
        (micros(r.getAs[java.sql.Timestamp]("last_updated_at")),
          r.getAs[Long]("event_id")))
      val s2 = sorted.last
      val s1 = sorted.filter(r =>
        micros(r.getAs[java.sql.Timestamp]("last_updated_at")) <= t1us)
        .lastOption
      val p1 = s1.exists(_.getAs[String]("action") != "delete")
      val p2 = s2.getAs[String]("action") != "delete"
      val changed = cols.filter(c =>
        s1.map(_.getAs[Any](c)) != Some(s2.getAs[Any](c))).mkString(",")
      val status =
        if (!p1 && p2) Some("added")
        else if (p1 && !p2) Some("removed")
        else if (p1 && p2 && changed.nonEmpty) Some("changed")
        else None
      status.map { st =>
        id -> (st,
          if (st == "changed") changed else "",
          if (p1) Some(s1.get.getAs[Long]("emp_salary")) else None,
          if (p2) Some(s2.getAs[Long]("emp_salary")) else None)
      }
    }
    val got = SparkEntry.queries("cdc_snapshot_diff")(spark, dir).collect()
      .map { r =>
        def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        r.getAs[Long]("emp_id") -> (r.getAs[String]("status"),
          r.getAs[String]("changed_cols"), opt(3), opt(4))
      }.toMap
    assert(got == expect)
    // all three statuses occur — the two reconstructions genuinely differ
    assert(got.values.map(_._1).toSet == Set("added", "removed", "changed"))
  }

  test("events_equidepth: buckets recompute from the sorted value vector") {
    val k = 16
    val vs = Tables.events(spark, dir).where(col("value").isNotNull)
      .select((col("value").cast("decimal(18,2)") * 100).cast("long").as("v"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val n = vs.length
    val q = n / k; val r = n % k
    // ntile: buckets 1..r hold q+1 rows, the rest q
    val expect = (1 to k).map { b =>
      val start = if (b <= r) (b - 1) * (q + 1) else r * (q + 1) + (b - 1 - r) * q
      val size = if (b <= r) q + 1 else q
      val slice = vs.slice(start, start + size)
      b.toLong -> (size.toLong, slice.head._1, slice.last._1)
    }.toMap
    val got = SparkEntry.queries("events_equidepth")(spark, dir).collect()
      .map(row => row.getAs[Long]("bucket") -> (row.getAs[Long]("n_values"),
        row.getAs[Long]("lo_x100"), row.getAs[Long]("hi_x100"))).toMap
    assert(got == expect)
    // equi-depth under skew: depths differ by at most one row, and
    // bucket WIDTHS genuinely vary (the density signal)
    assert(got.values.map(_._1).max - got.values.map(_._1).min <= 1)
    assert(got.values.map(v => v._3 - v._2).toSet.size > 1)
  }

  test("emb_centroid_drift: recomputes from BigInt folds over the quantized halves") {
    def quant(x: Float): Long = java.math.BigDecimal.valueOf(x.toDouble * 1000)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val rows = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1).map(quant).toArray))
    val (ha, hb) = rows.partition(_._1 % 2 == 0)
    def milli(s: Long, n: Long): Long = s.sign * (math.abs(s) * 1000 / n)
    def centroid(g: Array[(Long, Array[Long])]): Array[Long] =
      (0 until 64).map(d => milli(g.map(_._2(d)).sum, g.length)).toArray
    val (ma, mb) = (centroid(ha), centroid(hb))
    val dot = ma.zip(mb).map { case (a, b) => a * b }.sum
    val n2a = ma.map(a => a * a).sum; val n2b = mb.map(b => b * b).sum
    val out = SparkEntry.queries("emb_centroid_drift")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_a") == ha.length && r.getAs[Long]("n_b") == hb.length)
    assert(r.getAs[Long]("dot_sign") == dot.sign)
    assert(r.getAs[Long]("cos2_bp") ==
      (BigInt(10000) * BigInt(dot) * BigInt(dot) /
        (BigInt(n2a) * BigInt(n2b)).max(BigInt(1))).toLong)
    assert(r.getAs[Long]("l2sq_diff_milli2") ==
      ma.zip(mb).map { case (a, b) => (a - b) * (a - b) }.sum)
    assert(r.getAs[Long]("max_dim_gap") ==
      ma.zip(mb).map { case (a, b) => math.abs(a - b) }.max)
    // the fixture's embeddings are zero-centered, so the half
    // centroids are noise vectors: the statistic must REPORT that
    // (cos² well below parallel) rather than fake alignment — exactly
    // the signal that flips when an encoder swap shifts the space
    assert(r.getAs[Long]("cos2_bp") >= 0L && r.getAs[Long]("cos2_bp") <= 10000L)
    assert(r.getAs[Long]("l2sq_diff_milli2") > 0L)
    assert(r.getAs[Long]("max_dim_gap") > 0L)
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == rows.length)
  }

  test("text_chi2_terms: scores recompute from the 2x2 contingency tables") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
    val n1 = docs.count(_.getAs[String]("lang") == "en").toLong
    val nn = docs.length.toLong
    val byTerm = docs.flatMap { r =>
      val cls = r.getAs[String]("lang") == "en"
      r.getAs[String]("text").trim.toLowerCase.split("\\s+").distinct
        .map(t => (t, cls))
    }.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toMap
    val scored = byTerm.toSeq.map { case (t, (a, b)) =>
      val c = n1 - a; val d = nn - n1 - b
      val num = BigInt(a) * d - BigInt(b) * c
      val den = (BigInt(a + b) * (c + d) * (a + c) * (b + d)).max(BigInt(1))
      (t, a, b, (BigInt(10000) * nn * num * num / den).toLong)
    }
    val expect = scored.sortBy(s => (-s._4, s._1)).take(20)
      .map(s => s._1 -> (s._2, s._3, s._4)).toMap
    val got = SparkEntry.queries("text_chi2_terms")(spark, dir).collect()
      .map(r => r.getAs[String]("term") -> (r.getAs[Long]("n_en_with"),
        r.getAs[Long]("n_other_with"), r.getAs[Long]("chi2_bp"))).toMap
    assert(got == expect)
    // the selection discriminates: scores spread and the top term is
    // genuinely associated (chi2 > 0)
    assert(got.values.map(_._3).max > 0L)
    assert(got.values.map(_._3).toSet.size > 1)
  }
}
