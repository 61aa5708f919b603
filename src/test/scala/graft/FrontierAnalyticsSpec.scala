package graft

import org.apache.spark.sql.functions._

/** Round-13 operators: 2-D skyline (brute-force dominance recheck +
  * two-phase plan shape), lag-k autocorrelation (exact recompute from
  * the collected daily series), last-touch attribution (per-user
  * replay), and golden-record survivorship (mode election recheck).
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
}
