package graft

import org.apache.spark.sql.functions._

/** Round-13 operators: CUSUM changepoint monitor (prefix-extrema
  * identity vs the recursive fold), half-life decay score (dyadic
  * arithmetic recheck), blocked record linkage (blocking completeness
  * + linkage accuracy), and hybrid RRF fusion (channel membership and
  * score recheck). Each assert recomputes the semantics independently
  * driver-side — the DuckDB oracle pins engine parity, these pin the
  * MATH.
  */
class LinkageMonitorSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("events_cusum: window identity equals the recursive max(0,.) fold") {
    val rows = SparkEntry.queries("events_cusum")(spark, dir)
      .orderBy("day").collect()
    assert(rows.length > 1)
    // recursive reference: C+_d = max(0, C+_{d-1} + dev_d),
    //                      C-_d = max(0, C-_{d-1} - dev_d)
    var cp = 0L; var cn = 0L
    rows.foreach { r =>
      val dev = r.getAs[Long]("dev")
      cp = math.max(0L, cp + dev)
      cn = math.max(0L, cn - dev)
      assert(r.getAs[Long]("cusum_pos") == cp, s"day ${r.get(0)} pos")
      assert(r.getAs[Long]("cusum_neg") == cn, s"day ${r.get(0)} neg")
    }
    // deviations are zero-sum by construction (dev = n*D - N)
    assert(rows.map(_.getAs[Long]("dev")).sum == 0L)
  }

  test("events_cusum: an injected level shift trips alarm_hi") {
    // double the volume in the last third of days on a copy of the
    // fixture series: the accumulated excess must cross 2N
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .orderBy("day").collect().map(r => r.getAs[Long]("n"))
    val d = daily.length
    val shifted = daily.zipWithIndex.map { case (n, i) =>
      if (i >= 2 * d / 3) n * 3 else n }
    val total = shifted.sum
    var s = 0L; var minS = 0L; var tripped = false
    shifted.foreach { n =>
      s += n * d - total
      minS = math.min(minS, s)
      if (s - math.min(0L, minS) > 2 * total) tripped = true
    }
    assert(tripped, "a 3x level shift over a third of the series must alarm")
  }

  test("events_decay_score: contributions are the exact dyadic halvings") {
    val got = SparkEntry.queries("events_decay_score")(spark, dir)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("decayed_x100"))).toMap
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("v"))
      .collect()
    val d1 = ev.map(_.getAs[java.sql.Date]("day").toLocalDate).max(
      Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
    val expect = ev.groupBy(_.getAs[Long]("user_id")).map { case (u, rs) =>
      u -> rs.map { r =>
        val age = math.min(40L,
          d1.toEpochDay - r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)
        math.max(0L, r.getAs[Long]("v")) / (1L << age)
      }.sum
    }
    expect.foreach { case (u, v) =>
      assert(got(u)._2 == v, s"user $u decayed sum")
    }
    assert(got.keySet == expect.keySet)
  }

  test("record linkage: every dirty record links, and blocking is complete") {
    val out = SparkEntry.queries("customers_record_linkage")(spark, dir).collect()
    val nCust = Tables.customer(spark, dir).count()
    // completeness: a transposition at p differs from the original
    // only inside window [p, p+1], so the deletion key at q = p
    // matches exactly — the TRUE pair always shares a block and
    // survives the lev<=2 gate, so every dirty record must appear
    assert(out.length == nCust, s"${out.length} linked of $nCust")
    out.foreach { r =>
      assert(r.getAs[Long]("lev_dist") <= 2L)
      assert(r.getAs[Long]("n_cand") >= 1L)
    }
    // a CORRECT link sits at the true pair's distance: exactly 0
    // (transposed digits were equal) or 2 (a transposition in plain
    // levenshtein); a WRONG link means a rival beat the true pair,
    // which is only possible at a strictly smaller distance or at the
    // same distance with a lower key
    val wrong = out.filterNot(_.getAs[Boolean]("is_correct"))
    out.filter(_.getAs[Boolean]("is_correct")).foreach { r =>
      val lev = r.getAs[Long]("lev_dist")
      assert(lev == 0L || lev == 2L,
        "the true pair's distance is exactly 0 or 2")
    }
    wrong.foreach { r =>
      assert(r.getAs[Long]("lev_dist") < 2L ||
        r.getAs[Long]("matched_custkey") < r.getAs[Long]("dirty_id"),
        "an incorrect link must strictly beat the true pair in (lev, key)")
    }
    // and the fixture should link mostly correctly — the dense
    // 0..N key space makes window-local rivals common (swapping two
    // tail digits often lands one substitution from ANOTHER live
    // key), so the measured accuracy is the honest ambiguity floor
    // of lev<=2 linkage on this name space, not a bug
    assert(wrong.length * 3 < out.length, "accuracy must exceed 2/3")
  }

  test("sim_hybrid_rrf: fused scores are the exact integer RRF of both channels") {
    val out = SparkEntry.queries("sim_hybrid_rrf")(spark, dir)
      .orderBy("fused_rank").collect()
    assert(out.length == 10)
    out.foreach { r =>
      val lr = r.getAs[Long]("lex_rank"); val dr = r.getAs[Long]("dense_rank")
      val want = (if (lr > 0) 1000000L / (60 + lr) else 0L) +
        (if (dr > 0) 1000000L / (60 + dr) else 0L)
      assert(r.getAs[Long]("rrf_x1e6") == want)
      assert(lr > 0 || dr > 0, "a fused doc must come from some channel")
    }
    // a doc ranked #1 in BOTH channels would dominate; at minimum the
    // top fused doc must beat any single-channel-only doc's max score
    val top = out.head.getAs[Long]("rrf_x1e6")
    assert(top >= 1000000L / 61, "top fused score at least a rank-1 channel hit")
    // fused order is strictly by (score desc, doc_id)
    val sorted = out.map(r => (-r.getAs[Long]("rrf_x1e6"), r.getAs[Long]("doc_id")))
    assert(sorted.sameElements(sorted.sorted))
  }
}
