package graft

/** The HLL++ distinct sketch must stay inside its advertised error
  * envelope against the exact count at every fixture scale the gates
  * run — the same invariant the certificate queries' `ok` column
  * hands to the driver's hash gate, asserted here directly so a
  * failure names the offending group.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("approx distinct within 6% of exact at sf0.001 and sf0.01") {
    for (sf <- Seq("0.001", "0.01")) {
      val rows = SparkEntry.queries("events_approx_distinct")(
          spark, s"/root/testdata/sf$sf")
        .select($"event_type", $"ok" === 1L).as[(String, Boolean)].collect()
      assert(rows.nonEmpty)
      val out = rows.filterNot(_._2)
      assert(out.isEmpty, s"sketch out of bound at sf$sf: ${out.mkString(",")}")
    }
  }

  test("count-min estimates overestimate within eps*N at sf0.001 and sf0.01") {
    for (sf <- Seq("0.001", "0.01")) {
      val rows = SparkEntry.queries("events_cms_counts")(
          spark, s"/root/testdata/sf$sf")
        .select($"user_id", $"ok" === 1L).as[(Long, Boolean)].collect()
      assert(rows.nonEmpty)
      val out = rows.filterNot(_._2)
      assert(out.isEmpty, s"CMS out of bound at sf$sf: ${out.mkString(",")}")
    }
  }

  test("approx p90 rank error within n/accuracy at sf0.001 and sf0.01") {
    for (sf <- Seq("0.001", "0.01")) {
      val rows = SparkEntry.queries("events_approx_quantiles")(
          spark, s"/root/testdata/sf$sf")
        .select($"event_type", $"ok" === 1L).as[(String, Boolean)].collect()
      assert(rows.nonEmpty)
      val out = rows.filterNot(_._2)
      assert(out.isEmpty, s"quantile sketch out of rank bound at sf$sf: ${out.mkString(",")}")
    }
  }

  test("lineitem profile HLL distincts within 6% of exact at sf0.001 and sf0.01") {
    for (sf <- Seq("0.001", "0.01")) {
      val rows = SparkEntry.queries("lineitem_profile_approx")(
          spark, s"/root/testdata/sf$sf")
        .select($"col_name", $"ok" === 1L).as[(String, Boolean)].collect()
      assert(rows.length === 5)
      val out = rows.filterNot(_._2)
      assert(out.isEmpty, s"profile sketch out of bound at sf$sf: ${out.mkString(",")}")
    }
  }

  test("the exact p90 sits inside the approx query's own rank window") {
    // the oracle-pinned exact half and the sketch half must agree on
    // the target rank arithmetic — a drift in one shows up here
    val dir = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("events_quantiles_exact")(spark, dir)
      .select($"event_type", $"target_rank").as[(String, Long)].collect().toMap
    val approx = SparkEntry.queries("events_approx_quantiles")(spark, dir)
      .select($"event_type", $"target_rank").as[(String, Long)].collect().toMap
    assert(exact === approx)
  }

  test("winsorize sketch twin: tails within GK bound, no rank window in the plan") {
    for (sf <- Seq("0.001", "0.01")) {
      val df = SparkEntry.queries("events_winsorize_approx")(
        spark, s"/root/testdata/sf$sf")
      val rows = df.select($"event_type", $"ok" === 1L)
        .as[(String, Boolean)].collect()
      assert(rows.nonEmpty)
      val out = rows.filterNot(_._2)
      assert(out.isEmpty, s"clipped tail exceeds GK bound at sf$sf: ${out.mkString(",")}")
      // the scale promise: bounds come from the sketch, not a per-type
      // sort window (the exact form's audit-grade cost)
      assert(!df.queryExecution.executedPlan.toString.contains("Window"),
        "sketch-served winsorize must not plan a rank window")
    }
  }

  test("winsorize twins agree on group counts") {
    val dir = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("events_winsorize")(spark, dir)
      .select($"event_type", $"n").as[(String, Long)].collect().toMap
    val approx = SparkEntry.queries("events_winsorize_approx")(spark, dir)
      .select($"event_type", $"n").as[(String, Long)].collect().toMap
    assert(exact === approx)
  }
}
