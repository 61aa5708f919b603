package graft

/** Gaps-and-islands streak mining pinned against a driver-side fold
  * over the raw fixture. */
class StreaksSpec extends SparkSpec {
  import spark.implicits._

  test("events_user_streaks matches a driver-side island fold") {
    val dir = "/root/testdata/sf0.001"
    val days = Tables.events(spark, dir)
      .select($"user_id", $"ts".cast("timestamp_ntz"))
      .as[(Long, java.time.LocalDateTime)].collect()
      .map { case (u, ts) => (u, ts.toLocalDate) }.distinct
    val want = days.groupBy(_._1).map { case (u, ds) =>
      val epochDays = ds.map(_._2.toEpochDay).sorted
      val streaks = epochDays.zip(Long.MinValue +: epochDays.dropRight(1))
        .foldLeft(List.empty[Long]) {
          case (acc, (d, prev)) if d - prev == 1 => (acc.head + 1) :: acc.tail
          case (acc, _) => 1L :: acc
        }
      (u, streaks.max, epochDays.size.toLong, streaks.size.toLong)
    }.toSet
    val got = ExtensionQueries.queries("events_user_streaks")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    // the fixture genuinely contains multi-day streaks and gaps
    assert(got.exists(_._2 > 1L) && got.exists(r => r._4 > 1L))
  }

  test("parts_abc_analysis: classes partition the parts, mean revenue strictly tiers") {
    val dir = "/root/testdata/sf0.001"
    val rows = ExtensionQueries.queries("parts_abc_analysis")(spark, dir)
      .as[(String, Long, Long)].collect()
      .map { case (c, n, r) => c -> ((n, r)) }.toMap
    assert(rows.keySet === Set("A", "B", "C"))
    val nParts = Tables.lineitem(spark, dir)
      .select($"l_partkey").distinct().count()
    assert(rows.values.map(_._1).sum === nParts)
    // cumulative-share classification means per-part revenue can only
    // fall from A to B to C
    def mean(c: String): Double = rows(c)._2.toDouble / rows(c)._1
    assert(mean("A") > mean("B") && mean("B") > mean("C"))
  }
}
