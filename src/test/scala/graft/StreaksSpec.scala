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
}
