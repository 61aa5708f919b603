package graft

import org.apache.spark.sql.functions.to_date

/** Gaps-and-islands streak mining, ABC classification, and the audit
  * queries (Benford, k-anonymity), each pinned against a driver-side
  * fold over the raw fixture. */
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

  test("orders_benford recounts exactly and carries the public expected table") {
    val dir = "/root/testdata/sf0.001"
    val got = ExtensionQueries.queries("orders_benford")(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map { case (d, n, s, b, dev) => d -> ((n, s, b, dev)) }.toMap
    val want = Tables.orders(spark, dir)
      .select($"o_totalprice").as[Double].collect()
      .map(p => BigDecimal(math.abs(p) * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toBigInt.toString.head.asDigit)
      .filter(_ >= 1)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.view.mapValues(_._1).toMap === want)
    // shares are exact floor(1e6·n/total) and devs are exact differences
    val total = want.values.sum
    got.foreach { case (d, (n, s, b, dev)) =>
      assert(s === 1000000L * n / total)
      assert(dev === s - b)
    }
    // the expected column is the published Benford table
    assert(got(1)._3 === 301030L && got(9)._3 === 45757L)
  }

  test("events_kanonymity recounts the risky population exactly") {
    val dir = "/root/testdata/sf0.001"
    val groups = Tables.events(spark, dir)
      .select($"event_type", to_date($"ts").as("day"), $"user_id").distinct()
      .groupBy($"event_type", $"day").count()
      .select($"count").as[Long].collect()
    val want = groups.groupBy(_ >= 5L).map { case (anon, gs) =>
      anon -> ((gs.size.toLong, gs.sum))
    }
    val got = ExtensionQueries.queries("events_kanonymity")(spark, dir)
      .as[(Boolean, Long, Long)].collect()
      .map { case (a, g, m) => a -> ((g, m)) }.toMap
    assert(got === want)
  }
}
