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
}
