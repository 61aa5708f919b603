package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamJoins

/** Stream-stream interval join (SURVEY §2.9 extension): click/impression
  * attribution with watermarks on both sides so join state is evictable.
  * Inner form emits matches only; left-outer form also emits
  * never-matched left rows once the watermark proves no match can
  * arrive.
  */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("inner interval join matches clicks within the window, drops those outside") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoins.intervalJoin(
      imps.toDF().toDF("ad_id", "imp_ts"), "imp_ts", "10 minutes",
      clicks.toDF().toDF("ad_id", "click_ts"), "click_ts", "10 minutes",
      key = "ad_id", windowSeconds = 600)
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attr_inner").start()

    imps.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:00:00")))
    // ad1 clicked 5 min after impression (in window), then again 30 min
    // after (outside); ad2 never clicked; ad3 clicked with no impression
    clicks.addData((1L, t("2024-01-01 10:05:00")),
      (1L, t("2024-01-01 10:30:00")), (3L, t("2024-01-01 10:02:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attr_inner").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString))
    assert(rows.toSeq ===
      Seq((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:05:00.0")))
  }

  test("stream-static enrichment joins each batch against the dim, keeps misses") {
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[(Long, Long)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "segment")
    val out = StreamJoins.enrichWithDim(
      events.toDF().toDF("user_id", "amount"), dim, "user_id")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("enriched").start()

    events.addData((1L, 10L), (3L, 30L))
    q.processAllAvailable()
    events.addData((2L, 20L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("enriched")
      .select($"user_id", $"amount", $"segment").as[(Long, Long, Option[String])]
      .collect().toSet
    // user 3 has no dim row: passes through with null, not dropped
    assert(rows === Set((1L, 10L, Some("gold")), (3L, 30L, None),
      (2L, 20L, Some("basic"))))
  }

  test("left-outer emits unmatched impressions only after the watermark closes their window") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoins.intervalJoin(
      imps.toDF().toDF("ad_id", "imp_ts"), "imp_ts", "5 minutes",
      clicks.toDF().toDF("ad_id", "click_ts"), "click_ts", "5 minutes",
      key = "ad_id", windowSeconds = 600, joinType = "left_outer")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attr_outer").start()

    imps.addData((1L, t("2024-01-01 10:00:00")), (2L, t("2024-01-01 10:00:00")))
    clicks.addData((1L, t("2024-01-01 10:04:00")))
    q.processAllAvailable()
    // before the watermark passes 10:10+delay, ad2 must NOT have a null row:
    // a matching click could still arrive
    val early = spark.table("attr_outer").collect()
    assert(!early.exists(r => r.getLong(0) == 2L),
      "unmatched row emitted while its window was still open")

    // push both watermarks far past ad2's window end (10:10) + 5 min delay
    imps.addData((9L, t("2024-01-01 12:00:00")))
    clicks.addData((9L, t("2024-01-01 12:00:01")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attr_outer").collect()
      .map(r => (r.getLong(0), Option(r.getTimestamp(2)).map(_.toString)))
    assert(rows.contains((1L, Some("2024-01-01 10:04:00.0"))))
    assert(rows.contains((2L, None)),
      "watermark-closed unmatched impression must surface with null click")
  }
}
