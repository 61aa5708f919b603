package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming windowed aggregation with watermark (SURVEY §2.9): tumbling
  * windows close once the watermark passes; late events beyond the
  * watermark are dropped.
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  case class E(ts: Timestamp, v: Double)

  test("tumbling window agg emits closed windows; too-late events dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(18,2)")).as("total"))
      .select(col("window.start").as("w"), col("n"), col("total"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("win_out").start()

    def t(s: String) = Timestamp.valueOf(s)
    input.addData((t("2024-01-01 10:05:00"), 1.0), (t("2024-01-01 10:50:00"), 2.0))
    q.processAllAvailable()
    // advance event time well past 11:00 + 10min watermark → closes 10:00 window
    input.addData((t("2024-01-01 12:00:00"), 5.0))
    q.processAllAvailable()
    // this event is for the already-closed 10:00 window → dropped
    input.addData((t("2024-01-01 10:30:00"), 100.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getDecimal(2).longValue()))
    // only the closed 10:00-11:00 window was appended, without the late 100.0
    assert(rows.toSeq === Seq(("2024-01-01 10:00:00.0", 2L, 3L)))
  }

  test("session_window merges events within gap, splits across it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    def t(s: String) = Timestamp.valueOf(s)
    val agg = input.toDF().toDF("ts", "user_id")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s"),
        col("session_window.end").as("e"), col("user_id"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_out").start()
    // one 3-event session (gaps < 30min), then a separate session 2h later
    input.addData((t("2024-01-01 09:00:00"), 1L), (t("2024-01-01 09:20:00"), 1L),
      (t("2024-01-01 09:45:00"), 1L), (t("2024-01-01 12:00:00"), 1L))
    q.processAllAvailable()
    input.addData((t("2024-01-01 15:00:00"), 1L)) // advance watermark, close sessions
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_out").orderBy("s").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(3)))
    assert(rows.toSeq === Seq(("2024-01-01 09:00:00.0", 3L), ("2024-01-01 12:00:00.0", 1L)))
  }

  test("hopping window counts each event in every overlapping window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    def t(s: String) = Timestamp.valueOf(s)
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("hop_out").start()
    // 10:40 falls in [10:00,11:00) and [10:30,11:30); 10:50 in the same two
    input.addData((t("2024-01-01 10:40:00"), 1.0), (t("2024-01-01 10:50:00"), 2.0))
    q.processAllAvailable()
    input.addData((t("2024-01-01 13:00:00"), 9.0)) // advance watermark, close both
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("hop_out").orderBy("w").collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1)))
    assert(rows.toSeq === Seq(
      ("2024-01-01 10:00:00.0", 2L), ("2024-01-01 10:30:00.0", 2L)))
  }
}
