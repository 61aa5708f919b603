package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.SessionStream

/** Streaming session-window twin ([[SessionStream.sessionize]]): the
  * NATIVE watermark-closed `session_window` operator, driven by real
  * StreamingQueries over the fixture, must reproduce the batch
  * `events_session_window` registry query row for row — under
  * one-day-per-batch arrival, under seeded random day-aligned splits,
  * and across a checkpointed mid-stream restart (the Retention/Funnel
  * twin contract shape). The batch side is a different algorithm
  * entirely (one keyed shuffle + in-partition merge in Spark,
  * gaps-and-islands in the DuckDB oracle), so agreement here is three
  * independent implementations of session semantics converging.
  *
  * Flush mechanics: Append mode emits a session only when the
  * watermark passes its end, so sessions near the stream's tail would
  * sit in state forever once input stops. The spec closes them the
  * way a production pipeline's heartbeat would: two sentinel events
  * for a reserved key (-1) far past the fixture's horizon — the first
  * advances the watermark, the second triggers the micro-batch that
  * evaluates state against it. The sentinel's own session is excluded
  * on read (key < 0); every REAL session must have been emitted.
  */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, dir)
    .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
      to_date(col("ts")).as("d"))
    .localCheckpoint(true)
  private lazy val days: Seq[java.sql.Date] =
    events.select(col("d")).distinct().orderBy("d")
      .as[java.sql.Date].collect().toSeq
  private lazy val byDay: Map[java.sql.Date, Seq[(Long, Timestamp)]] =
    events.as[(Long, Timestamp, java.sql.Date)].collect().toSeq
      .groupBy(_._3).view.mapValues(_.map(t => (t._1, t._2))).toMap
  private lazy val horizon: Timestamp = {
    val m = events.agg(max(col("ts"))).head.getTimestamp(0)
    new Timestamp(m.getTime + 10L * 86400 * 1000)
  }

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sess-$name").toString

  private lazy val batchTruth: Set[(Long, String, String, Long)] =
    SparkEntry.queries("events_session_window")(spark, dir)
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet

  private def outRows(out: String): Set[(Long, String, String, Long)] =
    spark.read.parquet(out)
      .where(col("user_id") >= 0) // drop the watermark-flush sentinel
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet

  private def startQ(input: MemoryStream[(Long, Timestamp)],
                     out: String, ckpt: String) =
    SessionStream.sessionize(input.toDF().toDF("user_id", "ts"))
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", out)
      .start()

  /** Advance the watermark past every real session end, then trigger
    * the micro-batch that evaluates state against it. */
  private def flush(input: MemoryStream[(Long, Timestamp)],
                    q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    input.addData((-1L, horizon)); q.processAllAvailable()
    input.addData((-1L, new Timestamp(horizon.getTime + 3600 * 1000)))
    q.processAllAvailable()
  }

  test("one-day-per-batch replay equals the batch query row for row") {
    implicit val sqlCtx = spark.sqlContext
    val base = tmp("a")
    val input = MemoryStream[(Long, Timestamp)]
    val q = startQ(input, base + "/out", base + "/ckpt")
    days.foreach { d => input.addData(byDay(d)); q.processAllAvailable() }
    flush(input, q)
    q.stop()
    val got = outRows(base + "/out")
    assert(got === batchTruth)
    // the fixture genuinely exercises merging: multi-event sessions
    // exist, and some user has more than one session
    assert(got.exists(_._4 > 1L))
    assert(got.groupBy(_._1).exists(_._2.size > 1))
  }

  test("seeded random day-aligned splits all reproduce the batch truth") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(20L)
    for (trial <- 1 to 2) {
      val base = tmp(s"r$trial")
      val input = MemoryStream[(Long, Timestamp)]
      val q = startQ(input, base + "/out", base + "/ckpt")
      val cuts = days.indices.tail.filter(_ => rnd.nextBoolean())
      val groups = (Seq(0) ++ cuts :+ days.size).sliding(2).toSeq
        .map { case Seq(a, b) => days.slice(a, b) }.filter(_.nonEmpty)
      groups.foreach { grp =>
        input.addData(grp.flatMap(byDay)); q.processAllAvailable()
      }
      flush(input, q)
      q.stop()
      assert(outRows(base + "/out") === batchTruth,
        s"trial $trial groups=${groups.map(_.size)}")
    }
  }

  test("checkpointed restart mid-stream stays exact") {
    // stop the query halfway, start a NEW query from the same
    // checkpoint and sink (the engine may re-fire the last uncommitted
    // batch — the parquet sink's metadata log must absorb it), feed
    // the rest: emitted sessions still equal the batch truth, with
    // mid-fixture open sessions carried across the restart in state
    implicit val sqlCtx = spark.sqlContext
    val base = tmp("q")
    val input = MemoryStream[(Long, Timestamp)]
    val (firstHalf, secondHalf) = days.splitAt(days.size / 2)
    var q = startQ(input, base + "/out", base + "/ckpt")
    firstHalf.foreach { d => input.addData(byDay(d)); q.processAllAvailable() }
    q.stop()
    q = startQ(input, base + "/out", base + "/ckpt")
    secondHalf.foreach { d => input.addData(byDay(d)); q.processAllAvailable() }
    flush(input, q)
    q.stop()
    assert(outRows(base + "/out") === batchTruth)
  }
}
