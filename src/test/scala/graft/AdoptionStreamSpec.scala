package graft

import org.apache.spark.sql.functions._
import graft.streaming.Monitors

/** Streaming adoption curves ([[Monitors.adoptionBatch]]): day-ordered
  * replay must reproduce the `events_adoption_curve` batch query
  * exactly, under any day-aligned batch split, and crash-replay of a
  * batch must be idempotent — the same contract shape GrowthStreamSpec
  * pins for growth accounting.
  */
class AdoptionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, dir)
    .select(col("event_type"), col("user_id"), col("ts"),
      to_date(col("ts")).as("d"))
    .localCheckpoint(true)
  private lazy val days: Seq[java.sql.Date] =
    events.select(col("d")).distinct().orderBy("d")
      .as[java.sql.Date].collect().toSeq

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-adopt-$name").toString

  private def outRows(outDir: String): Set[(String, String, Long, Long)] =
    spark.read.parquet(outDir)
      .select(col("event_type"), col("day").cast("string"),
        col("new_adopters"), col("cum_adopters"))
      .as[(String, String, Long, Long)].collect().toSet

  private lazy val batchTruth: Set[(String, String, Long, Long)] =
    SparkEntry.queries("events_adoption_curve")(spark, dir)
      .select(col("event_type"), col("day").cast("string"),
        col("new_adopters"), col("cum_adopters"))
      .as[(String, String, Long, Long)].collect().toSet

  test("one-day-per-batch replay equals the batch query row for row") {
    val (store, out) = (tmp("a") + "/store", tmp("a") + "/out")
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.adoptionBatch(store, out)(
        events.where(col("d") === d), i.toLong)
    }
    val got = outRows(out)
    assert(got === batchTruth)
    // the curve is genuinely cumulative: cum never below new, and for
    // some type a later day strictly exceeds its first day's cum
    assert(got.forall { case (_, _, n, c) => c >= n && n > 0 })
    val byType = got.groupBy(_._1).view.mapValues(_.map(_._4))
    assert(byType.exists { case (_, cs) => cs.max > cs.min })
  }

  test("ten-day mega-batches produce the same accumulated output") {
    val (store, out) = (tmp("b") + "/store", tmp("b") + "/out")
    days.grouped(10).zipWithIndex.foreach { case (grp, i) =>
      Monitors.adoptionBatch(store, out)(
        events.where(col("d").isin(grp.map(_.toString): _*)), i.toLong)
    }
    assert(outRows(out) === batchTruth)
  }

  test("crash-replay of the last batch is idempotent") {
    val (store, out) = (tmp("c") + "/store", tmp("c") + "/out")
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.adoptionBatch(store, out)(
        events.where(col("d") === d), i.toLong)
    }
    val before = outRows(out)
    val last = days.last
    Monitors.adoptionBatch(store, out)(
      events.where(col("d") === last), (days.size - 1).toLong)
    Monitors.adoptionBatch(store, out)(
      events.where(col("d") === last), (days.size - 1).toLong)
    assert(outRows(out) === before)
  }
}
