package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.Monitors

/** Streaming growth accounting ([[Monitors.growthAccountBatch]]):
  * day-ordered replay must reproduce the batch query exactly, under
  * any day-aligned batch split, and crash-replay of a batch must be
  * idempotent.
  */
class GrowthStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val events = Tables.events(spark, dir)
    .select(col("user_id"), col("ts"), to_date(col("ts")).as("d"))
    .localCheckpoint(true)
  private lazy val days: Seq[java.sql.Date] =
    events.select(col("d")).distinct().orderBy("d")
      .as[java.sql.Date].collect().toSeq

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-growth-$name").toString

  private def outRows(outDir: String): Set[(String, Long, Long, Long, Long, Long)] =
    spark.read.parquet(outDir)
      .select(col("day").cast("string"), col("n_active"), col("n_new"),
        col("n_returning"), col("n_resurrected"), col("n_churned"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

  private lazy val batchTruth: Set[(String, Long, Long, Long, Long, Long)] =
    SparkEntry.queries("events_growth_accounting")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

  test("one-day-per-batch replay equals the batch query row for row") {
    val (store, out) = (tmp("a") + "/store", tmp("a") + "/out")
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.growthAccountBatch(store, out)(
        events.where(col("d") === d), i.toLong)
    }
    val got = outRows(out)
    assert(got === batchTruth && got.size === days.size)
    // the decomposition reconciles and every kind actually occurs
    assert(got.forall { case (_, a, n, r, rs, _) => a == n + r + rs })
    assert(got.exists(_._4 > 0) && got.exists(_._5 > 0) && got.exists(_._6 > 0))
  }

  test("ten-day mega-batches produce the same accumulated output") {
    val (store, out) = (tmp("b") + "/store", tmp("b") + "/out")
    days.grouped(10).zipWithIndex.foreach { case (grp, i) =>
      Monitors.growthAccountBatch(store, out)(
        events.where(col("d").isin(grp.map(_.toString): _*)), i.toLong)
    }
    assert(outRows(out) === batchTruth)
  }

  test("late arrival stales neighbors; growthBackfill over the store repairs to exact") {
    // the scaladoc's documented failure + recovery, end to end:
    // one third of a middle day's users arrive AFTER the last day
    val (store, out) = (tmp("late") + "/store", tmp("late") + "/out")
    val lateDay = days(days.size / 2)
    val isLate = col("d") === lateDay && col("user_id") % 3 === 0
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.growthAccountBatch(store, out)(
        events.where(col("d") === d && !isLate), i.toLong)
    }
    Monitors.growthAccountBatch(store, out)(
      events.where(isLate), days.size.toLong)
    // the late batch rewrote ONLY its own day — neighbors are stale
    // (the fixture has daily-active users, so withholding a third of a
    // day genuinely moves the neighbor labels)
    val stale = outRows(out)
    assert(stale !== batchTruth, "fixture too sparse to stale a neighbor")
    // the repair: the batch query over the store's presence rows, which
    // are append-complete regardless of arrival order
    val presence = spark.read.parquet(store).select(col("user_id"), col("day"))
    val repaired = Monitors.growthBackfill(presence)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try repaired.write.mode("overwrite").partitionBy("day").parquet(out)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    assert(outRows(out) === batchTruth)
  }

  test("crash-replay of the last batch is idempotent") {
    val (store, out) = (tmp("c") + "/store", tmp("c") + "/out")
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.growthAccountBatch(store, out)(
        events.where(col("d") === d), i.toLong)
    }
    val before = outRows(out)
    // replay the final day twice more, as a post-crash restart would
    val last = days.last
    Monitors.growthAccountBatch(store, out)(
      events.where(col("d") === last), (days.size - 1).toLong)
    Monitors.growthAccountBatch(store, out)(
      events.where(col("d") === last), (days.size - 1).toLong)
    assert(outRows(out) === before)
  }
}
