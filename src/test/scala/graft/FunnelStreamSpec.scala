package graft

import org.apache.spark.sql.functions._
import graft.streaming.Monitors

/** Streaming signup→click→purchase funnel ([[Monitors.funnelBatch]]):
  * day-ordered replay must reproduce the `events_funnel` batch query
  * exactly, under any day-aligned batch split, and crash-replay of a
  * batch must be idempotent — the GrowthStreamSpec contract shape.
  * The funnel-specific property the split exercises: the per-user
  * triple is a SUFFICIENT STATISTIC — a click seen before the user's
  * signup arrives must never enter the chain, and a click that
  * arrives in a later batch than the signup must (the conditional-min
  * chain folds across batch boundaries through the virtual events).
  */
class FunnelStreamSpec extends SparkSpec {
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
    java.nio.file.Files.createTempDirectory(s"graft-funnel-$name").toString

  private def outRows(outDir: String): Set[(String, Long)] =
    spark.read.parquet(outDir)
      .select(col("stage"), col("n_users").cast("long"))
      .as[(String, Long)].collect().toSet

  private lazy val batchTruth: Set[(String, Long)] =
    SparkEntry.queries("events_funnel")(spark, dir)
      .select(col("stage"), col("n_users").cast("long"))
      .as[(String, Long)].collect().toSet

  test("one-day-per-batch replay equals the batch query row for row") {
    val (store, out) = (tmp("a") + "/store", tmp("a") + "/out")
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.funnelBatch(store, out)(
        events.where(col("d") === d), i.toLong)
    }
    val got = outRows(out)
    assert(got === batchTruth)
    // the funnel genuinely narrows: each stage holds at least the next,
    // and the fixture converts at every stage
    val m = got.toMap
    assert(m("signup") >= m("click_after") &&
      m("click_after") >= m("purchase_after") && m("purchase_after") > 0)
  }

  test("ten-day mega-batches produce the same accumulated output") {
    val (store, out) = (tmp("b") + "/store", tmp("b") + "/out")
    days.grouped(10).zipWithIndex.foreach { case (grp, i) =>
      Monitors.funnelBatch(store, out)(
        events.where(col("d").isin(grp.map(_.toString): _*)), i.toLong)
    }
    assert(outRows(out) === batchTruth)
  }

  test("three seeded random day-aligned splits all reproduce the batch truth") {
    // "any day-aligned split" is the promise; the fixed one-day and
    // ten-day shapes leave the irregular middle untested. Seeded, so a
    // failure reproduces exactly.
    val rnd = new scala.util.Random(19L)
    for (trial <- 1 to 3) {
      val (store, out) = (tmp(s"r$trial") + "/store", tmp(s"r$trial") + "/out")
      // random cut points → contiguous runs of 1..n days
      val cuts = days.indices.tail.filter(_ => rnd.nextBoolean())
      val groups = (Seq(0) ++ cuts :+ days.size).sliding(2).toSeq
        .map { case Seq(a, b) => days.slice(a, b) }.filter(_.nonEmpty)
      groups.zipWithIndex.foreach { case (grp, i) =>
        Monitors.funnelBatch(store, out)(
          events.where(col("d").isin(grp.map(_.toString): _*)), i.toLong)
      }
      assert(outRows(out) === batchTruth, s"trial $trial groups=${groups.map(_.size)}")
    }
  }

  test("crash-replay of the last batch is idempotent") {
    val (store, out) = (tmp("c") + "/store", tmp("c") + "/out")
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.funnelBatch(store, out)(
        events.where(col("d") === d), i.toLong)
    }
    val before = outRows(out)
    assert(before === batchTruth)
    Monitors.funnelBatch(store, out)(
      events.where(col("d") === days.last), (days.size - 1).toLong)
    assert(outRows(out) === before)
  }
}
