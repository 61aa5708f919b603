package graft

import org.apache.spark.sql.functions._
import graft.streaming.Monitors

/** Streaming cohort retention ([[Monitors.retentionBatch]]):
  * day-ordered replay must reproduce the `events_retention` batch
  * query exactly, under any day-aligned batch split, and crash-replay
  * of a batch must be idempotent — the GrowthStreamSpec /
  * AdoptionStreamSpec contract shape. The one retention-specific
  * wrinkle the one-day split exercises for real: a user's weekly
  * activity often arrives BEFORE their signup event (same week,
  * earlier day), so the incremental sink must backfill the
  * newly-cohorted user's already-seen presence into the matrix — a
  * cell-recompute path the adoption twin doesn't have.
  */
class RetentionStreamSpec extends SparkSpec {
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
    java.nio.file.Files.createTempDirectory(s"graft-reten-$name").toString

  private def outRows(outDir: String): Set[(String, Long, Long)] =
    spark.read.parquet(outDir)
      .select(col("cohort_week").cast("string"),
        col("week_offset").cast("long"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet

  private lazy val batchTruth: Set[(String, Long, Long)] =
    SparkEntry.queries("events_retention")(spark, dir)
      .select(col("cohort_week").cast("date").cast("string"),
        col("week_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet

  test("one-day-per-batch replay equals the batch query row for row") {
    val (store, out) = (tmp("a") + "/store", tmp("a") + "/out")
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.retentionBatch(store, out)(
        events.where(col("d") === d), i.toLong)
    }
    val got = outRows(out)
    assert(got === batchTruth)
    // the matrix is genuinely a matrix: some cohort retains users past
    // its signup week, and offset-0 rows exist for every cohort
    assert(got.nonEmpty && got.forall(_._3 > 0))
    assert(got.exists(_._2 > 0))
    val cohorts = got.map(_._1)
    assert(cohorts.forall(c => got.exists(t => t._1 == c && t._2 == 0L)))
  }

  test("week-spanning mega-batches produce the same accumulated output") {
    val (store, out) = (tmp("b") + "/store", tmp("b") + "/out")
    days.grouped(10).zipWithIndex.foreach { case (grp, i) =>
      Monitors.retentionBatch(store, out)(
        events.where(col("d").isin(grp.map(_.toString): _*)), i.toLong)
    }
    assert(outRows(out) === batchTruth)
  }

  test("three seeded random day-aligned splits all reproduce the batch truth") {
    // same hardening as FunnelStreamSpec: the irregular middle between
    // the one-day and ten-day shapes, seeded for reproducibility — and
    // for retention specifically, random cuts vary WHERE in a week the
    // signup/activity boundary lands, exercising the newly-cohorted
    // backfill at arbitrary offsets
    val rnd = new scala.util.Random(19L)
    for (trial <- 1 to 3) {
      val (store, out) = (tmp(s"r$trial") + "/store", tmp(s"r$trial") + "/out")
      val cuts = days.indices.tail.filter(_ => rnd.nextBoolean())
      val groups = (Seq(0) ++ cuts :+ days.size).sliding(2).toSeq
        .map { case Seq(a, b) => days.slice(a, b) }.filter(_.nonEmpty)
      groups.zipWithIndex.foreach { case (grp, i) =>
        Monitors.retentionBatch(store, out)(
          events.where(col("d").isin(grp.map(_.toString): _*)), i.toLong)
      }
      assert(outRows(out) === batchTruth, s"trial $trial groups=${groups.map(_.size)}")
    }
  }

  test("late signup moves a cohort earlier; retentionBackfill repairs to exact") {
    // the one arrival-order violation the incremental path can NOT
    // absorb: a user already cohorted by a later signup gains an
    // EARLIER one — their emitted cells keep the old week_offset. The
    // fixture has 15 users with signups in ≥2 distinct weeks, so
    // withholding the first week's signups genuinely moves cohorts.
    val (store, out) = (tmp("late") + "/store", tmp("late") + "/out")
    val cutoff = days(math.min(7, days.size - 1))
    val isLate = col("event_type") === "signup" && col("d") < cutoff
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.retentionBatch(store, out)(
        events.where(col("d") === d && !isLate), i.toLong)
    }
    Monitors.retentionBatch(store, out)(
      events.where(isLate), days.size.toLong)
    val stale = outRows(out)
    assert(stale !== batchTruth,
      "fixture produced no moved-earlier cohort — tune the cutoff")
    val presence = spark.read.parquet(s"$store/presence")
      .select(col("user_id"), col("week"))
    val signup = spark.read.parquet(s"$store/signup")
      .select(col("user_id"), col("sig_week"))
    Monitors.retentionBackfill(presence, signup)
      .write.mode("overwrite").parquet(out)
    assert(outRows(out) === batchTruth)
  }

  test("driven by a real StreamingQuery: checkpointed restart mid-stream stays exact") {
    // the other tests call the foreachBatch body directly with manual
    // batch ids; this one wires it through an actual MemoryStream →
    // writeStream.foreachBatch query, stops it halfway, restarts a NEW
    // query from the same checkpoint (which may re-fire the last
    // uncommitted batch — the idempotence contract under the engine's
    // own replay), and feeds the rest
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val base = tmp("q")
    val (store, out, ckpt) = (base + "/store", base + "/out", base + "/ckpt")
    val byDay: Map[java.sql.Date, Seq[(String, Long, java.sql.Timestamp)]] =
      events.select(col("event_type"), col("user_id"),
          col("ts").cast("timestamp"), col("d"))
        .as[(String, Long, java.sql.Timestamp, java.sql.Date)]
        .collect().toSeq.groupBy(_._4)
        .view.mapValues(_.map(t => (t._1, t._2, t._3))).toMap
    val input = MemoryStream[(String, Long, java.sql.Timestamp)]
    def startQ() = input.toDF().toDF("event_type", "user_id", "ts")
      .writeStream.outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch(Monitors.retentionBatch(store, out) _)
      .start()
    val (firstHalf, secondHalf) = days.splitAt(days.size / 2)
    var q = startQ()
    firstHalf.foreach { d => input.addData(byDay(d)); q.processAllAvailable() }
    q.stop()
    q = startQ()
    secondHalf.foreach { d => input.addData(byDay(d)); q.processAllAvailable() }
    q.processAllAvailable()
    q.stop()
    assert(outRows(out) === batchTruth)
  }

  test("crash-replay of the last batch is idempotent") {
    val (store, out) = (tmp("c") + "/store", tmp("c") + "/out")
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.retentionBatch(store, out)(
        events.where(col("d") === d), i.toLong)
    }
    val before = outRows(out)
    assert(before === batchTruth)
    Monitors.retentionBatch(store, out)(
      events.where(col("d") === days.last), (days.size - 1).toLong)
    assert(outRows(out) === before)
  }
}
