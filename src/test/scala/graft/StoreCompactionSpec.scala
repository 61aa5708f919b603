package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.Monitors

/** [[Monitors.compactStore]] — long-horizon maintenance for the
  * foreachBatch twins' batchId-partitioned stores. Pins the contract
  * the scaladoc promises: compacting committed batches mid-stream
  * changes NO downstream output (growth accounting and the funnel,
  * the two store shapes — raw presence vs sufficient-statistic),
  * replay of a post-compaction batch stays idempotent, double-compact
  * converges, and the partition count actually shrinks (the point of
  * the operation).
  */
class StoreCompactionSpec extends SparkSpec {
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
    java.nio.file.Files.createTempDirectory(s"graft-compact-$name").toString

  private def partitions(storeSub: String): Seq[String] =
    Option(new java.io.File(storeSub).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).toSeq.sorted

  private def growthRows(outDir: String): Set[(String, Long, Long, Long, Long, Long)] =
    spark.read.parquet(outDir)
      .select(col("day").cast("string"), col("n_active"), col("n_new"),
        col("n_returning"), col("n_resurrected"), col("n_churned"))
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet

  private def funnelRows(outDir: String): Set[(String, Long)] =
    spark.read.parquet(outDir)
      .select(col("stage"), col("n_users").cast("long"))
      .as[(String, Long)].collect().toSet

  test("growth store: mid-stream compaction changes no later output") {
    val (sA, oA) = (tmp("ga") + "/store", tmp("ga") + "/out")
    val (sB, oB) = (tmp("gb") + "/store", tmp("gb") + "/out")
    val k = days.size / 2
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.growthAccountBatch(sA, oA)(events.where(col("d") === d), i.toLong)
      Monitors.growthAccountBatch(sB, oB)(events.where(col("d") === d), i.toLong)
      if (i == k) {
        // batches ≤ k-1 are committed (k is the latest) — compact them;
        // the presence store's read-side fold is distinct()
        Monitors.compactStore(spark, sB, (k - 1).toLong)(_.distinct())
        assert(partitions(sB).size === 2,
          s"expected [compacted, current], got ${partitions(sB)}")
      }
    }
    assert(growthRows(oB) === growthRows(oA))
  }

  test("funnel stores: compaction + post-compaction replay stay exact") {
    val (sA, oA) = (tmp("fa") + "/store", tmp("fa") + "/out")
    val (sB, oB) = (tmp("fb") + "/store", tmp("fb") + "/out")
    val k = days.size / 2
    val stateMerge: DataFrame => DataFrame = df => df.groupBy(col("user_id"))
      .agg(min(col("t_signup")).as("t_signup"), min(col("t_click")).as("t_click"),
        min(col("t_purchase")).as("t_purchase"))
    val deltaMerge: DataFrame => DataFrame = df => df
      .agg(sum(col("d_signup")).as("d_signup"), sum(col("d_click")).as("d_click"),
        sum(col("d_purchase")).as("d_purchase"))
    days.zipWithIndex.foreach { case (d, i) =>
      Monitors.funnelBatch(sA, oA)(events.where(col("d") === d), i.toLong)
      Monitors.funnelBatch(sB, oB)(events.where(col("d") === d), i.toLong)
      if (i == k) {
        Monitors.compactStore(spark, s"$sB/state", (k - 1).toLong)(stateMerge)
        Monitors.compactStore(spark, s"$sB/delta", (k - 1).toLong)(deltaMerge)
      }
    }
    assert(funnelRows(oB) === funnelRows(oA))
    assert(funnelRows(oA) ===
      SparkEntry.queries("events_funnel")(spark, dir)
        .select(col("stage"), col("n_users").cast("long"))
        .as[(String, Long)].collect().toSet)
    // crash-replay of the last (uncompacted) batch on the compacted store
    val before = funnelRows(oB)
    Monitors.funnelBatch(sB, oB)(
      events.where(col("d") === days.last), (days.size - 1).toLong)
    assert(funnelRows(oB) === before)
  }

  test("double-compact converges and is a no-op on an empty range") {
    val s = tmp("dc") + "/store"
    val o = tmp("dc") + "/out"
    days.take(6).zipWithIndex.foreach { case (d, i) =>
      Monitors.growthAccountBatch(s, o)(events.where(col("d") === d), i.toLong)
    }
    val rows = growthRows(o)
    Monitors.compactStore(spark, s, 4L)(_.distinct())
    val onceParts = partitions(s)
    val onceStore = spark.read.parquet(s).drop("batch").distinct().count()
    Monitors.compactStore(spark, s, 4L)(_.distinct())
    assert(partitions(s) === onceParts)
    assert(spark.read.parquet(s).drop("batch").distinct().count() === onceStore)
    // compacting a range with no partitions is a no-op
    Monitors.compactStore(spark, s + "/nowhere", 99L)(_.distinct())
    // and the already-emitted output is untouched by any of it
    assert(growthRows(o) === rows)
  }

  // --- crash-window recovery for a SUM-folded store (the delta-store
  // shape the r19 fold-absorbs-duplicates argument was FALSE for: a
  // SUM cannot absorb a duplicated source partition, so correctness
  // rides entirely on the manifest protocol below) ---

  private def sumStore(): String = {
    val s = tmp("crash") + "/store"
    (0 to 3).foreach { b =>
      Seq(("k", 1L)).toDF("k", "v").coalesce(1)
        .write.mode("overwrite").parquet(s"$s/batch=$b")
    }
    s
  }
  private val sumMerge: DataFrame => DataFrame =
    df => df.groupBy(col("k")).agg(sum(col("v")).as("v"))
  private def storeSum(s: String): Long =
    spark.read.parquet(s).agg(sum(col("v"))).head.getLong(0)

  /** Manufacture the post-commit crash state: a COMPLETE `.compact-tmp`
    * holding the fold of batches 0..2 plus the published manifest. */
  private def plantCommit(s: String): Unit = {
    sumMerge(spark.read.parquet(s"$s/batch=0", s"$s/batch=1", s"$s/batch=2"))
      .coalesce(1).write.mode("overwrite").parquet(s"$s/.compact-tmp")
    val w = new java.io.PrintWriter(s"$s/.compact-manifest")
    try { w.println("upTo=2"); (0 to 2).foreach(b => w.println(s"batch=$b")) }
    finally w.close()
  }

  test("SUM store: crash after manifest commit, before deletes — re-run is exact") {
    val s = sumStore()
    plantCommit(s)
    Monitors.compactStore(spark, s, 2L)(sumMerge)
    assert(partitions(s) === Seq("batch=2", "batch=3"))
    assert(storeSum(s) === 4L, "fold must appear exactly once, never doubled")
  }

  test("SUM store: crash mid-source-deletes — re-run is exact") {
    val s = sumStore()
    plantCommit(s)
    // the crashed run already deleted one recorded source
    def rmr(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rmr); f.delete(); ()
    }
    rmr(new java.io.File(s"$s/batch=0"))
    Monitors.compactStore(spark, s, 2L)(sumMerge)
    assert(partitions(s) === Seq("batch=2", "batch=3"))
    assert(storeSum(s) === 4L,
      "resume must replay the recorded deletes, not re-fold partial sources")
  }

  test("SUM store: crash after promote with a stale manifest — re-run just clears it") {
    val s = sumStore()
    plantCommit(s)
    Monitors.compactStore(spark, s, 2L)(sumMerge) // completes the plant
    // re-plant ONLY the manifest (promotion already happened, no tmp)
    val w = new java.io.PrintWriter(s"$s/.compact-manifest")
    try { w.println("upTo=2"); (0 to 2).foreach(b => w.println(s"batch=$b")) }
    finally w.close()
    Monitors.compactStore(spark, s, 2L)(sumMerge)
    assert(!new java.io.File(s"$s/.compact-manifest").exists())
    assert(storeSum(s) === 4L)
  }

  test("pending compaction to a different upTo fails loudly") {
    val s = sumStore()
    plantCommit(s)
    val e = intercept[IllegalArgumentException] {
      Monitors.compactStore(spark, s, 3L)(sumMerge)
    }
    assert(e.getMessage.contains("batch=2"))
    // and the prescribed re-run finishes the pending work
    Monitors.compactStore(spark, s, 2L)(sumMerge)
    assert(storeSum(s) === 4L)
  }
}
