package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.cdc.{CdcEvent, CdcWire}
import graft.sinks.Sinks.ParquetSnapshotStore
import graft.streaming.{CdcStream, StatefulApply}

/** Ad-hoc dev scratch main (not part of the library surface). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("drive2").toString
    val wireDir = s"$root/wire"; Files.createDirectories(Paths.get(wireDir))
    def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:0$i")
    def writeWire(events: Seq[CdcEvent], name: String): Unit = {
      val lines = CdcWire.toWire(events.toDF())
        .select(to_json(struct(col("key"), col("value")))).as[String].collect()
      Files.write(Paths.get(s"$wireDir/$name"), String.join("\n", lines: _*).getBytes)
    }
    writeWire(Seq(
      CdcEvent(0, 1L, "Alice", "J", "2012-04-10", "SF", 80000L, "insert", ts(1)),
      CdcEvent(0, 2L, "Emma", "W", "2015-07-01", "Boston", 72000L, "insert", ts(2)),
      CdcEvent(0, 3L, "Bob", "K", "2013-02-02", "SF", 50000L, "insert", ts(3))), "b1.json")
    Thread.sleep(1100)
    writeWire(Seq(
      CdcEvent(0, 1L, "Alice", "J", "2012-04-10", "SF", 90000L, "update", ts(5)),
      CdcEvent(0, 2L, "Emma", "W", "2015-07-01", "Boston", 0L, "delete", ts(6))), "b2.json")

    val store = new ParquetSnapshotStore(spark, s"$root/snapshot", Seq("emp_id"))
    val q = CdcStream.start(
      graft.sources.CdcSources.wireJsonStream(spark, wireDir, 1),
      store, s"$root/dlq", s"$root/ckpt", totalsPath = Some(s"$root/totals"))
    q.awaitTermination(120000)
    println("== snapshot:"); spark.read.parquet(s"$root/snapshot").orderBy("emp_id").show(false)
    println("== D2 totals (after update+delete retraction):")
    spark.read.parquet(s"$root/totals").orderBy("emp_city").show(false)

    // stateful apply over a rate-limited real stream (mapGroupsWithState)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CdcEvent]
    val sq = StatefulApply.latestPerKeyStream(mem.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("state_drive").start()
    mem.addData(CdcEvent(0, 7L, "A", "B", "2010-01-01", "X", 10L, "insert", ts(1)))
    sq.processAllAvailable()
    mem.addData(CdcEvent(1, 7L, "A", "B", "2010-01-01", "X", 20L, "update", ts(2)))
    sq.processAllAvailable()
    sq.stop()
    println("== stateful emissions:")
    spark.table("state_drive").show(false)
    spark.stop()
  }
}
