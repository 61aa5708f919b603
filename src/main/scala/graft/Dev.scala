package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cdc.{CdcEvent, CdcWire}
import graft.sinks.Sinks.ParquetSnapshotStore
import graft.streaming.CdcStream

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

    val root = Files.createTempDirectory("drive").toString
    val wireDir = s"$root/wire"; Files.createDirectories(Paths.get(wireDir))
    def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:0$i")
    def writeWire(events: Seq[CdcEvent], name: String): Unit = {
      val lines = CdcWire.toWire(events.toDF())
        .select(to_json(struct(col("key"), col("value")))).as[String].collect()
      Files.write(Paths.get(s"$wireDir/$name"), String.join("\n", lines: _*).getBytes)
    }
    writeWire(Seq(
      CdcEvent(0, 1L, "Alice", "Johnson", "2012-04-10", "San Francisco", 80000L, "insert", ts(1)),
      CdcEvent(0, 2L, "Emma", "Wood", "2015-07-01", "Boston", 72000L, "insert", ts(2)),
      CdcEvent(0, 3L, "Too", "Low", "2000-01-01", "LA", 50L, "insert", ts(3))), "b1.json")
    Thread.sleep(1100)
    writeWire(Seq(
      CdcEvent(0, 1L, "Alice", "Johnson", "2012-04-10", "San Francisco", 75000L, "update", ts(6)),
      CdcEvent(0, 1L, "Alice", "Johnson", "2012-04-10", "San Francisco", 75000L, "delete", ts(7))), "b2.json")

    val store = new ParquetSnapshotStore(spark, s"$root/snapshot", Seq("emp_id"))
    val wire = graft.sources.CdcSources.wireJsonStream(spark, wireDir, maxFilesPerTrigger = 1)
    val q = CdcStream.start(wire, store, s"$root/dlq", s"$root/ckpt")
    q.awaitTermination(120000)
    println("== root=" + root)
    println("== snapshot:")
    spark.read.parquet(s"$root/snapshot").show(false)
    println("== dlq:")
    spark.read.parquet(s"$root/dlq").show(false)
    // restart the stream with no new data: checkpoint should no-op, state unchanged
    val q2 = CdcStream.start(
      graft.sources.CdcSources.wireJsonStream(spark, wireDir, 1), store, s"$root/dlq", s"$root/ckpt")
    q2.awaitTermination(120000)
    println("== snapshot after idempotent restart:")
    spark.read.parquet(s"$root/snapshot").show(false)
    println("== dlq rows after restart: " + spark.read.parquet(s"$root/dlq").count())
    spark.stop()
  }
}
