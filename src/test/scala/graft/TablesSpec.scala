package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The fixture vintage problem: the driver regenerates the testdata
  * parquet between rounds, and `events.ts` has shipped as parquet
  * TIMESTAMP(NANOS) (surfacing as epoch-nanos LONG under
  * `nanosAsLong`), as timestamp[us] with no timezone (TIMESTAMP_NTZ),
  * and could plausibly ship as a session-tz TIMESTAMP. A loader pinned
  * to one vintage silently breaks every downstream events/cdc query
  * when the vintage flips (exactly what zeroed 44 queries in round 9).
  * This spec pins [[Tables.events]] to normalize all three to the same
  * TimestampType instants.
  */
class TablesSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  // 2024-01-01T00:00:07.179575Z — the first instant in the real fixture
  private val micros = 1704067207179575L

  private def writeAndLoad(dir: String): org.apache.spark.sql.DataFrame = {
    Tables.events(spark, dir)
  }

  private def baseRow(ts: Any): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(1L, ts, 7L, "click", 1.5, "{}")

  private def schemaWith(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  private def check(dir: String): Unit = {
    val got = writeAndLoad(dir)
    assert(got.schema("ts").dataType === TimestampType,
      s"ts must normalize to TimestampType, got ${got.schema("ts").dataType}")
    val inst = got.select(unix_micros(col("ts"))).head.getLong(0)
    assert(inst === micros, s"instant drifted: $inst != $micros")
  }

  test("events loader normalizes epoch-nanos LONG vintage (TIMESTAMP(NANOS) under nanosAsLong)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_long").toString
    spark.createDataFrame(List(baseRow(micros * 1000L)).asJava, schemaWith(LongType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir)
  }

  test("events loader normalizes TIMESTAMP_NTZ vintage (timestamp[us], no timezone)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_ntz").toString
    spark.createDataFrame(
        List(baseRow(java.time.LocalDateTime.ofEpochSecond(
          micros / 1000000L, (micros % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))).asJava,
        schemaWith(TimestampNTZType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir)
  }

  test("events loader passes through session-tz TIMESTAMP vintage") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ev_ts").toString
    spark.createDataFrame(
        List(baseRow(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          micros / 1000000L, (micros % 1000000L) * 1000L)))).asJava,
        schemaWith(TimestampType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir)
  }

  test("real fixture loads with TimestampType ts and non-zero rows") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.where(col("ts").isNotNull).count() > 0)
  }
}
