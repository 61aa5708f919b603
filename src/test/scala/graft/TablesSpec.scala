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

  // ---- orders/lineitem date-column vintages -------------------------
  // Same drift class as events.ts, canonical type TIMESTAMP_NTZ (what
  // every TPC-H query and DuckDB mirror compares against). Each test
  // writes one plausible vintage and pins the loaded wall-clock.

  // 1998-07-22T00:00:00 — a representative o_orderdate wall-clock
  private val dayMicros = 901065600000000L
  private val dayLdt = java.time.LocalDateTime.ofEpochSecond(
    dayMicros / 1000000L, 0, java.time.ZoneOffset.UTC)

  private def ordersSchemaWith(dt: DataType): StructType = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", dt), StructField("o_orderpriority", StringType)))

  private def ordersRow(d: Any): org.apache.spark.sql.Row =
    org.apache.spark.sql.Row(1L, 2L, "O", 10.0, d, "1-URGENT")

  private def checkOrders(dir: String): Unit = {
    val got = Tables.orders(spark, dir)
    assert(got.schema("o_orderdate").dataType === TimestampNTZType,
      s"o_orderdate must normalize to TIMESTAMP_NTZ, got ${got.schema("o_orderdate").dataType}")
    val wall = got.select(col("o_orderdate").cast("string")).head.getString(0)
    assert(wall === "1998-07-22 00:00:00", s"wall-clock drifted: $wall")
  }

  private def writeOrders(tag: String, dt: DataType, v: Any): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ord_$tag").toString
    spark.createDataFrame(List(ordersRow(v)).asJava, ordersSchemaWith(dt))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("orders loader passes through TIMESTAMP_NTZ vintage (current)") {
    checkOrders(writeOrders("ntz", TimestampNTZType, dayLdt))
  }

  test("orders loader normalizes epoch-nanos LONG vintage") {
    checkOrders(writeOrders("long", LongType, dayMicros * 1000L))
  }

  test("orders loader normalizes session-tz TIMESTAMP vintage") {
    checkOrders(writeOrders("ts", TimestampType,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(dayMicros / 1000000L))))
  }

  test("orders loader normalizes DATE vintage to midnight NTZ") {
    checkOrders(writeOrders("date", DateType,
      java.sql.Date.valueOf(dayLdt.toLocalDate)))
  }

  test("lineitem loader normalizes DATE-vintage l_shipdate to midnight NTZ") {
    val dir = java.nio.file.Files.createTempDirectory("graft_li_date").toString
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType), StructField("l_quantity", DoubleType),
      StructField("l_shipdate", DateType)))
    spark.createDataFrame(
        List(org.apache.spark.sql.Row(1L, 5.0, java.sql.Date.valueOf(dayLdt.toLocalDate))).asJava,
        schema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Tables.lineitem(spark, dir)
    assert(got.schema("l_shipdate").dataType === TimestampNTZType)
    val wall = got.select(col("l_shipdate").cast("string")).head.getString(0)
    assert(wall === "1998-07-22 00:00:00", s"wall-clock drifted: $wall")
  }

  // ---- documents/embeddings width vintages --------------------------

  test("embeddings loader pins float64 embedding vintage back to ARRAY<FLOAT> and widths") {
    val dir = java.nio.file.Files.createTempDirectory("graft_emb_f64").toString
    val schema = StructType(Seq(
      StructField("vec_id", IntegerType),
      StructField("embedding", ArrayType(DoubleType)),
      StructField("label", LongType)))
    spark.createDataFrame(
        List(org.apache.spark.sql.Row(7, Seq(0.25, -1.5), 3L)).asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Tables.embeddings(spark, dir)
    assert(got.schema("vec_id").dataType === LongType)
    assert(got.schema("label").dataType === IntegerType)
    assert(got.schema("embedding").dataType === ArrayType(FloatType, containsNull = true))
    val r = got.select(col("vec_id"), col("embedding"), col("label")).head
    assert(r.getLong(0) === 7L)
    assert(r.getSeq[Float](1) === Seq(0.25f, -1.5f))
    assert(r.getInt(2) === 3)
  }

  test("documents loader widens int32 id/count vintage to BIGINT") {
    val dir = java.nio.file.Files.createTempDirectory("graft_doc_i32").toString
    val schema = StructType(Seq(
      StructField("doc_id", IntegerType), StructField("text", StringType),
      StructField("n_chars", IntegerType)))
    spark.createDataFrame(
        List(org.apache.spark.sql.Row(5, "hello", 5)).asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Tables.documents(spark, dir)
    assert(got.schema("doc_id").dataType === LongType)
    assert(got.schema("n_chars").dataType === LongType)
    assert(got.select(col("doc_id")).head.getLong(0) === 5L)
  }

  test("real orders/lineitem fixtures load with NTZ date columns") {
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    val l = Tables.lineitem(spark, "/root/testdata/sf0.001")
    assert(o.schema("o_orderdate").dataType === TimestampNTZType)
    assert(l.schema("l_shipdate").dataType === TimestampNTZType)
    assert(o.count() > 0 && l.count() > 0)
  }
}
