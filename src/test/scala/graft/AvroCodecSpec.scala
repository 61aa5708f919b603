package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.functions.AvroCodec

/** The flat-record Avro codec: lossless roundtrip, corrupt→null DLQ
  * routing, codegen participation, and wire-format stability against
  * hand-assembled bytes (zigzag varints per the Avro spec — NOT
  * avro-generated, so a library behavior change fails loudly).
  */
class AvroCodecSpec extends SparkSpec {
  import spark.implicits._

  private val (toAvro, fromAvro) = AvroCodec.register(spark)

  test("roundtrip is lossless on the CDC fixture log, nulls included") {
    val log = cdc.Fixtures.employeeCdcLog(spark, "/root/testdata/sf0.001")
      // null out a string + a long on some rows to exercise the unions
      .withColumn("emp_city", when(col("emp_id") % 7 === 0, lit(null)).otherwise(col("emp_city")))
      .withColumn("emp_salary", when(col("emp_id") % 11 === 0, lit(null)).otherwise(col("emp_salary")))
    val st = StructType.fromDDL(
      "emp_id BIGINT, action STRING, emp_salary BIGINT, emp_city STRING")
    val src = log.select(col("emp_id"), col("action"), col("emp_salary"), col("emp_city"))
    val back = src.select(toAvro(struct(src.columns.map(col): _*)).as("v"))
      .select(fromAvro(col("v"), st).as("r")).select("r.*")
    assert(back.count() === src.count())
    assert(src.exceptAll(back).count() === 0 && back.exceptAll(src).count() === 0,
      "avro encode∘decode must be the identity")
  }

  test("corrupt bytes decode to null (the DLQ routing signal); valid bytes don't") {
    val st = StructType.fromDDL("a BIGINT, b STRING")
    val good = Seq((1L, "x"), (2L, "yy")).toDF("a", "b")
      .select(toAvro(struct(col("a"), col("b"))).as("v"))
    // truncate to 1 byte: a 2-field record can never fit
    val mixed = good.select(col("v"))
      .unionAll(good.limit(1).select(expr("substring(v, 1, 1)").as("v")))
      .select(fromAvro(col("v"), st).as("r"))
    assert(mixed.where(col("r").isNull).count() === 1)
    assert(mixed.where(col("r").isNotNull).count() === 2)
  }

  test("wire bytes match the Avro spec's zigzag varint layout (hand-assembled)") {
    // record {a: long=3, b: string="hi"} with nullable fields:
    // union index 1 (varint 0x02), zigzag(3)=6 (0x06),
    // union index 1, strlen zigzag(2)=4 (0x04), 'h','i'
    val bytes = Seq((3L, "hi")).toDF("a", "b")
      .select(toAvro(struct(col("a"), col("b"))).as("v"))
      .as[Array[Byte]].head()
    assert(bytes.toSeq === Seq[Byte](0x02, 0x06, 0x02, 0x04, 'h'.toByte, 'i'.toByte),
      "binary encoding drifted from the Avro 1.x spec layout " +
        "(every field canonically union{null,T} → index varint first)")
  }

  test("both directions run inside whole-stage codegen") {
    val st = StructType.fromDDL("a BIGINT, b STRING")
    // a range source, not a local relation — ConvertToLocalRelation
    // would otherwise fold the whole projection at plan time
    val df = spark.range(1).select((col("id") + 1).as("a"), lit("x").as("b"))
      .select(fromAvro(toAvro(struct(col("a"), col("b"))), st).as("r"))
      .select("r.*")
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` star prefix is the executedPlan notation for operators
    // running inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("*(1) Project") && l.contains("from_avro_flat")),
      s"avro codec must not break codegen:\n$plan")
    assert(df.as[(Long, String)].head() === ((1L, "x")))
  }

  test("timestamps ride as micros and come back exact") {
    val st = StructType.fromDDL("ts TIMESTAMP_NTZ, id BIGINT")
    val src = spark.sql(
      "SELECT TIMESTAMP_NTZ'2024-03-01 12:34:56.789012' AS ts, 7L AS id")
    val back = src.select(fromAvro(toAvro(struct(col("ts"), col("id"))), st).as("r"))
      .select("r.*")
    assert(back.collect() === src.collect())
  }

  test("SQL surface: from_avro_flat(bytes, ddl) via the session extension") {
    Seq((5L, "q")).toDF("a", "b").createOrReplaceTempView("avro_src")
    val out = spark.sql(
      """SELECT r.* FROM (
        |  SELECT from_avro_flat(to_avro_flat(struct(a, b)), 'a BIGINT, b STRING') AS r
        |  FROM avro_src)""".stripMargin)
    assert(out.collect().map(_.toString).toSeq === Seq("[5,q]"))
  }
}
