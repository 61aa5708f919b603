package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * All loaders are plain parquet scans so Catalyst can push filters and
  * prune columns into the file source. The only special case is `events`:
  * its `ts` column is parquet TIMESTAMP(NANOS), which Spark's vectorized
  * reader rejects by default — we read it as a long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a microsecond
  * timestamp, matching DuckDB's nanos→micros truncation so oracle
  * comparisons agree.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Session conf the library needs; our mains and the test harness set
    * it at session build. */
  val nanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** `events` with `ts` as a proper TimestampType (µs), truncated from the
    * stored nanoseconds exactly like DuckDB truncates on read.
    *
    * Defensive conf guard: reading TIMESTAMP(NANOS) parquet requires
    * [[nanosConf]]. Entry points set it at session creation (no
    * mid-query conf mutation); the guard fires for ad-hoc sessions that
    * skipped setup. Note it also overrides a conf explicitly set to
    * "false": [[nanosConf]] is a registered SQLConf entry, so an unset
    * conf and an explicit false are indistinguishable through
    * `RuntimeConfig` (both read as the default "false") — and this
    * loader cannot produce the `ts` column at all without the flag, so
    * setting it is strictly better than the PARQUET_TYPE_ILLEGAL crash
    * the "respect false" alternative yields.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get(nanosConf, "false") != "true")
      spark.conf.set(nanosConf, "true")
    load(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
