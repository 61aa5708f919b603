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

  /** `events` with `ts` normalized to a proper TimestampType (µs)
    * regardless of how the fixture generation stored it. The driver's
    * fixtures have shipped `ts` three ways across rounds — parquet
    * TIMESTAMP(NANOS) (read as long under [[nanosConf]]), plain
    * timestamp[us] with no timezone (read as TIMESTAMP_NTZ), and a
    * session-tz TIMESTAMP — so the loader dispatches on the type Spark
    * actually read instead of assuming a vintage. All three converge on
    * the same instants under the UTC session every entry point sets, so
    * DuckDB oracle comparisons agree in each case.
    *
    * Defensive conf guard: reading TIMESTAMP(NANOS) parquet requires
    * [[nanosConf]]. Entry points set it at session creation (no
    * mid-query conf mutation); the guard fires for ad-hoc sessions that
    * skipped setup. Note it also overrides a conf explicitly set to
    * "false": [[nanosConf]] is a registered SQLConf entry, so an unset
    * conf and an explicit false are indistinguishable through
    * `RuntimeConfig` (both read as the default "false") — and the NANOS
    * vintage cannot be read at all without the flag, so setting it is
    * strictly better than the PARQUET_TYPE_ILLEGAL crash the "respect
    * false" alternative yields. Harmless for the other vintages (the
    * flag only affects NANOS columns).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    if (spark.conf.get(nanosConf, "false") != "true")
      spark.conf.set(nanosConf, "true")
    // Same defensive guard for the session timezone: the NTZ branch
    // below normalizes via cast(TimestampType), which interprets the
    // wall-clock in the SESSION zone — correct only under the UTC
    // session every entry point sets. An ad-hoc non-UTC session would
    // get silently shifted instants, so pin UTC here exactly like
    // nanosConf (the library's documented session contract is UTC;
    // oracle parity for every timestamp column depends on it).
    val tzConf = "spark.sql.session.timeZone"
    if (spark.conf.get(tzConf) != "UTC") spark.conf.set(tzConf, "UTC")
    val raw = load(spark, dir, "events")
    val norm = raw.schema("ts").dataType match {
      // TIMESTAMP(NANOS) vintage, surfaced as epoch-nanos long
      case LongType         => expr("timestamp_micros(ts div 1000)")
      // timestamp[us] without timezone: reinterpret the wall-clock in
      // the (UTC) session zone — identical instant, TimestampType out
      case TimestampNTZType => col("ts").cast(TimestampType)
      case _                => col("ts")
    }
    raw.withColumn("ts", norm)
  }
}
