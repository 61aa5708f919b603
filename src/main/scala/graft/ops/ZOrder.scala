package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — multi-dimensional data layout for
  * scan pruning, the Delta/Iceberg `OPTIMIZE ZORDER BY` shape. A sort
  * on one column prunes scans filtered on that column only; bit-
  * interleaving two dimensions into one key makes RANGES of the key
  * correspond to RECTANGLES in (a, b) space, so range-partitioning +
  * sorting by z gives every output slice a tight min/max box on BOTH
  * dimensions, and a scan with a 2-d box predicate can skip every
  * file whose box misses it (parquet row-group stats give the same
  * skip within files).
  *
  * Scale shape: the z key is pure per-row bit arithmetic inside
  * whole-stage codegen (no shuffle added beyond the layout's own
  * range partitioning, which a rewrite pays once); the manifest is
  * one aggregation grouped by file; skip decisions read only the
  * manifest — the planner never touches data. ZOrderSpec demonstrates
  * the actual skip ratio on a written layout vs an unclustered one.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative columns:
    * a's bit i lands at 2i, b's at 2i+1. 2·bits ≤ 62 keeps the key in
    * a long; callers bucket/clamp wider dimensions first. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits $bits out of range")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** DuckDB mirror of [[zValue]] for oracle parity. */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"(((CAST($a AS BIGINT) >> $i) & 1) << ${2 * i}) | " +
        s"(((CAST($b AS BIGINT) >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Rewrite `df` into `n` z-clustered slices: range-partition by the
    * interleaved key, sort within each slice so parquet row-group
    * stats are tight too. Write the result with any file sink; pair
    * with [[manifest]] for skip decisions. */
  def layout(df: DataFrame, a: Column, b: Column, n: Int,
             bits: Int = 16): DataFrame =
    df.withColumn("z", zValue(a, b, bits))
      .repartitionByRange(n, col("z"))
      .sortWithinPartitions(col("z"))

  /** Per-file min/max manifest over `dims` — the stats a box-predicate
    * planner consults to skip files. One aggregation, grouped by file. */
  def manifest(df: DataFrame, dims: Seq[String]): DataFrame =
    df.withColumn("_file", input_file_name())
      .groupBy(col("_file"))
      .agg(count(lit(1)).as("rows"),
        dims.flatMap(d => Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d"))): _*)

  /** Files whose min/max box intersects `[lo, hi]` on every dim —
    * i.e. the files a pruning scan must actually read. */
  def filesForBox(man: DataFrame, box: Map[String, (Long, Long)]): DataFrame =
    box.foldLeft(man) { case (m, (d, (lo, hi))) =>
      m.where(col(s"max_$d") >= lo && col(s"min_$d") <= hi)
    }
}
