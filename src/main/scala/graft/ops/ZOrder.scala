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

  /** Interleave the low `bits` bits of k non-negative columns: column
    * j's bit i lands at position i·k + j. k·bits ≤ 62 keeps the key
    * in a long; callers bucket/clamp wider dimensions first. */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val k = dims.size
    require(k >= 2, s"need >= 2 dims, got $k")
    require(bits >= 1 && k * bits <= 62, s"$k dims x $bits bits overflow a long")
    val longs = dims.map(_.cast("long"))
    (for {
      i <- 0 until bits
      (d, j) <- longs.zipWithIndex
    } yield shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_ bitwiseOR _)
  }

  /** 2-d [[zValueN]]: a's bit i lands at 2i, b's at 2i+1. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** DuckDB mirror of [[zValueN]] for oracle parity. */
  def zValueNSql(dims: Seq[String], bits: Int): String = {
    val k = dims.size
    (for {
      i <- 0 until bits
      (d, j) <- dims.zipWithIndex
    } yield s"(((CAST($d AS BIGINT) >> $i) & 1) << ${i * k + j})")
      .mkString("(", " | ", ")")
  }

  /** DuckDB mirror of [[zValue]] for oracle parity. */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    zValueNSql(Seq(a, b), bits)

  /** Rewrite `df` into `n` z-clustered slices: range-partition by the
    * interleaved key, sort within each slice so parquet row-group
    * stats are tight too, then DROP the key — the written files keep
    * the input schema (like OPTIMIZE ZORDER, the clustering key is
    * layout, not data; the projection preserves partitioning and
    * intra-partition order). Write the result with any file sink;
    * pair with [[manifest]] for skip decisions. */
  def layout(df: DataFrame, a: Column, b: Column, n: Int,
             bits: Int = 16): DataFrame = {
    // collision-proof internal name: a user column named "z" must
    // survive the layout rewrite untouched
    val zk = "__graft_z"
    df.withColumn(zk, zValue(a, b, bits))
      .repartitionByRange(n, col(zk))
      .sortWithinPartitions(col(zk))
      .drop(zk)
  }

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
