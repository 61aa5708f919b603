package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record-linkage blocking primitives: the scalable exact GLOBAL RANK
  * and the sorted-neighborhood candidate generator built on it
  * (Hernández & Stolfo, "The merge/purge problem for large
  * databases", SIGMOD 1995). The deletion-neighborhood channel lives
  * in the `customers_record_linkage` query; this file holds the
  * complementary classic: sort everything by a key, slide a window of
  * `w` neighbors, verify inside the window.
  */
object Linkage {

  /** Exact global dense row rank (1-based) by `sortCols` — WITHOUT a
    * single-partition window. The classic distributed ranking shape:
    * range-repartition on the sort key (disjoint ordered ranges per
    * partition), rank locally inside each partition (a KEYED window —
    * partitioned by the physical partition id), then add per-partition
    * prefix offsets computed on the |partitions|-row count summary
    * (the only global window in the plan, dimension-sized by
    * construction, broadcast back).
    *
    * `sortCols` must be a deterministic total order (include a
    * tiebreaker id): range partitioning keeps equal keys together,
    * but row_number over a tied order would be nondeterministic.
    */
  def globalRank(df: DataFrame, sortCols: Column*): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // PINNED before fan-out, not an optimization: the offsets branch
    // and the join branch both consume this frame, and two physical
    // instantiations of a range exchange may SAMPLE different
    // boundaries — offsets computed against one branch's _pid layout
    // would then be joined onto the other's, yielding duplicate and
    // gapped ranks (observed as run-to-run nondeterminism before the
    // pin). The materialization is the classic two-pass ranking's
    // first pass, not overhead.
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lr", row_number().over(
        Window.partitionBy(col("_pid")).orderBy(sortCols: _*)).cast("long"))
      .localCheckpoint(true)
    val offsets = ranged.groupBy(col("_pid")).agg(count(lit(1)).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(
        Window.partitionBy(lit(1)).orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    ranged.join(broadcast(offsets), "_pid")
      .withColumn("rank", col("_off") + col("_lr"))
      .drop("_pid", "_lr", "_off")
  }

  /** Exact GLOBAL RUNNING SUM of `value` in `sortCols` order —
    * [[globalRank]]'s two-pass discipline extended from counts to
    * sums: range-repartition on the sort key, per-partition running
    * sums (a KEYED window), then per-partition prefix offsets from
    * the |partitions|-row total summary (the only global window,
    * dimension-sized, broadcast back). Adds `cum` = Σ value over all
    * rows at-or-before this one in the total order. The naive form —
    * `SUM(v) OVER (ORDER BY …)` with no partition — funnels the table
    * through one task; this is its distributed equivalent, exactly,
    * and the primitive exact weighted quantiles / Lorenz curves /
    * cumulative-share cuts stand on at 100 TB.
    *
    * `sortCols` must be a deterministic total order (include a
    * tiebreaker id) — same contract as [[globalRank]]. `value` must
    * already be an integral column: "exact" is the operator's whole
    * contract, so a decimal/double weight is rejected here (schema
    * check, plan-time) rather than silently truncated by the long
    * cast — callers carrying money scale to cents FIRST. */
  def globalRunningSum(df: DataFrame, value: Column,
                       sortCols: Column*): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val vt = df.select(value).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vt),
      s"globalRunningSum is exact-integer only; got $vt — cast to a " +
        "scaled long (e.g. cents) before calling")
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // pinned before fan-out for the same reason as globalRank: the
    // offsets branch and the join branch must see ONE range layout
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_v", value.cast("long"))
      .withColumn("_lc", sum(col("_v")).over(
        Window.partitionBy(col("_pid")).orderBy(sortCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true)
    val offsets = ranged.groupBy(col("_pid")).agg(sum(col("_v")).as("_n"))
      .withColumn("_off", coalesce(sum(col("_n")).over(
        Window.partitionBy(lit(1)).orderBy(col("_pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_pid"), col("_off"))
    ranged.join(broadcast(offsets), "_pid")
      .withColumn("cum", col("_off") + col("_lc"))
      .drop("_pid", "_v", "_lc", "_off")
  }

  /** Sorted-neighborhood candidate pairs: every (a, b) whose ranks
    * under `sortCols` differ by at most `w` (0 < rank_b − rank_a ≤ w).
    * The rank-bucket equi-join formulation: bucket width = w, so any
    * in-window pair sits in the same or adjacent buckets — two keyed
    * joins, block size 2w, never a cross join. Returns the input
    * columns twice (suffixed `_a`/`_b`) plus both ranks.
    */
  def snmCandidates(df: DataFrame, w: Int, sortCols: Column*): DataFrame = {
    require(w >= 1, "window must be at least 1")
    val ranked = df.transform(globalRank(_, sortCols: _*))
      .withColumn("_bkt", expr(s"(rank - 1) div $w"))
      .localCheckpoint(true) // both join sides of both bucket passes
    val cols = df.columns
    def side(sfx: String) = ranked.select(
      (cols.map(c => col(c).as(s"$c$sfx")) :+
        col("rank").as(s"rank$sfx") :+ col("_bkt").as(s"_bkt$sfx")): _*)
    val a = side("_a"); val b = side("_b")
    val same = a.join(b, col("_bkt_a") === col("_bkt_b"))
    val adj = a.join(b, col("_bkt_a") + 1 === col("_bkt_b"))
    same.unionByName(adj)
      .where(col("rank_b") > col("rank_a") &&
        col("rank_b") - col("rank_a") <= w)
      .drop("_bkt_a", "_bkt_b")
  }
}
