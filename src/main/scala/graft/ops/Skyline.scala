package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline / Pareto frontier (Börzsönyi, Kossmann & Stocker,
  * "The Skyline Operator", ICDE 2001): the points no other row beats
  * on both axes — minimize `x`, maximize `y`. Equal (x, y) duplicates
  * survive together as one point with `n_rows` > 1.
  *
  * The two-phase partitioned formulation from the distributed-skyline
  * literature: phase 1 collapses same-x peers and computes LOCAL
  * prefix maxima inside x-bucket partitions (a keyed window, never a
  * global sort of the data); phase 2 prefix-maxes the ONE-row-per-
  * bucket summary (the only global window, dimension-sized by
  * construction) and broadcasts it back, so each row compares against
  * its bucket's local prefix max AND all lower buckets' global max.
  */
object Skyline {

  /** Frontier of `df` minimizing `x`, maximizing `y`. Returns
    * (x, y, n_rows) ordered by x; strictly monotone by construction.
    * `bucketOf` maps x to a coarse bucket id (default x div 100) —
    * correctness never depends on it, only partition balance; choose
    * finer buckets for denser x domains.
    */
  def frontier2d(df: DataFrame, x: Column, y: Column,
      bucketOf: Column => Column = c => floor(c / 100).cast("long")):
      DataFrame = {
    val g = df.groupBy(x.as("x"), y.as("y")).agg(count(lit(1)).as("n_rows"))
    val tp = g.withColumn("rn", row_number().over(
        Window.partitionBy(col("x")).orderBy(col("y").desc)))
      .where(col("rn") === 1)
      .withColumn("bucket", bucketOf(col("x")))
    val wLocal = Window.partitionBy(col("bucket")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // pinned: the summary branch and the final filter both read it,
    // and recomputing the bucket exchange twice wastes the wide pass
    val local = tp.withColumn("prev_local", max(col("y")).over(wLocal))
      .localCheckpoint(true)
    val summary = local.groupBy(col("bucket"))
      .agg(max(col("y")).as("bmax"))
      .withColumn("prev_buckets", max(col("bmax")).over(
        Window.partitionBy(lit(1)).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"), col("prev_buckets"))
    local.join(broadcast(summary), Seq("bucket"))
      .where(col("y") > greatest(
        coalesce(col("prev_local"), lit(Long.MinValue)),
        coalesce(col("prev_buckets"), lit(Long.MinValue))))
      .select(col("x"), col("y"), col("n_rows"))
      .orderBy("x")
  }
}
