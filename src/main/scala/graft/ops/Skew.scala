package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation patterns (SURVEY §7.4 scale notes; SCALE.md).
  *
  * Plain sums/counts are already skew-immune in Spark (map-side partial
  * aggregation), but *distinct* aggregates over a low-cardinality group
  * key concentrate every distinct value of the hottest group on one
  * reducer. The two-stage formulation shuffles on (group, value) first
  * — high combined cardinality spreads the hot group across all
  * partitions — then counts rows per group. AQE's skew handling splits
  * any residual hot partitions at runtime.
  */
object Skew {

  /** COUNT(DISTINCT value) per group, two-stage skew-safe form. NULLs
    * are excluded, matching SQL `COUNT(DISTINCT v)` (a bare
    * distinct+count would count NULL as a value). */
  def distinctCount(df: DataFrame, groupCols: Seq[Column], value: Column,
                    as: String = "n_distinct"): DataFrame =
    df.where(value.isNotNull)
      .select((groupCols :+ value.as("_v")): _*)
      .distinct() // shuffle on (group, value): hot groups spread by value
      .groupBy(groupCols: _*)
      .agg(count(lit(1)).as(as))

  /** Salted two-stage aggregation for additive aggregates whose payload
    * per group is heavy (e.g. building large per-group structures):
    * stage 1 aggregates (group, salt) buckets, stage 2 merges buckets.
    * For plain sum/count Spark's partial aggregation already does this;
    * the explicit form exists for aggregates without a map-side
    * combiner.
    */
  def saltedSum(df: DataFrame, groupCols: Seq[Column], value: Column,
                salts: Int, as: String = "total"): DataFrame =
    // salt = hash of the value: deterministic under task retries
    // (monotonically_increasing_id/spark_partition_id are not), spreads
    // a hot group across `salts` reducers whenever its values vary
    df.withColumn("_salt", pmod(hash(value), lit(salts)))
      .groupBy((groupCols :+ col("_salt")): _*)
      .agg(sum(value).as("_partial"))
      .groupBy(groupCols: _*)
      .agg(sum(col("_partial")).as(as))
}
