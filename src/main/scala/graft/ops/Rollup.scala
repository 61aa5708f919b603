package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance via MERGEABLE partial aggregates —
  * the materialized-view refresh pattern a 100 TB warehouse actually
  * runs. Facts reduce ONCE into per-(bucket, key) partial rows whose
  * state re-aggregates losslessly (count, sum, min, max — the same
  * algebra every mergeable sketch follows); the partial table is tiny
  * relative to facts, an incremental refresh recomputes only the
  * buckets that received new data, and every coarser grain (or the
  * global total) merges from partials without re-reading a single
  * fact row.
  *
  * Scale shape: `partials` is one keyed aggregation over facts with
  * map-side combine (the only pass that sees fact volume);  `merge`
  * aggregates the partial table — orders of magnitude smaller — so
  * re-grains are effectively free. Correctness rests on the partial
  * state being a commutative monoid: merge(partials(A) ∪ partials(B))
  * ≡ direct(A ∪ B) for ANY split of the facts, which is exactly what
  * the registered query's oracle pins (a two-slice union against the
  * direct one-pass aggregate). Averages and other ratios derive from
  * (sum, count) at read time — never stored, so they stay mergeable.
  */
object Rollup {

  /** One mergeable partial row per (bucket, keys...): count, sum, min,
    * max of `value`. `value` should already be an exact type (long /
    * decimal) — floats would make the sum order-dependent. */
  def partials(df: DataFrame, bucket: Column, keys: Seq[Column],
               value: Column): DataFrame =
    df.groupBy((bucket.as("bucket") +: keys): _*)
      .agg(count(lit(1)).as("p_n"), sum(value).as("p_sum"),
        min(value).as("p_min"), max(value).as("p_max"))

  /** Merge partials up to the `keys` grain (folding all buckets). The
    * input may be any union of disjoint partial sets — refresh slices,
    * per-day increments, per-source shards. */
  def merge(partialRows: DataFrame, keys: Seq[Column]): DataFrame =
    partialRows.groupBy(keys: _*)
      .agg(sum(col("p_n")).cast("long").as("n"),
        // no cast: sum(long) is already long, and a decimal p_sum must
        // merge losslessly — casting here would silently truncate
        // fractional decimal totals
        sum(col("p_sum")).as("total"),
        min(col("p_min")).as("vmin"), max(col("p_max")).as("vmax"))
}
