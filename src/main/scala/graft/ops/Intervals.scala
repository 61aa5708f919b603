package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval / sweep-line primitives over ±1 boundary events.
  *
  * The classic sweep (sort all boundaries, running sum) is a total
  * order per day — correct, but a single window partition per day
  * means one task owns a hot day's entire boundary list. The form
  * here is the two-pass subdivision (the same trick as
  * [[Linkage.globalRank]]'s range-repartition + per-partition
  * offsets, specialized to time): running sums are computed inside
  * (day, hour-bucket) partitions, and each bucket's starting offset
  * is the prefix sum of earlier buckets' deltas — a day-keyed window
  * over the ≤ 25-row-per-day bucket summary, never the boundary list.
  * A day with 10⁹ sessions at 100 TB fans across 25 tasks instead of
  * one, and the reduction is exact, not approximate.
  */
object Intervals {

  /** Max concurrent open intervals per day from boundary events
    * `(day DATE, t TIMESTAMP, delta ±1)`, with `t` in
    * `[day 00:00, day+1 00:00]` (a midnight-split segment's closing
    * boundary lands on the NEXT midnight and gets its own bucket 24,
    * after every within-day bucket — bucket = whole hours since the
    * day's midnight, NOT `hour(t)`, exactly so that boundary sorts
    * last). Ties order +1 before −1 at equal `t` (inclusive overlap);
    * within an equal (t, delta) block every permutation yields the
    * same prefix-sum set, so the result is partitioning-exact — the
    * two-pass decomposition reproduces the single-sweep prefix sums
    * bucket by bucket (offset + local run = global run).
    *
    * Timezone contract: `CAST(day AS TIMESTAMP)` resolves midnight in
    * the SESSION timezone, so the "≤ 25 buckets per day" bound and
    * the bucket-24 midnight reasoning assume fixed 24-hour days —
    * true under UTC (this library pins `spark.sql.session.timeZone`
    * to UTC in its entry points) and any non-DST zone. Under a
    * DST-bearing zone a 23/25-hour day shifts bucket labels by one;
    * CORRECTNESS survives regardless (`hb` stays monotone in `t`, so
    * the two-pass decomposition still reproduces the sweep), only the
    * bucket-count prose weakens to ≤ 26.
    *
    * Returns one row per day: (day, max_concurrent, n_bounds).
    */
  def maxConcurrentPerDay(bounds: DataFrame): DataFrame = {
    // integer div, not `/`: long `/` promotes to double, and the sweep
    // must not hinge on float rounding at bucket boundaries
    val hb = expr(
      "(unix_micros(t) - unix_micros(CAST(day AS TIMESTAMP))) div 3600000000")
    val wLocal = Window.partitionBy(col("day"), col("hb"))
      .orderBy(col("t").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hourly = bounds
      .withColumn("hb", hb)
      .withColumn("run", sum(col("delta")).over(wLocal))
      .groupBy(col("day"), col("hb"))
      .agg(sum(col("delta")).as("hour_sum"),
        max(col("run")).as("hour_max"),
        count(lit(1)).as("n"))
    // the only day-wide window: ≤ 25 rows per day (one per bucket)
    val wDay = Window.partitionBy(col("day")).orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hourly
      .withColumn("off", coalesce(sum(col("hour_sum")).over(wDay), lit(0L)))
      .groupBy(col("day"))
      .agg(max(col("off") + col("hour_max")).as("max_concurrent"),
        sum(col("n")).as("n_bounds"))
  }
}
