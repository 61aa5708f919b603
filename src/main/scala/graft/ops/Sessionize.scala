package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (extension operator,
  * SURVEY §7.4 — the `events` fixture is the target).
  *
  * Classic gaps-and-islands: a session break is a gap > `gapMicros`
  * between consecutive events of the same key; the session id is the
  * running count of breaks. Two window passes over one keyed shuffle —
  * both windows share the same partitioning so Spark plans a single
  * exchange. Scale note: state is bounded per key, no driver-side
  * work, and the shuffle key is the session key, so this survives a
  * 1000-executor scale-out unchanged; for streaming use
  * `session_window($"ts", gap)` instead (same semantics, state-store
  * backed).
  */
object Sessionize {
  /** Adds `session_id` (0-based per key, in time order). `tieBreak`
    * totalizes ordering for equal timestamps.
    */
  def withSessionId(events: DataFrame, key: Column, ts: Column,
                    gapMicros: Long, tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(key).orderBy((ts.asc +: tieBreak.map(_.asc)): _*)
    val us = unix_micros(ts.cast("timestamp"))
    val isBreak = when(us - lag(us, 1).over(w) > gapMicros, 1).otherwise(0)
    events
      .withColumn("session_id",
        sum(isBreak).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: bounds, event count, exact total of `valueCol`
    * summed as decimal (order-independent — double sums differ
    * run-to-run under parallel reduction) and emitted as a cents-scaled
    * BIGINT (`total_value_x100`), the canonicalization-stable wire type.
    */
  def sessionStats(events: DataFrame, key: Column, ts: Column,
                   gapMicros: Long, valueCol: Column,
                   tieBreak: Seq[Column] = Nil): DataFrame =
    withSessionId(events, key, ts, gapMicros, tieBreak)
      .groupBy(key.as("key"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        (sum(valueCol.cast("decimal(18,2)")) * lit(100)).cast("long").as("total_value_x100"))
}
