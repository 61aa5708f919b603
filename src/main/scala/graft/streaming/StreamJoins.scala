package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins with bounded state.
  *
  * The canonical use is attribution-style enrichment: a right-side
  * event (click) joins the left-side event (impression) it follows
  * within a time window. Spark requires BOTH a watermark on each side
  * and a time-range join condition so the state store can evict: a
  * left row is held only until `leftTs + window` falls behind the
  * right watermark, and vice versa — state is bounded by
  * rate × (window + watermark delay), never by stream length. Without
  * the range condition the join would buffer both streams forever,
  * the stream-stream version of an unbounded cartesian.
  *
  * At 100 TB/day scale the state store shards by the join key exactly
  * like a batch shuffle; skewed keys are bounded by the same window —
  * a hot key holds window-length state, not history.
  */
object StreamJoins {

  /** Interval join: rows match when keys are equal and
    * `right.ts ∈ [left.ts, left.ts + windowSeconds]`.
    *
    * `joinType` "inner" emits matches as they arrive; "left_outer"
    * additionally emits unmatched left rows (right columns null) once
    * the watermark proves no match can still arrive — the streaming
    * form of "impressions that never converted".
    *
    * Input frames must NOT already carry conflicting column names
    * other than `key`; output disambiguates the two timestamp columns
    * as `<leftTs>` / `<rightTs>` (caller picks distinct names).
    */
  def intervalJoin(left: DataFrame, leftTs: String, leftDelay: String,
                   right: DataFrame, rightTs: String, rightDelay: String,
                   key: String, windowSeconds: Long,
                   joinType: String = "inner"): DataFrame = {
    require(leftTs != rightTs, "left and right timestamp columns must have distinct names")
    val l = left.withWatermark(leftTs, leftDelay).alias("l")
    val r = right.withWatermark(rightTs, rightDelay).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") +
          expr(s"INTERVAL $windowSeconds SECONDS"),
      joinType)
      .drop(col(s"r.$key"))
  }

  /** Stream-static dimension enrichment. Stateless: no watermark, no
    * state store — each micro-batch joins against the static side, so
    * the only scale knob is the dim itself (broadcast when bounded, as
    * here; a huge dim falls back to a per-batch shuffle join). Left
    * join so stream rows without a dim entry pass through with nulls
    * instead of silently vanishing mid-pipeline.
    *
    * Dim freshness caveat: a PLAIN parquet DataFrame snapshots its
    * file listing at read time — overwriting the directory mid-query
    * serves stale rows or fails on deleted files. Mid-query dim
    * refresh needs a snapshot-re-resolving table format or a
    * `foreachBatch` that re-reads the dim per batch; with a fixed dim
    * (this test's case) the plain frame is correct.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
