package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match points (key, ts) to intervals
  * (key, start, end) with ts ∈ [start, end].
  *
  * Spark-first shape: a naive range join is an equi-join on the key
  * with a range residual — one hot key degenerates to
  * |points|·|intervals| inside the key. Instead, time is cut into
  * fixed-width buckets: each interval explodes to the buckets it
  * spans, each point lands in exactly one bucket, and the join is a
  * plain equi-join on (key, bucket) followed by the exact range
  * filter. Cost ∝ |points| + Σ(interval span / width), never the
  * per-key cross product, and each (point, interval) pair is produced
  * at most once (a point has one bucket) — no dedup pass.
  *
  * `bucketMicros` is the cost dial: ≈ the typical interval length is
  * a good default (1 bucket row per interval, 1 probe per point).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      ptTs: String, start: String, end: String,
                      bucketMicros: Long): DataFrame = {
    val p = points.withColumn("_b",
      floor(unix_micros(col(ptTs).cast("timestamp")) / bucketMicros).cast("long"))
    val iv = intervals
      // corrupt rows guard: end < start would explode to a DESCENDING
      // bucket sequence (sequence(5,3) counts down), and an extreme
      // span could exceed Spark's array-length limit and fail the job
      .where(col(start) <= col(end))
      .withColumn("_bs",
        floor(unix_micros(col(start).cast("timestamp")) / bucketMicros).cast("long"))
      .withColumn("_be",
        floor(unix_micros(col(end).cast("timestamp")) / bucketMicros).cast("long"))
      .withColumn("_b", explode(expr("sequence(_bs, _be)")))
      .drop("_bs", "_be")
    p.join(iv, keys :+ "_b")
      .where(col(ptTs) >= col(start) && col(ptTs) <= col(end))
      .drop("_b")
  }
}
