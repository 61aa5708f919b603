package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One output row of [[Monitors.cusumMonitor]]: the running one-sided
  * CUSUM statistics and alarm flags after folding `day`'s count. */
case class CusumPoint(key: String, day: java.sql.Date, n: Long, dev_x100: Long,
    cusum_pos: Long, cusum_neg: Long, alarm_hi: Boolean, alarm_lo: Boolean)

/** Continuous sequential monitors — the streaming twins of the batch
  * audit queries (`events_cusum` etc.), same family discipline as
  * [[CorpusStream]]: exact integer state, deterministic under replay,
  * O(1) state per key.
  */
object Monitors {

  /** Streaming one-sided CUSUM changepoint monitor (Page, Biometrika
    * 1954) — the CONTINUOUS form of `events_cusum`. The batch query
    * scales deviations by the in-hand series (dev = n·D − N, the
    * retrospective audit); a stream has no final N/D, so the
    * sequential contract is Page's actual one: deviations against a
    * FIXED target rate (`dev = 100·n − target_x100` per period,
    * exact cents-style integers), alarms when either one-sided
    * accumulation crosses `threshold_x100`. State per key is THREE
    * longs — running sum S, running min of S, running max of S — and
    * the one-sided resets ride the same prefix-extrema identity the
    * batch form uses (`CUSUM⁺ = S − min(0, min S)`), so batch and
    * stream agree fold-for-fold on identical input order.
    *
    * Input contract: one row per (key, day, n) — the CLOSED daily
    * aggregate (upstream is a watermarked window count; this monitor
    * folds finalized periods, it does not re-open days). Rows within
    * a micro-batch fold in day order, so replaying a batch reproduces
    * identical outputs (the [[CorpusStream]] determinism rule).
    *
    * Scale shape: state is O(1) per monitored key, sharded by key;
    * no timeout needed — an idle key holds 24 bytes forever, and the
    * alarm history lives in the output stream, not the state.
    */
  def cusumMonitor(daily: DataFrame, targetX100: Long,
      thresholdX100: Long): Dataset[CusumPoint] = {
    import daily.sparkSession.implicits._
    daily.select(col("key").cast("string").as("key"),
        col("day").cast("date").as("day"), col("n").cast("long").as("n"))
      .as[(String, java.sql.Date, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, rows: Iterator[(String, java.sql.Date, Long)],
         state: GroupState[(Long, Long, Long)]) => {
          var (s, minS, maxS) =
            if (state.exists) state.get else (0L, 0L, 0L)
          val out = rows.toSeq.sortBy(_._2.toLocalDate.toEpochDay).map {
            case (_, day, n) =>
              val dev = 100L * n - targetX100
              s += dev
              minS = math.min(minS, s)
              maxS = math.max(maxS, s)
              val pos = s - math.min(0L, minS)
              val neg = math.max(0L, maxS) - s
              CusumPoint(key, day, n, dev, pos, neg,
                pos > thresholdX100, neg > thresholdX100)
          }
          state.update((s, minS, maxS))
          out.iterator
        })
  }
}
