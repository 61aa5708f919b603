package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.cdc.CdcEvent

/** The `transformWithState` (state API v2, Spark 4.x) formulation of
  * the stateful A2 apply — same contract as
  * [[StatefulApply.latestPerKeyStream]], expressed against the API a
  * new deployment should target: typed named state handles
  * (`ValueState`), explicit `TimeMode`/`OutputMode` declared by the
  * processor, per-state TTL config, and timers — instead of the single
  * opaque `GroupState` blob of `mapGroupsWithState`.
  *
  * Why both exist here: v2 runs only on the RocksDB state store
  * provider ([[requiredConfs]]), which is also the provider a 100 TB
  * deployment runs anyway (changelog checkpointing, bounded memory —
  * state spills off-heap instead of living on the JVM heap like the
  * default HDFS-backed map). The v1 form stays for default-provider
  * compatibility; both are gated by the same cross-batch spec
  * scenario so their semantics cannot drift apart.
  *
  * Scale shape: identical to v1 — state is one row per live key,
  * sharded by the groupBy shuffle; the sizing knob is live-key
  * cardinality. Idle-key TTL ([[latestPerKeyStreamTtl]]) uses v2's
  * first-class event-time TIMERS (`registerTimer` +
  * `handleExpiredTimer`) instead of v1's hand-rolled
  * `setTimeoutTimestamp`; `TTLConfig` per-state expiry also exists
  * but is processing-time, the wrong clock for replay-safe eviction.
  */
object StatefulApplyV2 {

  /** transformWithState requires the RocksDB state store provider;
    * callers (and the spec) set these on the session before starting
    * the query. */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  private class LatestProcessor
      extends StatefulProcessor[Long, CdcEvent, CdcEvent] {
    @transient private var latest: ValueState[CdcEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[CdcEvent]("latest",
        Encoders.product[CdcEvent], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CdcEvent],
                                 timers: TimerValues): Iterator[CdcEvent] = {
      val seed =
        if (latest.exists()) Iterator.single(latest.get()) else Iterator.empty
      val resolved = (seed ++ rows).reduce(StatefulApply.newer)
      latest.update(resolved)
      Iterator.single(resolved)
    }
  }

  /** Latest-wins keyed apply over a continuous stream; each batch
    * emits the current resolved row per touched key (Update mode). */
  def latestPerKeyStream(events: Dataset[CdcEvent]): Dataset[CdcEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.emp_id)
      .transformWithState(new LatestProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** [[LatestProcessor]] + idle-key TTL via REAL event-time timers —
    * the v2 form of [[StatefulApply.latestPerKeyStreamTtl]]'s
    * hand-rolled `setTimeoutTimestamp`. Each key keeps exactly one
    * live timer at `latest.last_updated_at + idleMs`: an arriving
    * event deletes the stale timer and re-arms (timers are a keyed
    * SET in v2 — an orphaned old deadline would still fire and evict
    * a key that had fresh data). When the watermark passes the
    * deadline the runtime calls [[handleExpiredTimer]], which emits
    * the key's final resolved row as an `action = "expired"`
    * tombstone and clears the state — the same downstream contract
    * as v1, gated by the same spec scenario. */
  private class LatestTtlProcessor(idleMs: Long)
      extends StatefulProcessor[Long, CdcEvent, CdcEvent] {
    @transient private var latest: ValueState[CdcEvent] = _

    private def deadline(e: CdcEvent): Long = e.last_updated_at.getTime + idleMs

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[CdcEvent]("latest",
        Encoders.product[CdcEvent], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[CdcEvent],
                                 timers: TimerValues): Iterator[CdcEvent] = {
      val prev = if (latest.exists()) Some(latest.get()) else None
      val resolved = (prev.iterator ++ rows).reduce(StatefulApply.newer)
      latest.update(resolved)
      prev.map(deadline).filter(_ != deadline(resolved))
        .foreach(getHandle.deleteTimer)
      getHandle.registerTimer(deadline(resolved))
      Iterator.single(resolved)
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[CdcEvent] =
      if (!latest.exists()) Iterator.empty
      else {
        val last = latest.get()
        latest.clear()
        Iterator.single(last.copy(action = "expired"))
      }
  }

  /** [[latestPerKeyStream]] with event-time state TTL: a key idle past
    * `idleMs` evicts once the watermark passes its deadline, emitting
    * an `action = "expired"` tombstone carrying its final resolved
    * state. Event-time timers (not processing time), so replays and
    * stalls cannot expire keys early; state stays bounded by keys
    * active within the TTL window — the knob an unbounded-key-churn
    * deployment tunes. */
  def latestPerKeyStreamTtl(events: Dataset[CdcEvent], watermarkDelay: String,
                            idleMs: Long): Dataset[CdcEvent] = {
    import events.sparkSession.implicits._
    events.withWatermark("last_updated_at", watermarkDelay)
      .groupByKey(_.emp_id)
      .transformWithState(new LatestTtlProcessor(idleMs),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
