package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.cdc.CdcEvent

/** State-store-backed apply-changes (SURVEY §7.3): the
  * `mapGroupsWithState` formulation of A2 for continuous streams, where
  * per-key state must live across micro-batches without re-reading the
  * snapshot.
  *
  * Per key the state is the latest event seen (last-write-wins by
  * (last_updated_at, action_id)); each batch emits the key's current
  * resolved row. Downstream, `action == "delete"` rows mean "key gone" —
  * the same contract `mergeIntoSnapshot` consumes.
  *
  * Scale: state is one row per live key, sharded by the stream's
  * groupBy shuffle — the 100 TB sizing knob is key cardinality, not
  * event volume. For bounded-lateness eviction switch the timeout to
  * `EventTimeTimeout` + `withWatermark` upstream.
  */
object StatefulApply {

  private[streaming] def newer(a: CdcEvent, b: CdcEvent): CdcEvent = {
    val c = a.last_updated_at.compareTo(b.last_updated_at)
    if (c > 0 || (c == 0 && a.action_id >= b.action_id)) a else b
  }

  def latestPerKeyStream(events: Dataset[CdcEvent]): Dataset[CdcEvent] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.emp_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[CdcEvent], state: GroupState[CdcEvent]) =>
          val latest = (state.getOption.iterator ++ it).reduce(newer)
          state.update(latest)
          latest
      }
  }

  /** [[latestPerKeyStream]] with state TTL: a key idle past
    * `idleMs` of event time is EVICTED once the watermark passes its
    * timeout, and its final resolved row is emitted with
    * `action = "expired"` so downstream can flush/compact it. This is
    * the unbounded-key-churn form: without eviction, state grows with
    * every key ever seen; with it, state is bounded by keys active
    * within the TTL window — the knob a 100 TB deployment actually
    * tunes. Event-time timeout (not processing-time), so replays and
    * stalls can't expire keys early.
    */
  def latestPerKeyStreamTtl(events: Dataset[CdcEvent], watermarkDelay: String,
                            idleMs: Long): Dataset[CdcEvent] = {
    import events.sparkSession.implicits._
    events.withWatermark("last_updated_at", watermarkDelay)
      .groupByKey(_.emp_id)
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[CdcEvent], state: GroupState[CdcEvent]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last.copy(action = "expired")
          } else {
            val latest = (state.getOption.iterator ++ it).reduce(newer)
            state.update(latest)
            state.setTimeoutTimestamp(latest.last_updated_at.getTime + idleMs)
            latest
          }
      }
  }

  /** Late/duplicate hardening for the wire stream (SURVEY §2.9): bound
    * state with an event-time watermark and drop redelivered events
    * (same key + event time) inside it. The reference's watermark
    * tie-drop bug (producer.py:33 `>` comparison) loses ties instead —
    * here ties dedup, not vanish.
    */
  def withLateDataHandling(events: Dataset[CdcEvent], delay: String): Dataset[CdcEvent] =
    events.withWatermark("last_updated_at", delay)
      .dropDuplicates("emp_id", "last_updated_at")
}
