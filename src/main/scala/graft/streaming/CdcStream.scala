package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.cdc.{CdcWire, Routing}
import graft.sinks.Sinks.ParquetSnapshotStore

/** The streaming assembly (SURVEY §3.2 restated for Spark):
  * wire stream → decode → validate-split → [DLQ sink | latest-per-key →
  * snapshot merge].
  *
  * One `foreachBatch` handles both branches so the source is read once
  * per micro-batch (the persist/unpersist pair). Each batch is one
  * atomic merge into the snapshot — replacing the reference's
  * per-message autocommit (consumer.py:60-91) and its
  * commit-before-write loss window (§2.9): with checkpointing, a
  * crashed batch replays and the keyed merge is idempotent.
  *
  * Scale: the only shuffle per batch is the latest-per-key window keyed
  * by emp_id inside `store.merge`; DLQ and corrupt branches are
  * narrow filters appended columnar-ly. State lives in the snapshot
  * store, not the driver.
  */
object CdcStream {

  /** Start the pipeline from a Kafka-shaped (`key`,`value`) stream.
    *
    * @param wire      streaming DataFrame with a string `value` column
    * @param store     keyed snapshot destination (D1)
    * @param dlqPath   parquet dead-letter dir (K2 analog); receives both
    *                  validation failures and corrupt JSON
    * @param checkpoint checkpoint dir (replaces producer.py:15's
    *                  process-local watermark, which lost state on
    *                  restart — SURVEY §2.9)
    */
  def start(wire: DataFrame, store: ParquetSnapshotStore, dlqPath: String,
            checkpoint: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    wire.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, store, dlqPath)
      }
      .start()

  /** One micro-batch: decode, split, route. Factored out so batch
    * replays and tests hit the identical code path.
    */
  def applyBatch(batch: DataFrame, store: ParquetSnapshotStore, dlqPath: String): Unit = {
    val decoded = CdcWire.fromWire(batch).persist()
    try {
      val corrupt = decoded.where(col("corrupt"))
      val split = Routing.validateSplit(decoded.where(!col("corrupt")))
      val dlq = split.invalid
        .select(col("emp_id"), col("action"), col("emp_dob"), col("emp_salary"),
          col("last_updated_at"), col("bad_dob"), col("bad_salary"), col("bad_id"))
      dlq.write.mode("append").parquet(dlqPath)
      if (!corrupt.isEmpty)
        corrupt.select(col("emp_id"), col("action"), col("last_updated_at"))
          .write.mode("append").parquet(dlqPath + "_corrupt")
      val valid = split.valid.drop("corrupt")
      if (!valid.isEmpty)
        store.merge(valid, tsCol = "last_updated_at", tieBreak = Seq("action_id"))
    } finally decoded.unpersist()
  }
}
