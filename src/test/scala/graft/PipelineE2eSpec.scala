package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.cdc.{CdcEvent, CdcWire}
import graft.sinks.Sinks.ParquetSnapshotStore
import graft.streaming.CdcStream

/** The reference DAG's five-step sequence — setup → seed the 7 golden
  * mutations → produce (change log → keyed-JSON wire) → consume
  * (streaming validate/route/apply) → verification scan — run
  * end-to-end through the PUBLIC API and gated on the golden end
  * state. `PipelineDemo` performs the same sequence as a demo main;
  * this spec makes the contract a test: destination = exactly the
  * Emma Wood row, DLQ = exactly the three planted invalid events, and
  * the D2 totals table reflects the post-delete snapshot.
  *
  * Reference semantics: the seed mutations and end state mirror the
  * reference's DAG fixtures (`airflow_dags/project2_dag.py:99-156`) —
  * Alice inserts, updates, then deletes (net absent); Emma persists;
  * the too-low salary, pre-1940 DOB, and negative id rows route to
  * the DLQ and never touch the destination.
  */
class PipelineE2eSpec extends SparkSpec {

  test("reference DAG sequence: seed -> produce -> consume -> verify " +
    "reaches the golden end state through the public API") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-e2e").toString
    val wireDir = s"$root/wire"
    Files.createDirectories(Paths.get(wireDir))
    def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:0$i")

    // seed: the DAG's 7 mutations
    val mutations = Seq(
      CdcEvent(0, 1L, "Alice", "Johnson", "2012-04-10", "San Francisco", 80000L, "insert", ts(1)),
      CdcEvent(0, 2L, "Emma", "Wood", "2015-07-01", "Boston", 72000L, "insert", ts(2)),
      CdcEvent(0, 3L, "Too", "Low", "2000-01-01", "LA", 50L, "insert", ts(3)),
      CdcEvent(0, 4L, "Too", "Old", "1900-01-01", "San Jose", 50000L, "insert", ts(4)),
      CdcEvent(0, -100L, "Wrong", "ID", "2000-01-01", "Chicago", 45000L, "insert", ts(5)),
      CdcEvent(0, 1L, "Alice", "Johnson", "2012-04-10", "San Francisco", 75000L, "update", ts(6)),
      CdcEvent(0, 1L, "Alice", "Johnson", "2012-04-10", "San Francisco", 75000L, "delete", ts(7)))

    // produce: change log -> keyed-JSON wire files (K1 shape)
    val wireLines = CdcWire.toWire(mutations.toDF())
      .select(to_json(struct(col("key"), col("value")))).as[String].collect()
    Files.write(Paths.get(s"$wireDir/batch.json"),
      String.join("\n", wireLines: _*).getBytes)
    assert(wireLines.length == 7, "every mutation reaches the wire")

    // consume: stream -> validate/route -> snapshot + DLQ + totals
    val store = new ParquetSnapshotStore(spark, s"$root/snapshot", Seq("emp_id"))
    val q = CdcStream.start(
      graft.sources.CdcSources.wireJsonStream(spark, wireDir),
      store, s"$root/dlq", s"$root/ckpt", totalsPath = Some(s"$root/totals"))
    assert(q.awaitTermination(120000),
      "the consume stream must terminate within the timeout")

    // verification scan: golden end state
    val dest = store.load().get
      .select($"emp_id", $"emp_FN", $"emp_LN", $"emp_city", $"emp_salary")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(dest == Seq((2L, "Emma", "Wood", "Boston", 72000L)),
      "destination must hold exactly the Emma Wood row " +
        "(Alice inserted, updated, then deleted; invalid rows routed)")
    val dlqIds = spark.read.parquet(s"$root/dlq")
      .select($"emp_id").as[Long].collect().toSet
    assert(dlqIds == Set(3L, 4L, -100L),
      "DLQ must hold exactly the low-salary, pre-1940-DOB, and " +
        "negative-id events")
    // D2 totals derive from the MERGED snapshot, so Alice's deleted
    // salary is retracted and only Emma's city survives
    val totals = spark.read.parquet(s"$root/totals")
      .select($"emp_city", $"total_salary", $"n_emps")
      .as[(String, Long, Long)].collect().toSeq
    assert(totals == Seq(("Boston", 72000L, 1L)),
      "totals must reflect the post-delete snapshot state")
  }
}
