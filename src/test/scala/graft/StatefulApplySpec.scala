package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.cdc.CdcEvent
import graft.streaming.StatefulApply

/** State-store A2 (`mapGroupsWithState`) across micro-batches. */
class StatefulApplySpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = Timestamp.valueOf(f"2024-01-01 00:00:0$i")
  private def ev(id: Long, sal: Long, action: String, i: Int, aid: Int = 0) =
    CdcEvent(aid, id, s"FN$id", s"LN$id", "2012-04-10", "City", sal, action, ts(i))

  test("state carries the latest row per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val out = StatefulApply.latestPerKeyStream(input.toDS())
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("stateful_out").start()

    input.addData(ev(1, 100, "insert", 1), ev(2, 200, "insert", 2))
    q.processAllAvailable()
    input.addData(ev(1, 150, "update", 3))
    q.processAllAvailable()
    input.addData(ev(2, 0, "delete", 4), ev(1, 140, "update", 2)) // late, older than ts(3)
    q.processAllAvailable()
    q.stop()

    // last emission per key reflects the state-resolved latest event
    val rows = spark.table("stateful_out").as[CdcEvent].collect()
    val lastPerKey = rows.zipWithIndex.groupBy(_._1.emp_id)
      .map { case (k, v) => k -> v.maxBy(_._2)._1 }
    assert(lastPerKey(1L).emp_salary === 150L) // late update did not regress state
    assert(lastPerKey(1L).action === "update")
    assert(lastPerKey(2L).action === "delete")
  }

  test("watermark + dropDuplicates dedups redelivered events") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val out = StatefulApply.withLateDataHandling(input.toDS(), "10 minutes")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_out").start()
    val e = ev(1, 100, "insert", 1)
    input.addData(e, e) // duplicate within one batch
    q.processAllAvailable()
    input.addData(e)    // redelivery in a later batch
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dedup_out").count() === 1)
  }
}
