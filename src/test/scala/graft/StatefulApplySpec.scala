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

  test("transformWithState (v2, RocksDB) resolves the same latest-wins contract") {
    implicit val sqlCtx = spark.sqlContext
    val saved = graft.streaming.StatefulApplyV2.requiredConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    graft.streaming.StatefulApplyV2.requiredConfs
      .foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val input = MemoryStream[CdcEvent]
      val out = graft.streaming.StatefulApplyV2.latestPerKeyStream(input.toDS())
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("stateful_v2_out").start()

      input.addData(ev(1, 100, "insert", 1), ev(2, 200, "insert", 2))
      q.processAllAvailable()
      input.addData(ev(1, 150, "update", 3))
      q.processAllAvailable()
      input.addData(ev(2, 0, "delete", 4), ev(1, 140, "update", 2)) // late
      q.processAllAvailable()
      q.stop()

      val rows = spark.table("stateful_v2_out").as[CdcEvent].collect()
      val lastPerKey = rows.zipWithIndex.groupBy(_._1.emp_id)
        .map { case (k, v) => k -> v.maxBy(_._2)._1 }
      assert(lastPerKey(1L).emp_salary === 150L)
      assert(lastPerKey(1L).action === "update")
      assert(lastPerKey(2L).action === "delete")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("state TTL evicts idle keys once the watermark passes, with an expired tombstone") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    def evAt(id: Long, sal: Long, when: String) =
      CdcEvent(0, id, s"FN$id", s"LN$id", "2012-04-10", "City", sal, "insert", t(when))
    val input = MemoryStream[CdcEvent]
    // 10-min watermark delay, 1h idle TTL
    val out = StatefulApply.latestPerKeyStreamTtl(input.toDS(), "10 minutes",
      idleMs = 3600L * 1000)
    val q = out.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("ttl_out").start()

    input.addData(evAt(1, 100, "2024-01-01 10:00:00"), evAt(2, 200, "2024-01-01 10:05:00"))
    q.processAllAvailable()
    // key 2 stays active at 13:00 → watermark advances to 12:50, far past
    // key 1's 11:00 timeout → key 1 evicts with an expired tombstone
    input.addData(evAt(2, 250, "2024-01-01 13:00:00"))
    q.processAllAvailable()
    q.processAllAvailable() // timeout fires on the batch after the watermark moves
    q.stop()

    val rows = spark.table("ttl_out").as[CdcEvent].collect()
    val expired = rows.filter(_.action == "expired")
    assert(expired.map(_.emp_id).toSeq === Seq(1L),
      s"only idle key 1 must expire, got: ${rows.mkString(";")}")
    assert(expired.head.emp_salary === 100L,
      "tombstone must carry the key's final resolved state")
    assert(!rows.exists(r => r.emp_id == 2L && r.action == "expired"),
      "active key 2 must stay in state")
  }

  test("v2 event-time timers evict idle keys with an expired tombstone") {
    implicit val sqlCtx = spark.sqlContext
    val saved = graft.streaming.StatefulApplyV2.requiredConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    graft.streaming.StatefulApplyV2.requiredConfs
      .foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def t(s: String) = Timestamp.valueOf(s)
      def evAt(id: Long, sal: Long, when: String) =
        CdcEvent(0, id, s"FN$id", s"LN$id", "2012-04-10", "City", sal, "insert", t(when))
      val input = MemoryStream[CdcEvent]
      // same scenario as the v1 TTL test: 10-min watermark, 1h idle TTL
      val out = graft.streaming.StatefulApplyV2.latestPerKeyStreamTtl(
        input.toDS(), "10 minutes", idleMs = 3600L * 1000)
      val q = out.writeStream.outputMode(OutputMode.Update())
        .format("memory").queryName("ttl_v2_out").start()

      input.addData(evAt(1, 100, "2024-01-01 10:00:00"), evAt(2, 200, "2024-01-01 10:05:00"))
      q.processAllAvailable()
      // key 2 re-arms its timer at 13:00; the watermark advance to
      // 12:50 fires key 1's 11:00 timer but NOT key 2's
      input.addData(evAt(2, 250, "2024-01-01 13:00:00"))
      q.processAllAvailable()
      q.processAllAvailable() // timer fires on the batch after the watermark moves
      q.stop()

      val rows = spark.table("ttl_v2_out").as[CdcEvent].collect()
      val expired = rows.filter(_.action == "expired")
      assert(expired.map(_.emp_id).toSeq === Seq(1L),
        s"only idle key 1 must expire, got: ${rows.mkString(";")}")
      assert(expired.head.emp_salary === 100L,
        "tombstone must carry the key's final resolved state")
      assert(!rows.exists(r => r.emp_id == 2L && r.action == "expired"),
        "re-armed key 2 must stay in state")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
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
