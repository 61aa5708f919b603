package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

/** Bucketed point-in-interval join against a brute-force oracle,
  * including intervals spanning many buckets and boundary inclusivity. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("point-in-interval matches brute force on random data") {
    val rnd = new scala.util.Random(31)
    // timestamps as seconds scaled to micros via timestamp casts
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val pts = (0 until 400).map(i =>
      (rnd.nextInt(4).toLong, i.toLong, ts(rnd.nextInt(100000))))
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(100000); val len = rnd.nextInt(30000)
      (rnd.nextInt(4).toLong, 1000L + i, ts(s), ts(s + len))
    }
    val p = pts.toDF("k", "pid", "t")
    val iv = ivs.toDF("k", "iid", "s", "e")
    val got = RangeJoin.pointInInterval(p, iv, Seq("k"), "t", "s", "e",
        bucketMicros = 7L * 1000000L) // deliberately small buckets: many spans
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = (for {
      (pk, pid, t) <- pts
      (ik, iid, s, e) <- ivs
      if pk == ik && !t.before(s) && !t.after(e)
    } yield (pid, iid)).toSet
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("boundaries are inclusive on both ends") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val p = Seq((1L, 1L, ts(10)), (1L, 2L, ts(20)), (1L, 3L, ts(21))).toDF("k", "pid", "t")
    val iv = Seq((1L, 7L, ts(10), ts(20))).toDF("k", "iid", "s", "e")
    val got = RangeJoin.pointInInterval(p, iv, Seq("k"), "t", "s", "e", 1000000L)
      .select("pid").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
  }
}
