package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOf

/** As-of join semantics against a brute-force oracle: <= match, ties
  * visible, matched row's values (including NULLs) emitted verbatim,
  * unmatched left rows dropped. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join matches a per-row brute force on random data") {
    val rnd = new scala.util.Random(21)
    val left = (0 until 300).map(i => (rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(100).toLong))
    val right = (0 until 120).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, s"v$i"))
    val l = left.toDF("k", "lid", "ts")
    // dedupe right per (k, ts) like real callers do (deterministic match)
    val r = right.toDF("k", "ts", "v").groupBy("k", "ts").agg(max("v").as("v"))
    val got = AsOf.asOfJoin(l, r, Seq("k"), "ts", "ts", Map("v" -> "v"))
      .select("lid", "asof_ts", "v").as[(Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val rMap = r.as[(Long, Long, String)].collect()
    val want = left.flatMap { case (k, lid, ts) =>
      val cands = rMap.filter(x => x._1 == k && x._2 <= ts)
      if (cands.isEmpty) None
      else {
        val best = cands.maxBy(_._2)
        Some(lid -> ((best._2, best._3)))
      }
    }.toMap
    assert(got === want)
  }

  test("matched right row's NULL is emitted, not an older value") {
    val l = Seq((1L, 100L)).toDF("k", "ts")
    val r = Seq((1L, 10L, Some("old")), (1L, 50L, None: Option[String]))
      .toDF("k", "ts", "v")
    val out = AsOf.asOfJoin(l, r, Seq("k"), "ts", "ts", Map("v" -> "v"))
      .select("asof_ts", "v").collect().head
    assert(out.getLong(0) === 50L)
    assert(out.isNullAt(1), "must carry the matched row's NULL")
  }

  test("composite keys: match requires every key column to agree") {
    val l = Seq((1L, "x", 100L), (1L, "y", 100L)).toDF("k1", "k2", "ts")
    val r = Seq((1L, "x", 10L, "vx")).toDF("k1", "k2", "ts", "v")
    val out = AsOf.asOfJoin(l, r, Seq("k1", "k2"), "ts", "ts", Map("v" -> "v"))
      .select("k2", "v").as[(String, String)].collect().toMap
    assert(out === Map("x" -> "vx")) // (1, "y") has no right row
  }

  test("no prior right row -> left row dropped (inner as-of)") {
    val l = Seq((1L, 5L), (1L, 50L)).toDF("k", "ts")
    val r = Seq((1L, 10L, "x")).toDF("k", "ts", "v")
    val out = AsOf.asOfJoin(l, r, Seq("k"), "ts", "ts", Map("v" -> "v"))
      .select("ts").as[Long].collect().toSeq
    assert(out === Seq(50L))
  }
}
