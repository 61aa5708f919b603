package graft

import org.apache.spark.sql.functions._
import graft.ops.{Pack, Text}

/** Concat-and-chunk sequence packing: pack ids follow the cumulative
  * token stream, straddlers are exactly the docs crossing a cut, and
  * the assignment is partitioning-invariant. */
class PackSpec extends SparkSpec {
  import spark.implicits._

  // one group, budget 10: docs of 4+4 tokens fill [0,8); the 5-token doc
  // spans [8,13) crossing the cut at 10; then 7 spans [13,20) ending at
  // the boundary (NOT a straddler: token 19 < 20); 1 starts pack 2.
  private val docs = Seq(
    ("g", 1L, 4L), ("g", 2L, 4L), ("g", 3L, 5L), ("g", 4L, 7L), ("g", 5L, 1L)
  ).toDF("grp0", "ord0", "n0")

  test("pack ids, straddlers, and boundary-exact spans") {
    val got = Pack.assign(docs, $"grp0", $"ord0", $"n0", budget = 10L)
      .select($"ord", $"pack_id", $"straddles")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got === Seq((1L, 0L, false), (2L, 0L, false), (3L, 0L, true),
      (4L, 1L, false), (5L, 2L, false)))
  }

  test("groups pack independently and stats roll up") {
    val two = docs.union(Seq(("h", 1L, 25L), ("h", 2L, 3L)).toDF("g", "o", "n"))
    val stats = Pack.packStats(two, $"grp0", $"ord0", $"n0", budget = 10L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(stats === Set(
      ("g", 0L, 3L, 13L, 1L), ("g", 1L, 1L, 7L, 0L), ("g", 2L, 1L, 1L, 0L),
      ("h", 0L, 1L, 25L, 1L), ("h", 2L, 1L, 3L, 0L)))
  }

  test("zero-token doc on a pack boundary is not a straddler") {
    val z = Seq(("g", 1L, 10L), ("g", 2L, 0L), ("g", 3L, 2L))
      .toDF("grp0", "ord0", "n0")
    val got = Pack.assign(z, $"grp0", $"ord0", $"n0", budget = 10L)
      .select($"ord", $"pack_id", $"straddles")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    // the empty doc sits exactly at cum=10: pack 1, no span, no straddle
    assert(got === Seq((1L, 0L, false), (2L, 1L, false), (3L, 1L, false)))
  }

  test("invariants hold on a random corpus (seeded driver-side replay)") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 400).map(i => (s"g${i % 3}", i.toLong, rnd.nextInt(30).toLong))
    val got = Pack.assign(rows.toDF("grp0", "ord0", "n0"),
        $"grp0", $"ord0", $"n0", budget = 64L)
      .select($"grp", $"ord", $"n", $"cum", $"pack_id", $"straddles")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    for ((_, inGroup) <- got.groupBy(_._1)) {
      var start = 0L
      for ((_, _, n, cum, pack, straddles) <- inGroup.sortBy(_._2)) {
        assert(cum === start + n)
        assert(pack === start / 64)
        assert(straddles === (n > 0 && start / 64 != (start + n - 1) / 64))
        start += n
      }
    }
  }

  test("assignment is invariant under input partitioning") {
    val base = Pack.assign(docs, $"grp0", $"ord0", $"n0", 10L)
      .select($"ord", $"pack_id").as[(Long, Long)].collect().toSet
    val shuffled = Pack.assign(docs.repartition(7), $"grp0", $"ord0", $"n0", 10L)
      .select($"ord", $"pack_id").as[(Long, Long)].collect().toSet
    assert(base === shuffled)
  }
}
