package graft

import org.apache.spark.sql.functions._
import graft.ops.DeltaJoin

/** The delta rule must reproduce the full join exactly — including
  * duplicate join keys on both sides (multiplicity is where a wrong
  * term double-counts) — and the increment must be exactly the rows
  * the base join lacks. */
class DeltaJoinSpec extends SparkSpec {
  import spark.implicits._

  // duplicate keys on both sides: key 1 is 2×3, key 2 is 1×2
  private def a = Seq((1L, "a1"), (1L, "a2"), (2L, "a3"), (3L, "a4"))
    .toDF("k", "av")
  private def da = Seq((1L, "a5"), (9L, "a6")).toDF("k", "av")
  private def b = Seq((1L, "b1"), (1L, "b2"), (1L, "b3"), (2L, "b4"))
    .toDF("k", "bv")
  private def db = Seq((2L, "b5"), (9L, "b6")).toDF("k", "bv")

  test("refreshed view is multiset-identical to the full join") {
    val full = a.unionByName(da).join(b.unionByName(db), Seq("k"))
    val view = DeltaJoin.refreshed(a, da, b, db, Seq("k"))
    assert(view.count() === full.count())
    assert(view.exceptAll(full).isEmpty && full.exceptAll(view).isEmpty)
  }

  test("increment is exactly the full join minus the base join") {
    val full = a.unionByName(da).join(b.unionByName(db), Seq("k"))
    val expected = full.exceptAll(a.join(b, Seq("k")))
    val inc = DeltaJoin.increment(a, da, b, db, Seq("k"))
    assert(inc.exceptAll(expected).isEmpty && expected.exceptAll(inc).isEmpty)
  }

  test("every term of the delta rule contributes on this fixture") {
    // dA⋈B0 (k=1), A0⋈dB (k=2), dA⋈dB (k=9) — a dropped term fails
    assert(da.join(b, Seq("k")).count() > 0)
    assert(a.join(db, Seq("k")).count() > 0)
    assert(da.join(db, Seq("k")).count() > 0)
  }

  test("delta sides carry broadcast hints in the increment plan") {
    val plan = DeltaJoin.increment(a, da, b, db, Seq("k"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.toLowerCase.contains("broadcast"),
      s"no broadcast in increment plan:\n${plan.take(2000)}")
  }
}
