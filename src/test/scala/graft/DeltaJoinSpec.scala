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

  test("signed increment + consolidate equals the join of corrected tables") {
    // corrections: retract (1,"a1"), update (2,"a3")→(2,"a3x") on A;
    // retract one copy of the duplicated (1,"b1") and insert (3,"b9") on B
    val daS = Seq((1L, "a1", -1L), (2L, "a3", -1L), (2L, "a3x", 1L))
      .toDF("k", "av", "sign")
    val dbS = Seq((1L, "b1", -1L), (3L, "b9", 1L)).toDF("k", "bv", "sign")
    val correctedA = Seq((1L, "a2"), (2L, "a3x"), (3L, "a4")).toDF("k", "av")
    val correctedB = Seq((1L, "b2"), (1L, "b3"), (2L, "b4"), (3L, "b9"))
      .toDF("k", "bv")
    val expected = correctedA.join(correctedB, Seq("k"))

    val changes = DeltaJoin.signedIncrement(a, daS, b, dbS, Seq("k"), "sign")
    val view = DeltaJoin.consolidate(a.join(b, Seq("k")), changes, "sign")
    assert(view.exceptAll(expected).isEmpty && expected.exceptAll(view).isEmpty,
      "consolidated z-set view must equal the corrected join")
    assert(view.count() === expected.count())
  }

  test("consolidate preserves multiplicity for duplicate surviving rows") {
    val view = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("k", "v")
    val changes = Seq((2L, "y", -1L), (1L, "x", 1L)).toDF("k", "v", "sign")
    val out = DeltaJoin.consolidate(view, changes, "sign")
    assert(out.where($"k" === 1L).count() === 3L) // 2 stored + 1 inserted
    assert(out.where($"k" === 2L).count() === 0L) // retracted to zero
  }

  test("strict consolidate fails loudly on over-retraction; lenient drops it") {
    val view = Seq((1L, "x")).toDF("k", "v")
    // two retracts of a single stored row → net -1: upstream corruption
    val changes = Seq((1L, "x", -1L), (1L, "x", -1L)).toDF("k", "v", "sign")
    val lenient = DeltaJoin.consolidate(view, changes, "sign")
    assert(lenient.count() === 0L, "lenient mode drops negative-net rows")
    val err = intercept[Exception] {
      DeltaJoin.consolidate(view, changes, "sign", strict = true).count()
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    assert(messages(err).contains("over-retraction"),
      s"expected over-retraction error, got: ${messages(err).take(500)}")
    // a valid change stream is untouched by strict mode
    val ok = Seq((1L, "x", 1L)).toDF("k", "v", "sign")
    assert(DeltaJoin.consolidate(view, ok, "sign", strict = true).count() === 2L)
  }

  test("aggregatedConsolidate equals the recomputed aggregate of the corrected rows") {
    // stored view: aggregate of the base facts per key
    val base = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L)).toDF("k", "v")
    val view = base.groupBy($"k")
      .agg(count(lit(1)).cast("long").as("n"), sum($"v").as("total"))
    // changes: insert (1,30); update (2,5)->(2,6); retract group 3 entirely
    val changes = Seq((1L, 30L, 1L), (2L, 5L, -1L), (2L, 6L, 1L), (3L, 7L, -1L))
      .toDF("k", "v", "sign")
    val corrected = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 6L)).toDF("k", "v")
    val expected = corrected.groupBy($"k")
      .agg(count(lit(1)).cast("long").as("n"), sum($"v").as("total"))
    val out = DeltaJoin.aggregatedConsolidate(view, changes, Seq("k"), $"v", "sign")
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty,
      "maintained aggregate must equal the recomputed aggregate")
    // group 3's count reached 0 → it vanishes, as from the direct aggregate
    assert(out.where($"k" === 3L).count() === 0L)
  }

  test("strict aggregatedConsolidate fails on a count driven negative") {
    val view = Seq((1L, 1L, 10L)).toDF("k", "n", "total")
    val changes = Seq((1L, 10L, -1L), (1L, 10L, -1L)).toDF("k", "v", "sign")
    assert(DeltaJoin.aggregatedConsolidate(
      view, changes, Seq("k"), $"v", "sign").count() === 0L)
    val err = intercept[Exception] {
      DeltaJoin.aggregatedConsolidate(
        view, changes, Seq("k"), $"v", "sign", strict = true).count()
    }
    def messages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    assert(messages(err).contains("over-retraction"))
  }

  test("delta sides carry broadcast hints in the increment plan") {
    val plan = DeltaJoin.increment(a, da, b, db, Seq("k"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.toLowerCase.contains("broadcast"),
      s"no broadcast in increment plan:\n${plan.take(2000)}")
  }
}
