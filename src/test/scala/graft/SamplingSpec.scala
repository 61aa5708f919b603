package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Deterministic hash sampling: stable across runs, proportions near
  * the requested rates, splits exhaustive and disjoint, stratified
  * filter honors per-stratum rates. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 20000L).toDF("id")

  test("bucket matches a driver-side recomputation and is stable") {
    val got = ids.select($"id", Sampling.bucket($"id").as("b"))
      .as[(Long, Long)].collect().toMap
    def ref(id: Long) =
      (((id % Sampling.P + Sampling.P) % Sampling.P * Sampling.A + Sampling.B)
        % Sampling.P) % Sampling.Buckets
    assert(got.forall { case (id, b) => b === ref(id) })
    assert((-5L to -1L).forall { id => // negative ids normalize too
      val b = Seq(id).toDF("id").select(Sampling.bucket($"id")).as[Long].head()
      b === ref(id) && b >= 0
    })
  }

  test("split proportions are near 90/5/5 and assignment is exhaustive") {
    val counts = ids.select(Sampling.assignSplit($"id").as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 20000L)
    assert(math.abs(counts("train") - 18000L) < 400)
    assert(math.abs(counts("val") - 1000L) < 200)
    assert(math.abs(counts("test") - 1000L) < 200)
  }

  test("hashSample rate and subset-stability under rate increase") {
    val at10 = ids.where(Sampling.hashSample($"id", 1000)).as[Long].collect().toSet
    val at20 = ids.where(Sampling.hashSample($"id", 2000)).as[Long].collect().toSet
    assert(math.abs(at10.size - 2000) < 300)
    assert(at10.subsetOf(at20), "raising the rate must only add rows")
  }

  test("stratified sample keeps per-stratum rates and drops unknown strata") {
    val df = (0L until 9000L).map(i => (i, s"s${i % 3}")).toDF("id", "st")
    val kept = df.where(Sampling.stratifiedSample($"id", $"st",
        Map("s0" -> 10000, "s1" -> 5000)))
      .groupBy("st").count().as[(String, Long)].collect().toMap
    assert(kept("s0") === 3000L)         // 100%
    assert(math.abs(kept("s1") - 1500L) < 200) // ~50%
    assert(!kept.contains("s2"))         // absent stratum dropped
  }

  test("weightedCapPerGroup caps per group, biases toward weight, stays stable") {
    // weights 1 vs 100 in one group: the heavy half should dominate
    // the kept set (priority = hash·2^20 div w)
    val df = (0L until 2000L).map(i =>
        (i, s"g${i % 2}", if (i < 1000L) 1L else 100L))
      .toDF("id", "g", "w")
    val kept = Sampling.weightedCapPerGroup(df, $"g", $"id", $"w", cap = 50)
      .as[(Long, String, Long, Long)].collect()
    assert(kept.length === 100)
    assert(kept.groupBy(_._2).forall(_._2.length == 50))
    val heavy = kept.count(_._3 == 100L)
    assert(heavy > 85, s"heavy-weight rows under-selected: $heavy/100")
    // deterministic under repartitioning
    val again = Sampling.weightedCapPerGroup(
        df.repartition(7, $"id"), $"g", $"id", $"w", cap = 50)
      .as[(Long, String, Long, Long)].collect()
    assert(kept.map(_._1).sorted.toSeq === again.map(_._1).sorted.toSeq)
    // priority mirrors its SQL form textually (the oracle contract)
    assert(Sampling.weightedPrioritySql("doc_id", "n_chars")
      .contains("* 1048576) // greatest(n_chars, 1)"))
  }

  test("leakage-safe split: no near-dup pair straddles a split boundary") {
    val dir = "/root/testdata/sf0.001"
    val split = SparkEntry.queries("corpus_leakage_safe_split")(spark, dir)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    // the invariant the operator exists for, checked against the SAME
    // pair graph the cluster labels derive from
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    val straddlers = pairs.filter { case (a, b) => split(a) != split(b) }
    assert(straddlers.isEmpty, s"pairs across splits: ${straddlers.mkString(",")}")
    // and the doc-level hash split does NOT have this property on the
    // same fixture — otherwise the operator is indistinguishable
    val naive = SparkEntry.queries("corpus_split")(spark, dir)
    // corpus_split emits per-split stats; recompute the naive per-doc
    // assignment directly
    val naiveSplit = Tables.documents(spark, dir)
      .select($"doc_id", Sampling.assignSplit($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    assert(pairs.exists { case (a, b) => naiveSplit(a) != naiveSplit(b) },
      "fixture has no straddling pair under the naive split — the " +
        "spec lost its discriminating power, re-plant one")
    naive.count() // keep the registered query exercised
  }
}
