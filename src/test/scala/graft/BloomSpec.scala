package graft

import org.apache.spark.sql.functions._
import graft.ops.Bloom

/** [[graft.ops.Bloom]]: the filter's defining guarantees — zero false
  * negatives, word-wise mergeability, bounded materialized size — plus
  * the Spark/SQL-mirror arithmetic agreement PlanSpec can't see. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def keys(ids: Seq[Long]) = ids.toDF("id")
    .select(graft.ops.Sampling.hashVal(col("id")).as("h"))

  test("no false negatives: every inserted key probes true") {
    val ins = keys(1L to 200L)
    val words = Bloom.filterWords(Bloom.build(ins, col("h")))
    val misses = ins.where(!Bloom.hitExpr(col("h"), words)).count()
    assert(misses === 0L)
  }

  test("false-positive rate at this load stays near the Bloom bound") {
    val words = Bloom.filterWords(Bloom.build(keys(1L to 200L), col("h")))
    val probes = keys(100001L to 102000L) // disjoint from the inserted ids
    val fp = probes.where(Bloom.hitExpr(col("h"), words)).count()
    // load n=200, m=4096, k=3 → (1-e^{-kn/m})^3 ≈ 0.0018; 2000 probes
    // expect ~4. Allow a wide band — this pins magnitude, not chance.
    assert(fp <= 40L, s"FP count $fp far above the analytic bound")
  }

  test("filter is mergeable: bit_or of shard builds equals the full build") {
    val a = Bloom.build(keys(1L to 100L), col("h"))
    val b = Bloom.build(keys(101L to 200L), col("h"))
    val merged = a.unionByName(b).groupBy("word")
      .agg(expr("bit_or(bits)").as("bits"))
    val full = Bloom.filterWords(Bloom.build(keys(1L to 200L), col("h")))
    assert(Bloom.filterWords(merged).toSeq === full.toSeq)
  }

  test("materialized filter is bounded and positions stay in range") {
    val words = Bloom.build(keys(1L to 10000L), col("h"))
    assert(words.count() <= Bloom.Words.toLong)
    val bad = keys(1L to 1000L)
      .select(explode(Bloom.positions(col("h"))).as("pos"))
      .where(col("pos") < 0 || col("pos") >= Bloom.MBits).count()
    assert(bad === 0L)
  }

  test("position arithmetic matches the SQL mirror rendered through Spark SQL") {
    // the DuckDB mirror uses `//` floor division; on the NON-NEGATIVE
    // h both engines' integer division agree, so render a Spark-legal
    // twin by swapping the operator and compare per position
    val df = keys(1L to 500L)
    val mismatches = (0 until Bloom.Hashes).map { i =>
      val sql = Bloom.positionSql("h", i).replace("//", "div")
      df.where(Bloom.position(col("h"), i) =!= expr(sql)).count()
    }.sum
    assert(mismatches === 0L)
  }
}
