package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Manku-style banded simhash pair detection: the band join must find
  * EXACTLY the Hamming ≤ 3 pairs a brute-force popcount over all
  * fingerprint pairs finds (pigeonhole completeness — 3 flips cannot
  * touch all 4 bands), and identical docs pair at distance 0. */
class SimhashPairsSpec extends SparkSpec {
  import spark.implicits._

  test("banding finds exactly the brute-force hamming<=3 pairs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .where(col("doc_id") < 200)
    // cap disabled: the cap is a deliberate precision/cost trade, the
    // pigeonhole construction itself must be lossless
    val got = Dedup.simhashNearDups(docs, col("text"), col("doc_id"),
        maxBucket = Int.MaxValue)
      .select($"doc_a", $"doc_b", $"hamming")
      .as[(Long, Long, Long)].collect().toSet
    val fp = Dedup.simhashN(docs, col("text"), col("doc_id"), Dedup.simhashPairBits)
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- fp; (b, hb) <- fp if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got === brute)
    assert(brute.nonEmpty, "fixture should contain near-dup pairs")
  }

  test("identical docs pair at hamming 0") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashNearDups(docs, $"text", $"doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 0L)))
  }
}
