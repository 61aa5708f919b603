package graft

import org.apache.spark.sql.functions._
import graft.ops.{Linkage, Multimodal}

/** The exact integer Mann-Whitney AUC identity (events_score_auc's
  * engine) and the binary stride frame sampler — pinned against
  * driver-side recomputations on hand-checkable inputs.
  */
class RankMetricsSpec extends SparkSpec {
  import spark.implicits._

  /** Naive O(n²) AUC with the mid-rank tie convention: count every
    * (pos, neg) pair as 1 if pos scores higher, 0.5 (as 1 of 2) if
    * tied. Returns (2U, n_pos, n_neg). */
  private def naiveAuc(rows: Seq[(Long, Long)]): (Long, Long, Long) = {
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    val u2 = (for (p <- pos; n <- neg) yield {
      if (p > n) 2L else if (p == n) 1L else 0L
    }).sum
    (u2, pos.size.toLong, neg.size.toLong)
  }

  /** The histogram + running-sum pipeline events_score_auc runs, on an
    * arbitrary (score, label) frame. */
  private def pipelineAuc(rows: Seq[(Long, Long)]): (Long, Long, Long) = {
    val hist = rows.toDF("score", "label")
      .groupBy(col("score"))
      .agg(count(lit(1)).as("cnt"), sum(col("label")).as("pos"))
    val r = Linkage.globalRunningSum(hist, col("cnt"), col("score"))
      .select(col("cnt"), col("pos"), (col("cum") - col("cnt")).as("cb"))
      .agg(sum(col("pos")).as("np"), sum(col("cnt") - col("pos")).as("nn"),
        sum(col("pos") * (lit(2L) * col("cb") + col("cnt") + 1L)).as("r2"))
      .as[(Long, Long, Long)].collect().head
    (r._3 - r._1 * (r._1 + 1), r._1, r._2)
  }

  test("rank-sum AUC matches the naive pairwise count, ties included") {
    // heavy ties at 5 across both classes, a clean separator at 9/1,
    // and an inversion (a positive scoring below a negative)
    val rows = Seq[(Long, Long)](
      (9, 1), (5, 1), (5, 1), (5, 0), (3, 1),
      (5, 0), (2, 0), (1, 0), (2, 1), (7, 0))
    assert(pipelineAuc(rows) === naiveAuc(rows))
  }

  test("AUC extremes: perfect ranking = 2U max, inverted = 0") {
    val perfect = Seq[(Long, Long)]((10, 1), (9, 1), (2, 0), (1, 0))
    val (u2p, np, nn) = pipelineAuc(perfect)
    assert(u2p === 2L * np * nn)
    val inverted = perfect.map { case (s, l) => (s, 1L - l) }
    assert(pipelineAuc(inverted)._1 === 0L)
  }

  test("frame sampler: partial final frame, stride coverage, exact checksum") {
    // 35 bytes at frameBytes=8 -> frames [0..7][8..15][16..23][24..31][32..34]
    // stride 2 keeps frames 0, 2, 4 -> first bytes at offsets 0, 16, 32
    val bytes = Array.tabulate(35)(i => (i + 1).toByte)
    val got = Multimodal.frameSample(
        Seq((7L, bytes)).toDF("media_id", "payload"),
        col("payload"), col("media_id"), frameBytes = 8, stride = 2)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got === ((7L, 35L, 5L, 3L, (1L + 17L + 33L))))
  }

  test("frame sampler: empty payload yields an all-zero row, not a dropped one") {
    val got = Multimodal.frameSample(
        Seq((1L, Array.empty[Byte])).toDF("media_id", "payload"),
        col("payload"), col("media_id"), frameBytes = 16, stride = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 0L, 0L, 0L, 0L)))
  }

  test("frame sampler: high byte values stay unsigned in the checksum") {
    val bytes = Array(0xff.toByte, 0x00.toByte) // one frame of 2
    val got = Multimodal.frameSample(
        Seq((1L, bytes)).toDF("media_id", "payload"),
        col("payload"), col("media_id"), frameBytes = 2, stride = 1)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got._5 === 255L)
  }
}
