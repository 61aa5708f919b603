package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §7.4).
  *
  * Two paths:
  *  - brute force: broadcast the (small) query set, score every
  *    candidate, window top-k. Exact; cost O(candidates × queries).
  *    The scan side streams — at 100 TB this is one pass, no
  *    candidate-side shuffle except the final per-query top-k (which
  *    WindowGroupLimit reduces map-side before the exchange).
  *  - LSH-bucketed: candidates restricted to the query's sign bucket
  *    (an IVF-style inverted-list probe). Cost drops by ~2^bits; recall
  *    trades off with `bits`.
  *
  * Similarity = exact integer dot product of quantized vectors
  * ([[Vectors.quantize]]): deterministic, order-independent, and
  * rank-equivalent to float cosine down to the quantization floor.
  */
object Similarity {

  private def ranked(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_vec_id")).orderBy(col("dot").desc, col("vec_id").asc)))
      .where(col("rnk") <= k)

  /** Exact top-k: every (query, candidate) pair scored. */
  def topKBruteForce(candidates: DataFrame, queries: DataFrame,
                     vecCol: Column, idCol: Column, k: Int): DataFrame = {
    val cand = candidates.select(idCol.as("vec_id"), Vectors.quantize(vecCol).as("q"))
    val qs = queries.select(idCol.as("q_vec_id"), Vectors.quantize(vecCol).as("qq"))
    val scored = cand.crossJoin(broadcast(qs))
      .select(col("q_vec_id"), col("vec_id"),
        Vectors.intDot(col("q"), col("qq")).as("dot"))
    ranked(scored, k)
  }

  /** LSH-bucketed approximate top-k: score only candidates in the
    * query's sign bucket. */
  def topKLsh(candidates: DataFrame, queries: DataFrame,
              vecCol: Column, idCol: Column, k: Int, bits: Int): DataFrame = {
    val cand = candidates.select(idCol.as("vec_id"), Vectors.quantize(vecCol).as("q"))
      .withColumn("bucket", Vectors.signBucket(col("q"), bits))
    val qs = queries.select(idCol.as("q_vec_id"), Vectors.quantize(vecCol).as("qq"))
      .withColumn("qbucket", Vectors.signBucket(col("qq"), bits))
    val scored = cand.join(broadcast(qs), col("bucket") === col("qbucket"))
      .select(col("q_vec_id"), col("vec_id"),
        Vectors.intDot(col("q"), col("qq")).as("dot"))
    ranked(scored, k)
  }
}
