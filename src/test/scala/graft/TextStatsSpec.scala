package graft

import org.apache.spark.sql.functions._
import graft.ops.Text

/** Repetition signals and tf-idf weighting on hand-computed fixtures. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: duplicate and top bigram fractions") {
    // "a b a b a" → bigrams: (a b), (b a), (a b), (b a): 4 total,
    // 2 distinct, top count 2 → dup 5000bp, top 5000bp.
    // "x y z" → 2 bigrams, both unique → 0bp / 5000bp (top is 1 of 2).
    // "w" → no bigrams → all zeros.
    val docs = Seq((1L, "a b a b a"), (2L, "x y z"), (3L, "w"))
      .toDF("doc_id", "text")
    val got = Text.repetitionStats(docs, $"text", $"doc_id")
      .select($"doc_id", $"n_grams", $"n_distinct_grams", $"top_gram_n",
        $"dup_gram_bp", $"top_gram_bp")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got === Seq(
      (1L, 4L, 2L, 2L, 5000L, 5000L),
      (2L, 2L, 2L, 1L, 0L, 5000L),
      (3L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("tfIdf matches the smoothed formula") {
    val got = Seq((3L, 2L, 9L)).toDF("tf", "df", "n")
      .select(Text.tfIdf($"tf", $"df", $"n").as("w"))
      .as[Double].head()
    assert(math.abs(got - 3.0 * math.log(10.0 / 3.0)) < 1e-12)
  }
}
