package graft

import org.apache.spark.sql.functions._
import graft.ops.Text

/** Repetition signals and tf-idf weighting on hand-computed fixtures. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("hashedLinearScore matches a driver-side fold of the same arithmetic") {
    val weights: Seq[Long] = (0 until 64).map(b => ((b * 2654435761L) % 1009L) - 504L)
    def polyHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31L + c.toLong) % 1000000007L)
    def score(text: String): Long =
      text.trim.toLowerCase.split("\\s+")
        .map(t => weights((polyHash(t) % 64L).toInt)).sum
    val docs = Seq((1L, "The quick brown fox"), (2L, "foo Bar baz foo foo"),
        (3L, "  padded   whitespace  doc  "))
      .toDF("doc_id", "text")
    val got = docs.select($"doc_id",
        Text.hashedLinearScore($"text", weights).as("s"))
      .as[(Long, Long)].collect().toMap
    val want = Map(
      1L -> score("The quick brown fox"),
      2L -> score("foo Bar baz foo foo"),
      3L -> score("  padded   whitespace  doc  "))
    assert(got === want)
    // repeated tokens count with multiplicity, so doc 2's repeats move
    // the score by exactly 2x the "foo" bucket weight vs one mention
    val oneFoo = score("foo Bar baz")
    assert(want(2L) === oneFoo + 2L * weights((polyHash("foo") % 64L).toInt))
  }

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

  test("pairStats: adjacent BPE pre-token pair counts") {
    // "ab ab cd" → pre-tokens [ab, ab, cd] → pairs (ab,ab), (ab,cd)
    // "ab, cd"  → pre-tokens [ab, ',', cd] → pairs (ab,','), (',',cd)
    // "x"       → 1 pre-token → no pairs (the size>=2 guard)
    val docs = Seq((1L, "ab ab cd"), (2L, "ab, cd"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = Text.pairStats(docs, $"text")
      .as[(String, String, Long)].collect().toSet
    assert(got === Set(
      ("ab", "ab", 1L), ("ab", "cd", 1L),
      ("ab", ",", 1L), (",", "cd", 1L)))
  }

  test("pairStats: total pair mass equals sum over docs of (tokens - 1)") {
    val docs = Seq((1L, "one two three four"), (2L, "a1 b2"), (3L, "solo"))
      .toDF("doc_id", "text")
    val totalPairs = Text.pairStats(docs, $"text")
      .agg(sum($"n")).as[Long].head()
    // doc1: 4 pre-tokens→3, doc2: [a, 1, b, 2]→3, doc3: 1→0
    assert(totalPairs === 6L)
  }

  test("tfIdf matches the smoothed formula") {
    val got = Seq((3L, 2L, 9L)).toDF("tf", "df", "n")
      .select(Text.tfIdf($"tf", $"df", $"n").as("w"))
      .as[Double].head()
    assert(math.abs(got - 3.0 * math.log(10.0 / 3.0)) < 1e-12)
  }
}
