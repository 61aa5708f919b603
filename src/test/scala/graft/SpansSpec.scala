package graft

import org.apache.spark.sql.functions._
import graft.ops.Spans

/** [[graft.ops.Spans]]: planted verbatim runs are recovered with their
  * exact token length, boilerplate grams are capped out, and the
  * diagonal decomposition never fuses separate runs. */
class SpansSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("recovers a planted shared run with its exact token length") {
    val shared = words("s", 25) // 25-token verbatim run
    val docs = Seq(
      (1L, words("a", 30) + " " + shared + " " + words("b", 10)),
      (2L, words("c", 5) + " " + shared + " " + words("d", 40)),
      (3L, words("e", 60))).toDF("doc_id", "text")
    val got = Spans.sharedSpans(docs, $"text", $"doc_id")
      .select($"doc_a", $"doc_b", $"span_tokens").as[(Long, Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L, 25L)))
  }

  test("runs below the span threshold do not emit") {
    val shared = words("s", 12) // 12 < 20-token threshold
    val docs = Seq(
      (1L, words("a", 30) + " " + shared),
      (2L, shared + " " + words("d", 30))).toDF("doc_id", "text")
    assert(Spans.sharedSpans(docs, $"text", $"doc_id").count() === 0L)
  }

  test("two separate runs on different diagonals do not fuse") {
    val r1 = words("x", 22)
    val r2 = words("y", 24)
    // r1 and r2 appear in both docs but at non-matching relative
    // offsets separated by different filler — two diagonals, and the
    // reported span must be the longer run, not their sum
    val docs = Seq(
      (1L, r1 + " " + words("f", 7) + " " + r2),
      (2L, r2 + " " + words("g", 13) + " " + r1)).toDF("doc_id", "text")
    val got = Spans.sharedSpans(docs, $"text", $"doc_id")
      .select($"span_tokens").as[Long].head()
    assert(got === 24L)
  }

  test("boilerplate grams shared by more than maxGramDocs docs are capped out") {
    val boiler = words("b", 30)
    // 60 docs all carry the same 30-token block > maxGramDocs=50
    val docs = (1L to 60L).map(i => (i, boiler + " " + words(s"u$i", 10)))
      .toDF("doc_id", "text")
    assert(Spans.sharedSpans(docs, $"text", $"doc_id").count() === 0L)
    // the same corpus under a higher cap sees all pairs
    assert(Spans.sharedSpans(docs, $"text", $"doc_id", maxGramDocs = 100)
      .count() === 60L * 59L / 2L)
  }
}
