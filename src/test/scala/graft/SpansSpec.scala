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

  test("boilerplate grams over the occurrence cap are dropped before the join") {
    val boiler = words("b", 30)
    // 60 docs all carry the same 30-token block → 60 occurrences > 50
    val docs = (1L to 60L).map(i => (i, boiler + " " + words(s"u$i", 10)))
      .toDF("doc_id", "text")
    assert(Spans.sharedSpans(docs, $"text", $"doc_id").count() === 0L)
    // the same corpus under a higher cap sees all pairs
    assert(Spans.sharedSpans(docs, $"text", $"doc_id", maxGramOcc = 4000)
      .count() === 60L * 59L / 2L)
  }

  test("within-doc repetition counts against the cap (no quadratic self-repeat fanout)") {
    // one degenerate doc repeats a 8-token phrase 60 times: every gram
    // inside the repeated region exceeds the occurrence cap from TWO
    // docs alone, so the pair emits nothing (text_repetition's signal,
    // not a span) instead of joining 60×60 positions per gram
    val phrase = words("p", 8)
    val spam = Seq.fill(60)(phrase).mkString(" ")
    val docs = Seq((1L, spam), (2L, spam)).toDF("doc_id", "text")
    assert(Spans.sharedSpans(docs, $"text", $"doc_id").count() === 0L)
  }

  test("matches a brute-force longest-common-token-run on random docs") {
    val rnd = new scala.util.Random(7)
    // small vocabulary forces plenty of chance n-gram collisions
    def doc(len: Int): Array[String] =
      Array.fill(len)("t" + rnd.nextInt(12))
    val toks = (1L to 12L).map(i => i -> doc(40 + rnd.nextInt(40))).toMap
    val docs = toks.toSeq.map { case (i, t) => (i, t.mkString(" ")) }
      .toDF("doc_id", "text")
    // brute force: longest common substring over token arrays
    def lcs(a: Array[String], b: Array[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          best = math.max(best, dp(i)(j))
        }
      best
    }
    val n = 3; val minTok = 4
    val expected = (for {
      a <- 1L to 12L; b <- (a + 1) to 12L
      s = lcs(toks(a), toks(b)) if s >= minTok
    } yield (a, b, s.toLong)).toSet
    val got = Spans.sharedSpans(docs, $"text", $"doc_id",
        n = n, minTokens = minTok, maxGramOcc = 100000)
      .select($"doc_a", $"doc_b", $"span_tokens")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
  }
}
