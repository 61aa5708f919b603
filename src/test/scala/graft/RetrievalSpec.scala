package graft

import org.apache.spark.sql.functions._
import graft.ops.Retrieval

/** Integer BM25: driver-fold equivalence plus the ranking properties
  * the float original guarantees (idf weighting, tf saturation). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // exact driver-side mirror of Retrieval.bm25TopK's arithmetic
  private def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
  private def bm25(docs: Seq[(Long, String)], terms: Seq[String]): Map[Long, Long] = {
    val tk = docs.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val n = tk.size.toLong
    val tt = tk.map(_._2.size.toLong).sum
    val dfm = terms.map(t => t -> tk.count(_._2.contains(t)).toLong).toMap
    tk.map { case (id, toks) =>
      val dl = toks.size.toLong
      id -> terms.map { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) 0L
        else {
          val idf = bitlen(2 * n + 1) - bitlen(2 * dfm(t) + 1) + 1
          val sat = (BigInt(220000) * tf * tt) /
            ((BigInt(10) * tf + 3) * tt + BigInt(9) * dl * n)
          idf * sat.toLong
        }
      }.sum
    }.toMap
  }

  // df(rare) = 2, df(common) = 6 → genuinely different idf tiers
  private val docs = Seq(
    (1L, "rare common common filler filler filler"),
    (2L, "common filler filler filler other words"),
    (3L, "rare rare rare filler filler filler"),
    (4L, "filler nothing matches here at all"),
    (5L, "common common common common common common"),
    (6L, "common words here again with padding"),
    (7L, "unrelated text entirely different tokens now"),
    (8L, "common another filler mix of stuff here"))

  test("bm25TopK matches the driver-side fold exactly") {
    val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
        $"text", $"doc_id", Seq("rare", "common"), 8)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toMap
    val want = bm25(docs, Seq("rare", "common")).filter(_._2 > 0)
    assert(got === want)
  }

  test("rare terms outscore common terms at equal tf and dl") {
    // docs 1 and 2 have identical length; doc 1 holds the rare term
    // once, doc 2 the common term once → idf must rank doc 1 higher
    val scores = Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
        $"text", $"doc_id", Seq("rare", "common"), 8)
      .select($"doc_id", $"score").as[(Long, Long)].collect().toMap
    val oneRare = bm25(docs, Seq("rare")).apply(1L)
    val oneCommon = bm25(docs, Seq("common")).apply(2L)
    assert(oneRare > oneCommon)
    // and the no-match doc is absent from the result entirely
    assert(!scores.contains(4L) && !scores.contains(7L))
  }

  test("tf saturates: tripling tf does not triple the term score") {
    val s1 = bm25(docs, Seq("rare")).apply(1L) // tf=1
    val s3 = bm25(docs, Seq("rare")).apply(3L) // tf=3, same dl
    assert(s3 > s1)
    assert(s3 < 3 * s1)
  }

  test("top-k cut is total: ties break on doc_id ascending") {
    val dup = Seq((10L, "same text"), (11L, "same text"), (12L, "same text"))
    val top2 = Retrieval.bm25TopK(dup.toDF("doc_id", "text"),
        $"text", $"doc_id", Seq("same"), 2)
      .select($"doc_id").as[Long].collect().toSeq
    assert(top2 === Seq(10L, 11L))
  }
}
