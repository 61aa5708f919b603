package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Text}

/** Containment dedup: the near-subset test. [[Dedup.containmentVerify]]
  * must keep a short-doc-inside-long-doc pair whose Jaccard is far
  * below any sane near-dup threshold, and the integer
  * cross-multiplication must agree with a driver-side exact
  * computation.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val words = (0 until 60).map(i => s"w$i")
  // B = 20-token prefix of A (B's shingles ⊂ A's); A has 58 shingles,
  // B has 18, so J = 18/58 ≈ 0.31 while containment = 18/18 = 1.0.
  private val docA = words.mkString(" ")
  private val docB = words.take(20).mkString(" ")

  test("subset pair passes containment but fails Jaccard at 1/2") {
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val sh = Text.distinctShingles(docs, $"text", $"doc_id", 3)
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val cont = Dedup.containmentVerify(cand, sh, num = 8, den = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(cont.toSeq === Seq((1L, 2L, 18L, 18L)),
      "containment must keep the subset pair with inter = min_sz = 18")
    val jac = Dedup.jaccardVerify(cand, sh, num = 1, den = 2).count()
    assert(jac === 0L, "J = 18/58 must fail the 1/2 Jaccard threshold")
  }

  test("end-to-end LSH channel surfaces a high-J high-containment pair") {
    // Two docs sharing a long run (J ≈ 0.9) are guaranteed band
    // collisions; the containment pipeline must find and keep them.
    val docC = (words :+ "extra").mkString(" ")
    val docs = Seq((1L, docA), (2L, docC)).toDF("doc_id", "text")
    val got = Dedup.minhashContainmentDups(docs, $"text", $"doc_id")
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(got.toSeq === Seq((1L, 2L)))
  }
}
