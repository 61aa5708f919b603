package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Similarity, Vectors}

/** Triadic wedge counts ([[graft.ops.Graph.commonNeighborCounts]]) and
  * the Matryoshka retrieval funnel ([[graft.ops.Similarity
  * .topKMatryoshka]]) — the two round-17 serving primitives — pinned
  * against driver-side recomputations.
  */
class TriadicSpec extends SparkSpec {
  import spark.implicits._

  /** Naive driver-side common-neighbor counts over an edge list. */
  private def naiveCn(es: Seq[(Long, Long)]): Map[(Long, Long), Long] = {
    val adj = (es ++ es.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pairs = for {
      (u, ns) <- adj.toSeq
      x <- ns; y <- ns if x < y
    } yield ((x, y), u)
    pairs.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
  }

  test("commonNeighborCounts matches the naive wedge census") {
    // two triangles sharing node 3, plus a pendant: wedges through
    // every center, pairs both adjacent and non-adjacent
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L),
      (4L, 5L), (5L, 6L))
    val got = Graph.commonNeighborCounts(es.toDF("a", "b"))
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, c) => ((x, y), c) }.toMap
    assert(got === naiveCn(es))
  }

  test("the per-center cap bounds a hub's wedge contribution") {
    // star of 10 leaves around hub 100: uncapped the star yields
    // C(10,2)=45 leaf pairs; cap 4 keeps exactly C(4,2)=6, and which
    // 4 leaves survive is the deterministic hash-rank, not input order
    val star = (1L to 10L).map(l => (l, 100L))
    val capped = Graph.commonNeighborCounts(star.toDF("a", "b"), cap = 4)
      .as[(Long, Long, Long)].collect()
    assert(capped.length === 6)
    assert(capped.forall(_._3 === 1L))
    val reversed = Graph.commonNeighborCounts(
        star.reverse.toDF("a", "b"), cap = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(reversed === capped.toSet)
  }

  test("matryoshka funnel with full prefix and uncut shortlist equals brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cand = emb.where(col("vec_id") >= 8)
    val qs = emb.where(col("vec_id") < 8)
    val n = cand.count().toInt
    val funnel = Similarity.topKMatryoshka(cand, qs, col("embedding"),
        col("vec_id"), k = 10, prefixDim = 64, shortlist = n)
      .select("q_vec_id", "vec_id", "dot", "rnk")
      .as[(Long, Long, Long, Int)].collect().toSet
    val brute = Similarity.topKBruteForce(cand, qs, col("embedding"),
        col("vec_id"), k = 10)
      .select("q_vec_id", "vec_id", "dot", "rnk")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(funnel === brute)
  }

  test("matryoshka re-rank scores are true full-width dots and ranks are dense") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val got = Similarity.topKMatryoshka(emb.where(col("vec_id") >= 8),
        emb.where(col("vec_id") < 8), col("embedding"), col("vec_id"),
        k = 10, prefixDim = 16, shortlist = 30)
    // every returned dot must equal the exact integer dot of the two
    // quantized vectors (the funnel may MISS a true neighbor, but must
    // never mis-score one it returns)
    val qz = emb.select(col("vec_id"), Vectors.quantize(col("embedding")).as("z"))
    val rescored = got.join(qz.select(col("vec_id"), col("z").as("cz")), "vec_id")
      .join(qz.select(col("vec_id").as("q_vec_id"), col("z").as("sz")), "q_vec_id")
      .select(col("q_vec_id"), col("rnk"),
        (col("dot") === Vectors.intDot(col("cz"), col("sz"))).as("ok"))
      .as[(Long, Int, Boolean)].collect()
    assert(rescored.nonEmpty && rescored.forall(_._3))
    // dense 1..10 per query
    val byQ = rescored.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byQ.values.forall(_ == (1 to 10)))
  }
}
