package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Fixed-point integer PageRank ([[Graph.pageRank]]): pinned against a
  * driver-side fold of the identical recurrence, plus the structural
  * properties (teleport floor, determinism under repartitioning).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  //   a → b (w 2), a → c (w 1), b → c (w 1), c → a (w 1)
  private val edges = Seq(
    ("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L), ("c", "a", 1L))

  /** The same integer recurrence, folded on the driver. */
  private def fold(es: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to iters) {
      val in = es.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        (pr(s) * w) / outW(s)
      }.sum).toMap
      pr = nodes.map { nd =>
        nd -> ((15 * Graph.Scale / 100) / n + (Graph.DampPct * in.getOrElse(nd, 0L)) / 100)
      }.toMap
    }
    pr
  }

  test("pageRank matches the driver-side integer fold exactly") {
    val got = Graph.pageRank(edges.toDF("src", "dst", "w"), iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === fold(edges, 3))
  }

  test("a node with no in-edges holds exactly the teleport share") {
    // d → a: d gets no mass in, so after any iteration pr(d) is the
    // teleport floor
    val es = edges :+ ("d", "a", 1L)
    val got = Graph.pageRank(es.toDF("src", "dst", "w"), iters = 2)
      .as[(String, Long)].collect().toMap
    assert(got("d") === (15 * Graph.Scale / 100) / 4)
  }

  test("result is identical under adversarial repartitioning") {
    val base = Graph.pageRank(edges.toDF("src", "dst", "w"), 3)
      .as[(String, Long)].collect().toMap
    val shuffled = Graph.pageRank(
        edges.toDF("src", "dst", "w").repartition(7, col("dst")), 3)
      .as[(String, Long)].collect().toMap
    assert(base === shuffled)
  }
}
