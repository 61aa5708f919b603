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

  /** [[Graph.markovStationary]]'s recurrence, folded on the driver:
    * in-sums plus the dangling self-loop term. */
  private def foldMarkov(es: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val outW = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(_ -> Graph.Scale / nodes.size).toMap
    for (_ <- 1 to iters) {
      val in = es.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        (pr(s) * w) / outW(s)
      }.sum).toMap
      pr = nodes.map { nd =>
        nd -> (in.getOrElse(nd, 0L)
          + (if (outW.contains(nd)) 0L else pr(nd)))
      }.toMap
    }
    pr
  }

  test("markovStationary matches the driver-side integer fold exactly") {
    val got = Graph.markovStationary(edges.toDF("src", "dst", "w"), iters = 4)
      .as[(String, Long)].collect().toMap
    assert(got === foldMarkov(edges, 4))
  }

  test("markovStationary conserves mass up to div truncation; dangling keeps its own") {
    // d is dangling (only in-edges): its round-k mass must be the
    // self-kept previous mass plus its in-sum, and the total must
    // never EXCEED the initial Scale (truncation only loses mass)
    val es = Seq(("a", "b", 1L), ("b", "a", 1L), ("a", "d", 1L))
    val got = Graph.markovStationary(es.toDF("src", "dst", "w"), iters = 3)
      .as[(String, Long)].collect().toMap
    assert(got === foldMarkov(es, 3))
    val total = got.values.sum
    assert(total <= Graph.Scale && total > Graph.Scale - 100L,
      s"mass drifted: $total vs ${Graph.Scale}")
    // a dangling sink accumulates (it never emits) — strictly above uniform
    assert(got("d") > Graph.Scale / 3)
  }

  test("a node with no in-edges holds exactly the teleport share") {
    // d → a: d gets no mass in, so after any iteration pr(d) is the
    // teleport floor
    val es = edges :+ ("d", "a", 1L)
    val got = Graph.pageRank(es.toDF("src", "dst", "w"), iters = 2)
      .as[(String, Long)].collect().toMap
    assert(got("d") === (15 * Graph.Scale / 100) / 4)
  }

  /** Driver fold of the personalized recurrence (seeded teleport). */
  private def pprFold(es: Seq[(String, String, Long)], iters: Int,
      seeds: Set[String]): Map[String, Long] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val ns = nodes.count(seeds)
    val outW = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var pr = nodes.map(nd => nd -> (if (seeds(nd)) Graph.Scale / ns else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = es.groupBy(_._2).view.mapValues(_.map { case (s, _, w) =>
        (BigInt(pr(s)) * w / outW(s)).toLong
      }.sum).toMap
      pr = nodes.map { nd =>
        nd -> ((if (seeds(nd)) (15 * Graph.Scale / 100) / ns else 0L) +
          (Graph.DampPct * in.getOrElse(nd, 0L)) / 100)
      }.toMap
    }
    pr
  }

  test("personalizedPageRank matches the driver-side fold exactly") {
    val got = Graph.personalizedPageRank(edges.toDF("src", "dst", "w"),
        iters = 3, col("node") === "a")
      .as[(String, Long)].collect().toMap
    assert(got === pprFold(edges, 3, Set("a")))
  }

  test("personalized mass never reaches nodes unreachable from the seeds") {
    // d → a exists but nothing points to d, and d is not a seed: its
    // personalized rank must be exactly 0 (uniform PageRank would give
    // it the teleport floor)
    val es = edges :+ ("d", "a", 1L)
    val got = Graph.personalizedPageRank(es.toDF("src", "dst", "w"),
        iters = 3, col("node") === "a")
      .as[(String, Long)].collect().toMap
    assert(got("d") === 0L)
    assert(got("a") > 0L && got("b") > 0L)
  }

  test("rank join falls back to a keyed shuffle join past the broadcast budget") {
    // 40 nodes, budget 10: the size gate must drop the broadcast hint.
    // autoBroadcastJoinThreshold is disabled so neither the planner nor
    // AQE can re-convert the tiny test frame — at the real scale the
    // gate exists for (10⁹ nodes) the frame is over the threshold anyway.
    val es = (1L to 120L).map(i => (s"n$i", s"n${(i % 40) + 1}", 1L))
    val df = es.toDF("src", "dst", "w")
    val viaBroadcast = Graph.pageRank(df, iters = 2)
      .as[(String, Long)].collect().toMap
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val gated = Graph.pageRank(df, iters = 2, broadcastNodeBudget = 10)
      val got = gated.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === viaBroadcast,
        "join strategy must not change the fixed-point values")
      val p = gated.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        "past the node budget the rank vector must NOT broadcast — " +
          "that is the 100 TB executor-memory killer the gate exists for")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "the per-iteration rank join must plan as a keyed shuffle join")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("pageRank on an empty edge frame returns an empty result, not a crash") {
    val empty = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    assert(Graph.pageRank(empty, iters = 2).count() === 0L)
  }

  test("personalizedPageRank fails fast on an empty seed set") {
    // Spark's non-ANSI div would otherwise yield NULL pr for every seed
    // while the DuckDB mirror's // 0 raises — a silent cross-engine
    // divergence mode, closed by the eager require
    val ex = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges.toDF("src", "dst", "w"),
        iters = 2, col("node") === "no-such-node")
    }
    assert(ex.getMessage.contains("seed"))
  }

  test("result is identical under adversarial repartitioning") {
    val base = Graph.pageRank(edges.toDF("src", "dst", "w"), 3)
      .as[(String, Long)].collect().toMap
    val shuffled = Graph.pageRank(
        edges.toDF("src", "dst", "w").repartition(7, col("dst")), 3)
      .as[(String, Long)].collect().toMap
    assert(base === shuffled)
  }

  // brute-force triangle count for the property tests
  private def bruteTriangles(es: Seq[(Long, Long)]): Long = {
    val set = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = set.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    nodes.combinations(3).count { case Seq(x, y, z) =>
      set((x, y)) && set((x, z)) && set((y, z))
    }.toLong
  }

  private def triCount(es: Seq[(Long, Long)]): (Long, Long, Long) =
    Graph.triangleStats(es.toDF("a", "b"))
      .as[(Long, Long, Long)].head()

  test("triangleStats counts a planted clique exactly: K4 has 4 triangles") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val (ne, nw, nt) = triCount(k4)
    assert(ne === 6L)
    assert(nt === 4L)
    assert(nt === bruteTriangles(k4))
    assert(nw >= nt) // every triangle is a closed wedge
  }

  test("a star graph has zero triangles and zero wedges at its hub") {
    // hub 1 with 5 leaves: orientation points every edge leaf→hub, so
    // the hub anchors no wedges — this IS the skew bound the
    // degree-ordering buys
    val star = (2L to 6L).map(l => (math.min(1L, l), math.max(1L, l)))
    val (ne, nw, nt) = triCount(star)
    assert(ne === 5L && nw === 0L && nt === 0L)
  }

  test("triangleStats matches brute force on a mixed graph") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L),
      (5L, 6L), (6L, 7L), (1L, 7L), (2L, 7L), (1L, 4L))
    assert(triCount(g)._3 === bruteTriangles(g))
  }

  test("kCore peels to the planted dense core and certifies convergence") {
    // K4 on 1-4 plus a pendant path 4-5-6: the 3-core is exactly the K4
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val (n, m, conv) = Graph.kCore(g.toDF("a", "b"), k = 3, rounds = 3)
      .as[(Long, Long, Boolean)].head()
    assert((n, m, conv) === ((4L, 6L, true)))
  }

  test("kCore reports converged = false when the round budget is too small") {
    // a 10-node path at k = 2 peels two endpoints per round: 2 rounds
    // leave degree-1 nodes behind and the flag must say so
    val path = (1L to 9L).map(i => (i, i + 1))
    val under = Graph.kCore(path.toDF("a", "b"), k = 2, rounds = 2)
      .as[(Long, Long, Boolean)].head()
    assert(!under._3)
    val enough = Graph.kCore(path.toDF("a", "b"), k = 2, rounds = 5)
      .as[(Long, Long, Boolean)].head()
    assert(enough === ((0L, 0L, true))) // a path has no 2-core
  }

  test("triangle census is partition-independent") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
    val a = triCount(g)
    val b = Graph.triangleStats(g.toDF("a", "b").repartition(5, col("b")))
      .as[(Long, Long, Long)].head()
    assert(a === b)
  }
}
