package graft

import graft.ops.Components

/** Min-label connected components: chains collapse to the smallest id,
  * disjoint clusters stay disjoint, and the fixpoint is reached within
  * the diameter bound. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chain, triangle, and isolated pair resolve to min-id components") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12 (+ redundant edge),
    // isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("doc_a", "doc_b")
    val got = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("label order is edge-direction independent") {
    val forward = Seq((5L, 6L), (6L, 7L)).toDF("doc_a", "doc_b")
    val backward = Seq((7L, 6L), (6L, 5L)).toDF("doc_a", "doc_b")
    val a = Components.connectedComponents(forward).as[(Long, Long)].collect().toMap
    val b = Components.connectedComponents(backward).as[(Long, Long)].collect().toMap
    assert(a === b && a === Map(5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  test("star algorithm matches label propagation on the basic shapes") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (30L, 30L)
    ).toDF("doc_a", "doc_b")
    val prop = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val star = Components.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(star === prop)
    assert(star(30L) === 30L) // self-pair = isolated node
  }

  test("star converges on a deep path far beyond label propagation's bound") {
    // path 0-1-2-…-200: diameter 200 ≫ label propagation's default 20
    // rounds (it throws); the star rounds bound is O(log² n).
    val n = 200
    val path = (0 until n).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    assertThrows[IllegalStateException] {
      Components.connectedComponents(path)
    }
    val star = Components.connectedComponentsStar(path)
      .as[(Long, Long)].collect().toMap
    assert(star.size === n + 1 && star.values.forall(_ == 0L))
    // same labels as label propagation when the latter is given enough
    // rounds — the two formulations agree on the exact fixpoint
    // (smaller path: O(diameter) checkpoint rounds are the cost being
    // escaped, no need to pay 200 of them in the test)
    val m = 60
    val path60 = (0 until m).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val prop = Components.connectedComponents(path60, maxIter = m + 2)
      .as[(Long, Long)].collect().toMap
    val star60 = Components.connectedComponentsStar(path60)
      .as[(Long, Long)].collect().toMap
    assert(star60 === prop)
  }

  test("adaptive selector matches both parents on shallow graphs (probe branch)") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L), (30L, 30L)
    ).toDF("doc_a", "doc_b")
    val prop = Components.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val adaptive = Components.connectedComponentsAdaptive(pairs)
      .as[(Long, Long)].collect().toMap
    assert(adaptive === prop)
  }

  test("adaptive selector finishes deep graphs through the star fallback") {
    // diameter-200 path: the 4-round probe cannot converge, so the
    // star stage must run — on the label-CONTRACTED graph — and the
    // composed labels must still be the exact component minima. A
    // second shallow component rides along to exercise the
    // probe-converged-region fallback (its label never reaches the
    // star stage and must survive the final left join).
    val n = 200
    val path = (0 until n).map(i => (i.toLong, i + 1L)) ++
      Seq((500L, 501L), (501L, 502L))
    val adaptive = Components.connectedComponentsAdaptive(
        path.toDF("doc_a", "doc_b"), probeRounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(adaptive.size === n + 4)
    (0 to n).foreach(i => assert(adaptive(i.toLong) === 0L, s"node $i"))
    Seq(500L, 501L, 502L).foreach(i => assert(adaptive(i) === 500L, s"node $i"))
    // and the star formulation agrees on the identical fixpoint
    val star = Components.connectedComponentsStar(path.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(adaptive === star)
  }

  test("blocked union-find matches the iterative labels on random blocked graphs") {
    // componentsWithinGroups is only valid when no edge crosses a
    // group — generate groups over DISJOINT id ranges with random
    // chain/clique/self-pair mixtures, then check it against the
    // generic iterative form run on the same pairs (which ignores the
    // group column entirely).
    val rnd = new scala.util.Random(42)
    val pairs = (0 until 8).flatMap { g =>
      val base = g * 1000L
      val nodes = rnd.shuffle((0 until 40).map(base + _.toLong).toList)
      val chain = nodes.sliding(2).collect {
        case List(a, b) if rnd.nextBoolean() => (g.toLong, a, b)
      }.toList
      val extra = List.fill(12)((g.toLong,
        nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size))))
      chain ++ extra
    }
    val df = pairs.toDF("cell", "doc_a", "doc_b")
    val blocked = Components.componentsWithinGroups(df, $"cell")
      .as[(Long, Long)].collect().toMap
    val iterative = Components.connectedComponentsAdaptive(
        df.select($"doc_a", $"doc_b"))
      .as[(Long, Long)].collect().toMap
    assert(blocked === iterative)
    assert(blocked.nonEmpty)
  }

  test("blocked union-find handles chains deeper than any round budget") {
    // a 300-edge chain inside ONE group: the per-cell union-find has
    // no round structure at all, so depth is free — this is the shape
    // that forced emb_semdedup onto the adaptive fallback before
    val chain = (0 until 300).map(i => (1L, i.toLong, i + 1L))
    val got = Components.componentsWithinGroups(
        chain.toDF("cell", "doc_a", "doc_b"), $"cell")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 301 && got.values.forall(_ == 0L))
  }

  test("star labels are permutation-robust on a shuffled multi-component graph") {
    // two interleaved deep paths (evens and odds) plus a shared bridge
    // only in one of them, with edges listed in scrambled order
    val evens = (0 until 120 by 2).map(i => (i.toLong, i + 2L))
    val odds = (1 until 121 by 2).map(i => (i.toLong, i + 2L))
    val rnd = new scala.util.Random(7)
    val pairs = rnd.shuffle(evens ++ odds).map {
      case (a, b) => if (a % 3 == 0) (b, a) else (a, b)
    }.toDF("doc_a", "doc_b")
    val star = Components.connectedComponentsStar(pairs)
      .as[(Long, Long)].collect().toMap
    star.foreach { case (id, comp) =>
      assert(comp === (if (id % 2 == 0) 0L else 1L), s"node $id")
    }
  }
}
