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
}
