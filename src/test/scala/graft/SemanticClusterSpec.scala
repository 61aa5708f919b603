package graft

import org.apache.spark.sql.functions._
import graft.ops.SemanticCluster

/** Exact-integer Lloyd round ([[SemanticCluster.lloydOnce]]):
  * separation recovery, representative choice, empty-cluster handling,
  * and partition-independence.
  */
class SemanticClusterSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated groups on the first axis; ids 0 (in A) and 1
  // (in B) serve as seeds
  private def fixture = Seq(
    (0L, Array(1.0f, 0.1f)), (2L, Array(0.9f, -0.1f)), (4L, Array(1.1f, 0.0f)),
    (1L, Array(-1.0f, 0.1f)), (3L, Array(-0.9f, 0.0f)),
    (5L, Array(-1.1f, -0.1f)), (6L, Array(-1.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("separated groups are recovered with exact sizes and reps") {
    val emb = fixture
    val got = SemanticCluster.lloydOnce(emb, col("embedding"), col("vec_id"),
        emb.where(col("vec_id") < 2))
      .orderBy("cluster")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSeq === Seq((0L, 3L), (1L, 4L)))
    // cluster 1's integer-mean centroid is (-1000, 0); vec 6 sits on it
    assert(got(1)._4 === 6L)
    // reps are members of their own cluster
    assert(Set(0L, 2L, 4L).contains(got(0)._4))
  }

  test("a duplicated seed leaves an empty cluster that vanishes") {
    // both seeds identical → every row ties to cluster 0 in pass 1,
    // cluster 1 is empty and must not resurface with a 0-distance
    // centroid
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)), (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = SemanticCluster.lloydOnce(emb, col("embedding"), col("vec_id"),
        emb.where(col("vec_id") < 2))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(0L))
    assert(got.head._2 === 4L)
  }

  test("result is identical under adversarial repartitioning") {
    val a = SemanticCluster.lloydOnce(fixture, col("embedding"), col("vec_id"),
      fixture.where(col("vec_id") < 2)).orderBy("cluster").collect().toSeq
    val re = fixture.repartition(5, col("vec_id"))
    val b = SemanticCluster.lloydOnce(re, col("embedding"), col("vec_id"),
      re.where(col("vec_id") < 2)).orderBy("cluster").collect().toSeq
    assert(a === b)
  }
}
