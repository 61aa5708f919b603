package graft

import org.apache.spark.sql.functions._
import graft.ops.Pca

/** Integer power-iteration PCA: gram correctness, dominant-axis
  * recovery, and the degenerate-input guard. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("gram matches a hand-computed outer-product sum") {
    // quantize multiplies by 1000: use small floats for exact longs
    val emb = Seq(
      (1L, Seq(0.001f, 0.002f, 0.0f)),
      (2L, Seq(0.002f, -0.001f, 0.003f))
    ).toDF("vec_id", "embedding")
    val g = Pca.gram(emb, $"embedding", 3)
    // q1 = (1,2,0), q2 = (2,-1,3)
    assert(g(0).toSeq === Seq(5L, 0L, 6L))   // 1+4, 2-2, 0+6
    assert(g(1).toSeq === Seq(0L, 5L, -3L))  // 2-2, 4+1, 0-3
    assert(g(2).toSeq === Seq(6L, -3L, 9L))  // 0+6, 0-3, 0+9
  }

  test("power iteration converges to the dominant axis") {
    // 10 vectors hugging axis 1, tiny noise on axis 0/2 → the scaled
    // direction's largest |component| must land on axis 1
    val g = Pca.gram((1 to 10).map(i =>
        (i.toLong, Seq(0.001f * (i % 2), 0.5f, 0.001f * (i % 3))))
      .toDF("vec_id", "embedding"), $"embedding", 3)
    val v = Pca.powerIterate(g, 3)
    assert(v.map(math.abs).zipWithIndex.maxBy(_._1)._2 === 1)
    assert(math.abs(v(1)) === Pca.Scale) // the max component sits at full scale
  }

  test("projection ranks vectors by alignment with the direction") {
    val d = Seq(1000000L, 0L, 0L)
    val strong = Pca.project(typedLit(Seq(5L, 1L, 1L)), d)
    val weak = Pca.project(typedLit(Seq(1L, 9L, 9L)), d)
    val got = spark.range(1).select(strong.as("s"), weak.as("w"))
      .as[(Long, Long)].head()
    assert(got._1 > got._2)
    assert(got._1 === 5L * 1000000L)
  }

  test("all-zero corpus degrades to the zero direction, not a crash") {
    val g = Array.fill(4, 4)(0L)
    assert(Pca.powerIterate(g, 3) === Seq(0L, 0L, 0L, 0L))
  }

  test("registered query is deterministic across shuffle widths") {
    val dir = "/root/testdata/sf0.001"
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "3")
      val a = ExtensionQueries.queries("emb_pca_project")(spark, dir)
        .collect().map(_.toSeq).toSeq
      spark.conf.set(key, "11")
      val b = ExtensionQueries.queries("emb_pca_project")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(a === b)
      assert(a.nonEmpty)
    } finally spark.conf.set(key, saved)
  }
}
