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

  test("seedAssignments labels every vector with its nearest seed's own id") {
    val emb = fixture
    val got = SemanticCluster.seedAssignments(emb, col("embedding"), col("vec_id"),
        emb.where(col("vec_id") < 2))
      .select($"vec_id", $"cl").as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 2L -> 0L, 4L -> 0L,
      1L -> 1L, 3L -> 1L, 5L -> 1L, 6L -> 1L))
    // per-vector labels aggregate to exactly lloyd's round-0 sizes
    assert(got.values.groupBy(identity).view.mapValues(_.size).toMap ===
      Map(0L -> 3, 1L -> 4))
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

  test("a second Lloyd round moves centroids and strictly drops inertia") {
    // 1-d layout: seeds at 0.0 and 1.0; the 0.55 point starts in
    // cluster 1 (closer to the 1.0 seed) but flips to cluster 0 once
    // the refit pulls centroid 0 to its members — the second round
    // then re-refits around the flipped membership
    val emb = Seq(
      (0L, Array(0.0f)), (1L, Array(1.0f)), (2L, Array(0.1f)),
      (3L, Array(0.2f)), (4L, Array(2.0f)), (5L, Array(2.1f)),
      (6L, Array(0.55f))
    ).toDF("vec_id", "embedding")
    val seeds = emb.where(col("vec_id") < 2)
    def run(r: Int) = SemanticCluster.lloyd(emb, col("embedding"), col("vec_id"), seeds, r)
      .orderBy("cluster").as[(Long, Long, Long, Long)].collect()
    val r1 = run(1)
    val r2 = run(2)
    // memberships already converged after round 1 on this layout...
    assert(r1.map(x => (x._1, x._2)).toSeq === Seq((0L, 4L), (1L, 3L)))
    assert(r2.map(x => (x._1, x._2)).toSeq === Seq((0L, 4L), (1L, 3L)))
    // ...but the round-2 centroids fit the post-flip members tighter
    assert(r2(0)._3 < r1(0)._3, s"cluster 0 inertia: ${r2(0)._3} !< ${r1(0)._3}")
    assert(r2(1)._3 < r1(1)._3, s"cluster 1 inertia: ${r2(1)._3} !< ${r1(1)._3}")
    // exact hand-fold pins (quantized units²)
    assert(r1(0)._3 === 222500L && r2(0)._3 === 171876L)
  }

  test("farthest-point seeding picks the spread extremes, deterministically") {
    // 1-d values 0, 10, 5, 9, 1 with ids 0..4: start = id 0 (value 0);
    // next = value 10 (id 1); next = value 5 (id 2, min-dist 5² beats
    // 9's 1² and 1's 1²); next = value 9? no — after {0,10,5}, 9 has
    // min-dist 1², 1 has 1² → tie at 1e6 quantized² → lowest id wins
    // (id 3, value 9... wait id order: ids 3=9, 4=1 → id 3)
    val emb = Seq(
      (0L, Array(0.0f)), (1L, Array(10.0f)), (2L, Array(5.0f)),
      (3L, Array(9.0f)), (4L, Array(1.0f))
    ).toDF("vec_id", "embedding")
    val ids = SemanticCluster.farthestPointSeedIds(
      emb, col("embedding"), col("vec_id"), k = 4)
    assert(ids === Seq(0L, 1L, 2L, 3L))
    // determinism under repartitioning
    val again = SemanticCluster.farthestPointSeedIds(
      emb.repartition(3, col("vec_id")), col("embedding"), col("vec_id"), k = 4)
    assert(again === ids)
  }

  test("farthest-point seeding never re-picks a chosen id on duplicate vectors") {
    // ids 0 and 1 share a vector; previously, once every remaining
    // dmin hit 0 the lowest-id tie-break re-selected id 0 and the
    // downstream isin() seed filter silently collapsed below k
    val emb = Seq(
      (0L, Array(0.0f)), (1L, Array(0.0f)), (2L, Array(10.0f))
    ).toDF("vec_id", "embedding")
    val ids = SemanticCluster.farthestPointSeedIds(
      emb, col("embedding"), col("vec_id"), k = 3)
    assert(ids === Seq(0L, 2L, 1L))
    assert(ids.distinct.size === 3)
    // k beyond the corpus now fails loudly instead of duplicating
    assertThrows[IllegalArgumentException] {
      SemanticCluster.farthestPointSeedIds(
        emb, col("embedding"), col("vec_id"), k = 4)
    }
  }

  test("lloyd with non-contiguous seed ids labels clusters by the seed's own id") {
    val emb = Seq(
      (2L, Array(1.0f, 0.0f)), (7L, Array(-1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f)), (9L, Array(-0.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = SemanticCluster.lloydOnce(emb, col("embedding"), col("vec_id"),
        emb.where(col("vec_id").isin(2L, 7L)))
      .orderBy("cluster").as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(2L, 7L), "labels must be the seed ids")
    assert(got.map(_._2).toSeq === Seq(2L, 2L))
  }

  test("lloyd matches a driver-side reference fold on randomized fixtures") {
    // independent reimplementation of the whole algorithm (quantize →
    // seed-assign → truncated-mean refit → re-assign → summarize) as
    // plain Scala folds; any divergence in tie-breaks, truncation, or
    // labeling between the DataFrame pipeline and the spec'd semantics
    // fails here on inputs the fixed fixtures never exercise
    def reference(vecs: Seq[(Long, Array[Float])], seedIds: Seq[Long],
                  refits: Int): Seq[(Long, Long, Long, Long)] = {
      val q = vecs.map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 1000)).toSeq
      }.sortBy(_._1)
      val seeds = q.filter(s => seedIds.contains(s._1))
      def d2(a: Seq[Long], b: Seq[Long]): Long =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      // seed assignment: argmin of ‖c‖²−2xc, ties → lowest seed id
      var assign: Map[Long, Long] = q.map { case (id, v) =>
        id -> seeds.minBy { case (sid, sv) =>
          (sv.map(x => x * x).sum - 2 * sv.zip(v).map { case (x, y) => x * y }.sum, sid)
        }._1
      }.toMap
      var cents: Seq[(Long, Seq[Long])] = Nil
      for (_ <- 1 to refits) {
        cents = assign.groupBy(_._2).toSeq.sortBy(_._1).map { case (cl, members) =>
          val vs = members.keys.toSeq.sorted.map(id => q.find(_._1 == id).get._2)
          cl -> vs.transpose.map(col => col.sum / vs.size).toSeq
        }
        assign = q.map { case (id, v) =>
          id -> cents.minBy { case (cl, c) => (d2(v, c), cl) }._1
        }.toMap
      }
      assign.groupBy(_._2).toSeq.sortBy(_._1).map { case (cl, members) =>
        val c = cents.find(_._1 == cl).get._2
        val ds = members.keys.toSeq.sorted.map(id => (id, d2(q.find(_._1 == id).get._2, c)))
        (cl, members.size.toLong, ds.map(_._2).sum,
          ds.minBy { case (id, d) => (d, id) }._1)
      }
    }
    val rnd = new scala.util.Random(0xC10AL)
    for (trial <- 0 until 3) {
      val n = 30 + rnd.nextInt(30)
      val dim = 4
      val vecs = (0L until n.toLong).map(i =>
        (i, Array.fill(dim)((rnd.nextFloat() - 0.5f) * 2f)))
      val seedIds = rnd.shuffle(vecs.map(_._1)).take(3).sorted
      val refits = 1 + rnd.nextInt(2)
      val emb = vecs.toDF("vec_id", "embedding")
      val got = SemanticCluster.lloyd(emb, col("embedding"), col("vec_id"),
          emb.where(col("vec_id").isin(seedIds: _*)), refits)
        .orderBy("cluster").as[(Long, Long, Long, Long)].collect().toSeq
      val want = reference(vecs, seedIds, refits)
      assert(got === want, s"trial $trial (n=$n seeds=$seedIds refits=$refits)")
    }
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
