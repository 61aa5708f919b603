package graft

import org.apache.spark.sql.functions._
import graft.ops.Vectors

/** [[Vectors.signProject]] (JL ±1 projection): pinned against a
  * driver-side fold over the same seeded hyperplanes, plus its
  * relationship to [[Vectors.signBucket]] (the bucket is exactly the
  * sign pattern of the projection).
  */
class VectorsSpec extends SparkSpec {
  import spark.implicits._

  test("mutualKnn matches a driver-side fold of the bucket/top-k/reciprocity pipeline") {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toList
    val hp = Vectors.hyperplanes(6, 64)
    val q: List[(Long, Seq[Long])] = emb.map { case (id, v) =>
      (id, v.map(x => math.round(x.toDouble * 1000)))
    }
    def bucket(x: Seq[Long]): Long =
      hp.zipWithIndex.map { case (p, j) =>
        val proj = p.zip(x).map { case (w, c) => w * c }.sum
        if (proj >= 0) 1L << j else 0L
      }.sum
    val byBucket = q.groupBy(x => bucket(x._2))
    val topk: Map[(Long, Long), Long] = byBucket.values.toList.flatMap { vs =>
      vs.flatMap { case (a, qa) =>
        vs.filter(_._1 != a)
          .map { case (b, qb) => (b, qa.zip(qb).map { case (x, y) => x * y }.sum) }
          .sortBy { case (b, dot) => (-dot, b) }.take(5)
          .map { case (b, dot) => ((a, b), dot) }
      }
    }.toMap
    val want = topk.collect { case ((a, b), dot)
      if a < b && topk.contains((b, a)) => (a, b, dot) }.toSet
    val got = ExtensionQueries.queries("emb_mutual_knn")(spark, dir)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // reciprocity by construction: no one-sided edge survives
    got.foreach { case (a, b, _) =>
      assert(topk.contains((a, b)) && topk.contains((b, a)))
    }
  }

  private val vecs = Seq(
    (0L, Array(0.5f, -1.0f, 0.25f, 2.0f)),
    (1L, Array(-0.1f, 0.0f, 1.5f, -0.75f)),
    (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)))

  private def quantized(v: Array[Float]): Seq[Long] =
    v.map(x => math.round(x.toDouble * 1000)).toSeq

  test("emb_label_spread matches a 2-round driver fold over the verified edge set") {
    val dir = "/root/testdata/sf0.001"
    val edges = ExtensionQueries.queries("emb_mutual_knn")(spark, dir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toList
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)].collect().toMap
    var lab: Map[Long, Option[Long]] = labels.map { case (id, l) =>
      id -> (if (id % 10 == 0) Some(l) else None)
    }
    for (_ <- 1 to 2) {
      lab = lab.map {
        case (id, Some(l)) => id -> Some(l)
        case (id, None) =>
          val votes = adj.getOrElse(id, Nil).flatMap(lab(_))
          id -> (if (votes.isEmpty) None
            else Some(votes.groupBy(identity).view.mapValues(_.size).toList
              .maxBy { case (l, c) => (c, -l) }._1))
      }
    }
    val got = ExtensionQueries.queries("emb_label_spread")(spark, dir)
      .select($"vec_id", $"spread_label").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got === lab)
    // non-vacuous: spreading labeled vectors beyond the 10% seed set
    assert(lab.count(_._2.isDefined) > lab.keys.count(_ % 10 == 0))
  }

  test("signProject matches a driver-side fold over the shared hyperplanes") {
    val planes = 6
    val hp = Vectors.hyperplanes(planes, 4)
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Vectors.signProject(Vectors.quantize(col("embedding")), planes, 4).as("p"))
      .as[(Long, Seq[Long])].collect().toMap
    for ((id, v) <- vecs) {
      val q = quantized(v)
      val want = hp.map(p => p.zip(q).map { case (w, x) => w * x }.sum)
      assert(got(id) === want, s"vec $id")
    }
  }

  test("null vector degrades to the zero projection / all-set bucket on BOTH engines") {
    // a fully-null embedding array must agree with the SQL mirrors'
    // COALESCE(list_sum(...), 0): projection components 0, and every
    // bucket bit set (0 >= 0) — Spark's null-propagating aggregate
    // would otherwise yield NULL components and a zero bucket,
    // splitting the driver's hash compare on a null-bearing fixture
    val bits = 5
    val df = Seq((0L, Option(Array(0.5f, -1.0f, 0.25f, 2.0f))), (1L, None))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Vectors.signProject(Vectors.quantize(col("embedding")), bits, 4).as("p"),
        Vectors.signBucket(Vectors.quantize(col("embedding")), bits, 4).as("b"))
      .as[(Long, Seq[Long], Long)].collect()
      .map { case (k, p, b) => k -> ((p, b)) }.toMap
    val (pNull, bNull) = df(1L)
    assert(pNull === Seq.fill(bits)(0L))
    assert(bNull === (1L << bits) - 1)
    val (pReal, _) = df(0L)
    assert(pReal.exists(_ != 0L)) // non-null rows unaffected
  }

  test("signBucket is the sign pattern of signProject") {
    val bits = 5
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        Vectors.signProject(Vectors.quantize(col("embedding")), bits, 4).as("p"),
        Vectors.signBucket(Vectors.quantize(col("embedding")), bits, 4).as("b"))
      .as[(Long, Seq[Long], Long)].collect()
    for ((_, p, b) <- df) {
      val want = p.zipWithIndex.map { case (x, j) => if (x >= 0) 1L << j else 0L }.sum
      assert(b === want)
    }
  }

  test("mmrRerank trades the redundant near-dup for a diverse pick") {
    // The query must NOT coincide with the top hit: with chosen₁ == q,
    // λ=1/2 cancels relevance against redundancy identically for every
    // doc (dot(d,q) − dot(d,q) = 0) and the re-rank degenerates to id
    // order — the first version of this test planted exactly that.
    // Here: doc 1 is the top hit, doc 2 its near-dup (tiny marginal
    // score once 1 is chosen), doc 3 the diverse direction that MMR
    // must promote over 2 despite lower raw relevance.
    val docs = Seq(
      (0L, Seq(1.0f, 0.2f, 0.0f, 0.0f)), // query
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f, 0.0f, 0.0f)),
      (3L, Seq(0.3f, 0.9f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.mmrRerank(docs, col("embedding"),
        col("vec_id"), queryId = 0L, shortlist = 10, k = 2)
      .select($"rank", $"vec_id", $"dot_q", $"mmr")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got.map(_._2) === List(1L, 3L), s"got $got")
    // driver recheck of the exact integers: quantized vectors
    def qz(v: Seq[Float]) = v.map(x => math.round(x.toDouble * 1000))
    def dot(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => x * y }.sum
    val (v1, v2, v3) = (qz(Seq(1f, 0f, 0f, 0f)), qz(Seq(0.99f, 0.01f, 0f, 0f)),
      qz(Seq(0.3f, 0.9f, 0f, 0f)))
    val vq = qz(Seq(1f, 0.2f, 0f, 0f))
    assert(got.head._3 === dot(v1, vq) && got.head._4 === dot(v1, vq))
    assert(got(1)._3 === dot(v3, vq))
    assert(got(1)._4 === dot(v3, vq) - dot(v3, v1))
    // and the near-dup would have scored lower — the inequality that
    // makes the re-rank DO something
    assert(dot(v2, vq) - dot(v2, v1) < dot(v3, vq) - dot(v3, v1))
  }

  test("mmrRerank at lambda=1 reduces to pure relevance order") {
    // Same fixture as above: at λ = 1 the diversity term carries
    // weight 0, so the redundant near-dup (doc 2) keeps its raw-score
    // rank ahead of the diverse doc 3 — the exact opposite of the
    // λ = 1/2 pick, pinning that the parameter actually steers.
    val docs = Seq(
      (0L, Seq(1.0f, 0.2f, 0.0f, 0.0f)), // query
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.01f, 0.0f, 0.0f)),
      (3L, Seq(0.3f, 0.9f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = graft.ops.Similarity.mmrRerank(docs, col("embedding"),
        col("vec_id"), queryId = 0L, shortlist = 10, k = 3,
        lamNum = 1, lamDen = 1)
      .select($"rank", $"vec_id", $"dot_q", $"mmr")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got.map(_._2) === List(1L, 2L, 3L), s"got $got")
    // every pick's mmr equals its relevance — no diversity discount
    assert(got.forall(r => r._3 === r._4), s"got $got")
  }

  test("signBucket prefix property: b-bit bucket = 24-bit bucket mod 2^b") {
    // load-bearing for the corpus-scaled LSH width: the Spark side
    // computes signBucket(v, bits) directly while the DuckDB oracle
    // masks the full 24-bit bucket — they agree only because
    // hyperplanes draws planes sequentially from one fixed seed, so
    // planes(8) is a prefix of planes(24). A reseeded-per-width
    // generator would silently split the engines at sf > 0.1.
    val rnd = new scala.util.Random(271828)
    val vecs = (1L to 50L).map(i =>
      (i, Seq.fill(64)((rnd.nextFloat() - 0.5f) * 2f))).toDF("vec_id", "v")
      .select(col("vec_id"), graft.ops.Vectors.quantize(col("v")).as("q"))
    for (bits <- Seq(8, 12, 17)) {
      val got = vecs.select(col("vec_id"),
          graft.ops.Vectors.signBucket(col("q"), bits).as("b"),
          (graft.ops.Vectors.signBucket(col("q"), 24) % (1L << bits)).as("m"))
        .as[(Long, Long, Long)].collect()
      assert(got.forall(r => r._2 == r._3),
        s"prefix property broken at bits=$bits: " +
          got.filter(r => r._2 != r._3).take(3).mkString(","))
    }
  }
}
