package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Text}

/** Prefix filtering is an EXACT candidate generator: its output must
  * equal brute-force all-pairs Jaccard — no probabilistic misses to
  * calibrate, which is its selling point over the LSH channels. */
class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("prefix-filter pairs == brute-force all-pairs shingle Jaccard >= 1/2") {
    val docs = Tables.documents(spark, dir)
    val got = Dedup.prefixFilterPairs(docs, col("text"), col("doc_id"))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    // brute force: all pairs over the same distinct 3-shingles
    // (fixture-sized only — the quadratic form the operator avoids)
    val sh = Text.distinctShingles(docs, col("text"), col("doc_id"), 3)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .where(lit(2) * col("inter") >= col("ca.n") + col("cb.n") - col("inter"))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    assert(got === brute)
    assert(got.nonEmpty, "fixture should contain at least one near-dup pair")
  }

  test("PPJoin length+position filters stay exact on randomized corpora") {
    // the filters prune candidate ROWS, never qualifying PAIRS; this
    // stresses the regimes the fixture lacks — tiny docs, wildly
    // uneven sizes (length filter active), heavy shared boilerplate
    // shingles (position filter active) — at several thresholds
    val rnd = new scala.util.Random(9090)
    val vocab = Vector("red", "blue", "green", "ink", "dot", "sky", "sun",
      "map", "key", "log", "row", "bit")
    for ((num, den) <- Seq((1, 2), (2, 3), (4, 5))) {
      val docs = (1 to 60).map { id =>
        val base = Vector.fill(3 + rnd.nextInt(4))(vocab(rnd.nextInt(4))) // hot
        val tail = Vector.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        (id.toLong, (base ++ tail).mkString(" "))
      }.toDF("doc_id", "text")
      val got = Dedup.prefixFilterPairs(docs, col("text"), col("doc_id"),
          num = num, den = den)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      val sh = Text.distinctShingles(docs, col("text"), col("doc_id"), 3)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val brute = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
        .where(lit(den) * col("inter") >=
          lit(num) * (col("ca.n") + col("cb.n") - col("inter")))
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(got === brute, s"threshold $num/$den")
    }
  }

  test("containment position filter stays exact on randomized skewed corpora") {
    // the containment-adapted position bound prunes candidate ROWS,
    // never qualifying PAIRS; stress the near-subset regime (tiny doc
    // inside huge doc) plus hot boilerplate at several thresholds
    val rnd = new scala.util.Random(6161)
    val vocab = Vector("red", "blue", "green", "ink", "dot", "sky", "sun",
      "map", "key", "log", "row", "bit", "fog", "ice")
    for ((num, den) <- Seq((1, 2), (8, 10), (2, 3))) {
      val docs = (1 to 50).map { id =>
        val base = Vector.fill(3 + rnd.nextInt(3))(vocab(rnd.nextInt(4)))
        val tail = Vector.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
        (id.toLong, (base ++ tail).mkString(" "))
      }.toDF("doc_id", "text")
      val got = Dedup.containmentPrefixPairs(docs, col("text"), col("doc_id"),
          num = num, den = den, maxOcc = 1000000)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      val sh = Text.distinctShingles(docs, col("text"), col("doc_id"), 3)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val brute = sh.as("a").join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("inter"))
        .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
        .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
        .where(lit(den) * col("inter") >=
          lit(num) * least(col("ca.n"), col("cb.n")))
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(got === brute, s"threshold $num/$den")
      assert(got.nonEmpty, s"threshold $num/$den must discriminate")
    }
  }

  test("containment position filter: ACTIVE cap regime equals the plain prefix join") {
    // heavy shared boilerplate + a tiny cap forces corpus-hot shingles
    // INTO prefixes (the regime where the positional bound's witness
    // can be capped away); the pc-gated filter must reproduce the
    // plain pre x ful join's verified pairs exactly, not approximately
    val rnd = new scala.util.Random(7777)
    val hot = Vector("the", "quick", "brown", "fox")
    val vocab = Vector("red", "blue", "green", "ink", "dot", "sky", "sun",
      "map", "key", "log", "row", "bit", "fog", "ice", "oak", "elm")
    val docs = (1 to 60).map { id =>
      val base = Vector.tabulate(4)(i => hot(i % hot.size)) // shared = hot
      val tail = Vector.fill(4 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
      (id.toLong, (base ++ tail).mkString(" "))
    }.toDF("doc_id", "text")
    for (cap <- Seq(3, 10, 25)) {
      val got = Dedup.containmentPrefixPairs(docs, col("text"), col("doc_id"),
          maxOcc = cap)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      // the r13 plain-join formulation, rebuilt verbatim
      val sh = Text.distinctShingles(docs, col("text"), col("doc_id"), 3)
      val ranked = Dedup.rankShingles(sh)
      val pre = ranked
        .where(col("rn") <= col("n") - expr("(n * 8 + 9) div 10") + 1 &&
          col("f") <= cap)
        .select(col("doc_id"), col("shingle"))
      val ful = ranked.where(col("f") <= cap)
        .select(col("doc_id"), col("shingle"))
      val cand = pre.as("x").join(ful.as("y"),
          col("x.shingle") === col("y.shingle") &&
            col("x.doc_id") =!= col("y.doc_id"))
        .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
          greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
        .distinct()
      val plain = Dedup.containmentVerify(cand, sh, 8, 10)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      assert(got === plain, s"cap $cap")
    }
  }

  test("containment-prefix pairs == brute-force all-pairs containment >= 8/10") {
    val docs = Tables.documents(spark, dir)
    // maxOcc above any fixture shingle frequency -> exactly complete
    val got = Dedup.containmentPrefixPairs(docs, col("text"), col("doc_id"),
        maxOcc = 1000000)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    val sh = Text.distinctShingles(docs, col("text"), col("doc_id"), 3)
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .where(lit(10) * col("inter") >= lit(8) * least(col("ca.n"), col("cb.n")))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("containment-prefix finds the skewed near-subset pair LSH bands miss") {
    // short doc (8 distinct shingles) fully contained in a long doc of
    // 200: containment = 1 but Jaccard = 8/200 = 0.04 — at J=0.04 the
    // 8-band/4-row s-curve collision chance is 1-(1-J^4)^8 ~ 2e-5, so
    // the Jaccard-tuned LSH channel essentially never surfaces it; the
    // prefix channel MUST, deterministically
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val long = (1 to 202).map(i => s"w$i").mkString(" ")
    val noise = (300 to 340).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long), (3L, noise)).toDF("doc_id", "text")
    val got = Dedup.containmentPrefixPairs(docs, col("text"), col("doc_id"))
      .select($"doc_a", $"doc_b", $"inter", $"min_sz")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 8L, 8L)), s"got $got")
    val lsh = Dedup.minhashContainmentDups(docs, col("text"), col("doc_id"))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(!lsh.contains((1L, 2L)),
      "if the LSH channel starts finding this pair, the premise of the " +
        "second channel changed — re-check the band tuning")
  }

  test("prefix length arithmetic: n - ceil(n/2) + 1 over threshold 1/2") {
    // a doc with 4 distinct tokens keeps a 3-token prefix; sharing
    // only the doc's 2 MOST-frequent tokens cannot reach J >= 1/2
    // against it, and the candidate join must still find every true
    // pair — covered by the brute-force equality above; here pin the
    // arithmetic itself
    val l = (n: Int, num: Int, den: Int) => n - ((n * num + den - 1) / den) + 1
    assert(l(4, 1, 2) === 3 && l(5, 1, 2) === 3 && l(1, 1, 2) === 1)
    assert(l(10, 4, 5) === 3) // J >= 0.8 -> short prefixes
  }
}
