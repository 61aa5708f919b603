package graft

import org.apache.spark.sql.functions._
import graft.ops.Linkage

/** Sorted-neighborhood linkage + the distributed global-rank
  * primitive under it: rank exactness and partition-count invariance,
  * window completeness of the bucket join, and the measured (not
  * hidden) recall profile of multi-pass SNM on the dirty-feed
  * fixture. */
class SnmLinkageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("globalRank: exact 1..N dense ranks matching a driver-side sort") {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
    val ranked = Linkage.globalRank(c, col("c_name"), col("c_custkey"))
      .collect().map(r => (r.getAs[String]("c_name"),
        r.getAs[Long]("c_custkey"), r.getAs[Long]("rank")))
    val expect = ranked.sortBy(p => (p._1, p._2)).zipWithIndex
      .map { case ((n, k, _), i) => (n, k, i + 1L) }
    assert(ranked.sortBy(_._3).sameElements(expect.sortBy(_._3)),
      "ranks must equal the total-order row number")
    assert(ranked.map(_._3).toSet == (1L to ranked.length).toSet,
      "ranks must be dense 1..N with no duplicates or gaps")
  }

  test("snmCandidates: exactly the pairs within w in sort order") {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
    val w = 7
    val got = Linkage.snmCandidates(c, w, col("c_name"), col("c_custkey"))
      .select(col("c_custkey_a"), col("c_custkey_b"),
        col("rank_a"), col("rank_b"))
      .collect()
      .map(r => (r.getAs[Long]("c_custkey_a"), r.getAs[Long]("c_custkey_b")))
      .toSet
    val sorted = c.collect()
      .map(r => (r.getAs[String]("c_name"), r.getAs[Long]("c_custkey")))
      .sortBy(identity)
    val expect = (for {
      i <- sorted.indices
      j <- (i + 1) to math.min(i + w, sorted.length - 1)
    } yield (sorted(i)._2, sorted(j)._2)).toSet
    assert(got == expect,
      "bucket join must produce exactly the rank-window pairs")
  }

  test("snm linkage: found implies verified; recall profile is the honest gap") {
    val out = SparkEntry.queries("customers_snm_linkage")(spark, dir).collect()
    val n = out.length
    assert(n == Tables.customer(spark, dir).count())
    out.foreach { r =>
      if (r.getAs[Boolean]("found")) {
        assert(r.getAs[Long]("lev_dist") >= 0 && r.getAs[Long]("lev_dist") <= 2)
        assert(r.getAs[Long]("n_cand") >= 1)
      } else {
        assert(r.getAs[Long]("matched_custkey") == -1L &&
          r.getAs[Long]("lev_dist") == -1L && r.getAs[Long]("n_cand") == 0L)
      }
    }
    // multi-pass SNM on the DENSE fixture: SNM is incomplete in
    // general (a mid-digit transposition behind the low-entropy
    // shared prefix moves a record out of its twin's forward-sort
    // window), but on a dense sequential key space the sort window
    // always holds SOME lev<=2 neighbor, so every record links
    // (found-rate 1.0 measured at sf0.001 and sf0.01) and the
    // (lev, key)-minimal winner coincides with the
    // deletion-neighborhood channel's. The discriminating metrics
    // here are the ones below, not found-rate.
    val found = out.count(_.getAs[Boolean]("found"))
    assert(found * 2 > n, s"found $found of $n: reverse pass alone covers half")
    // p <= 12 (m = custkey % 6 in 0..2): suffix-5 intact means the
    // reversed names share a 5-char prefix and last-5 digits are
    // unique at this scale, so the reverse pass must link these
    // CORRECTLY, not merely to an impostor
    val suffixIntact = out.filter(r => r.getAs[Long]("dirty_id") % 6 < 3)
    assert(suffixIntact.forall(r =>
        r.getAs[Long]("matched_custkey") == r.getAs[Long]("dirty_id")),
      "reverse pass must correctly link every suffix-intact record")
    // overall correct-link rate clears the same ambiguity floor the
    // deletion channel's spec pins
    val correct = out.count(r =>
      r.getAs[Long]("matched_custkey") == r.getAs[Long]("dirty_id"))
    assert((n - correct) * 3 < n, "accuracy must exceed 2/3")
  }

  test("globalRank: randomized datasets with heavy ties rank exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 3) {
      val n = 200 + rnd.nextInt(300)
      // small key space forces ties across range-partition boundaries
      val rows = (1 to n).map(i => (rnd.nextInt(7).toString, i.toLong))
      val df = rows.toDF("key", "id")
      val got = graft.ops.Linkage.globalRank(df, col("key"), col("id"))
        .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("id")) ->
          r.getAs[Long]("rank")).toMap
      val expect = rows.sorted.zipWithIndex
        .map { case (kv, i) => kv -> (i + 1L) }.toMap
      assert(got == expect, s"trial $trial")
    }
  }

  test("globalRank is invariant to the shuffle partition count") {
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    def ranks() = Linkage.globalRank(c, col("c_name"), col("c_custkey"))
      .select(col("c_custkey"), col("rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val r3 = ranks()
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val r17 = ranks()
      assert(r3 == r17, "rank must not depend on the partition count")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
