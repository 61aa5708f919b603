package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** [[Skew.saltedJoin]] must be row-identical to the plain join on a
  * fixture with a genuinely hot key (including duplicate identical
  * rows — the case the partition-id term in the salt exists for),
  * and must actually spread the hot key across salts. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // key 1 is hot: 400 rows, 100 of them bit-identical (v=0);
  // keys 2..20 have 3 rows each; key 99 has no build-side match
  private def probe = (
    (1 to 300).map(i => (1L, i.toLong)) ++
    (1 to 100).map(_ => (1L, 0L)) ++
    (for (k <- 2 to 20; i <- 1 to 3) yield (k.toLong, i.toLong)) ++
    Seq((99L, 1L))
  ).toDF("k", "v")

  private def build =
    (1 to 20).map(k => (k.toLong, s"dim$k")).toDF("k", "name")

  test("salted inner join is row-identical to the plain join") {
    val plain = probe.join(build, Seq("k"), "inner")
      .groupBy("k", "v", "name").count()
    val salted = Skew.saltedJoin(probe, build, Seq("k"), 8)
      .groupBy("k", "v", "name").count()
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join keeps unmatched probe rows exactly once") {
    val salted = Skew.saltedJoin(probe, build, Seq("k"), 8, "left")
    assert(salted.count() === probe.count())
    assert(salted.where(col("k") === 99L && col("name").isNull).count() === 1L)
  }

  test("the hot key's rows actually land on multiple salts") {
    // observe the OPERATOR'S salt expression (Skew.probeSalt is the
    // same Column saltedJoin assigns): > 1 distinct value for the hot
    // key means the reducer fan-out is real; a drift to key-only
    // salting would collapse this to 1 and fail here
    val salts = probe.withColumn("s", Skew.probeSalt(Seq("k"), 8))
      .where(col("k") === 1L)
      .select(countDistinct(col("s"))).as[Long].head()
    assert(salts > 1L, s"hot key collapsed onto $salts salt(s)")
    // the canonical worst case: a hot key whose rows are bit-identical
    val ident = (1 to 64).map(_ => (1L, 0L)).toDF("k", "v")
      .repartition(4)
      .withColumn("s", Skew.probeSalt(Seq("k"), 8))
      .select(countDistinct(col("s"))).as[Long].head()
    assert(ident > 1L, s"identical-row hot key collapsed onto $ident salt(s)")
  }

  test("rejects join types that would double-count the replicated build side") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(probe, build, Seq("k"), 8, "full")
    }
  }
}
