package graft

import org.apache.spark.sql.functions._
import graft.ops.Rollup

/** Partial-aggregate mergeability: merging partials from ANY disjoint
  * split of the facts equals the direct one-pass aggregate. */
class RollupSpec extends SparkSpec {

  test("merge of a 3-way hash split equals the direct aggregate") {
    val facts = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("x"))
    val direct = facts.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"), sum(col("x")).cast("long").as("total"),
        min(col("x")).as("vmin"), max(col("x")).as("vmax"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap

    // arbitrary 3-way split (hash of the row's exact value mix)
    val slices = (0 until 3).map(i =>
      facts.where(pmod(hash(col("event_type"), col("day"), col("x")), lit(3)) === i))
    val merged = Rollup.merge(
      slices.map(Rollup.partials(_, col("day"), Seq(col("event_type")), col("x")))
        .reduce(_ unionByName _),
      Seq(col("event_type")))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap

    assert(merged === direct)
  }

  test("a single-bucket refresh only touches that bucket's partials") {
    val facts = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("x"))
    val all = Rollup.partials(facts, col("day"), Seq(col("event_type")), col("x"))
    val d = "2024-01-03"
    // refresh = recompute ONE day's partials from that day's facts and
    // splice them over the stored table — the incremental contract
    val refreshed = all.where(col("bucket") =!= lit(d).cast("date"))
      .unionByName(Rollup.partials(facts.where(col("day") === lit(d).cast("date")),
        col("day"), Seq(col("event_type")), col("x")))
    val a = Rollup.merge(all, Seq(col("event_type"))).orderBy("event_type").collect().toSeq
    val b = Rollup.merge(refreshed, Seq(col("event_type"))).orderBy("event_type").collect().toSeq
    assert(a === b)
  }
}
