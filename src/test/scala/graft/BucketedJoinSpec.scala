package graft

import org.apache.spark.sql.functions._

/** The 100 TB co-location story: two tables bucketed on their join key
  * read back pre-partitioned, so the fact-fact join — AND a downstream
  * aggregation on the same key — run with ZERO shuffle exchanges. This
  * is what "pre-partition the big joins" in SCALE.md concretely means;
  * losing the bucketing contract (a writer dropping bucketBy, a reader
  * losing the output-partitioning report) should fail here.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join + same-key aggregation run shuffle-free") {
    // force the join to stay sort-merge: at fixture scale both AQE and
    // the static planner would otherwise broadcast the small side,
    // which hides exactly the exchange this test guards against
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    restore.foreach { case (k, _) => spark.conf.set(k, "-1") }
    try {
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast("decimal(12,2)")).as("q"))
      // collect() executes THIS QueryExecution (count() would build its
      // own), so the asserted plan is the AQE-finalized one
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), "join must stay sort-merge")
      assert(!plan.contains("Exchange"),
        s"bucketed join/agg must not shuffle:\n$plan")

      // and the result is the same as the unbucketed plan
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), $"l_orderkey" === $"o_orderkey")
        .count()
      assert(spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), $"l_orderkey" === $"o_orderkey")
        .count() === expected)
    } finally {
      restore.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
