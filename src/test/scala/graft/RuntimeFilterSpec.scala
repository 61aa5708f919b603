package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Guard for Spark's runtime bloom-filter injection — the semi-join
  * reduction SCALE.md leans on at 100 TB: when a fact⋈dim join has a
  * selective predicate on the dim side, the optimizer builds a bloom
  * filter from the filtered dim keys and applies it INSIDE the fact
  * side's scan stage, so the big shuffle carries only rows that can
  * possibly join (shuffle volume ∝ dim selectivity, not fact size).
  *
  * The fixture sides are tiny, so the spec lowers the application-side
  * scan-size threshold to zero and disables broadcast joins — the
  * production defaults (10 GB application side, 10 MB creation side)
  * are exactly the 1000-executor regime where this rule fires on its
  * own. What is being pinned is that the plan SHAPE survives our
  * session extensions and conf set: if injection stops firing, fact
  * shuffles stop being pruned and the 100 TB story silently degrades.
  */
class RuntimeFilterSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter into the fact scan side") {
    val tmp = Files.createTempDirectory("graft_rf").toFile.getAbsolutePath
    spark.range(100000)
      .select(col("id"), (col("id") % 997).as("fact_key"),
        (col("id") * 31 % 1000).as("payload"))
      .write.mode("overwrite").parquet(s"$tmp/fact")
    spark.range(997)
      .select(col("id").as("dim_key"), (col("id") % 20).as("dim_cat"))
      .write.mode("overwrite").parquet(s"$tmp/dim")

    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$tmp/fact")
      val dim = spark.read.parquet(s"$tmp/dim").where(col("dim_cat") === 3)
      val joined = fact.join(dim, col("fact_key") === col("dim_key"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("might_contain"),
        s"runtime bloom filter was not injected:\n${optimized.take(4000)}")
      // and the result is still correct: 997 keys, 1 in 20 categories,
      // ~100 fact rows per key
      val n = joined.count()
      val expected = spark.read.parquet(s"$tmp/fact")
        .join(spark.read.parquet(s"$tmp/dim").where(col("dim_cat") === 3),
          col("fact_key") === col("dim_key")).count()
      assert(n == expected && n > 0)
    }
  }
}
