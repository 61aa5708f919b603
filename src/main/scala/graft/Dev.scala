package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev scratch main (not part of the library surface):
  * `runMain graft.Dev q1 q2 ...` times each named query `n` times in a
  * fresh JVM — the uncontaminated ground truth for bench numbers.
  */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.nanosConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("dedup_minhash_lsh")
    for (name <- names; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val n = df.count()
      println(f"== $name run$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (i == 1 && sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        println(df.queryExecution.executedPlan.toString.take(8000))
      spark.catalog.clearCache() // Bench's inter-run hygiene

    }
    spark.stop()
  }
}
