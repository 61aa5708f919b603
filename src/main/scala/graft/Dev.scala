package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev scratch main (not part of the library surface). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def run(name: String): Unit = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, dir).count()
      println(f"== $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val pred = sys.env.getOrElse("DEV_PRED", "q1_agg,cdc_dedup_first,cdc_latest_per_key,q5_multijoin,cdc_dlq_split,events_hourly_agg,events_json_extract,events_sessionize")
      .split(",").filter(_.nonEmpty)
    // warm up JIT first so timings isolate the contamination effect
    run("cdc_city_totals"); run("cdc_city_totals")
    pred.foreach(run)
    run("cdc_city_totals"); run("cdc_city_totals"); run("cdc_city_totals")
    spark.stop()
  }
}
