package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc dev scratch main (not part of the library surface). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("dedup_minhash_lsh")(spark, dir).count()
      println(f"== dedup_minhash_lsh run$i rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
