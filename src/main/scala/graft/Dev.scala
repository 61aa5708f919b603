package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.{Similarity, Vectors}

/** Ad-hoc dev scratch main (not part of the library surface). */
object Dev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // bigger workload than the fixture so the scoring loop dominates:
    // 200k candidates x 32 queries x 64 dims
    val rnd = new scala.util.Random(5)
    val cands = spark.range(200000).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() - 0.5f).toSeq)
    }.toDF("vec_id", "embedding").persist()
    val qs = spark.range(32).map { i =>
      (i, Array.fill(64)(rnd.nextFloat() - 0.5f).toSeq)
    }.toDF("vec_id", "embedding").persist()
    cands.count(); qs.count()

    val qdot = GraftFunctions.registerQDot(spark)
    def fused(): Long =
      Similarity.topKBruteForce(cands, qs, col("embedding"), col("vec_id"), 10).count()
    def composed(): Long = {
      val c = cands.select(col("vec_id"), Vectors.quantize(col("embedding")).as("q"))
      val s = qs.select(col("vec_id").as("q_vec_id"), Vectors.quantize(col("embedding")).as("qq"))
      val scored = c.crossJoin(broadcast(s))
        .select(col("q_vec_id"), col("vec_id"), Vectors.intDot(col("q"), col("qq")).as("dot"))
      scored.withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q_vec_id"))
            .orderBy(col("dot").desc, col("vec_id").asc)))
        .where(col("rnk") <= 10).count()
    }
    for (i <- 1 to 3) {
      var t0 = System.nanoTime(); val a = composed()
      println(f"== composed run$i rows=$a time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime(); val b = fused()
      println(f"== fused    run$i rows=$b time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
