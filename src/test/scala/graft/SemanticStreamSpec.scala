package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.CorpusStream

/** Streaming semantic dedup ([[CorpusStream.semanticAdmitBatch]]):
  * greedy prefix admission must be batch-split invariant, satisfy the
  * maximal-independent-set contract exactly (every rejection names an
  * admitted in-threshold witness; no two admitted vectors in a cell
  * are within threshold), and replay idempotently.
  */
class SemanticStreamSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val emb = Tables.embeddings(spark, dir)
    .select(col("vec_id").cast("long").as("vec_id"),
      col("embedding").cast("array<float>").as("v"))
  private lazy val centroids: Seq[Seq[Float]] =
    emb.where(col("vec_id") < 4).orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toSeq).toSeq

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-sem-$name").toString

  private def decisionsOf(decDir: String): Set[(Long, Int, Boolean, Long)] =
    spark.read.parquet(decDir)
      .select(col("vec_id"), col("cell"), col("admitted"), col("dup_of"))
      .as[(Long, Int, Boolean, Long)].collect().toSet

  test("admission decisions are batch-split invariant") {
    val (s1, d1) = (tmp("a") + "/store", tmp("a") + "/dec")
    CorpusStream.semanticAdmitBatch(s1, d1, centroids)(emb, 0L)
    val (s3, d3) = (tmp("b") + "/store", tmp("b") + "/dec")
    // id-ordered splits: the greedy prefix order must match the
    // single-batch in-batch order for the policies to be comparable
    CorpusStream.semanticAdmitBatch(s3, d3, centroids)(
      emb.where(col("vec_id") < 170), 0L)
    CorpusStream.semanticAdmitBatch(s3, d3, centroids)(
      emb.where(col("vec_id") >= 170 && col("vec_id") < 340), 1L)
    CorpusStream.semanticAdmitBatch(s3, d3, centroids)(
      emb.where(col("vec_id") >= 340), 2L)
    val one = decisionsOf(d1)
    val split = decisionsOf(d3)
    assert(one.nonEmpty && one === split)
    // and the signal is real: the fixture has both rejections and
    // multi-cell admissions
    assert(one.exists(!_._3) && one.count(_._3) > 400)
  }

  test("greedy-MIS contract holds against a sequential in-memory replay") {
    val (s1, d1) = (tmp("c") + "/store", tmp("c") + "/dec")
    CorpusStream.semanticAdmitBatch(s1, d1, centroids)(emb, 0L)
    val dec = spark.read.parquet(d1)
      .select(col("vec_id"), col("cell"), col("admitted"), col("dup_of"))
    // independent edge recomputation: same cells (from the decisions),
    // threshold recomputed from raw vectors via the registered kernel
    val qdot = graft.functions.GraftFunctions.registerQDot(spark)
    val vv = emb.join(dec.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .withColumn("n2", qdot(col("v"), col("v")))
    val pairs = vv.as("x").join(vv.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        qdot(col("x.v"), col("y.v")).as("dot"),
        col("x.n2").as("n2a"), col("y.n2").as("n2b"))
      .where(col("dot") > 0 &&
        lit(10000L).cast("decimal(38,0)") *
          col("dot").cast("decimal(38,0)") * col("dot").cast("decimal(38,0)") >=
        lit(1600L).cast("decimal(38,0)") *
          col("n2a").cast("decimal(38,0)") * col("n2b").cast("decimal(38,0)"))
      .select(col("a"), col("b")).as[(Long, Long)].collect()
    val nbrs = pairs.groupBy(_._2).map { case (b, xs) => b -> xs.map(_._1).toSet }
    val got = dec.as[(Long, Int, Boolean, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    // sequential replay in plain Scala
    val admitted = scala.collection.mutable.Set.empty[Long]
    got.keys.toSeq.sorted.foreach { id =>
      val witnesses = nbrs.getOrElse(id, Set.empty).filter(admitted)
      val expect = if (witnesses.isEmpty) (true, -1L)
        else (false, witnesses.min)
      assert(got(id) === expect, s"vec $id")
      if (witnesses.isEmpty) admitted += id
    }
    assert(admitted.nonEmpty)
  }

  test("crash-replay of a batch replaces its output; store holds admitted only") {
    val (s3, d3) = (tmp("d") + "/store", tmp("d") + "/dec")
    val b0 = emb.where(col("vec_id") < 250)
    val b1 = emb.where(col("vec_id") >= 250)
    CorpusStream.semanticAdmitBatch(s3, d3, centroids)(b0, 0L)
    CorpusStream.semanticAdmitBatch(s3, d3, centroids)(b1, 1L)
    def storeSet: Set[Long] = spark.read.parquet(s3)
      .select(col("vec_id")).as[Long].collect().toSet
    val before = storeSet
    val decBefore = decisionsOf(d3)
    CorpusStream.semanticAdmitBatch(s3, d3, centroids)(b1, 1L) // replay
    assert(storeSet === before)
    assert(decisionsOf(d3) === decBefore)
    // the store is exactly the admitted set
    assert(before === decBefore.filter(_._3).map(_._1))
  }
}
