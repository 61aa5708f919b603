package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic clustering / semantic dedup over an embedding column: one
  * exact-integer Lloyd round of k-means (assign → refit → re-assign)
  * with data-point seeds, emitting per-cluster size, inertia, and the
  * representative (medoid-ish) vector — the "keep one document per
  * embedding cluster" primitive of semantic dedup.
  *
  * Everything is integer arithmetic over [[Vectors.quantize]]d
  * components, so the result is bit-identical across engines /
  * partitionings and the DuckDB oracle can hash-pin it:
  *  - seed distance uses `‖c‖² − 2·x·c` (the per-row `‖x‖²` shift
  *    cannot change a row's argmin, so it is dropped);
  *  - the refit centroid is the TRUNCATED integer mean `Σx_d div m`
  *    (toward zero — Spark `div`, DuckDB `//`, and Scala `Long`
  *    division all agree, verified on negatives), which sits within
  *    one quantization unit (1e-3) of the float mean — below the
  *    embedding noise floor, the same argument that justifies
  *    quantization itself. Distances to the integer centroid then
  *    stay in `long` at ANY cluster size (component diffs are
  *    ~|2·quantized| regardless of m) — no overflow cliff.
  *
  * Scale shape: both assignment passes are pure scan-stage expressions
  * against LITERAL centroids (k·dim longs — same bounded-collect class
  * as the PQ codebooks); the refit is one (cluster, dim)-keyed
  * aggregate with map-side partials (k·dim groups — hot by design, and
  * bounded). No shuffle carries vectors anywhere; the only wide op is
  * the final k-row aggregate. At 100 TB this is 2 scans + 1 tiny
  * shuffle.
  */
object SemanticCluster {

  /** Argmin over per-cluster score columns; ties → lowest index.
    * `array_position` returns the FIRST occurrence of the min. */
  private def argmin(scores: Seq[Column]): Column =
    array_position(array(scores: _*), array_min(array(scores: _*)))

  /** One Lloyd round. `seeds` must be a small frame of (id, vec) rows
    * (k rows — it is collected); cluster ids are the seeds' 0-based
    * rank by ascending id. Returns one row per non-empty cluster:
    * (cluster, n_members, inertia, rep_vec_id). */
  def lloydOnce(emb: DataFrame, vecCol: Column, idCol: Column,
                seeds: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._

    // ---- seeds → literals (bounded: k vectors)
    val seedRows = seeds.select(idCol.cast("long").as("id"),
        Vectors.quantize(vecCol).as("q"))
      .orderBy("id").collect()
    val seedVecs: Seq[Seq[Long]] = seedRows.map(_.getSeq[Long](1).toSeq).toSeq

    val q = emb.select(idCol.cast("long").as("vec_id"),
      Vectors.quantize(vecCol).as("q"))

    // ---- pass 1: assign to nearest seed (score = ‖c‖² − 2·x·c)
    def seedScore(c: Seq[Long]): Column = {
      val cn2 = c.map(x => x * x).sum
      lit(cn2) - lit(2L) * Vectors.intDot(col("q"), array(c.map(lit): _*))
    }
    val a1 = q.withColumn("cl", argmin(seedVecs.map(seedScore)) - 1)

    // ---- refit: per-(cluster, dim) component sums + member counts
    val sums = a1.select(col("cl"), posexplode(col("q")).as(Seq("d", "x")))
      .groupBy(col("cl"), col("d")).agg(sum(col("x")).as("s"))
    val counts = a1.groupBy(col("cl")).agg(count(lit(1)).as("m"))
    // bounded collect: k·dim sums + k counts
    val mByCl = counts.as[(Long, Long)].collect().toMap
    val cent: Seq[(Long, Seq[Long])] = sums.as[(Long, Int, Long)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (cl, rows) =>
        val m = mByCl(cl)
        // truncated integer mean, toward zero — matches DuckDB `//`
        (cl, rows.sortBy(_._2).map(r => r._3 / m).toSeq)
      }

    // ---- pass 2: re-assign to the refit centroids, full distance
    def centScore(c: Seq[Long]): Column =
      Vectors.intNorm2(zip_with(col("q"), array(c.map(lit): _*), (x, cd) => x - cd))
    val scores = cent.map { case (_, c) => centScore(c) }
    val clIds = array(cent.map(c => lit(c._1)): _*)
    val a2 = q
      .withColumn("__p", argmin(scores))
      .withColumn("cluster", element_at(clIds, col("__p").cast("int")))
      .withColumn("d2", array_min(array(scores: _*)))

    a2.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"), sum(col("d2")).as("inertia"),
        min_by(col("vec_id"), struct(col("d2"), col("vec_id"))).as("rep_vec_id"))
  }
}
