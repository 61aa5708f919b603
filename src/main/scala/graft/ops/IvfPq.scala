package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** IVF-PQ: the full Jégou/Douze/Schmid construction — the coarse
  * quantizer ([[Ivf]]) partitions the corpus into cells and prunes the
  * search to `nProbe` of them, while PQ ([[Pq]]) codes each vector's
  * RESIDUAL (v − cell centroid) so the pruned candidates score from
  * compressed bytes. Residual coding is what makes the composition
  * better than either half: residuals are centered near zero, so the
  * same m×k codebook budget quantizes them far more finely than raw
  * vectors.
  *
  * Scale shape: query cost is (|corpus|·nProbe/cells) ADC lookups over
  * byte codes + `shortlist` exact re-ranks — the memory-AND-compute
  * bounded regime a billion-vector corpus actually runs. Everything is
  * the two halves' machinery: cell probe = broadcast centroid join,
  * per-(query, cell) residual tables broadcast (nProbe·m·k doubles per
  * query — tiny), candidate scoring joins ON the cell key (never a
  * cross join), shortlist via WindowGroupLimit, exact q_dot re-rank.
  * Not oracle-SQL-expressible (two layers of iterative training) — the
  * registered query self-checks recall like IVF and PQ do.
  */
object IvfPq {

  final case class Index(pq: Pq.Index, cellOf: DataFrame, cents: DataFrame,
                         dim: Int)

  private def residual(v: Column, centroid: Column): Column =
    zip_with(v, centroid, (a, b) => (a.cast("double") - b.cast("double")).cast("float"))

  /** Coarse-quantize into `cells`, then PQ-encode residuals.
    * `metaCols` ride into `cellOf` (the per-vector cell map), so a
    * filtered search evaluates its predicate as a scan filter on the
    * pinned index — the same seam as [[Ivf.build]]. */
  def build(corpus: DataFrame, vecCol: Column, idCol: Column, dim: Int,
            cells: Int = 8, m: Int = 8, k: Int = 16,
            seed: Long = 42L, metaCols: Seq[(String, Column)] = Nil): Index = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // the coarse quantizer only needs roughly balanced cells (recall
    // is governed by the probed fraction, not centroid convergence —
    // Ivf.build's own scaladoc), and the residual codebook re-centers
    // whatever the cells leave over: half the default Lloyd rounds
    val ivf = Ivf.build(corpus, vecCol, idCol, k = cells, seed = seed,
      maxIter = 4, metaCols = metaCols)
    val cents = ivf.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }.toSeq
      .toDF("cell", "centroid")
    // persist the residual frame: Pq.build's Lloyd loop re-reads its
    // training input ~2x per round (assignment + centroid update), and
    // without the cache each pass re-runs the ML transform + centroid
    // join + residual zip_with from scratch. Cache hygiene follows the
    // corpus_clean precedent (Verify/Bench clear per query).
    val resid = ivf.assigned.join(broadcast(cents), "cell")
      .select(col("vec_id"), col("cell"),
        residual(col("v"), col("centroid")).as("rv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pq = Pq.build(resid, col("rv"), col("vec_id"), dim, m, k)
    // cell assignment comes straight from the IVF index — routing it
    // through resid would drag the centroid join into every query
    Index(pq, ivf.assigned.select(col("vec_id") +: col("cell") +:
      metaCols.map { case (n, _) => col(n) }: _*), cents, dim)
  }

  /** ADC over residual codes within the probed cells, shortlist, then
    * exact q_dot re-rank against the original vectors.
    *
    * Inner-product ADC decomposes as q·v ≈ q·c + Σ_s q_s·code_s (the
    * residual codebook entry stands in for v−c): ONE flat table of the
    * RAW query against the residual codebook is shared by every probed
    * cell, and each (query, cell) contributes only its scalar q·c
    * constant. Scoring q−c against v−c instead is NOT rank-equivalent
    * to q·v and silently mis-ranks — the planted-vector spec pins the
    * correct decomposition. */
  def topK(index: Index, corpus: DataFrame, queries: DataFrame,
           vecCol: Column, idCol: Column, k: Int, nProbe: Int,
           shortlist: Int, candFilter: Column = lit(true)): DataFrame = {
    val spark = queries.sparkSession
    val adc = GraftFunctions.registerAdcSum(spark)
    val m = index.pq.m
    val dsub = index.dim / m
    // exact double inner product (the probe and the q·c constant must
    // rank consistently with the table entries, which are doubles)
    def ddot(a: Column, b: Column): Column = aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    // nearest nProbe cells per query, each carrying its q·c constant
    val probes = queries.select(idCol.as("q_vec_id"), vecCol.as("qv"))
      .crossJoin(broadcast(index.cents))
      .withColumn("qc", ddot(col("qv"), col("centroid")))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("q_vec_id")).orderBy(col("qc").desc, col("cell").asc)))
      .where(col("crnk") <= nProbe)
      .select(col("q_vec_id"), col("cell"), col("qc"))
    // one flat ADC table per QUERY (raw slices × residual codebook);
    // the shared builder keeps the table layout identical to every
    // other ADC consumer (Pq.sliced slicing, (sub·k + code) order)
    val qtables = Pq.adcTables(queries, vecCol, idCol, index.pq.cents, m, dsub)
    // candidates pair with the queries probing their cell (cell-key
    // join — the probe prunes |corpus|·nProbe/cells BEFORE scoring),
    // then add the shared table's lookup sum to the cell constant.
    // candFilter evaluates on cellOf's metadata BEFORE any scoring, so
    // filtered search costs less than unfiltered; the shortlist then
    // only ever contains in-filter ids, and the exact re-rank inherits
    // that by construction
    val scored = index.pq.codes.join(index.cellOf.where(candFilter), "vec_id")
      .join(broadcast(probes), "cell")
      .join(broadcast(qtables), "q_vec_id")
      .withColumn("score", col("qc") + adc(col("codes"), col("tbl"), index.pq.k))
    val short = scored.withColumn("srnk", row_number().over(
        Window.partitionBy(col("q_vec_id")).orderBy(col("score").desc, col("vec_id").asc)))
      .where(col("srnk") <= shortlist)
      .select(col("q_vec_id"), col("vec_id"))
    // exact re-rank of the shortlist — shared with Pq.topKReranked
    Pq.rerankExact(corpus, queries, short, vecCol, idCol, k)
  }
}
