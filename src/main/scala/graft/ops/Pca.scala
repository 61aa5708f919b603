package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-direction extraction over the embedding corpus by integer
  * power iteration — the spectral primitive behind embedding
  * whitening, anisotropy removal ("all-but-the-top", Mu & Viswanath,
  * ICLR 2018), and 1-D semantic ordering, with every step exact so
  * both engines produce bit-identical directions.
  *
  * Two-phase shape, same contract as k-means / PQ codebooks:
  *
  *  1. TRAIN — the dim×dim Gram matrix G = Σ q·qᵀ over quantized
  *     vectors is one distributed aggregate: a double posexplode emits
  *     (i, j, qᵢ·qⱼ) per row and the (i, j)-keyed group-by partial-
  *     aggregates map-side, so the shuffle carries ≤ dim² rows PER
  *     TASK regardless of corpus size (dim = 64 → 4096 longs; each
  *     entry ≤ N·max(q)² ~ 3·10¹⁶ at 10¹¹ vectors — inside long).
  *     G is collected (bounded model metadata, 4096 longs) and THREE
  *     power-iteration rounds run driver-side in BigInt: w = G·v,
  *     then v ← w·10⁶ div max(|w|, 1) — the deterministic integer
  *     analog of normalize-and-iterate (BigInt / and DuckDB // both
  *     truncate toward zero, verified on negatives).
  *  2. SERVE — the converged direction rides the plan as a literal
  *     array; per-vector pc1 = q·v is a pure scan-stage integer dot
  *     (|pc1| ≤ dim·max(q)·10⁶ ~ 4·10¹⁰ — inside long).
  *
  * Uncentered on purpose: for cosine-normalized embedding spaces the
  * dominant uncentered direction IS the anisotropy axis the
  * literature removes; centering would put a non-integer mean into
  * every product and break engine-exactness.
  */
object Pca {

  val Scale = 1000000L

  /** dim×dim Gram matrix of the quantized embedding column as a
    * driver-side array (row-major). */
  def gram(emb: DataFrame, vCol: Column, dim: Int): Array[Array[Long]] = {
    val g = Array.fill(dim, dim)(0L)
    emb.select(Vectors.quantize(vCol).as("q"))
      .select(posexplode(col("q")).as(Seq("i", "qi")), col("q"))
      .select(col("i"), col("qi"), posexplode(col("q")).as(Seq("j", "qj")))
      .groupBy("i", "j").agg(sum(col("qi") * col("qj")).as("g"))
      .collect()
      .foreach(r => g(r.getAs[Int]("i"))(r.getAs[Int]("j")) = r.getAs[Long]("g"))
    g
  }

  /** `rounds` integer power-iteration steps from the all-ones start;
    * returns the ×10⁶-scaled direction. Pure function of G — the SQL
    * mirror replays the identical recurrence. */
  def powerIterate(g: Array[Array[Long]], rounds: Int): Seq[Long] = {
    val dim = g.length
    var v = IndexedSeq.fill(dim)(BigInt(1))
    for (_ <- 1 to rounds) {
      val w = (0 until dim).map(i =>
        (0 until dim).map(j => BigInt(g(i)(j)) * v(j)).sum)
      val m = w.map(_.abs).max.max(BigInt(1))
      v = w.map(x => x * Scale / m)
    }
    v.map(_.toLong)
  }

  /** Per-vector projection onto the ×10⁶-scaled literal direction. */
  def project(qCol: Column, direction: Seq[Long]): Column =
    Vectors.intDot(qCol, array(direction.map(lit): _*))

  /** SQL mirror: the same gram → 3 rounds → projection pipeline as
    * DuckDB CTEs (HUGEINT arithmetic; `//` truncates like BigInt /). */
  def projectSql(dim: Int, rounds: Int): String = {
    val iters = (1 to rounds).map { k =>
      val prev = s"v${k - 1}"
      s"""w$k AS (SELECT g.i AS i, SUM(CAST(g.g AS HUGEINT) * $prev.v) AS w
         |        FROM g JOIN $prev ON g.j = $prev.i GROUP BY 1),
         |m$k AS (SELECT GREATEST(MAX(ABS(w)), 1) AS m FROM w$k),
         |v$k AS (SELECT i, (w * $Scale) // m AS v FROM w$k CROSS JOIN m$k)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH q AS (SELECT vec_id, label, ${Vectors.quantizeSql("embedding")} AS q FROM embeddings),
       |g AS (SELECT i, j, CAST(SUM(q[i] * q[j]) AS BIGINT) AS g
       |      FROM q,
       |           LATERAL (SELECT unnest(generate_series(1, $dim)) AS i) a,
       |           LATERAL (SELECT unnest(generate_series(1, $dim)) AS j) b
       |      GROUP BY 1, 2),
       |v0 AS (SELECT unnest(generate_series(1, $dim)) AS i, CAST(1 AS HUGEINT) AS v),
       |$iters
       |SELECT q.vec_id, q.label,
       |       CAST(SUM(CAST(q.q[v$rounds.i] AS HUGEINT) * v$rounds.v) AS BIGINT) AS pc1
       |FROM q CROSS JOIN v$rounds
       |GROUP BY 1, 2
       |ORDER BY 1""".stripMargin
  }
}
