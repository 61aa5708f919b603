package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §7.4).
  *
  * Two paths:
  *  - brute force: broadcast the (small) query set, score every
  *    candidate, window top-k. Exact; cost O(candidates × queries).
  *    The scan side streams — at 100 TB this is one pass, no
  *    candidate-side shuffle except the final per-query top-k (which
  *    WindowGroupLimit reduces map-side before the exchange).
  *  - LSH-bucketed: candidates restricted to the query's sign bucket
  *    (an IVF-style inverted-list probe). Cost drops by ~2^bits; recall
  *    trades off with `bits`.
  *
  * Scoring uses [[graft.functions.QuantizedDotProduct]] — a fused
  * codegen'd quantize+dot (exact integer arithmetic, no per-pair array
  * allocation). Results are bit-identical to the composable
  * `Vectors.intDot(quantize(a), quantize(b))` form.
  */
object Similarity {

  private def ranked(scored: DataFrame, k: Int): DataFrame =
    scored.withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_vec_id")).orderBy(col("dot").desc, col("vec_id").asc)))
      .where(col("rnk") <= k)

  /** Exact threshold (range) search: every (query, candidate) pair
    * with integer dot ≥ `minDot` — the "all matches above a similarity
    * bar" form retrieval filters and dedup screens use where top-k's
    * fixed cut is wrong. Same broadcast-query scan shape as
    * [[topKBruteForce]]: one pass over the candidates with the query
    * block broadcast, the threshold filter runs scan-stage inside
    * codegen, and the output is bounded by the threshold's
    * selectivity. No shuffle anywhere.
    */
  def rangeSearch(candidates: DataFrame, queries: DataFrame,
                  vecCol: Column, idCol: Column, minDot: Long): DataFrame = {
    val qdot = GraftFunctions.registerQDot(candidates.sparkSession)
    val cand = candidates.select(idCol.as("vec_id"), vecCol.as("v"))
    val qs = queries.select(idCol.as("q_vec_id"), vecCol.as("qv"))
    cand.crossJoin(broadcast(qs))
      .select(col("q_vec_id"), col("vec_id"), qdot(col("v"), col("qv")).as("dot"))
      .where(col("dot") >= minDot)
  }

  /** Exact top-k: every (query, candidate) pair scored. */
  def topKBruteForce(candidates: DataFrame, queries: DataFrame,
                     vecCol: Column, idCol: Column, k: Int): DataFrame = {
    val qdot = GraftFunctions.registerQDot(candidates.sparkSession)
    val cand = candidates.select(idCol.as("vec_id"), vecCol.as("v"))
    val qs = queries.select(idCol.as("q_vec_id"), vecCol.as("qv"))
    val scored = cand.crossJoin(broadcast(qs))
      .select(col("q_vec_id"), col("vec_id"), qdot(col("v"), col("qv")).as("dot"))
    ranked(scored, k)
  }

  /** Matryoshka / adaptive retrieval (Kusupati et al., NeurIPS'22):
    * shortlist `shortlist` candidates per query by the dot product of
    * the first `prefixDim` QUANTIZED components, then re-rank the
    * shortlist by the full-dimension dot and keep top `k`. The cheap
    * pass reads prefixDim/dim of the bytes a full scan would; only
    * shortlist·|q| rows pay full-width arithmetic — the standard
    * funnel an MRL-trained embedding serves at scale (and the reason
    * to store the prefix as its own column family / parquet column
    * group).
    *
    * Integer arithmetic end to end (quantize → slice → intDot), so
    * both stages and both tiebreaks are engine-exact and the SQL
    * mirror reproduces the funnel bit-for-bit.
    */
  def topKMatryoshka(candidates: DataFrame, queries: DataFrame,
                     vecCol: Column, idCol: Column, k: Int,
                     prefixDim: Int, shortlist: Int): DataFrame = {
    val cand = candidates.select(idCol.as("vec_id"),
      Vectors.quantize(vecCol).as("cz"))
    val qs = queries.select(idCol.as("q_vec_id"),
      Vectors.quantize(vecCol).as("sz"))
    // prefix slices materialize once per row; the narrow pass scores
    // every pair but on prefixDim-wide arrays only
    val scored = cand.withColumn("cp", slice(col("cz"), 1, prefixDim))
      .crossJoin(broadcast(qs.withColumn("sp", slice(col("sz"), 1, prefixDim))))
      .select(col("q_vec_id"), col("vec_id"), col("cz"), col("sz"),
        Vectors.intDot(col("cp"), col("sp")).as("pdot"))
    val short = scored.withColumn("prnk", row_number().over(
        Window.partitionBy(col("q_vec_id"))
          .orderBy(col("pdot").desc, col("vec_id").asc)))
      .where(col("prnk") <= shortlist)
    ranked(short.select(col("q_vec_id"), col("vec_id"),
      Vectors.intDot(col("cz"), col("sz")).as("dot")), k)
  }

  /** DuckDB mirror of [[topKMatryoshka]] over the embeddings table
    * with the standard serving split (candidates vec_id ≥ 8, queries
    * < 8): defines `mrl(q_vec_id, vec_id, dot, rnk)` ranked over the
    * shortlist — consumers filter `rnk <= k`. The prefix dot reads
    * the first `prefixDim` components of the same quantized arrays,
    * exactly what the Spark side's slice computes. */
  def matryoshkaSql(prefixDim: Int, shortlist: Int, dim: Int): String =
    s"""qv AS MATERIALIZED (SELECT vec_id,
       |    ${Vectors.quantizeSql("embedding")} AS z FROM embeddings),
       |pscored AS (SELECT s.vec_id AS q_vec_id, c.vec_id, c.z AS cz, s.z AS sz,
       |    ${Vectors.intDotSql("c.z", "s.z", prefixDim)} AS pdot
       |  FROM qv c CROSS JOIN qv s WHERE c.vec_id >= 8 AND s.vec_id < 8),
       |short AS (SELECT q_vec_id, vec_id, cz, sz FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_vec_id
       |      ORDER BY pdot DESC, vec_id ASC) AS prnk FROM pscored)
       |  WHERE prnk <= $shortlist),
       |mrl AS MATERIALIZED (SELECT q_vec_id, vec_id, dot,
       |    CAST(row_number() OVER (PARTITION BY q_vec_id
       |      ORDER BY dot DESC, vec_id ASC) AS INT) AS rnk
       |  FROM (SELECT q_vec_id, vec_id,
       |      ${Vectors.intDotSql("cz", "sz", dim)} AS dot FROM short))""".stripMargin

  /** LSH-bucketed approximate top-k: score only candidates in the
    * query's sign bucket (bucketing is on the quantized components so
    * the SQL oracle mirrors exactly). */
  def topKLsh(candidates: DataFrame, queries: DataFrame,
              vecCol: Column, idCol: Column, k: Int, bits: Int,
              dim: Int = 64): DataFrame = {
    val qdot = GraftFunctions.registerQDot(candidates.sparkSession)
    // quantize materialized once per row; the bucket expression then
    // reads the stored array instead of re-quantizing per plane
    val cand = candidates.select(idCol.as("vec_id"), vecCol.as("v"),
        Vectors.quantize(vecCol).as("qz"))
      .withColumn("bucket", Vectors.signBucket(col("qz"), bits, dim)).drop("qz")
    val qs = queries.select(idCol.as("q_vec_id"), vecCol.as("qv"),
        Vectors.quantize(vecCol).as("qz"))
      .withColumn("qbucket", Vectors.signBucket(col("qz"), bits, dim)).drop("qz")
    val scored = cand.join(broadcast(qs), col("bucket") === col("qbucket"))
      .select(col("q_vec_id"), col("vec_id"), qdot(col("v"), col("qv")).as("dot"))
    ranked(scored, k)
  }

  /** Mutual k-NN graph construction — corpus×corpus, not query×corpus:
    * every vector's top-k inner-product neighbors among its LSH-bucket
    * peers, kept only when the relation is RECIPROCAL (a ∈ top-k(b) and
    * b ∈ top-k(a)). Mutual-NN is the standard symmetrization for
    * k-NN-graph clustering and agreement-based dedup: one-sided
    * neighbors of a hub vector are dropped, which is exactly the hub
    * suppression the literature wants.
    *
    * Scale shape: the self-join is keyed on the sign bucket
    * (co-partitioned, never all-pairs — in-bucket volume ~ n·E[|bucket|]),
    * the per-vector top-k pre-reduces map-side via WindowGroupLimit,
    * and the reciprocity check is one (a, b)-keyed semi join of the
    * ranked table against its own reversal. Integer dot + total
    * (dot desc, id) rank order keep the graph engine- and
    * partitioning-exact.
    */
  def mutualKnn(emb: DataFrame, vecCol: Column, idCol: Column,
      k: Int, bits: Int, dim: Int = 64): DataFrame = {
    val qdot = GraftFunctions.registerQDot(emb.sparkSession)
    val v = emb.select(idCol.as("vec_id"), vecCol.as("v"),
        Vectors.quantize(vecCol).as("qz"))
      .withColumn("bucket", Vectors.signBucket(col("qz"), bits, dim)).drop("qz")
    val pairs = v.select(col("bucket"), col("vec_id").as("a"), col("v").as("va"))
      .join(v.select(col("bucket"), col("vec_id").as("b"), col("v").as("vb")), "bucket")
      .where(col("a") =!= col("b"))
      .select(col("a"), col("b"), qdot(col("va"), col("vb")).as("dot"))
    val ranked = pairs.withColumn("rnk", row_number().over(
        Window.partitionBy(col("a")).orderBy(col("dot").desc, col("b").asc)))
      .where(col("rnk") <= k)
    ranked.where(col("a") < col("b")).select(col("a"), col("b"), col("dot"))
      .join(ranked.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"), "left_semi")
      .select(col("a").as("vec_a"), col("b").as("vec_b"), col("dot"))
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein, SIGIR
    * 1998) — diversity-aware selection over a retrieval shortlist, the
    * standard fix for near-duplicate results crowding a RAG context
    * window. Greedy, λ = lamNum/lamDen cross-multiplied away so the
    * score stays in exact integer space: step j picks argmax over
    * remaining shortlist docs of
    * `lamNum·dq(d) − (lamDen−lamNum)·max_{c∈chosen} dot(d, c)`
    * (pure relevance on the first pick), ties → lowest id — a total
    * order, so the selection is engine-exact in the quantized integer
    * dot space. λ = 1 (lamNum = lamDen) degenerates to pure relevance
    * order (spec-pinned); the default 1/2 weighs relevance and
    * diversity equally.
    *
    * Scale shape: relevance scoring is the brute-force one-pass scan
    * (query broadcast, TakeOrdered shortlist); the greedy loop then
    * runs DRIVER-SIDE over the collected shortlist — `shortlist` rows
    * of quantized vectors, bounded model-metadata like the PQ
    * codebooks, NOT corpus data. The O(k·shortlist) pairwise dots are
    * driver-trivial at any corpus size because the shortlist never
    * grows with the corpus.
    */
  def mmrRerank(emb: DataFrame, vecCol: Column, idCol: Column,
                queryId: Long, shortlist: Int, k: Int,
                lamNum: Int = 1, lamDen: Int = 2): DataFrame = {
    require(lamNum > 0 && lamNum <= lamDen,
      s"lambda must be in (0, 1]: got $lamNum/$lamDen")
    import emb.sparkSession.implicits._
    val q = emb.select(idCol.cast("long").as("vec_id"),
      Vectors.quantize(vecCol).as("qz"))
    val qv = q.where(col("vec_id") === queryId).select(col("qz").as("qqz"))
    val sl = q.crossJoin(broadcast(qv)).where(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("qz"), Vectors.intDot(col("qz"), col("qqz")).as("dq"))
      .orderBy(col("dq").desc, col("vec_id").asc).limit(shortlist)
      .as[(Long, Seq[Long], Long)].collect()
    def dot(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    var remaining = sl.toList
    var chosen = List.empty[(Long, Seq[Long], Long)]
    val picks = (1 to math.min(k, sl.length)).map { rank =>
      val scored = remaining.map { case d @ (id, qz, dq) =>
        val mmr = if (chosen.isEmpty) lamNum * dq
          else lamNum * dq - (lamDen - lamNum) * chosen.map(c => dot(qz, c._2)).max
        (d, mmr)
      }
      val (best, mmr) = scored.minBy { case ((id, _, _), m) => (-m, id) }
      chosen ::= best
      remaining = remaining.filterNot(_._1 == best._1)
      (rank.toLong, best._1, best._3, mmr)
    }
    picks.toDF("rank", "vec_id", "dot_q", "mmr")
  }

  /** DuckDB mirror of [[mmrRerank]] as a generated CTE chain (the
    * k-center seeding pattern: one fold CTE per greedy step, each
    * dropping the picked row and accumulating the max-similarity
    * term). Expects `embeddings(vec_id, embedding)`. */
  def mmrRerankSql(queryId: Long, shortlist: Int, k: Int, dim: Int,
                   lamNum: Int = 1, lamDen: Int = 2): String = {
    require(lamNum > 0 && lamNum <= lamDen,
      s"lambda must be in (0, 1]: got $lamNum/$lamDen")
    val dv = lamDen - lamNum // diversity weight, cross-multiplied
    val head =
      s"""q AS (SELECT vec_id, ${Vectors.quantizeSql("embedding")} AS qz FROM embeddings),
         |qq AS (SELECT qz AS qqz FROM q WHERE vec_id = $queryId),
         |sl AS (SELECT vec_id, qz, ${Vectors.intDotSql("qz", "qqz", dim)} AS dq
         |       FROM q CROSS JOIN qq WHERE vec_id <> $queryId
         |       ORDER BY dq DESC, vec_id LIMIT $shortlist),
         |fc1 AS (SELECT vec_id, qz, dq, $lamNum * dq AS mmr FROM sl
         |        ORDER BY dq DESC, vec_id LIMIT 1),
         |fd1 AS (SELECT d.vec_id, d.qz, d.dq,
         |               ${Vectors.intDotSql("d.qz", "c.qz", dim)} AS mx
         |        FROM sl d CROSS JOIN fc1 c WHERE d.vec_id <> c.vec_id)""".stripMargin
    val steps = (2 to k).map { j =>
      val pick =
        s""",
           |fc$j AS (SELECT vec_id, qz, dq, $lamNum * dq - $dv * mx AS mmr FROM fd${j - 1}
           |        ORDER BY $lamNum * dq - $dv * mx DESC, vec_id LIMIT 1)""".stripMargin
      val fold = if (j == k) "" else
        s""",
           |fd$j AS (SELECT d.vec_id, d.qz, d.dq,
           |               greatest(d.mx, ${Vectors.intDotSql("d.qz", "c.qz", dim)}) AS mx
           |        FROM fd${j - 1} d CROSS JOIN fc$j c WHERE d.vec_id <> c.vec_id)""".stripMargin
      pick + fold
    }.mkString
    val union = (1 to k)
      .map(j => s"SELECT CAST($j AS BIGINT) AS rank, vec_id, dq AS dot_q, mmr FROM fc$j")
      .mkString(" UNION ALL ")
    s"$head$steps,\npicks AS ($union)"
  }

  /** DuckDB CTE body shared by the mutual-kNN oracles: defines
    * `q/bkt/p/r/t` and finally `mk(vec_a, vec_b, dot)` with a < b.
    * The bucket is corpus-scaled like the Spark side
    * ([[Vectors.scaledLshBits]] at minBits/occupancy): full 24-bit
    * bucket masked by the same smallest-power-of-two scalar — exact
    * by the hyperplane prefix property (VectorsSpec). */
  def mutualKnnSqlCtes(k: Int, minBits: Int, occupancy: Int, dim: Int): String =
    s"""q AS (SELECT vec_id, label, ${Vectors.quantizeSql("embedding")} AS qz FROM embeddings),
       |pw AS (SELECT ${Vectors.scaledLshPow2Sql("embeddings", minBits, occupancy)} AS p),
       |bkt AS (SELECT vec_id, qz,
       |        (${Vectors.signBucketSql("qz", 24, dim)}) % (SELECT p FROM pw)
       |          AS bucket FROM q),
       |p AS (SELECT x.vec_id AS a, y.vec_id AS b,
       |             ${Vectors.intDotSql("x.qz", "y.qz", dim)} AS dot
       |      FROM bkt x JOIN bkt y ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
       |r AS (SELECT a, b, dot,
       |             row_number() OVER (PARTITION BY a ORDER BY dot DESC, b) AS rnk
       |      FROM p),
       |t AS (SELECT a, b, dot FROM r WHERE rnk <= $k),
       |mk AS (SELECT t.a AS vec_a, t.b AS vec_b, t.dot AS dot
       |       FROM t JOIN t t2 ON t.b = t2.a AND t.a = t2.b
       |       WHERE t.a < t.b)""".stripMargin
}
