package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranked retrieval over the document corpus — the serving-side shape
  * of a search/RAG pipeline (score every doc against a literal query,
  * return the top k).
  *
  * BM25 (Robertson & Zaragoza, FnTIR 2009; k1 = 1.2, b = 0.75) with
  * every float replaced by an exact integer analog so results are
  * bit-identical across engines and partitionings:
  *
  *  - idf(t) = bitlen(2N+1) − bitlen(2·df+1) + 1, where bitlen is the
  *    binary bit length (`length(bin(x))`). This is the floor-log2
  *    analog of log((N+0.5)/(df+0.5)) with Lucene's nonnegativity
  *    clamp: monotone decreasing in df, ≥ 1 even at df = N, and exact
  *    in both engines (Spark and DuckDB `bin()` both render without
  *    leading zeros).
  *  - The tf saturation term tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
  *    rides one cross-multiplied integer division at scale 10⁴: with
  *    avgdl = TT/N (total tokens / docs), numerator 22·tf·TT·10⁴ and
  *    denominator (10·tf+3)·TT + 9·dl·N — both inside DECIMAL(38,0)
  *    even at TT ~ 10¹³ (numerator ≤ 2.2·10⁵·tf·TT ≤ 10³⁰ for docs
  *    under 10⁷ tokens). Operands are nonnegative, so Spark `div` and
  *    DuckDB `//` agree trivially.
  *
  * Scale shape: for a LITERAL query there is no inverted index to
  * build — per-term tf is `size(filter(tk, _ = term))`, a pure
  * scan-stage expression, so the whole scoring pass is one corpus scan
  * with ZERO explodes and ZERO joins. Corpus statistics (N, TT, df per
  * term) are one aggregate row broadcast back; the top-k runs as
  * TakeOrderedAndProject (per-partition heads, never a global sort).
  * An explode→postings→join formulation would shuffle every token
  * occurrence at 100 TB for the same answer.
  */
object Retrieval {

  /** Top-`k` docs by integer BM25 against literal `terms`.
    * Output: (doc_id, score, n_hit) — score is the ×10⁴-scaled BM25
    * sum, n_hit the number of distinct query terms present. Docs
    * matching no term are dropped before the top-k (their score is 0
    * by construction, not worth ranking). Ties break on doc_id, so
    * the cut is total.
    */
  def bm25TopK(docs: DataFrame, textCol: Column, idCol: Column,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.size <= 32, "literal query of 1..32 terms")
    val base = docs.select(idCol.as("doc_id"), Text.tokens(textCol).as("tk"))
      .select((col("doc_id") +: size(col("tk")).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("tk"), x => x === lit(t))).cast("long").as(s"tf$i")
        }): _*)
    val stats = base.agg(count(lit(1)).as("n"),
      (sum(col("dl")).as("tt") +: terms.indices.map(i =>
        sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))): _*)
    val scored = base.crossJoin(broadcast(stats))
    val contribs = terms.indices.map { i =>
      val idf = length(bin(lit(2L) * col("n") + 1L)) -
        length(bin(lit(2L) * col(s"df$i") + 1L)) + lit(1)
      when(col(s"tf$i") > 0, idf.cast("long") *
        expr(s"(220000 * CAST(tf$i AS DECIMAL(38,0)) * tt) div " +
          s"((10 * CAST(tf$i AS DECIMAL(38,0)) + 3) * tt + 9 * CAST(dl AS DECIMAL(38,0)) * n)")
          .cast("long"))
        .otherwise(0L)
    }
    val hits = terms.indices.map(i =>
      when(col(s"tf$i") > 0, 1L).otherwise(0L)).reduce(_ + _)
    scored
      .select(col("doc_id"), contribs.reduce(_ + _).as("score"), hits.as("n_hit"))
      .where(col("n_hit") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** DuckDB mirror of [[bm25TopK]] over the `documents` table; the
    * tokenizer expression defaults to [[Text.tokensSql]] — the same
    * single source every other oracle uses. */
  def bm25TopKSql(terms: Seq[String], k: Int,
      tkExpr: String = Text.tokensSql()): String = {
    val tfCols = terms.indices.map(i =>
      s"len(list_filter(tk, x -> x = '${terms(i)}')) AS tf$i").mkString(",\n|        ")
    val dfCols = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n|        ")
    val contribs = terms.indices.map { i =>
      s"(CASE WHEN tf$i > 0 THEN (length(bin(2*n + 1)) - length(bin(2*df$i + 1)) + 1) * " +
        s"CAST((220000 * CAST(tf$i AS HUGEINT) * tt) // " +
        s"((10 * CAST(tf$i AS HUGEINT) + 3) * tt + 9 * CAST(dl AS HUGEINT) * n) AS BIGINT) " +
        s"ELSE 0 END)"
    }.mkString(" +\n|         ")
    val hits = terms.indices.map(i =>
      s"(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH t AS (SELECT doc_id, $tkExpr AS tk FROM documents),
       |d AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
       |        $tfCols
       |      FROM t),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS tt,
       |        $dfCols
       |      FROM d)
       |SELECT doc_id,
       |       CAST($contribs AS BIGINT) AS score,
       |       CAST($hits AS BIGINT) AS n_hit
       |FROM d CROSS JOIN st
       |WHERE $hits > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }
}
