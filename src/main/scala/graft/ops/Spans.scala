package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring detection across documents — the
  * token-span analog of "Deduplicating Training Data Makes Language
  * Models Better" (Lee et al., ACL'22): two docs that share a long
  * verbatim token run are near-dups no matter how different the rest
  * is, and set-similarity measures (MinHash/Jaccard over shingle SETS)
  * systematically under-weight one long run embedded in long docs.
  *
  * Shape: positioned word `n`-grams (gram hash + 1-based start) join
  * on gram hash; matching positions land on diagonals `pa − pb`, and a
  * run of k consecutive grams on one diagonal is a shared span of
  * k+n−1 tokens — recovered with one gaps-and-islands window per
  * (pair, diagonal), no per-row iteration anywhere.
  *
  * At 100 TB: the join is keyed by gram hash — mostly-unique keys, so
  * the shuffle is ~|corpus grams| with no hot partitions — EXCEPT
  * repeated grams (headers, license blocks, degenerate "spam spam
  * spam" docs) which would go quadratic; `maxGramOcc` drops grams with
  * more than that many total OCCURRENCES before the self-join — the
  * same hot-bucket cap discipline as the LSH channel, and occurrences
  * (not distinct docs) is the load-bearing choice: it bounds every
  * join key's fanout to ≤ maxGramOcc² rows even when one doc repeats
  * a gram thousands of times, where a distinct-doc cap would let a
  * single self-repetitive doc pair go quadratic. (A gram over the cap
  * is boilerplate or degenerate repetition by definition — the
  * within-doc case is text_repetition's signal, not a span.) Grams
  * hash through [[Text.polyHash]], so the whole chain is
  * integer-exact and oracle-mirrorable; a hash collision would affect
  * both engines identically.
  */
object Spans {

  /** Positioned n-gram table: (doc_id, pos, gh) with `pos` 1-based. */
  def positionedGrams(docs: DataFrame, textCol: Column, idCol: Column,
                      n: Int): DataFrame =
    docs.select(idCol.as("doc_id"), Text.tokens(textCol).as("tk"))
      .select(col("doc_id"), posexplode(Text.shingleExpr(n)))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        Text.polyHash(col("col")).as("gh"))

  /** Longest shared verbatim token span per doc pair:
    * (doc_a, doc_b, span_tokens), doc_a < doc_b, span ≥ `minTokens`.
    */
  def sharedSpans(docs: DataFrame, textCol: Column, idCol: Column,
                  n: Int = 8, minTokens: Int = 20,
                  maxGramOcc: Int = 50): DataFrame = {
    // One pinned-count fanout on the join key right after the gram
    // build, BEFORE the freq/join fork: the tokenize+posexplode
    // pipeline above it is scan-stage work (serial when the input is
    // few files), and without the exchange each of the three consumers
    // below (freq group-by, both join sides) re-runs it — measured
    // 0.6 s × 2 serial gram builds at sf0.1. With it, ReuseExchange
    // shares ONE gram materialization and the group-by, the join, and
    // the islands window all run at the pinned width instead of the
    // 1-2 partitions AQE's byte-judged coalescing would pick for the
    // skinny (doc_id, pos, gh) rows (see [[Dedup.fanout]]).
    val grams = Dedup.fanout(positionedGrams(docs, textCol, idCol, n), col("gh"))
    // hot-gram cap: one aggregation, then only surviving grams join
    val freq = grams.groupBy("gh")
      .agg(count(lit(1)).as("nf"))
      .where(col("nf") <= maxGramOcc)
      .select("gh")
    val ok = grams.join(freq, "gh")
    val pairs = ok.as("x").join(ok.as("y"),
        col("x.gh") === col("y.gh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.pos").as("pa"), col("y.pos").as("pb"))
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("diag"))
      .orderBy(col("pa"))
    pairs.withColumn("diag", col("pa") - col("pb"))
      .withColumn("island", col("pa") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("diag"), col("island"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((max(col("run")) + lit((n - 1).toLong)).as("span_tokens"))
      .where(col("span_tokens") >= minTokens)
  }

  /** DuckDB mirror of [[sharedSpans]] over a `documents(doc_id, text)`
    * view; `tkExpr` is the tokens-array SQL (the caller's TK macro). */
  def sharedSpansSql(tkExpr: String, n: Int = 8, minTokens: Int = 20,
                     maxGramOcc: Int = 50): String = {
    val gram = (0 until n).map(o => s"tk[i + $o]").mkString(" || ' ' || ")
    s"""WITH t AS (SELECT doc_id, $tkExpr AS tk FROM documents),
       |g AS (SELECT doc_id, i AS pos,
       |        ${Text.polyHashSql(s"($gram)")} AS gh
       |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk) - ${n - 1})) AS i) s
       |      WHERE len(tk) >= $n),
       |f AS (SELECT gh FROM (SELECT gh, COUNT(*) AS nf FROM g GROUP BY 1)
       |      WHERE nf <= $maxGramOcc),
       |ok AS (SELECT g.* FROM g JOIN f USING (gh)),
       |p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.pos AS pa, y.pos AS pb
       |      FROM ok x JOIN ok y ON x.gh = y.gh AND x.doc_id < y.doc_id),
       |i AS (SELECT doc_a, doc_b, pa - pb AS diag,
       |        pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS island
       |      FROM p),
       |r AS (SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS run
       |      FROM i GROUP BY doc_a, doc_b, diag, island)
       |SELECT doc_a, doc_b, MAX(run) + ${n - 1} AS span_tokens
       |FROM r GROUP BY 1, 2 HAVING MAX(run) + ${n - 1} >= $minTokens""".stripMargin
  }
}
