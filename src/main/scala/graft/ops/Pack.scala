package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: lay documents end-to-end in a
  * deterministic order and cut the stream every `budget` tokens
  * (concat-and-chunk, the standard pre-training batcher shape). A doc
  * belongs to the pack its FIRST token lands in; `straddles` marks docs
  * a cut passes through (the ones a loader must split across context
  * windows).
  *
  * Scale shape: packing is inherently sequential per stream, so the
  * operator shards by a group column (split, language, shard id...) and
  * packs within each shard — the window is partitioned by group, never
  * global. At 100 TB you pick the shard key so one shard's doc list
  * fits a single task's sort (e.g. hash(doc_id)%K composed with the
  * split), and pack ids are (shard, local id) pairs — exactly what this
  * returns. Cumulative sums are one window over one keyed shuffle.
  */
object Pack {

  /** Per-doc pack assignment: (grp, ord, n, pack_id, straddles).
    *
    * `pack_id` = floor(tokens-before-this-doc / budget) within the
    * group; `straddles` = the doc's span crosses a multiple of
    * `budget` (its tokens land in ≥ 2 context windows). A zero-token
    * doc occupies no span, so it can never straddle — the n > 0 guard
    * also keeps the last-token index `cum - 1` out of the negative
    * range where Spark's truncating `div` and SQL's flooring `//`
    * disagree.
    *
    * `order` must be unique within a group (doc ids are). The frame is
    * pinned to ROWS UNBOUNDED PRECEDING..CURRENT ROW: Spark's default
    * for an ordered window is a RANGE frame, which sums WHOLE tie
    * groups — a non-unique order column would silently assign every
    * tied doc the same cum (wrong pack_id/straddles) while a
    * ROWS-framed oracle counts them one by one.
    */
  def assign(df: DataFrame, group: Column, order: Column, nTokens: Column,
             budget: Long): DataFrame = {
    val w = Window.partitionBy(col("grp")).orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(group.as("grp"), order.as("ord"), nTokens.cast("long").as("n"))
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("pack_id", expr(s"(cum - n) div ${budget}L"))
      .withColumn("straddles", col("n") > 0 &&
        expr(s"(cum - n) div ${budget}L") =!= expr(s"(cum - 1) div ${budget}L"))
  }

  /** Per-pack rollup: docs, tokens, and straddling docs per
    * (group, pack_id). */
  def packStats(df: DataFrame, group: Column, order: Column, nTokens: Column,
                budget: Long): DataFrame =
    assign(df, group, order, nTokens, budget)
      .groupBy(col("grp"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).cast("long").as("n_tokens"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddling"))
}
