package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Text

/** Streaming corpus ingest: the batch cleaning pass (`corpus_clean`'s
  * quality gate + exact dedup) as a continuous pipeline — documents
  * arrive as a stream, low-quality docs are dropped, and the first
  * writer wins per content fingerprint ACROSS micro-batches via
  * streaming `dropDuplicates` state.
  *
  * State shape at scale: one state-store entry per distinct
  * fingerprint, sharded by the dedup key. Callers bound it with a
  * watermark on an event-time column (`dropDuplicatesWithinWatermark`)
  * when the corpus is unbounded; for a bounded backfill the exact
  * global dedup here is the semantics you want.
  */
object CorpusStream {

  /** quality gate → fingerprint → first-writer-wins dedup.
    * Works on a streaming or batch DataFrame with (doc_id, text). */
  def ingest(docs: DataFrame): DataFrame =
    docs
      .where(!Text.isLowQuality(col("text")))
      .select(col("doc_id"), Text.fingerprint(col("text")).as("fingerprint"),
        size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .dropDuplicates("fingerprint")
}
