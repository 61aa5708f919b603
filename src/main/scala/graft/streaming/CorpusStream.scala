package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.{Dedup, Text}

/** A cross-batch near-dup candidate: `doc_id` collided with the doc
  * that first claimed this MinHash band key. */
case class NearDupCandidate(doc_id: Long, band: Int, first_doc_id: Long)

/** A doc admitted by the streaming per-source cap; `seq` is its 1-based
  * admission rank within its source across the stream's lifetime. */
case class CappedDoc(doc_id: Long, source: String, seq: Long)

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

  /** foreachBatch body for STORE-BACKED incremental dedup — the other
    * production shape next to [[ingest]]'s state-store form: the
    * fingerprint store is an external parquet table (queryable,
    * restart-survivable independent of the checkpoint, shared with
    * batch backfills), each micro-batch runs
    * [[Dedup.incrementalExact]] against it, and survivors append
    * under a batchId-keyed subdir with overwrite — the same
    * idempotent-replay discipline as [[CdcStream.applyBatch]]'s DLQ:
    * a crash-replayed batch REPLACES its own output instead of
    * duplicating it.
    *
    * At scale the store read is a fingerprint-column scan (column
    * pruning leaves one string column) and the anti-join shuffles the
    * BATCH, not the store, when the batch broadcasts; a bucketed store
    * ([[graft.sinks.BucketedSnapshotStore]]'s layout) narrows the scan
    * to touched buckets.
    *
    * Wire it: `docs.writeStream.foreachBatch(dedupBatch(storeDir) _)`.
    */
  def dedupBatch(storeDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    // exclude THIS batch's own partition from the store read: on
    // crash-replay the store already holds the batch's survivors, and
    // treating them as store hits would overwrite batch=N with an
    // empty result — losing them. Partition pruning makes the
    // exclusion free.
    //
    // The read carries an EXPLICIT schema: a batch that crashed
    // mid-write can leave the store dir existing but holding no
    // readable footer (only a _temporary dir), where schema inference
    // would throw UNABLE_TO_INFER_SCHEMA on every replay — an explicit
    // schema makes that state read as an empty frame instead, keeping
    // the replay idempotent. First-ever-batch absence is matched by
    // error class (PATH_NOT_FOUND), not message text.
    val storeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("fingerprint",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("batch",
        org.apache.spark.sql.types.LongType)))
    val seen =
      try s.read.schema(storeSchema).parquet(storeDir)
        .where(col("batch") =!= batchId)
        .select(col("fingerprint"))
      catch { case e: Exception with org.apache.spark.SparkThrowable
        if e.getCondition == "PATH_NOT_FOUND" =>
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("fingerprint",
                org.apache.spark.sql.types.StringType))))
      }
    Dedup.incrementalExact(batch, seen, col("text"), col("doc_id"))
      .select(col("doc_id"), col("fingerprint"))
      .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
  }

  /** Streaming per-source admission cap — the continuous form of
    * [[graft.ops.Sampling.capPerGroup]]: each source admits at most
    * `cap` docs over the stream's lifetime, later arrivals drop. The
    * batch form keeps a uniform hash-rank subsample, which needs the
    * whole group in hand; a stream cannot rank globally, so the
    * streaming contract is first-`cap`-by-arrival — deterministic
    * under replay because intra-batch ties break by doc_id, and
    * monotone: once a doc is admitted (and emitted downstream) no
    * later arrival can evict it.
    *
    * State shape at scale: ONE long (admitted count) per distinct
    * source, sharded by source — the smallest state of any operator
    * here; no timeout needed even on unbounded streams.
    */
  def capBySource(docs: DataFrame, cap: Int): Dataset[CappedDoc] = {
    import docs.sparkSession.implicits._
    docs.select(col("source").cast("string").as("source"),
        col("doc_id").cast("long").as("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, rows: Iterator[(String, Long)], state: GroupState[Long]) => {
          val admitted = if (state.exists) state.get else 0L
          val room = math.max(cap - admitted, 0L).toInt
          val picked = rows.map(_._2).toSeq.sorted.take(room)
          if (picked.nonEmpty) state.update(admitted + picked.size)
          picked.iterator.zipWithIndex.map { case (id, i) =>
            CappedDoc(id, src, admitted + i + 1)
          }
        })
  }

  /** Streaming NEAR-dup candidate detection across micro-batches: each
    * arriving doc computes its banded MinHash signature per-row
    * ([[Dedup.bandKeyArray]] — no blocking aggregation in front of the
    * state update), and a band key's first writer claims it in the
    * state store; every later doc that lands on a claimed key emits a
    * `(doc_id, band, first_doc_id)` candidate row. Emitting CANDIDATES
    * is the honest streaming contract — exact Jaccard verification
    * needs the first doc's shingle set, which lives in the doc store
    * downstream, not in per-key state ([[Dedup.jaccardVerify]] runs
    * there, batched).
    *
    * State shape at scale: one long per distinct band key, sharded by
    * key hash — the same footprint as the exact-dedup fingerprint state
    * in [[ingest]], times `bands`. Bound it with a watermark-timeout
    * variant when the corpus is unbounded.
    */
  def nearDupCandidates(docs: DataFrame, shingleN: Int = 3, bands: Int = 8,
                        rowsPerBand: Int = 4): Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    val banded = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(Dedup.bandKeyArray(col("text"), shingleN, bands, rowsPerBand)).as("b"))
      .select(concat(col("b.band").cast("string"), lit("#"), col("b.bk")).as("key"),
        col("b.band").as("band"), col("doc_id"))
      .as[(String, Int, Long)]
    banded.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(String, Int, Long)], state: GroupState[Long]) => {
          // min doc id wins ties inside a batch — deterministic under
          // replay, matching the batch operators' first-writer-wins
          val sorted = rows.toSeq.sortBy(_._3)
          val first =
            if (state.exists) state.get
            else { state.update(sorted.head._3); sorted.head._3 }
          // id != first also drops re-deliveries of the claimant doc
          // (at-least-once upstream / duplicate rows in one batch):
          // a (doc, doc) self-pair would read as J=1 downstream and a
          // keep-min policy would drop the only copy
          sorted.iterator.filter(_._3 != first)
            .map { case (_, band, id) => NearDupCandidate(id, band, first) }
        })
  }
}
