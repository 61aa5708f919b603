package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.{Dedup, Text}

/** A cross-batch near-dup candidate: `doc_id` collided with the doc
  * that first claimed this MinHash band key. */
case class NearDupCandidate(doc_id: Long, band: Int, first_doc_id: Long)

/** A doc admitted by the streaming per-source cap; `seq` is its 1-based
  * admission rank within its source across the stream's lifetime. */
case class CappedDoc(doc_id: Long, source: String, seq: Long)

/** A doc admitted by the streaming token budget; `cum_tokens` is the
  * source's running token total INCLUDING this doc. */
case class BudgetedDoc(doc_id: Long, source: String, n_tok: Long,
                       cum_tokens: Long)

/** A doc placed by the streaming packer: `pack_id` is the context
  * window its first token lands in, `straddles` marks a window cut
  * passing through it — [[graft.ops.Pack.assign]]'s exact output
  * shape, computed on arrival. */
case class PackedDoc(source: String, doc_id: Long, n_tok: Long,
                     pack_id: Long, straddles: Boolean)

/** The winner of a streaming keep-best decision: the highest-quality
  * doc under `key` seen inside the decision horizon. */
case class BestPick(key: String, doc_id: Long, quality: Long)

/** A doc admitted by the streaming weighted sample for its
  * (source, window); `rk` is its 1-based priority rank. */
case class WeightedPick(source: String, window_start: java.sql.Timestamp,
                        doc_id: Long, rk: Int)

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

  /** foreachBatch body for streaming CHUNK-level dedup — the
    * continuous form of `corpus_chunk_dedup` (C4-style sub-document
    * removal): each micro-batch splits its docs into consecutive
    * `chunkTokens`-token chunks, a chunk occurrence survives only if
    * it is BOTH the batch's first occurrence (min (doc_id, pos), the
    * same packed-key rule as the batch operator) AND absent from the
    * chunk store accumulated by every earlier batch — so a
    * boilerplate block that arrived last week stays dead forever
    * without ever rescanning old batches. Writes per-doc retention
    * stats to `statsDir/batch=N` and the batch's surviving chunk
    * hashes to `storeDir/batch=N`, both batchId-keyed + overwrite:
    * crash-replay REPLACES a batch's output (the store read excludes
    * the replaying batch's own partition, exactly like [[dedupBatch]]).
    *
    * Scale shape: the store read prunes to one md5 column; the
    * anti-join shuffles the BATCH's first-occurrences (already
    * chunk-deduped within the batch by a map-side-combinable
    * group-by min), never the store, when the batch side broadcasts.
    */
  def chunkDedupBatch(storeDir: String, statsDir: String,
      chunkTokens: Int = Dedup.ChunkTokens)(
      batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val storeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("chunk_md5",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("batch",
        org.apache.spark.sql.types.LongType)))
    val seen =
      try s.read.schema(storeSchema).parquet(storeDir)
        .where(col("batch") =!= batchId)
        .select(col("chunk_md5").as("seen_md5")).distinct()
      catch { case e: Exception with org.apache.spark.SparkThrowable
        if e.getCondition == "PATH_NOT_FOUND" =>
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("seen_md5",
                org.apache.spark.sql.types.StringType))))
      }
    val chunks = Dedup.tokenChunks(batch, col("text"), col("doc_id"), chunkTokens)
      .select(col("doc_id"), md5(col("chunk")).as("chunk_md5"), col("k"))
    val winners = chunks.groupBy("chunk_md5").agg(min(col("k")).as("wk"))
    // pinned: BOTH writes below read it — without the checkpoint the
    // store scan, chunking, and both shuffles would run twice per batch
    val marked = chunks.join(winners, "chunk_md5")
      .join(seen, col("chunk_md5") === col("seen_md5"), "left")
      .withColumn("kept", col("k") === col("wk") && col("seen_md5").isNull)
      .localCheckpoint(true)
    marked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .write.mode("overwrite").parquet(s"$statsDir/batch=$batchId")
    marked.where(col("kept")).select(col("chunk_md5"))
      .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
  }

  /** Compaction + TTL for [[chunkDedupBatch]]'s append-only chunk
    * store — the lifecycle that keeps the store from growing one
    * partition per micro-batch forever (the state the reference's
    * watermark analog would bound).
    *
    * Folds every per-batch partition with id ≤ `upToBatch` (plus any
    * earlier compacted generation) into ONE new compacted partition
    * under a NEGATIVE batch id, which no streaming batch ever uses —
    * so the per-batch reader's `batch =!= batchId` self-exclusion
    * always INCLUDES compacted data, and a replaying batch can never
    * accidentally exclude history that was folded.
    *
    * Safety contract:
    *  - `upToBatch` must only cover batches the streaming checkpoint
    *    has committed: folding a batch that can still replay would
    *    put its own chunks in a partition the replay cannot exclude,
    *    so the replay would see them as "seen" and emit nothing.
    *    foreachBatch replays at most the last uncommitted batch, so
    *    `currentBatch - 1` is the natural horizon.
    *  - Crash-safe by superset: the new generation is written to a
    *    FRESH directory first and folded partitions are deleted only
    *    after the write commits. A crash at any point leaves a
    *    superset of the store (duplicates are fine — the reader
    *    `distinct()`s), and re-running the compaction converges.
    *
    * TTL: `expireBefore` drops chunks ADMITTED before that batch id —
    * admission time is all an append-only store records (a suppressed
    * re-occurrence is never re-written), so this is admission-age
    * TTL, the honest analog of a watermark bound: an expired chunk
    * that arrives again is simply re-admitted and starts a fresh TTL.
    * Compacted generations carry `last_batch` (max admission batch per
    * chunk) so the horizon survives repeated compactions; the
    * per-batch reader's explicit schema simply prunes that column.
    *
    * Scale shape: one column-pruned scan of the folded partitions,
    * one chunk-keyed group-by, one write — no driver-side state.
    */
  def compactChunkStore(s: org.apache.spark.sql.SparkSession, storeDir: String,
      upToBatch: Long, expireBefore: Long = Long.MinValue): Unit = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("chunk_md5", StringType),
      StructField("last_batch", LongType),
      StructField("batch", LongType)))
    foldStore(s, storeDir, upToBatch, schema) { df =>
      df.select(col("chunk_md5"),
          coalesce(col("last_batch"), col("batch")).as("lb"))
        .groupBy(col("chunk_md5")).agg(max(col("lb")).as("last_batch"))
        .where(col("last_batch") >= expireBefore)
    }
  }

  /** Compaction + TTL for [[nearDupBatch]]'s band-claim and shingle
    * stores — the same negative-generation, crash-safe-by-superset
    * discipline as [[compactChunkStore]] (see its safety contract;
    * `upToBatch` obeys the identical committed-horizon rule), closing
    * the last stores that otherwise grow one partition per batch
    * forever.
    *
    * Claims compact to the `keepPerKey` LOWEST doc ids per (band, bk)
    * — exactly the read-side semantic ([[nearDupBatch]] probes the
    * capped first-writer set), so compaction is lossless w.r.t. every
    * future probe PROVIDED `keepPerKey` ≥ the `maxBucket` those probes
    * run with: compaction permanently deletes claims beyond
    * `keepPerKey`, so a later probe with a larger cap would silently
    * lose claimants. That contract is enforced, not assumed — callers
    * pass the largest read-side cap their deployment uses as
    * `readMaxBucket` (both default to [[nearDupBatch]]'s default cap)
    * and the call refuses a keep count below it.
    * Shingle rows compact to distinct (doc_id, shingle).
    * Both carry `last_batch` (max admission batch) so admission-age
    * TTL survives repeated compactions; an expired doc that returns is
    * re-admitted and starts a fresh TTL, and because both stores
    * record the same admission batches per doc, one `expireBefore`
    * horizon expires a doc's claims and shingles together.
    *
    * Lifecycle proof: CorpusStreamSpec's "mid-stream compaction
    * survives a checkpointed restart" case runs a real checkpointed
    * query, compacts between runs, restarts, and asserts every probe
    * result equals a never-compacted twin store's.
    */
  def compactNearDupStore(s: org.apache.spark.sql.SparkSession, storeDir: String,
      upToBatch: Long, expireBefore: Long = Long.MinValue,
      keepPerKey: Int = 100, readMaxBucket: Int = 100): Unit = {
    require(keepPerKey >= readMaxBucket,
      s"compaction keepPerKey=$keepPerKey would drop claims a future " +
        s"nearDupBatch probe with maxBucket=$readMaxBucket can still see — " +
        "compaction must keep at least the read-side cap to stay lossless")
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    val bandSchema = StructType(Seq(
      StructField("band", IntegerType), StructField("bk", StringType),
      StructField("doc_id", LongType), StructField("last_batch", LongType),
      StructField("batch", LongType)))
    foldStore(s, s"$storeDir/bands", upToBatch, bandSchema) { df =>
      val w = Window.partitionBy(col("band"), col("bk")).orderBy(col("doc_id"))
      df.select(col("band"), col("bk"), col("doc_id"),
          coalesce(col("last_batch"), col("batch")).as("lb"))
        .groupBy(col("band"), col("bk"), col("doc_id"))
        .agg(max(col("lb")).as("last_batch"))
        .where(col("last_batch") >= expireBefore)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= keepPerKey).drop("rn")
    }
    val shSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("shingle", StringType),
      StructField("last_batch", LongType), StructField("batch", LongType)))
    foldStore(s, s"$storeDir/shingles", upToBatch, shSchema) { df =>
      df.select(col("doc_id"), col("shingle"),
          coalesce(col("last_batch"), col("batch")).as("lb"))
        .groupBy(col("doc_id"), col("shingle"))
        .agg(max(col("lb")).as("last_batch"))
        .where(col("last_batch") >= expireBefore)
    }
  }

  /** Shared fold machinery for the append-only per-batch stores: list
    * `batch=` partitions, fold every one at or below the horizon (plus
    * prior compacted generations) through `fold`, write the result to
    * a FRESH strictly-lower negative generation, and delete sources
    * only after the write commits — a crash at any point leaves a
    * superset and re-running converges. */
  private def foldStore(s: org.apache.spark.sql.SparkSession, storeDir: String,
      upToBatch: Long, schema: org.apache.spark.sql.types.StructType)(
      fold: DataFrame => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val root = new Path(storeDir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val parts = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("batch="))
          scala.util.Try(n.stripPrefix("batch=").toLong).toOption
            .map(b => (b, st.getPath))
        else None
      }
    val toFold = parts.filter { case (b, _) => b < 0 || b <= upToBatch }
    if (toFold.isEmpty) return
    // next negative generation id — strictly below every existing
    // partition so the target dir is always fresh (crash-safe superset)
    val gen = math.min(parts.map(_._1).min, 0L) - 1
    fold(s.read.schema(schema).option("basePath", storeDir)
        .parquet(toFold.map(_._2.toString): _*))
      .write.mode("overwrite").parquet(s"$storeDir/batch=$gen")
    // sources are deleted only after the new generation committed
    toFold.foreach { case (_, p) => fs.delete(p, true) }
  }

  /** foreachBatch body for STORE-BACKED incremental NEAR-dup
    * detection — the MinHash-LSH analog of [[dedupBatch]] (exact) and
    * [[chunkDedupBatch]] (chunks), completing the incremental family:
    * each micro-batch finds its verified near-dup pairs against ALL
    * history without ever rescanning old batches.
    *
    * Per batch: (1) distinct shingles and banded MinHash keys compute
    * for the batch only; (2) cross-batch candidates come from probing
    * the persistent band-claim store — read-side the `maxBucket`
    * LOWEST doc ids per (band, bk), the same first-writer cap
    * semantics as [[Dedup.lshCandidates]]'s bucket cap, so the
    * cross-batch channel's recall matches the batch channel's (any
    * historical doc within the cap is probed, not just one
    * representative) while a boilerplate signature claimed by 10⁶ old
    * docs still contributes at most `maxBucket` candidates per
    * colliding new doc; (3) intra-batch
    * candidates go through the standard capped LSH channel; (4) exact
    * Jaccard verification reads the shingle store SEMI-JOINED to the
    * candidate docs (full shingle sets of touched docs only — the
    * store scan is pruned by the candidate set, which is the part
    * that stays small as history grows). Three outputs, all
    * batchId-keyed + overwrite (claims, shingles, verified pairs), so
    * crash-replay REPLACES a batch's output and the store reads
    * exclude the replaying batch's own partitions — the same
    * idempotence discipline as every store-backed operator here.
    */
  def nearDupBatch(storeDir: String, shingleN: Int = 3, bands: Int = 8,
      rowsPerBand: Int = 4, num: Int = 1, den: Int = 2, maxBucket: Int = 100)(
      batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.types._
    val s = batch.sparkSession
    val bandSchema = StructType(Seq(StructField("band", IntegerType),
      StructField("bk", StringType), StructField("doc_id", LongType),
      StructField("batch", LongType)))
    val shSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("shingle", StringType), StructField("batch", LongType)))
    def readOr(dir: String, schema: StructType): DataFrame =
      try s.read.schema(schema).parquet(dir).where(col("batch") =!= batchId)
      catch { case e: Exception with org.apache.spark.SparkThrowable
        if e.getCondition == "PATH_NOT_FOUND" =>
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    val docs = batch.select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // pinned: feeds the band build, the verify side, and its own write
    val sh = Text.distinctShingles(docs, col("text"), col("doc_id"), shingleN)
      .localCheckpoint(true)
    val banded = Dedup.minhashBandKeys(sh, bands, rowsPerBand)
      .localCheckpoint(true) // probed, self-joined, and written
    // capped first-writer claims per key across history: the maxBucket
    // lowest doc ids (row_number over doc_id order plans as a
    // WindowGroupLimit top-k — no full sort of a hot key's claims)
    val wClaim = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bk")).orderBy(col("doc_id"))
    val priorClaims = readOr(s"$storeDir/bands", bandSchema)
      .select(col("band"), col("bk"), col("doc_id")).distinct()
      .withColumn("rn", row_number().over(wClaim))
      .where(col("rn") <= maxBucket)
      .select(col("band"), col("bk"), col("doc_id").as("old_doc"))
    val cross = banded.select(col("band"), col("bk"), col("doc_id").as("new_doc"))
      .join(priorClaims, Seq("band", "bk"))
      .where(col("new_doc") =!= col("old_doc"))
      .select(least(col("new_doc"), col("old_doc")).as("doc_a"),
        greatest(col("new_doc"), col("old_doc")).as("doc_b"))
    val intra = Dedup.lshCandidates(banded, maxBucket)
    val cand = intra.unionAll(cross).distinct().localCheckpoint(true)
    val touched = cand.select(col("doc_a").as("doc_id"))
      .unionAll(cand.select(col("doc_b").as("doc_id"))).distinct()
    // full shingle sets of touched docs only; distinct() guards the
    // pathological re-sent-doc-id case from double-counting overlaps
    val verifySh = sh.select(col("doc_id"), col("shingle"))
      .unionAll(readOr(s"$storeDir/shingles", shSchema)
        .select(col("doc_id"), col("shingle")))
      .join(touched, Seq("doc_id"), "left_semi")
      .distinct()
    Dedup.jaccardVerify(cand, verifySh, num, den)
      .write.mode("overwrite").parquet(s"$storeDir/pairs/batch=$batchId")
    banded.select(col("band"), col("bk"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$storeDir/bands/batch=$batchId")
    sh.select(col("doc_id"), col("shingle"))
      .write.mode("overwrite").parquet(s"$storeDir/shingles/batch=$batchId")
  }

  /** foreachBatch body for STORE-BACKED incremental ANN indexing —
    * completing the incremental family (exact dedup, chunks, near-dup,
    * now the vector index): each micro-batch of (vec_id, embedding)
    * rows assigns to its nearest FIXED coarse centroid with the same
    * exact-integer `‖c‖² − 2·x·c` argmin as the batch k-means channel
    * ([[graft.ops.SemanticCluster]] — ties → lowest cell), and appends
    * (vec_id, cell, v) under `batch=N` with overwrite, so crash-replay
    * REPLACES a batch's partition (assignments have no cross-batch
    * dependency — no self-exclusion read needed, the one store-backed
    * operator here with zero read amplification per batch).
    *
    * Centroids are FIXED model metadata trained offline
    * ([[graft.ops.Ivf.build]]'s output, or any quantizer): an IVF
    * coarse quantizer is a sketch, and re-training it per batch would
    * invalidate every historical assignment — the production contract
    * is train rarely, assign forever, REBUILD (a batch job over the
    * store) when drift warrants.
    *
    * Probe with [[annProbeStore]]; CorpusStreamSpec pins that the
    * incrementally-built store answers top-k identically to a
    * single-shot assignment over the union.
    *
    * Scale shape: assignment is a pure scan-stage expression against
    * k·dim literal longs; the write inherits the batch's
    * partitioning. Nothing shuffles, nothing reads the store.
    */
  def annIndexBatch(storeDir: String, centroids: Seq[Seq[Float]])(
      batch: DataFrame, batchId: Long): Unit = {
    // cell-partitioned layout: a probe touches nProbe cells, and the
    // directory pruning below (annProbeStore's isin filter) skips the
    // rest of the store ON DISK — the IVF inverted-list property,
    // realized as parquet partition pruning
    annAssign(batch, centroids)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$storeDir/batch=$batchId")
  }

  /** Shared exact-integer nearest-centroid assignment: (vec_id, v,
    * cell) with the quantized argmin and lowest-cell tie-break. */
  private[streaming] def annAssign(rows: DataFrame,
      centroids: Seq[Seq[Float]]): DataFrame = {
    require(centroids.nonEmpty, "at least one centroid")
    val qc = centroids.map(_.map(x => math.round(x * 1000f).toLong))
    val scores = qc.map { c =>
      lit(c.map(x => x * x).sum) - lit(2L) *
        graft.ops.Vectors.intDot(
          graft.ops.Vectors.quantize(col("v")), array(c.map(lit): _*))
    }
    rows.select(col("vec_id").cast("long").as("vec_id"),
        col("v").cast("array<float>").as("v"))
      .withColumn("cell",
        (array_position(array(scores: _*), array_min(array(scores: _*))) - 1)
          .cast("int"))
  }

  /** Top-k over the incrementally-built [[annIndexBatch]] store: each
    * query probes its `nProbe` nearest cells (same integer argmin as
    * the index side) and scores only those cells' vectors with the
    * fused `q_dot` — the IVF read path ([[graft.ops.Ivf.topK]])
    * re-expressed against the store. The probed cell set is bounded
    * (|queries| · nProbe — model-metadata scale, same class as the
    * centroids themselves), so it collects and rides the store scan
    * as an `isin` PARTITION filter against the cell-partitioned
    * layout: unprobed cells never leave disk. Queries broadcast.
    */
  def annProbeStore(s: org.apache.spark.sql.SparkSession, storeDir: String,
      centroids: Seq[Seq[Float]], queries: DataFrame, k: Int,
      nProbe: Int): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    val qdot = graft.functions.GraftFunctions.registerQDot(s)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("v", ArrayType(FloatType)), StructField("cell", IntegerType),
      StructField("batch", LongType)))
    val store = s.read.schema(schema).parquet(storeDir)
    // the query's nProbe nearest cells, by the same integer score the
    // index side assigns with (annAssign widened from argmin to top-n)
    val qc = centroids.map(_.map(x => math.round(x * 1000f).toLong))
    val cents = qc.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cell"),
        (lit(c.map(x => x * x).sum) - lit(2L) * graft.ops.Vectors.intDot(
          graft.ops.Vectors.quantize(col("qv")), array(c.map(lit): _*))).as("sc"))
    }
    val probed = queries
      .select(col("vec_id").cast("long").as("q_vec_id"),
        col("v").cast("array<float>").as("qv"))
      .select(col("q_vec_id"), col("qv"),
        explode(array(cents: _*)).as("cs"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("q_vec_id"))
          .orderBy(col("cs.sc").asc, col("cs.cell").asc)))
      .where(col("crnk") <= nProbe)
      .select(col("q_vec_id"), col("qv"), col("cs.cell").as("cell"))
      .localCheckpoint(true) // collected below AND joined — one build
    // bounded collect (|queries| · nProbe cell ids) → partition filter
    val cells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    store.where(col("cell").isin(cells: _*))
      .join(broadcast(probed), "cell")
      .where(col("vec_id") =!= col("q_vec_id"))
      .select(col("q_vec_id"), col("vec_id"),
        qdot(col("v"), col("qv")).as("dot"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("q_vec_id"))
          .orderBy(col("dot").desc, col("vec_id").asc)))
      .where(col("rnk") <= k)
  }

  /** foreachBatch body for STREAMING SEMANTIC DEDUP — the continuous
    * form of `emb_semdedup`: each micro-batch's vectors coarse-assign
    * to their fixed k-means cell ([[annAssign]]) and are ADMITTED only
    * if no already-admitted vector in the same cell sits within the
    * SemDeDup cosine threshold (the identical integer form as the
    * batch query: dot > 0 ∧ 10⁴·dot² ≥ 1600·n2a·n2b, i.e. cos ≥ 0.4).
    * Admitted vectors append to the cell-partitioned store under
    * `batch=N` with overwrite; per-vector decisions (admitted,
    * dup_of) land in `decisionsDir/batch=N` the same way — so
    * crash-replay REPLACES both outputs and the store read excludes
    * the replaying batch's own partition ([[dedupBatch]]'s
    * discipline).
    *
    * POLICY — greedy prefix admission, not component minima: a vector
    * is rejected iff an ADMITTED earlier vector (earlier batch, or
    * smaller vec_id within the batch) is within threshold, with
    * dup_of = the smallest such admitted id. This is what a
    * production ingest store can actually decide online (it can only
    * compare against what it kept), and it makes admission
    * BATCH-SPLIT INVARIANT: processing the same id-ordered rows in
    * one batch or many yields identical decisions, because the
    * admitted set is a deterministic function of the processed
    * prefix. It intentionally differs from the batch query's
    * component-minimum rule on CHAINS (a≈b≈c, a≉c: the offline pass
    * keeps only a; the online pass must re-admit c after rejecting b,
    * or every long drift chain would collapse to its first arrival).
    * SemanticStreamSpec pins the greedy-MIS properties (every
    * rejection names an admitted in-threshold witness; no two
    * admitted vectors in a cell are within threshold) against a
    * sequential in-memory replay, plus split-invariance and replay
    * idempotence.
    *
    * Scale shape: within-batch pair generation and the store probe
    * are both cell-blocked (the SemDeDup trade — cells bounded by
    * sizing k to the corpus, the same fixed-model assumption as
    * [[annIndexBatchPq]]); the greedy resolution runs per cell in one
    * [[graft.ops.Components.componentsWithinGroups]]-style
    * flatMapGroups whose memory is one entry per batch vector in the
    * cell plus the cell's batch-internal edge list. Nothing iterates,
    * nothing collects to the driver.
    */
  def semanticAdmitBatch(storeDir: String, decisionsDir: String,
      centroids: Seq[Seq[Float]])(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.types._
    val s = batch.sparkSession
    import s.implicits._
    val qdot = graft.functions.GraftFunctions.registerQDot(s)
    def nearTest(dot: Column, n2a: Column, n2b: Column): Column =
      dot > 0 &&
        lit(10000L).cast("decimal(38,0)") *
          dot.cast("decimal(38,0)") * dot.cast("decimal(38,0)") >=
        lit(1600L).cast("decimal(38,0)") *
          n2a.cast("decimal(38,0)") * n2b.cast("decimal(38,0)")
    val a = annAssign(batch, centroids)
      .withColumn("n2", qdot(col("v"), col("v")))
      .localCheckpoint(true) // feeds the probe, the pair join, and the append
    val storeSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("v", ArrayType(FloatType)), StructField("cell", IntegerType),
      StructField("batch", LongType)))
    val store =
      try s.read.schema(storeSchema).parquet(storeDir)
        .where(col("batch") =!= batchId)
        .select(col("vec_id"), col("v"), col("cell"))
      catch { case e: Exception with org.apache.spark.SparkThrowable
        if e.getCondition == "PATH_NOT_FOUND" =>
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(storeSchema.dropRight(1)))
      }
    // earliest admitted store near-dup per batch vector (store rows are
    // admitted by construction — the store IS the admitted set)
    val storeDup = a.as("b").join(store.as("st"), col("b.cell") === col("st.cell"))
      .where(nearTest(qdot(col("st.v"), col("b.v")),
        qdot(col("st.v"), col("st.v")), col("b.n2")))
      .groupBy(col("b.vec_id").as("vec_id"))
      .agg(min(col("st.vec_id")).as("store_dup"))
    // batch-internal threshold edges, cell-blocked like the batch query
    val edges = a.as("x").join(a.as("y"),
        col("x.cell") === col("y.cell") && col("x.vec_id") < col("y.vec_id"))
      .where(nearTest(qdot(col("x.v"), col("y.v")), col("x.n2"), col("y.n2")))
      .select(col("x.cell").as("cell"), col("x.vec_id").as("ea"),
        col("y.vec_id").as("eb"))
    // greedy prefix admission per cell: nodes (kind 0, with their store
    // verdict) and edges (kind 1) fold through one grouped pass
    val nodes = a.select(col("cell"), col("vec_id"))
      .join(storeDup, Seq("vec_id"), "left")
      .select(col("cell"), lit(0).as("kind"), col("vec_id").as("ea"),
        coalesce(col("store_dup"), lit(-1L)).as("eb"))
    val decided = nodes
      .unionByName(edges.select(col("cell"), lit(1).as("kind"),
        col("ea"), col("eb")))
      .as[(Int, Int, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val storeHit = scala.collection.mutable.LongMap.empty[Long]
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        // neighbors of the LARGER endpoint — greedy only ever looks back
        val back = scala.collection.mutable.LongMap
          .empty[scala.collection.mutable.ArrayBuffer[Long]]
        it.foreach {
          case (_, 0, id, sd) =>
            ids += id; if (sd >= 0) storeHit(id) = sd
          case (_, _, ea, eb) =>
            back.getOrElseUpdate(eb,
              scala.collection.mutable.ArrayBuffer.empty[Long]) += ea
        }
        val admitted = scala.collection.mutable.LongMap.empty[Long]
        ids.sorted.iterator.map { id =>
          val inBatch = back.get(id).iterator.flatten
            .filter(admitted.contains).reduceOption(_ min _)
          val dup = (storeHit.get(id), inBatch) match {
            case (Some(sdv), Some(ib)) => Some(sdv min ib)
            case (sdv, ib) => sdv.orElse(ib)
          }
          if (dup.isEmpty) admitted(id) = id
          (id, cell, dup.isEmpty, dup.getOrElse(-1L))
        }
      }
      .toDF("vec_id", "cell", "admitted", "dup_of")
      .localCheckpoint(true) // two writes below read one materialization
    decided.write.mode("overwrite").parquet(s"$decisionsDir/batch=$batchId")
    a.join(decided.where(col("admitted")).select(col("vec_id")), Seq("vec_id"))
      .select(col("vec_id"), col("v"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$storeDir/batch=$batchId")
  }

  /** PQ-coded variant of [[annIndexBatch]] — the IVF-PQ serving path
    * ([[graft.ops.IvfPq]]) as an INCREMENTAL store: each micro-batch
    * coarse-assigns to its nearest fixed centroid, computes the
    * residual (v − cell centroid), encodes it against FIXED per-subspace
    * codebooks (nearest codebook entry per slice, ties → lowest code —
    * the same argmin [[graft.ops.Pq.build]] encodes with), and appends
    * (vec_id, v, codes, cell) under `batch=N` with overwrite — so
    * crash-replay REPLACES a batch's partition exactly like the
    * uncoded store, and a checkpointed restart is invisible to any
    * later probe (CorpusStreamSpec proves this against a
    * never-restarted twin).
    *
    * Both `centroids` and `codebook` are FIXED model metadata (train
    * rarely, assign forever — re-training per batch would invalidate
    * every historical code; rebuild offline when drift warrants). The
    * codebook is the flattened (sub, code, centroid) table of
    * [[graft.ops.Pq.Index.cents]], dense by construction.
    *
    * Scale shape: assignment + encoding are one scan-stage expression
    * chain plus one keyed aggregation WITHIN the micro-batch (codes
    * fold per vec_id); nothing reads the store, nothing shuffles
    * across batches. The store keeps the raw vector beside the codes
    * because the serving read path ends in an exact re-rank — at
    * 100 TB the v column lives in the same cell-pruned parquet and
    * only shortlisted rows' vectors are ever deserialized.
    */
  def annIndexBatchPq(storeDir: String, centroids: Seq[Seq[Float]],
      codebook: Seq[(Int, Int, Seq[Double])])(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val m = codebook.map(_._1).max + 1
    val dim = centroids.head.size
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val coarse = centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cell", "centroid")
    val cents = codebook.toDF("sub", "code", "sub_centroid")
    val resid = annAssign(batch, centroids)
      .join(broadcast(coarse), "cell")
      .withColumn("rv", zip_with(col("v"), col("centroid"),
        (a, b) => (a.cast("double") - b.cast("double")).cast("float")))
      .select(col("vec_id"), col("v"), col("cell"), col("rv"))
    // slice the residual, encode each slice against its subspace
    // codebook (min(struct) → deterministic lowest-code tie-break),
    // refold to the positional codes array ADC indexes into
    val subL2 = expr("""aggregate(zip_with(subv, sub_centroid,
      (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)),
      0D, (acc, x) -> acc + x)""")
    val coded = resid
      .select(col("vec_id"), col("v"), col("cell"), posexplode(expr(
        s"transform(sequence(0, ${m - 1}), i -> slice(rv, i * $dsub + 1, $dsub))")))
      .withColumnRenamed("pos", "sub").withColumnRenamed("col", "subv")
      .join(broadcast(cents), "sub")
      .withColumn("d2", subL2)
      .groupBy(col("vec_id"), col("v"), col("cell"), col("sub"))
      .agg(min(struct(col("d2"), col("code"))).getField("code").as("code"))
      .groupBy(col("vec_id"), col("v"), col("cell"))
      .agg(expr("transform(array_sort(collect_list(struct(sub, code))), x -> x.code)")
        .as("codes"))
    coded.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$storeDir/batch=$batchId")
  }

  /** IVF-PQ top-k over the incrementally-built [[annIndexBatchPq]]
    * store — [[graft.ops.IvfPq.topK]]'s read path re-expressed against
    * the cell-partitioned layout: probe `nProbe` cells per query (the
    * same integer argmin the index side assigns with, so probe and
    * assignment can never disagree on a cell boundary), ADC-score only
    * those cells' CODES with the inner-product decomposition
    * q·v ≈ q·c + Σ_s q_s·codebook_s (one flat table of the RAW query
    * against the residual codebook, shared across probed cells — the
    * q−c form is NOT rank-equivalent, see IvfPq), shortlist, then
    * exact q_dot re-rank against the stored vectors.
    *
    * Scale shape: the probed cell set is bounded (|queries| · nProbe)
    * and rides the store scan as an `isin` PARTITION filter — unprobed
    * cells never leave disk; queries and their ADC tables broadcast;
    * only `shortlist` rows per query deserialize the v column for the
    * exact tail.
    */
  def annProbeStorePq(s: org.apache.spark.sql.SparkSession, storeDir: String,
      centroids: Seq[Seq[Float]], codebook: Seq[(Int, Int, Seq[Double])],
      queries: DataFrame, k: Int, nProbe: Int, shortlist: Int): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val adc = graft.functions.GraftFunctions.registerAdcSum(s)
    val m = codebook.map(_._1).max + 1
    val kCodes = codebook.map(_._2).max + 1
    val dim = centroids.head.size
    // same guard as the index side: a silent floor here would slice
    // queries short and null-poison every ADC table
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("v", ArrayType(FloatType)),
      StructField("codes", ArrayType(IntegerType)),
      StructField("cell", IntegerType), StructField("batch", LongType)))
    val store = s.read.schema(schema).parquet(storeDir)
    // probe cells by the index side's integer score; carry the DOUBLE
    // q·c constant for ADC (the decomposition's cell term)
    val qc = centroids.map(_.map(x => math.round(x * 1000f).toLong))
    val centStructs = qc.zipWithIndex.map { case (c, i) =>
      struct(lit(i).as("cell"),
        (lit(c.map(x => x * x).sum) - lit(2L) * graft.ops.Vectors.intDot(
          graft.ops.Vectors.quantize(col("qv")), array(c.map(lit): _*))).as("sc"))
    }
    val coarse = centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toDF("cell", "centroid")
    val probed = queries
      .select(col("vec_id").cast("long").as("q_vec_id"),
        col("v").cast("array<float>").as("qv"))
      .select(col("q_vec_id"), col("qv"),
        explode(array(centStructs: _*)).as("cs"))
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("q_vec_id"))
          .orderBy(col("cs.sc").asc, col("cs.cell").asc)))
      .where(col("crnk") <= nProbe)
      .select(col("q_vec_id"), col("qv"), col("cs.cell").as("cell"))
      .join(broadcast(coarse), "cell")
      .withColumn("qcd", expr("""aggregate(zip_with(qv, centroid,
        (a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)),
        0D, (acc, x) -> acc + x)"""))
      .select(col("q_vec_id"), col("qv"), col("cell"), col("qcd"))
      .localCheckpoint(true) // collected below AND joined — one build
    val cells = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    // one flat ADC table per query — the SHARED builder
    // (graft.ops.Pq.adcTables), so the table layout can never drift
    // from the batch IVF-PQ read path
    val cents = codebook.toDF("sub", "code", "centroid")
    val qtables = graft.ops.Pq.adcTables(
      probed.select(col("q_vec_id"), col("qv")).distinct(),
      col("qv"), col("q_vec_id"), cents, m, dsub)
    val short = store.where(col("cell").isin(cells: _*))
      .join(broadcast(probed.select(col("q_vec_id"), col("cell"), col("qcd"))), "cell")
      .join(broadcast(qtables), "q_vec_id")
      .where(col("vec_id") =!= col("q_vec_id"))
      .withColumn("score", col("qcd") + adc(col("codes"), col("tbl"), kCodes))
      .withColumn("srnk", row_number().over(
        Window.partitionBy(col("q_vec_id"))
          .orderBy(col("score").desc, col("vec_id").asc)))
      .where(col("srnk") <= shortlist)
      .select(col("q_vec_id"), col("vec_id"))
    // exact re-rank against the STORED vectors (cell-pruned read),
    // via the shared tail every two-stage ANN path uses
    graft.ops.Pq.rerankExact(
      store.where(col("cell").isin(cells: _*)).select(col("vec_id"), col("v")),
      queries.select(col("vec_id").cast("long").as("vec_id"),
        col("v").cast("array<float>").as("v")),
      short, col("v"), col("vec_id"), k)
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

  /** Streaming token budget — the continuous form of
    * `corpus_token_budget`'s per-source data recipe: each source
    * admits documents until its cumulative TOKEN total would exceed
    * `budget`, then drops the rest forever. The batch form selects
    * the prefix of a deterministic hash-priority order, which needs
    * the whole group in hand; a stream cannot rank globally, so the
    * streaming contract (exactly [[capBySource]]'s) is
    * first-by-arrival admission — deterministic under replay because
    * intra-batch ties break by doc_id, and monotone: an admitted doc
    * is never evicted. A doc that would overflow the remaining budget
    * is SKIPPED (not truncated), and later smaller docs may still fit
    * — the same greedy-prefix-with-skips a budget admission gate
    * actually runs.
    *
    * State shape at scale: ONE long (token total) per distinct
    * source, the [[capBySource]] footprint; no timeout needed.
    */
  def tokenBudgetBySource(docs: DataFrame, tokens: org.apache.spark.sql.Column,
                          budget: Long): Dataset[BudgetedDoc] = {
    import docs.sparkSession.implicits._
    docs.select(col("source").cast("string").as("source"),
        col("doc_id").cast("long").as("doc_id"),
        tokens.cast("long").as("n_tok"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[Long]) => {
          var used = if (state.exists) state.get else 0L
          val out = rows.toSeq.sortBy(_._2).flatMap { case (_, id, n) =>
            if (used + n <= budget) {
              used += n
              Some(BudgetedDoc(id, src, n, used))
            } else None
          }
          state.update(used)
          out.iterator
        })
  }

  /** [[dedupBatch]] with a Bloom pre-filter — the 100 TB shape of the
    * store-backed incremental dedup: beside each batch's fingerprint
    * partition the sink persists that batch's [[graft.ops.Bloom]] word
    * rows (≤128 longs), and the NEXT batch merges all filter partitions
    * word-wise (bit_or — the filter is a monoid, so per-batch shards
    * merge exactly), probes the batch as a scan-stage expression, and
    * pays the exact store recheck ONLY for bloom hits. A Bloom miss is
    * definitive (no false negatives), so the store — the part that
    * grows with corpus lifetime — is scanned semi-joined against the
    * (tiny) hit set instead of anti-joined against the whole batch;
    * false positives cost one extra exact lookup each, never a wrong
    * answer. Same batchId-keyed overwrite discipline as [[dedupBatch]],
    * for both the fingerprint and the filter partition, so crash-replay
    * stays idempotent.
    */
  def dedupBatchBloom(storeDir: String)(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.types._
    val s = batch.sparkSession
    val fpSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("fingerprint", StringType),
      StructField("batch", LongType)))
    val bfSchema = StructType(Seq(
      StructField("word", IntegerType), StructField("bits", LongType),
      StructField("batch", LongType)))
    def readOr(dir: String, schema: StructType, empty: StructType): DataFrame =
      try s.read.schema(schema).parquet(dir).where(col("batch") =!= batchId)
      catch { case e: Exception with org.apache.spark.SparkThrowable
        if e.getCondition == "PATH_NOT_FOUND" =>
          s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], empty)
      }
    // keyed on the SAME hash family as the batch probe below
    val hashOf = graft.ops.Text.polyHash(col("fingerprint"))
    val priorFilters = readOr(s"$storeDir/bloom", bfSchema, bfSchema)
      .groupBy("word").agg(expr("bit_or(bits)").as("bits"))
    val words = graft.ops.Bloom.filterWords(priorFilters)
    // dedup only — same contract as [[dedupBatch]]; compose the quality
    // gate upstream ([[ingest]]'s filter) when the pipeline wants both
    val fp = batch
      .select(col("doc_id").cast("long").as("doc_id"),
        Text.fingerprint(col("text")).as("fingerprint"))
      .withColumn("bloom_hit", graft.ops.Bloom.hitExpr(hashOf, words))
    // exact recheck only for hits: semi-join the store against the hit
    // set (broadcast — bloom hits are the small side by construction)
    val hits = fp.where(col("bloom_hit")).select(col("fingerprint"))
    val confirmed = readOr(storeDir + "/fp", fpSchema, fpSchema)
      .join(broadcast(hits), Seq("fingerprint"), "left_semi")
      .select(col("fingerprint"))
    // first-writer-wins inside the batch (same contract as
    // Dedup.incrementalExact, which would re-fingerprint the text),
    // then drop confirmed store hits; Bloom misses pass by
    // construction — `confirmed` only ever contains hit fingerprints
    val survivors = fp
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint")).orderBy(col("doc_id"))))
      .where(col("_rn") === 1)
      .join(confirmed, Seq("fingerprint"), "left_anti")
      .select(col("doc_id"), col("fingerprint"))
    survivors.write.mode("overwrite").parquet(s"$storeDir/fp/batch=$batchId")
    // this batch's filter shard, from the rows that actually landed
    graft.ops.Bloom.build(
        s.read.schema(StructType(fpSchema.dropRight(1)))
          .parquet(s"$storeDir/fp/batch=$batchId"),
        graft.ops.Text.polyHash(col("fingerprint")))
      .write.mode("overwrite").parquet(s"$storeDir/bloom/batch=$batchId")
  }

  /** Streaming CONCAT-AND-CHUNK packing — the continuous form of
    * `corpus_pack` ([[graft.ops.Pack.assign]]), completing the
    * streaming corpus family (cap, budget, keep-best, weighted
    * sample, dedup ×3, ANN index, pack): docs lay end-to-end per
    * source as they arrive, and each doc emits with the pack id its
    * first token lands in plus the straddle flag, by the IDENTICAL
    * integer formulas the batch operator uses — so replaying a log
    * through the stream in the batch operator's order reproduces its
    * assignment row for row (spec-pinned). The batch form needs the
    * whole group in hand to rank a deterministic order; the streaming
    * contract (the [[capBySource]] rule) is arrival order with
    * intra-batch doc_id ties.
    *
    * State per source is ONE long — the running token total — the
    * smallest state in the family alongside [[capBySource]]; no
    * timeout needed.
    */
  def packBySource(docs: DataFrame, budget: Long): Dataset[PackedDoc] = {
    require(budget >= 1, "budget must be at least 1 token")
    import docs.sparkSession.implicits._
    docs.select(col("source").cast("string").as("source"),
        col("doc_id").cast("long").as("doc_id"),
        col("n_tok").cast("long").as("n_tok"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (src: String, rows: Iterator[(String, Long, Long)],
         state: GroupState[Long]) => {
          var cum = if (state.exists) state.get else 0L
          val out = rows.toSeq.sortBy(_._2).map { case (_, id, n) =>
            val packId = cum / budget
            // a zero-token doc occupies no span and can never straddle
            // (same guard as the batch form — keeps (cum + n - 1) out
            // of the negative-dividend regime too)
            val straddles = n > 0 && packId != (cum + n - 1) / budget
            cum += n
            PackedDoc(src, id, n, packId, straddles)
          }
          state.update(cum)
          out.iterator
        })
  }

  /** Streaming KEEP-BEST decision — the continuous form of
    * `corpus_dedup_keep_best`'s per-cluster argmax: docs sharing a
    * caller-supplied near-dup key (a SimHash bucket, a normalized
    * fingerprint, an upstream cluster label — exact dupes would tie on
    * any length-based quality, so the key is a parameter, not baked to
    * [[Text.fingerprint]]) race inside an event-time horizon, and when
    * the watermark passes `maxEventTime + gap` the group emits its ONE
    * winner (highest `quality`, tie → lowest doc_id) and drops its
    * state. [[ingest]]'s first-writer-wins answers "which copy arrived
    * first"; this answers the batch ending's actual question — "which
    * copy is best" — which a stream can only decide once the horizon
    * closes, hence the timeout-driven emit rather than Append-per-row.
    *
    * Late data: rows older than the watermark are dropped BEFORE the
    * state update (standard flatMapGroupsWithState pre-filtering), so
    * an expired decision is never resurrected and never double-emits.
    *
    * State shape at scale: one (quality, doc_id, maxEvent) triple per
    * in-flight key, sharded by key, and the timeout bounds its
    * lifetime to the horizon — unlike [[ingest]]'s unbounded
    * fingerprint set, this state self-evicts.
    *
    * `docs` needs (doc_id, ts) plus whatever `key`/`quality` read, and
    * a caller-set watermark on `ts` (the horizon gap must be ≤ the
    * watermark delay or groups time out while siblings can still
    * legally arrive).
    */
  def keepBestByKey(docs: DataFrame, key: org.apache.spark.sql.Column,
                    quality: org.apache.spark.sql.Column,
                    gapMs: Long): Dataset[BestPick] = {
    import docs.sparkSession.implicits._
    docs
      .select(key.cast("string").as("key"),
        col("doc_id").cast("long").as("doc_id"),
        quality.cast("long").as("quality"),
        col("ts"))
      .as[(String, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k: String, rows: Iterator[(String, Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) => {
          if (state.hasTimedOut) {
            val (q, id, _) = state.get
            state.remove()
            Iterator.single(BestPick(k, id, q))
          } else {
            // fold the batch into (quality desc, id asc)-best + max event time
            val init = if (state.exists) state.get else (Long.MinValue, Long.MaxValue, 0L)
            val (q, id, maxEv) = rows.foldLeft(init) { case ((bq, bid, mx), r) =>
              val better = r._3 > bq || (r._3 == bq && r._2 < bid)
              (if (better) r._3 else bq, if (better) r._2 else bid,
                math.max(mx, r._4.getTime))
            }
            state.update((q, id, maxEv))
            // must exceed the current watermark or the update throws;
            // max() covers a first batch whose events trail it
            state.setTimeoutTimestamp(
              math.max(maxEv + gapMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
        })
  }

  /** Streaming WEIGHTED sample — the continuous form of
    * [[graft.ops.Sampling.weightedCapPerGroup]]: per (source,
    * event-time window) keep the `cap` docs with the smallest integer
    * priority `hash(id)·2²⁰ div max(weight,1)` — the SAME
    * Efraimidis–Spirakis-style race as the batch operator, computed by
    * the same column expression, so a window's winners equal the batch
    * operator run over that window's in-watermark rows. The race is
    * only decidable once no contender can arrive, so winners emit when
    * the watermark passes the window end (timeout), ranked.
    *
    * State shape at scale: at most `cap` (priority, id) pairs per
    * in-flight (source, window) — bounded by construction, timeout-
    * evicted; arrivals fold in as a running top-`cap`, so a window
    * that sees millions of rows still holds `cap` entries.
    */
  def weightedSampleByWindow(docs: DataFrame, weight: org.apache.spark.sql.Column,
                             windowDur: String, cap: Int): Dataset[WeightedPick] = {
    import docs.sparkSession.implicits._
    val win = window(col("ts"), windowDur)
    docs
      .select(col("source").cast("string").as("source"),
        col("doc_id").cast("long").as("doc_id"),
        weight.cast("long").as("__w"), col("ts"))
      // integer div (not fractional divide): the batch operator's
      // priority is `(hash·2^20) div w` and replay determinism rests
      // on both forms truncating identically
      .withColumn("wp", expr(
        s"(${graft.ops.Sampling.hashValSql("doc_id")} * 1048576) div greatest(__w, 1)"))
      .withColumn("wstart", win.getField("start"))
      .withColumn("wend", win.getField("end"))
      // `ts` rides along so the stateful operator's late-row
      // pre-filter still sees the watermarked event-time column
      .select(col("source"), col("doc_id"), col("wp").cast("long").as("wp"),
        col("wstart"), col("wend"), col("ts"))
      .as[(String, Long, Long, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)]
      .groupByKey(r => (r._1, r._4.getTime))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (String, Long),
         rows: Iterator[(String, Long, Long, java.sql.Timestamp, java.sql.Timestamp, java.sql.Timestamp)],
         state: GroupState[List[(Long, Long)]]) => {
          if (state.hasTimedOut) {
            val winners = state.get.sorted
            state.remove()
            winners.iterator.zipWithIndex.map { case ((_, id), i) =>
              WeightedPick(key._1, new java.sql.Timestamp(key._2), id, i + 1)
            }
          } else {
            val init = if (state.exists) state.get else Nil
            var endMs = 0L
            val merged = rows.foldLeft(init) { case (acc, r) =>
              endMs = math.max(endMs, r._5.getTime)
              ((r._3, r._2) :: acc).sorted.take(cap)
            }
            state.update(merged)
            state.setTimeoutTimestamp(
              math.max(endMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
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
