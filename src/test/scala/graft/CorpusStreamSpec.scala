package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, explode}
import org.apache.spark.sql.streaming.OutputMode
import graft.ops.Dedup
import graft.streaming.CorpusStream

/** Streaming corpus ingest: quality gate and exact dedup hold across
  * micro-batch boundaries (first writer wins via streaming state). */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private val good1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val good2 = "one two three four five six seven eight nine ten eleven"
  private val short = "too short"

  test("cross-batch exact dedup, quality gate, first writer wins") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = CorpusStream.ingest(input.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("corpus_ingest").start()

    input.addData((1L, good1), (2L, short), (3L, good1)) // 3 dups 1 in-batch
    q.processAllAvailable()
    input.addData((4L, good1), (5L, good2)) // 4 dups 1 across batches
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("corpus_ingest")
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toSet
    // doc 2 fails the length gate; docs 3 and 4 lose to doc 1's state
    assert(rows === Set((1L, 10L), (5L, 11L)))
  }

  test("store-backed incremental dedup: store accumulates, replay is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-fp-store").toString + "/store"
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.outputMode(OutputMode.Append())
      .foreachBatch(CorpusStream.dedupBatch(storeDir) _)
      .start()

    input.addData((1L, good1), (2L, good2), (3L, good1)) // 3 loses in-batch
    q.processAllAvailable()
    input.addData((4L, good1), (5L, "completely novel content here today"))
    q.processAllAvailable() // 4 is a store hit -> dropped
    q.stop()

    def stored = spark.read.parquet(storeDir)
    assert(stored.select($"doc_id").as[Long].collect().toSet === Set(1L, 2L, 5L))

    // crash-replay: re-running a batch id REPLACES its output, so the
    // store holds each survivor exactly once
    val replay = Seq((5L, "completely novel content here today"))
      .toDF("doc_id", "text")
    CorpusStream.dedupBatch(storeDir)(replay, 1L)
    assert(stored.count() === 3L)
    assert(stored.select($"doc_id").as[Long].collect().toSet === Set(1L, 2L, 5L))
  }

  test("bloom-accelerated store dedup: same survivors as the plain store, idempotent replay") {
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft-bloom-store").toString + "/store"
    val novel = "completely novel content here today friends"
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      CorpusStream.dedupBatchBloom(storeDir)(rows.toDF("doc_id", "text"), id)

    run(Seq((1L, good1), (2L, good2), (3L, good1)), 0L) // 3 loses in-batch
    run(Seq((4L, good1), (5L, novel)), 1L) // 4 = bloom-hit store dup, dropped
    def stored = spark.read.parquet(s"$storeDir/fp")
    assert(stored.select($"doc_id").as[Long].collect().toSet === Set(1L, 2L, 5L))

    // the per-batch filter shards merge into a filter that hits every
    // stored fingerprint (no false negatives across shards)
    val merged = graft.ops.Bloom.filterWords(
      spark.read.parquet(s"$storeDir/bloom")
        .groupBy($"word").agg(org.apache.spark.sql.functions.expr("bit_or(bits)").as("bits")))
    val missed = stored.where(!graft.ops.Bloom.hitExpr(
      graft.ops.Text.polyHash($"fingerprint"), merged)).count()
    assert(missed === 0L)

    // crash-replay of batch 1 REPLACES its own fp and filter shards
    run(Seq((5L, novel)), 1L)
    assert(stored.count() === 3L)
    assert(spark.read.parquet(s"$storeDir/bloom")
      .select($"batch").distinct().count() === 2L)
  }

  test("streaming per-source cap: first-N-by-arrival across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = CorpusStream.capBySource(
      input.toDF().toDF("doc_id", "source"), cap = 3)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("source_cap").start()

    input.addData((5L, "s1"), (2L, "s1"), (10L, "s2"))
    q.processAllAvailable()
    // s1 has room for 1 more: doc 7 admitted, doc 9 dropped (intra-batch
    // tie-break by doc_id); s2 fills up exactly
    input.addData((9L, "s1"), (7L, "s1"), (11L, "s2"), (12L, "s2"))
    q.processAllAvailable()
    // both sources full: everything drops
    input.addData((1L, "s1"), (13L, "s2"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("source_cap")
      .select($"doc_id", $"source", $"seq").as[(Long, String, Long)]
      .collect().toSet
    assert(rows === Set(
      (2L, "s1", 1L), (5L, "s1", 2L), (7L, "s1", 3L),
      (10L, "s2", 1L), (11L, "s2", 2L), (12L, "s2", 3L)))
  }

  test("streaming token budget: admits by arrival, skips overflow, later fits still admit") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val out = CorpusStream.tokenBudgetBySource(
      input.toDF().toDF("doc_id", "source", "n_tok"), col("n_tok"), budget = 100L)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("token_budget").start()

    input.addData((1L, "s1", 60L), (2L, "s1", 30L))
    q.processAllAvailable()
    // 90/100 used: doc 3 (20 tok) would overflow and is SKIPPED, but
    // doc 4 (10 tok) in the same batch still fits — greedy with skips,
    // intra-batch order by doc_id
    input.addData((3L, "s1", 20L), (4L, "s1", 10L))
    q.processAllAvailable()
    // budget exactly exhausted: everything drops
    input.addData((5L, "s1", 1L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("token_budget")
      .select($"doc_id", $"source", $"n_tok", $"cum_tokens")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(rows === Set(
      (1L, "s1", 60L, 60L), (2L, "s1", 30L, 90L), (4L, "s1", 10L, 100L)))
  }

  private val base = (0 until 60).map(i => s"w$i").mkString(" ")

  test("per-row band keys match the aggregated MinHash signature form") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50).select($"doc_id", $"text")
    val agg = graft.ops.Dedup.minhashBandKeys(
        graft.ops.Text.distinctShingles(docs, $"text", $"doc_id", 3), 8, 4)
      .select($"doc_id", $"band", $"bk").as[(Long, Int, String)].collect().toSet
    val perRow = docs.select($"doc_id",
        explode(graft.ops.Dedup.bandKeyArray($"text")).as("b"))
      .select($"doc_id", $"b.band", $"b.bk").as[(Long, Int, String)].collect().toSet
    assert(perRow === agg)
  }

  test("cross-batch near-dup candidates: collision with the first claimant") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = CorpusStream.nearDupCandidates(input.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("neardup_cands").start()

    val nearDup = base.replace("w30", "changed") // J ≈ 0.9 vs base
    val unrelated = (0 until 60).map(i => s"u$i").mkString(" ")
    input.addData((1L, base))
    q.processAllAvailable()
    // doc 1 re-delivered (at-least-once upstream): must NOT self-pair
    input.addData((1L, base), (2L, nearDup), (3L, unrelated), (4L, unrelated))
    q.processAllAvailable()
    q.stop()

    val cands = spark.table("neardup_cands")
      .select($"doc_id", $"first_doc_id").as[(Long, Long)].collect()
    val byDoc = cands.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // doc 2 collides with doc 1 in at least one band (and only doc 1);
    // doc 3 claims fresh keys; doc 4 (exact dup, same batch) hits doc 3;
    // doc 1's redelivery emits nothing (would otherwise read as J=1)
    assert(byDoc(2L) === Set(1L))
    assert(!byDoc.contains(3L))
    assert(byDoc(4L) === Set(3L))
    assert(!byDoc.contains(1L))
  }

  private def ts(min: Long): java.sql.Timestamp =
    new java.sql.Timestamp(1704067200000L + min * 60000L) // 2024-01-01 + min

  test("streaming keep-best: horizon close emits one best per key, late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "grp", "quality", "ts")
      .withWatermark("ts", "10 minutes")
    val out = CorpusStream.keepBestByKey(docs, org.apache.spark.sql.functions.col("grp"),
      org.apache.spark.sql.functions.col("quality"), gapMs = 5 * 60000L)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("keep_best").start()

    // group a: doc 3 (q=50) should beat doc 1 (q=40) and tie-loser 4
    input.addData((1L, "a", 40L, ts(0)), (3L, "a", 50L, ts(1)), (4L, "a", 50L, ts(1)))
    q.processAllAvailable()
    // group b opens; watermark still behind group a's timeout
    input.addData((7L, "b", 10L, ts(2)))
    q.processAllAvailable()
    assert(spark.table("keep_best").count() === 0L) // no horizon closed yet
    // advance the watermark far past both horizons: both groups decide
    input.addData((99L, "c", 1L, ts(60)))
    q.processAllAvailable()
    val decided = spark.table("keep_best")
      .select($"key", $"doc_id", $"quality").as[(String, Long, Long)].collect().toSet
    assert(decided === Set(("a", 3L, 50L), ("b", 7L, 10L)))
    // a LATE higher-quality doc for the already-decided group a
    // (event time far behind the watermark) must not resurrect it
    input.addData((8L, "a", 99L, ts(1)))
    q.processAllAvailable()
    input.addData((100L, "d", 1L, ts(120))) // push watermark again
    q.processAllAvailable()
    q.stop()
    val after = spark.table("keep_best")
      .where($"key" === "a").select($"doc_id").as[Long].collect().toSet
    assert(after === Set(3L), s"late data resurrected a decided group: $after")
  }

  test("streaming weighted sample matches the batch priority race per window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "source", "weight", "ts")
      .withWatermark("ts", "10 minutes")
    val out = CorpusStream.weightedSampleByWindow(
      docs, $"weight", windowDur = "30 minutes", cap = 2)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("weighted_win").start()

    // one 30-min window for s1 with 4 contenders across two batches
    val contenders = Seq((1L, 3L), (2L, 1L), (3L, 9L), (4L, 4L)) // (id, weight)
    input.addData((1L, "s1", 3L, ts(0)), (2L, "s1", 1L, ts(5)))
    q.processAllAvailable()
    input.addData((3L, "s1", 9L, ts(10)), (4L, "s1", 4L, ts(20)))
    q.processAllAvailable()
    assert(spark.table("weighted_win").count() === 0L) // window still open
    input.addData((50L, "s2", 1L, ts(90))) // watermark past window end
    q.processAllAvailable()
    q.stop()

    val got = spark.table("weighted_win").where($"source" === "s1")
      .select($"doc_id", $"rk").as[(Long, Int)].collect().toSet

    // expected = the BATCH operator's race on the same rows
    val batch = graft.ops.Sampling.weightedCapPerGroup(
        contenders.toDF("doc_id", "weight")
          .withColumn("source", org.apache.spark.sql.functions.lit("s1")),
        $"source", $"doc_id", $"weight", cap = 2)
      .select($"doc_id", $"rk").as[(Long, Long)].collect()
      .map { case (id, rk) => (id, rk.toInt) }.toSet
    assert(got === batch, s"streaming $got != batch $batch")
    assert(got.size === 2)
  }

  test("streaming chunk dedup: intra-batch and cross-batch suppression, idempotent replay") {
    val base = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    val storeDir = base + "/store"; val statsDir = base + "/stats"
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      CorpusStream.chunkDedupBatch(storeDir, statsDir)(
        rows.toDF("doc_id", "text"), id)
    def stats(id: Long): Map[Long, (Long, Long)] =
      spark.read.parquet(s"$statsDir/batch=$id")
        .select($"doc_id", $"n_chunks", $"n_kept")
        .as[(Long, Long, Long)].collect()
        .map { case (d, c, k) => d -> (c, k) }.toMap

    val A = (1 to 16).map(i => s"a$i").mkString(" ")
    val B = (1 to 16).map(i => s"b$i").mkString(" ")
    val C = (1 to 16).map(i => s"c$i").mkString(" ")
    val D = (1 to 16).map(i => s"d$i").mkString(" ")

    // batch 0: doc 2 repeats doc 1's chunk A inside the batch — the
    // lower (doc_id, pos) occurrence wins
    run(Seq((1L, s"$A $B"), (2L, s"$A $C")), 0L)
    assert(stats(0L) === Map(1L -> (2L, 2L), 2L -> (2L, 1L)))

    // batch 1: chunk B arrived in batch 0 → store hit, only D survives
    run(Seq((3L, s"$B $D")), 1L)
    assert(stats(1L) === Map(3L -> (2L, 1L)))

    // crash-replay of batch 1: its own store partition is excluded
    // from the read, so the outcome is identical, and the store holds
    // each chunk exactly once
    run(Seq((3L, s"$B $D")), 1L)
    assert(stats(1L) === Map(3L -> (2L, 1L)))
    val stored = spark.read.parquet(storeDir).select($"chunk_md5")
      .as[String].collect().toSeq
    assert(stored.size === 4 && stored.distinct.size === 4)
  }

  test("chunk store compaction: fold is a semantic no-op and replay stays idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val storeDir = base + "/store"; val statsDir = base + "/stats"
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      CorpusStream.chunkDedupBatch(storeDir, statsDir)(
        rows.toDF("doc_id", "text"), id)
    def stats(id: Long): Map[Long, (Long, Long)] =
      spark.read.parquet(s"$statsDir/batch=$id")
        .select($"doc_id", $"n_chunks", $"n_kept")
        .as[(Long, Long, Long)].collect()
        .map { case (d, c, k) => d -> (c, k) }.toMap
    def storeSet(): Set[String] =
      spark.read.parquet(storeDir).select($"chunk_md5")
        .as[String].collect().toSet

    val A = (1 to 16).map(i => s"a$i").mkString(" ")
    val B = (1 to 16).map(i => s"b$i").mkString(" ")
    val C = (1 to 16).map(i => s"c$i").mkString(" ")
    val D = (1 to 16).map(i => s"d$i").mkString(" ")

    run(Seq((1L, s"$A $B")), 0L)
    run(Seq((2L, s"$C")), 1L)
    run(Seq((3L, s"$B $D")), 2L) // B suppressed by batch 0, D admitted
    assert(stats(2L) === Map(3L -> (2L, 1L)))
    val before = storeSet()
    assert(before.size === 4)

    // compact batches ≤ 1 (batch 2 is the replayable frontier and
    // stays out of the fold)
    CorpusStream.compactChunkStore(spark, storeDir, upToBatch = 1L)
    assert(storeSet() === before, "compaction must not change the chunk set")
    // the folded partitions are gone; one negative generation replaces them
    val parts = new java.io.File(storeDir).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).toSet
    assert(parts === Set("batch=-1", "batch=2"))

    // crash-replay of batch 2 across the compaction boundary: its own
    // partition is still excluded, folded history still suppresses B
    run(Seq((3L, s"$B $D")), 2L)
    assert(stats(2L) === Map(3L -> (2L, 1L)))
    assert(storeSet() === before)

    // a second compaction folds the frontier + the first generation
    CorpusStream.compactChunkStore(spark, storeDir, upToBatch = 2L)
    assert(storeSet() === before)

    // chunk A still dead long after its partition was folded twice
    run(Seq((4L, s"$A")), 3L)
    assert(stats(3L) === Map(4L -> (1L, 0L)))
  }

  test("incremental near-dup: cross-batch pairs verified, replay idempotent") {
    val store = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      CorpusStream.nearDupBatch(store)(rows.toDF("doc_id", "text"), id)
    def pairs(id: Long): Set[(Long, Long)] =
      spark.read.parquet(s"$store/pairs/batch=$id")
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    // two near-dup texts (high shingle overlap) and an unrelated one
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 28).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    val noise = (100 to 140).map(i => s"n$i").mkString(" ")

    run(Seq((1L, base), (2L, noise)), 0L)
    assert(pairs(0L) === Set.empty, "no near-dups inside batch 0")

    // batch 1 brings the near-dup of a BATCH-0 doc: the pair must
    // surface without rescanning batch 0's raw text
    run(Seq((3L, nearDup)), 1L)
    assert(pairs(1L) === Set((1L, 3L)))

    // crash-replay of batch 1: own store partitions excluded, output
    // identical, store holds each claim/shingle once per batch
    run(Seq((3L, nearDup)), 1L)
    assert(pairs(1L) === Set((1L, 3L)))

    // intra-batch near-dups still go through the capped LSH channel
    val v1 = (200 to 230).map(i => s"v$i").mkString(" ")
    val v2 = ((200 to 228).map(i => s"v$i") ++ Seq("y1", "y2")).mkString(" ")
    run(Seq((4L, v1), (5L, v2)), 2L)
    assert(pairs(2L) === Set((4L, 5L)))

    // and the union of per-batch pairs equals the batch operator run
    // over the full corpus — the incremental form loses nothing up to
    // the shared bucket cap (both channels probe at most maxBucket
    // docs per band key; beyond the cap both drop the same way)
    val all = Seq((1L, base), (2L, noise), (3L, nearDup), (4L, v1), (5L, v2))
    val batchPairs = Dedup.minhashNearDups(all.toDF("doc_id", "text"),
        col("text"), col("doc_id"))
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert((pairs(0L) ++ pairs(1L) ++ pairs(2L)) === batchPairs)
  }

  test("near-dup store: probes reach non-representative historical claimants") {
    // the r12 recall gap: two historical docs share every band key
    // (identical texts), a new doc near-dups BOTH — the old min-only
    // read surfaced only the (min, new) pair; the capped claim set
    // must surface the non-representative claimant too
    val store = java.nio.file.Files.createTempDirectory("graft-ndrecall").toString
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      CorpusStream.nearDupBatch(store)(rows.toDF("doc_id", "text"), id)
    def pairs(id: Long): Set[(Long, Long)] =
      spark.read.parquet(s"$store/pairs/batch=$id")
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 28).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    run(Seq((1L, base), (2L, base)), 0L)
    assert(pairs(0L) === Set((1L, 2L)), "identical docs pair intra-batch")
    run(Seq((3L, nearDup)), 1L)
    assert(pairs(1L) === Set((1L, 3L), (2L, 3L)),
      "both historical claimants of the shared band keys must be probed")
  }

  test("near-dup store: compaction + TTL preserve probes and expire cold claims") {
    val store = java.nio.file.Files.createTempDirectory("graft-ndcompact").toString
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      CorpusStream.nearDupBatch(store)(rows.toDF("doc_id", "text"), id)
    def pairs(id: Long): Set[(Long, Long)] =
      spark.read.parquet(s"$store/pairs/batch=$id")
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    def bandParts(): Set[String] =
      new java.io.File(s"$store/bands").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet

    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 28).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    val other = (50 to 80).map(i => s"z$i").mkString(" ")
    run(Seq((1L, base)), 0L)
    run(Seq((2L, other)), 1L)
    // fold batches 0 and 1 into one compacted generation
    CorpusStream.compactNearDupStore(spark, store, upToBatch = 1L)
    assert(bandParts() === Set("batch=-1"), "per-batch partitions folded")
    // a probe against folded history still finds the cross-batch pair
    run(Seq((3L, nearDup)), 2L)
    assert(pairs(2L) === Set((1L, 3L)))
    // crash-replay of batch 2 against the compacted store: identical
    run(Seq((3L, nearDup)), 2L)
    assert(pairs(2L) === Set((1L, 3L)))
    // second compaction folds batch 2 into a fresh lower generation
    CorpusStream.compactNearDupStore(spark, store, upToBatch = 2L)
    assert(bandParts() === Set("batch=-2"))
    run(Seq((4L, nearDup)), 3L)
    assert(pairs(3L) === Set((1L, 4L), (3L, 4L)),
      "repeated compaction keeps every claimant probe-able")
    // TTL: expire everything admitted before batch 3 — doc 1 and 3's
    // claims and shingles go; doc 4 (admitted at 3) survives, so a
    // returning near-dup pairs only with it
    CorpusStream.compactNearDupStore(spark, store, upToBatch = 3L,
      expireBefore = 3L)
    run(Seq((5L, base)), 4L)
    assert(pairs(4L) === Set((4L, 5L)),
      "expired claims must not pair; surviving admission must")
    // lossless contract: compacting to fewer claims than a future
    // probe's maxBucket would silently lose claimants — must refuse
    intercept[IllegalArgumentException] {
      CorpusStream.compactNearDupStore(spark, store, upToBatch = 4L,
        keepPerKey = 10, readMaxBucket = 100)
    }
  }

  test("chunk store TTL: admission-age expiry re-admits a returning chunk") {
    val base = java.nio.file.Files.createTempDirectory("graft-ttl").toString
    val storeDir = base + "/store"; val statsDir = base + "/stats"
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      CorpusStream.chunkDedupBatch(storeDir, statsDir)(
        rows.toDF("doc_id", "text"), id)
    def stats(id: Long): Map[Long, (Long, Long)] =
      spark.read.parquet(s"$statsDir/batch=$id")
        .select($"doc_id", $"n_chunks", $"n_kept")
        .as[(Long, Long, Long)].collect()
        .map { case (d, c, k) => d -> (c, k) }.toMap

    val A = (1 to 16).map(i => s"a$i").mkString(" ")
    val B = (1 to 16).map(i => s"b$i").mkString(" ")

    run(Seq((1L, s"$A")), 0L) // A admitted at batch 0
    run(Seq((2L, s"$B")), 5L) // B admitted at batch 5
    // expire admissions older than batch 5: A falls out, B survives
    CorpusStream.compactChunkStore(spark, storeDir, upToBatch = 5L,
      expireBefore = 5L)
    assert(spark.read.parquet(storeDir).select($"chunk_md5")
      .as[String].collect().toSet.size === 1)
    // the expired chunk is re-admitted on return (fresh TTL), the
    // retained one still suppresses
    run(Seq((3L, s"$A $B")), 6L)
    assert(stats(6L) === Map(3L -> (2L, 1L)))
    // and after re-admission it suppresses again
    run(Seq((4L, s"$A")), 7L)
    assert(stats(7L) === Map(4L -> (1L, 0L)))
  }

  test("streaming pack matches the batch assignment on the arrival order, " +
    "cross-batch straddles included") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[(String, Long, Long)]
    val q = CorpusStream.packBySource(
        input.toDF().toDF("source", "doc_id", "n_tok"), budget = 100L)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("pack_stream").start()
    // batch 1 ends mid-window at 70 tokens; batch 2's first doc (60)
    // must straddle the 100-token cut — provable only if the running
    // total survived the batch boundary
    val b1 = Seq(("s", 1L, 40L), ("s", 2L, 30L), ("t", 10L, 250L))
    val b2 = Seq(("s", 3L, 60L), ("s", 4L, 0L), ("t", 11L, 50L))
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val got = spark.table("pack_stream")
      .select($"source", $"doc_id", $"pack_id", $"straddles")
      .as[(String, Long, Long, Boolean)].collect().toSet
    // batch twin over the SAME order: per-source arrival = (batch, id)
    val all = (b1.map((_, 0)) ++ b2.map((_, 1)))
      .map { case ((s, id, n), b) => (s, b, id, n) }
    val want = all.groupBy(_._1).flatMap { case (src, docs) =>
      var cum = 0L
      docs.sortBy(d => (d._2, d._3)).map { case (_, _, id, n) =>
        val p = cum / 100L
        val st = n > 0 && p != (cum + n - 1) / 100L
        cum += n
        (src, id, p, st)
      }
    }.toSet
    assert(got === want)
    // the planted cross-batch straddle actually fired
    assert(got.contains(("s", 3L, 0L, true)),
      "doc 3 spans the 100-token cut across the batch boundary")
    // and the zero-token doc never straddles
    assert(got.contains(("s", 4L, 1L, false)))
  }

  test("incremental ANN index: streamed batches answer like a single build, " +
    "replay idempotent, probe prunes to cells") {
    val store = java.nio.file.Files.createTempDirectory("graft-ann").toString
    val rnd = new scala.util.Random(8641)
    def vec(seedShift: Int): Seq[Float] =
      Seq.tabulate(8)(j => (rnd.nextFloat() - 0.5f) * 2f + (if (j == seedShift % 8) 2f else 0f))
    // 4 well-separated centroids on the axes
    val cents = (0 until 4).map(c => Seq.tabulate(8)(j => if (j == c) 3f else 0f))
    val b0 = (1L to 30L).map(i => (i, vec(i.toInt)))
    val b1 = (31L to 60L).map(i => (i, vec(i.toInt)))
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "v")

    CorpusStream.annIndexBatch(store, cents)(df(b0), 0L)
    CorpusStream.annIndexBatch(store, cents)(df(b1), 1L)
    // crash-replay of batch 1 REPLACES its partition — store holds
    // each vector exactly once
    CorpusStream.annIndexBatch(store, cents)(df(b1), 1L)
    val stored = spark.read.parquet(store).select($"vec_id").as[Long].collect()
    assert(stored.length === 60 && stored.distinct.length === 60)

    val queries = df(Seq((1000L, vec(3)), (1001L, vec(6))))
    val got = CorpusStream.annProbeStore(spark, store, cents, queries,
        k = 5, nProbe = 2)
      .select($"q_vec_id", $"rnk", $"vec_id", $"dot")
      .as[(Long, Long, Long, Long)].collect().toSet

    // twin: ONE assignment pass over the union, same probe machinery
    val single = java.nio.file.Files.createTempDirectory("graft-ann-1").toString
    CorpusStream.annIndexBatch(single, cents)(df(b0 ++ b1), 0L)
    val want = CorpusStream.annProbeStore(spark, single, cents, queries,
        k = 5, nProbe = 2)
      .select($"q_vec_id", $"rnk", $"vec_id", $"dot")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want,
      "incremental batches must answer identically to a single-shot build")

    // recall vs brute force within the probed fraction: with nProbe =
    // 4 (all cells) the probe IS exact brute force — pin that
    val all = CorpusStream.annProbeStore(spark, store, cents, queries,
        k = 5, nProbe = 4)
      .select($"q_vec_id", $"vec_id").as[(Long, Long)].collect().toSet
    val brute = graft.ops.Similarity.topKBruteForce(df(b0 ++ b1), queries,
        col("v"), col("vec_id"), k = 5)
      .select($"q_vec_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(all === brute, "nProbe = k cells must equal brute force")
  }

  test("near-dup store: mid-stream compaction survives a checkpointed " +
    "restart and matches the never-compacted store") {
    // the full lifecycle the compaction contract promises (see
    // CorpusStream.compactNearDupStore's safety contract): a REAL
    // checkpointed streaming query processes batches, the store
    // compacts between runs, the query restarts from its checkpoint,
    // and a later batch's probe results are IDENTICAL to a twin store
    // that was never compacted.
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft-ndckpt").toString
    val in = s"$root/in"
    val storeC = s"$root/store_compacted"
    val storeU = s"$root/store_uncompacted"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    def writeBatch(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes)
    def runStream(): Unit = {
      val q = spark.readStream
        .schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1) // one file = one micro-batch
        .json(in)
        .writeStream
        .foreachBatch(CorpusStream.nearDupBatch(storeC) _)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(180000),
        "streaming query must terminate within the timeout")
    }
    def pairsAll(store: String): Set[(Long, Long)] =
      spark.read.parquet(s"$store/pairs")
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet

    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = ((1 to 28).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    val other = (50 to 80).map(i => s"z$i").mkString(" ")
    val b0 = Seq((1L, base), (2L, other))
    val b1 = Seq((3L, nearDup))
    val b2 = Seq((4L, nearDup), (5L, (200 to 230).map(i => s"q$i").mkString(" ")))

    writeBatch("b0.json", b0)
    writeBatch("b1.json", b1)
    runStream() // batches 0 and 1 committed
    // compact MID-STREAM, up to the committed horizon
    CorpusStream.compactNearDupStore(spark, storeC, upToBatch = 1L)
    assert(new java.io.File(s"$storeC/bands").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet === Set("batch=-1"),
      "compaction must fold both committed band partitions")
    writeBatch("b2.json", b2)
    runStream() // RESTART from the checkpoint: batch 2 probes folded history
    // twin store: same batch sequence, never compacted
    for ((rows, id) <- Seq(b0, b1, b2).zipWithIndex)
      CorpusStream.nearDupBatch(storeU)(rows.toDF("doc_id", "text"), id.toLong)
    val got = pairsAll(storeC)
    assert(got === pairsAll(storeU),
      "compaction + restart must not change any probe result")
    // and the cross-compaction pairs specifically surfaced: batch 2's
    // doc 4 near-dups BOTH folded claimants (1 and 3) plus nothing else
    assert(got === Set((1L, 3L), (1L, 4L), (3L, 4L)))
  }

  test("PQ-coded ANN store: checkpointed restart answers identically to a " +
    "never-restarted build; full probe equals brute force") {
    // the IVF-PQ serving path through the SAME lifecycle the near-dup
    // compaction proof runs: a real checkpointed streaming query
    // indexes two batches, stops, RESTARTS from its checkpoint for a
    // third, and every probe over the restored store must equal a twin
    // store whose batches were applied in one uninterrupted sequence —
    // the daily contract of a 100 TB incremental ingestion pipeline.
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft-pqckpt").toString
    val in = s"$root/in"
    val storeR = s"$root/store_restarted"
    val storeT = s"$root/store_twin"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    val rnd = new scala.util.Random(2718)
    def vec(seedShift: Int): Seq[Float] =
      Seq.tabulate(8)(j => (rnd.nextFloat() - 0.5f) * 2f +
        (if (j == seedShift % 8) 2f else 0f))
    val cents = (0 until 4).map(c => Seq.tabulate(8)(j => if (j == c) 3f else 0f))
    val b0 = (1L to 20L).map(i => (i, vec(i.toInt)))
    val b1 = (21L to 40L).map(i => (i, vec(i.toInt)))
    val b2 = (41L to 60L).map(i => (i, vec(i.toInt)))
    def df(rows: Seq[(Long, Seq[Float])]) = rows.toDF("vec_id", "v")
    // FIXED residual codebook, trained ONCE offline (train rarely,
    // assign forever): Pq.build over the first batch's vectors; only
    // the flattened (sub, code, centroid) metadata rides into the
    // stream — codebook quality moves recall, never identity
    val codebook = graft.ops.Pq.build(df(b0), col("v"), col("vec_id"),
        dim = 8, m = 4, k = 4)
      .cents.as[(Int, Int, Seq[Double])].collect().toSeq

    def writeBatch(name: String, rows: Seq[(Long, Seq[Float])]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$in/$name"),
        rows.map { case (id, v) =>
          s"""{"vec_id":$id,"v":[${v.mkString(",")}]}""" }
          .mkString("\n").getBytes)
    def runStream(): Unit = {
      val q = spark.readStream
        .schema("vec_id LONG, v ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", 1) // one file = one micro-batch
        .json(in)
        .writeStream
        .foreachBatch(CorpusStream.annIndexBatchPq(storeR, cents, codebook) _)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(180000),
        "streaming query must terminate within the timeout")
    }

    writeBatch("b0.json", b0)
    writeBatch("b1.json", b1)
    runStream() // batches 0 and 1 committed, query stops
    writeBatch("b2.json", b2)
    runStream() // RESTART from the checkpoint: only batch 2 processes

    // twin: same batch sequence, never interrupted
    for ((rows, id) <- Seq(b0, b1, b2).zipWithIndex)
      CorpusStream.annIndexBatchPq(storeT, cents, codebook)(
        df(rows), id.toLong)

    // store integrity: every vector exactly once, codes dense
    val stored = spark.read.parquet(storeR)
      .select($"vec_id", $"codes").as[(Long, Seq[Int])].collect()
    assert(stored.length === 60 && stored.map(_._1).distinct.length === 60)
    assert(stored.forall(_._2.length == 4), "every vector carries m=4 codes")

    val queries = df(Seq((1000L, vec(3)), (1001L, vec(6))))
    def probe(store: String, nProbe: Int, shortlist: Int) =
      CorpusStream.annProbeStorePq(spark, store, cents, codebook, queries,
          k = 5, nProbe = nProbe, shortlist = shortlist)
        .select($"q_vec_id", $"rnk", $"vec_id", $"dot")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(probe(storeR, 2, 10) === probe(storeT, 2, 10),
      "a checkpointed restart must be invisible to the PQ probe")
    // probing ALL cells with an uncut shortlist makes the exact
    // re-rank see every candidate — the result IS brute force
    val full = probe(storeR, 4, 60)
    val brute = graft.ops.Similarity.topKBruteForce(
        df(b0 ++ b1 ++ b2), queries, col("v"), col("vec_id"), k = 5)
      .select($"q_vec_id", $"vec_id").as[(Long, Long)].collect().toSet
    assert(full.map(t => (t._1, t._3)) === brute,
      "all-cell probe + uncut shortlist must equal brute force")
    // crash-replay idempotency: re-applying a batch replaces, never
    // duplicates
    CorpusStream.annIndexBatchPq(storeT, cents, codebook)(df(b1), 1L)
    val replayed = spark.read.parquet(storeT)
      .select($"vec_id").as[Long].collect()
    assert(replayed.length === 60 && replayed.distinct.length === 60)
    assert(probe(storeT, 2, 10) === probe(storeR, 2, 10),
      "batch replay must not change any probe result")
  }
}
