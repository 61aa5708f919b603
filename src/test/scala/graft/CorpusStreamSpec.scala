package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.explode
import org.apache.spark.sql.streaming.OutputMode
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
}
