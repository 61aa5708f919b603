package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
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
}
