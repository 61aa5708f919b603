package graft

import graft.ops.AnnCache

/** The build-once cache's two load-bearing properties: one build per
  * key, and pinned components that SURVIVE the catalog-level cache
  * hygiene Bench/Verify run between queries — localCheckpoint blocks
  * live outside the CacheManager, and the truncated lineage means a
  * dropped block would fail the count rather than silently rebuild. */
class AnnCacheSpec extends SparkSpec {

  test("memo builds once per key; pinned frames survive clearCache") {
    AnnCache.clear()
    var builds = 0
    def build() = AnnCache.memo(spark, "spec:k1") {
      builds += 1
      AnnCache.pin(spark.range(100).toDF("id"))
    }
    val first = build()
    val second = build()
    assert(builds === 1, "same key must not rebuild")
    assert(first eq second, "same key must return the same instance")
    val other = AnnCache.memo(spark, "spec:k2") { builds += 1; "x" }
    assert(builds === 2 && other === "x")

    spark.catalog.clearCache() // Bench/Verify inter-query hygiene
    // count succeeds ONLY from the checkpointed blocks: pin truncated
    // the lineage, so an evicted block would throw, not recompute
    assert(first.count() === 100)
    AnnCache.clear()
  }
}
