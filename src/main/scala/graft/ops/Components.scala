package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the step that turns
  * near-dup PAIRS into dedup CLUSTERS (keep one doc per component,
  * drop the rest). Min-label propagation: every node repeatedly
  * adopts the smallest label among itself and its neighbors until no
  * label changes; the fixpoint labels each node with the smallest doc
  * id in its component, which is also the canonical survivor under
  * the repo's first-writer-wins convention.
  *
  * Scale shape: this is the simple-union-find-free formulation of the
  * iterative-join family (Kiveris et al., "Connected components in
  * MapReduce and beyond", SoCC 2014 — Large-Star/Small-Star are the
  * optimization when components are deep). Near-dup graphs are
  * shallow (clusters of boilerplate variants), so iterations ≈
  * component diameter ≈ 2-4; each iteration is one keyed join + one
  * keyed aggregation, and convergence is checked with an aggregate
  * count, never a collect of the labels.
  */
object Components {

  /** (id, comp) for every node appearing in `pairs` (columns
    * doc_a/doc_b); comp = min id of the node's component. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // Both edge directions in ONE pass over `pairs` (explode of a
    // 2-struct array): a union of two selects would execute the whole
    // upstream pair pipeline twice before the persist materializes —
    // for dedup clusters that upstream is the full MinHash
    // candidate+verify computation.
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Seed each node with its 1-hop minimum — the first propagation
    // step folded into the same keyed shuffle a node-distinct would
    // cost anyway, saving one loop iteration.
    var cached = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("m"))
      .select(col("src").as("id"), least(col("src"), col("m")).as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = cached
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("ncomp"))
      // `changed` rides along in the same select, so convergence costs
      // one filter over the cached result — NOT a second keyed join of
      // next against prev (labels are monotone non-increasing, so a
      // node changed iff its neighbor min undercut its label)
      val next = labels.join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (col("ncomp") < col("comp")).as("changed"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val stable = next.where(col("changed")).isEmpty
      cached.unpersist()
      cached = next
      labels = next.select(col("id"), col("comp"))
      converged = stable
      i += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter iterations; " +
          "labels would be split mid-propagation. Raise maxIter (component " +
          "diameter exceeds it).")
    // Truncate the iterative lineage and release the loop's cache so
    // library callers don't leak a persisted DataFrame they never got
    // a handle to unpersist.
    val out = labels.localCheckpoint()
    cached.unpersist()
    out
  }
}
