package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  * MapReduce and beyond", SoCC 2014). Near-dup graphs are shallow
  * (clusters of boilerplate variants), so iterations ≈ component
  * diameter ≈ 2-4; each iteration is one keyed join + one keyed
  * aggregation, and convergence is checked with an aggregate count,
  * never a collect of the labels. When components can be DEEP
  * (mention graphs, link graphs, transitive joins), use
  * [[connectedComponentsStar]] — the paper's Large-Star/Small-Star
  * alternation, whose round count is O(log² n) instead of
  * O(diameter).
  */
object Components {

  /** (id, comp) for every node appearing in `pairs` (columns
    * doc_a/doc_b); comp = min id of the node's component. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val (labels, converged) = labelPropCore(pairs, maxIter)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter iterations; " +
          "labels would be split mid-propagation. Raise maxIter (component " +
          "diameter exceeds it).")
    labels
  }

  /** Min-label-propagation loop shared by [[connectedComponents]] and
    * [[connectedComponentsAdaptive]]: returns the labels after at most
    * `maxIter` rounds plus whether the fixpoint was reached. A
    * non-converged label frame is still a sound CONTRACTION — every
    * label is the id of some node in the same component, and the
    * minimum node of each component always keeps itself (labels are
    * monotone non-increasing and only node ids of the component ever
    * propagate) — which is exactly what the adaptive fallback builds
    * on. */
  private def labelPropCore(pairs: DataFrame, maxIter: Int): (DataFrame, Boolean) = {
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
    //
    // Every round ends in an EAGER localCheckpoint, not a persist: the
    // round's plan references the previous labels frame more than once
    // (the neighbor-min join AND the carry-through), so without
    // truncation the ANALYZED plan doubles per iteration — persist
    // caches the data but Catalyst still walks (and stringifies) the
    // exponential tree, which OOMs near 20 rounds. Checkpointing pins
    // the round to a LogicalRDD; superseded rounds' blocks are freed by
    // the ContextCleaner once unreferenced (label frames are small —
    // two longs per node).
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("m"))
      .select(col("src").as("id"), least(col("src"), col("m")).as("comp"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges.join(labels, col("dst") === col("id"))
        .groupBy(col("src")).agg(min(col("comp")).as("ncomp"))
      // `changed` rides along in the same select, so convergence costs
      // one filter over the checkpointed result — NOT a second keyed
      // join of next against prev (labels are monotone non-increasing,
      // so a node changed iff its neighbor min undercut its label)
      val next = labels.join(neighborMin, col("id") === col("src"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          (col("ncomp") < col("comp")).as("changed"))
        .localCheckpoint()
      converged = next.where(col("changed")).isEmpty
      labels = next.select(col("id"), col("comp"))
      i += 1
    }
    edges.unpersist()
    (labels, converged)
  }

  /** Depth-adaptive connected components: probe with min-label
    * propagation (the optimal algorithm when rounds ≈ component
    * diameter is small — the common case for near-dup cluster graphs,
    * which are star-or-clique shaped with diameter 2–4), and only if
    * the probe has NOT converged after `probeRounds`, finish with
    * Large-Star/Small-Star — but on the label-CONTRACTED graph, not
    * the original: each probe label is the id of a node in the same
    * component, so collapsing endpoints to their labels preserves the
    * component structure while shrinking both the node set and (for
    * partially-converged regions) the edge set before the O(log² n)
    * machinery starts. Composition: a node's final component is the
    * star label of its probe label, and the minimum node of every
    * component keeps itself under the probe (labels are monotone,
    * nothing smaller exists), so the composed label is still the
    * component-wide minimum id — the same output contract as both
    * parents, property-pinned equal in ComponentsSpec on shallow AND
    * deep graphs.
    *
    * Scale shape: shallow graphs pay exactly label-prop (no star
    * rounds at all); adversarially deep graphs pay `probeRounds`
    * cheap label rounds, then star on a graph that the probe already
    * contracted by up to 2^probeRounds in diameter. This is the
    * production entry point when the input depth is unknown. */
  def connectedComponentsAdaptive(pairs: DataFrame, probeRounds: Int = 4,
                                  maxIter: Int = 30): DataFrame = {
    val (labels, converged) = labelPropCore(pairs, probeRounds)
    if (converged) return labels
    val pinned = labels // already localCheckpoint-ed by the loop
    val contracted = pairs
      .join(pinned.select(col("id").as("doc_a"), col("comp").as("ca")), "doc_a")
      .join(pinned.select(col("id").as("doc_b"), col("comp").as("cb")), "doc_b")
      .where(col("ca") =!= col("cb"))
      .select(col("ca").as("doc_a"), col("cb").as("doc_b"))
    val starLabels = connectedComponentsStar(contracted, maxIter)
    // regions the probe fully contracted have no cross-label edge, so
    // their labels never reach the star stage — fall back to the probe
    // label itself
    pinned.join(starLabels.select(col("id").as("comp"), col("comp").as("root")),
        Seq("comp"), "left")
      .select(col("id"), coalesce(col("root"), col("comp")).as("comp"))
  }

  /** Connected components when the pair graph is BLOCKED by a known
    * key — every edge's endpoints share `group`, so no component can
    * cross a group boundary and the whole computation collapses to ONE
    * keyed shuffle + a per-group local union-find (flatMapGroups).
    * This is the scale-correct shape whenever the blocking structure
    * is part of the operator itself: SemDeDup's k-means cells
    * (assignment is a function of the vector, so each vector lives in
    * exactly one cell and pairs are generated within-cell only). It is
    * NOT valid for banded candidate generation (MinHash/SimHash),
    * where a doc sits in several buckets and components chain ACROSS
    * buckets — those stay on the iterative machinery above.
    *
    * Why this exists (r16 verdict): the iterative loop costs one
    * localCheckpoint job + one convergence probe PER ROUND — correct,
    * but for emb_semdedup ~93% of wall was 40-stage scheduling over
    * 0.1 MB of shuffle. Here the stage count is a CONSTANT in data
    * size: one exchange on the group key, one narrow pass.
    *
    * Memory bound per task: the union-find map holds one entry per
    * DISTINCT NODE in the group (not per pair — the pair iterator
    * streams through once), so a task needs O(|cell|) longs. With
    * corpus-scaled blocking (k ∝ n pins mean cell size) that is a few
    * KB per group at any corpus size.
    *
    * Output contract matches [[connectedComponents]]: (id, comp = min
    * id of the node's component) for every endpoint, pinned equal in
    * ComponentsSpec on random blocked graphs. Min-id labels fall out
    * of the union rule — the smaller root always becomes the parent,
    * so a tree's root is the minimum id ever merged into it. */
  def componentsWithinGroups(pairs: DataFrame, groupCol: Column): DataFrame = {
    val s = pairs.sparkSession
    import s.implicits._
    pairs.select(groupCol.cast("long").as("g"),
        col("doc_a").cast("long").as("a"), col("doc_b").cast("long").as("b"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x0: Long): Long = {
          var x = x0
          var p = parent.getOrElse(x, x)
          while (p != x) { // path halving
            val gp = parent.getOrElse(p, p)
            parent(x) = gp
            x = gp
            p = parent.getOrElse(x, x)
          }
          x
        }
        it.foreach { case (_, a, b) =>
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        // materialize ids before the final find() pass: path halving
        // writes into `parent`, and mutating a LongMap mid-iteration
        // is not contract-safe
        val ids = parent.keysIterator.toArray
        ids.iterator.map(id => (id, find(id)))
      }
      .toDF("id", "comp")
  }

  /** Both edge directions of a canonical (hi, lo) edge set, with each
    * row's star minimum m = min(Γ⁺(u)) computed in a SINGLE window
    * pass over the u-keyed shuffle — no separate aggregate + join back
    * (the join formulation cost a second sort-merge pass per star
    * operation, and its double reference from small-star re-ran the
    * whole pipeline twice per round). `rn` marks one row per u so
    * small-star can emit the (u, m) self-attachment exactly once
    * without a second scan of the frame. */
  private def withMins(edges: DataFrame): DataFrame = {
    val both = edges.select(explode(array(
        struct(col("hi").as("u"), col("lo").as("v")),
        struct(col("lo").as("u"), col("hi").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
    val wp = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    both.select(col("u"), col("v"),
      least(col("u"), min(col("v")).over(wp)).as("m"),
      row_number().over(wp.orderBy(col("v"))).as("rn"))
  }

  /** large-star(u): every neighbor v > u re-attaches to m = min(Γ⁺(u)).
    * Each undirected edge {a<b} is rewritten exactly once (from its
    * smaller endpoint); v > u ≥ m, so (v, m) is already canonical and
    * never a self-loop. No distinct here: the round's input is
    * distinct, so each input edge emits one row and duplicates are
    * bounded by collisions onto the same (v, m) — the round-boundary
    * distinct in [[smallStar]] dedups once instead of paying a second
    * shuffle every round. */
  private def largeStar(edges: DataFrame): DataFrame =
    withMins(edges).where(col("v") > col("u"))
      .select(col("v").as("hi"), col("m").as("lo"))

  /** small-star(u): every neighbor v < u, and u itself, attaches to
    * m = min(Γ⁺(u)) — stars merge at shared minima. Both emissions
    * come out of ONE pass over [[withMins]] (the v < u re-attachment
    * per row, the (u, m) self-attachment on the rn = 1 row) via a
    * 2-element explode — the union-of-two-selects form executed the
    * whole withMins pipeline twice per round. */
  private def smallStar(edges: DataFrame): DataFrame =
    withMins(edges)
      .select(explode(array(
        when(col("v") < col("u"), struct(col("v").as("a"), col("m").as("b"))),
        when(col("rn") === 1, struct(col("u").as("a"), col("m").as("b"))))).as("p"))
      .where(col("p").isNotNull)
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .distinct()

  /** Large-Star/Small-Star connected components (Kiveris et al.,
    * "Connected components in MapReduce and beyond", SoCC 2014) — the
    * deep-graph path [[connectedComponents]]'s scaladoc points at.
    * Min-label propagation needs O(diameter) rounds: fine for shallow
    * near-dup clusters, pathological for chain-shaped graphs (a
    * diameter-10⁴ path is 10⁴ shuffles). The alternating star
    * operations instead contract every component to a star around its
    * minimum node in O(log² n) rounds regardless of diameter.
    *
    * Each round is two star operations; each operation is one keyed
    * aggregation (the per-node star minimum) + a join back to the
    * exploded edges, with edges kept canonical (hi, lo) and distinct,
    * so the working set never exceeds the deduplicated edge count —
    * both operations provably never grow it. Convergence = edge-set
    * fixpoint, checked by count + anti-join over the persisted round
    * output (two actions, never a collect); at the fixpoint the edge
    * set IS the star forest, so the labels read off it directly.
    * Output contract matches [[connectedComponents]] — (id, comp =
    * min id of component) for every endpoint of `pairs` — and
    * ComponentsSpec property-tests the two equal on deep paths, where
    * label propagation is at its worst.
    */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // ONE materialization of the (possibly expensive) upstream pair
    // pipeline — both the edge set and the node universe derive from
    // it, and deriving them independently would run the whole
    // candidate+verify computation twice (measured ~1.3 s of the
    // operator's bench cost on the MinHash graph).
    val pairsC = pairs.select(col("doc_a"), col("doc_b"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = pairsC
      .select(explode(array(col("doc_a"), col("doc_b"))).as("id"))
      .distinct()
    var edges = pairsC
      .select(greatest(col("doc_a"), col("doc_b")).as("hi"),
        least(col("doc_a"), col("doc_b")).as("lo"))
      .where(col("hi") =!= col("lo")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var i = 0
    var edgeCount = edges.count()
    // per-round eager localCheckpoint for the same reason as the
    // label-propagation loop: withMins references its input twice, so
    // an uncheckpointed round would double the analyzed plan 4× per
    // round. The previous round's count is carried over (edge sets
    // only shrink or hold), so convergence costs one count plus an
    // anti-join ONLY on count-stable rounds.
    while (!converged && i < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val nextCount = next.count()
      val same = nextCount == edgeCount &&
        next.join(edges, Seq("hi", "lo"), "left_anti").isEmpty
      edges.unpersist()
      edges = next
      edgeCount = nextCount
      converged = same
      i += 1
    }
    if (!converged) {
      pairsC.unpersist()
      throw new IllegalStateException(
        s"connectedComponentsStar did not reach an edge fixpoint after " +
          s"$maxIter rounds (bound is O(log^2 n) — raise maxIter).")
    }
    // fixpoint edges are (leaf, root) stars: the label is the unique
    // partner; roots and self-paired nodes fall back to themselves
    val labels = edges.groupBy(col("hi").as("id")).agg(min(col("lo")).as("c"))
    val out = nodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("c"), col("id")).as("comp"))
      .localCheckpoint()
    edges.unpersist(); pairsC.unpersist()
    out
  }
}
