package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over (src, dst, w) edge DataFrames.
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic end to end: ranks
  * are scaled by 10^12 and every division is an integer `div`, so the
  * result is bit-identical across engines, partitionings, and re-runs —
  * a float PageRank is none of those (sum order changes the low bits),
  * and the driver's oracle hash-compares values. The truncation error
  * per step is < 10^-12 of the rank mass, far below anything a ranking
  * consumer can observe.
  *
  * Scale shape: the edge aggregation is ONE keyed shuffle over the raw
  * data; every iteration after that runs on the aggregated edge table
  * (|node|² at worst, |distinct edges| in practice), with the rank
  * vector joined to the edge side — broadcast below
  * [[Graph.BroadcastNodeBudget]] nodes, keyed shuffle join above it
  * (the rank frame is |nodes| rows, bounded by the data, so an
  * unconditional broadcast would blow up on a 10⁹-node graph) — at
  * 100 TB of events the iterations never touch the raw data again.
  * Dangling nodes (no
  * out-edges) keep their teleport share and simply stop forwarding
  * mass; total mass is then conserved only up to the dangling leak,
  * which is the standard simplification and — being deterministic — is
  * mirrored exactly by the SQL oracle.
  */
object Graph {

  /** 10^12 fixed-point scale for rank values. */
  val Scale = 1000000000000L

  /** Damping factor in percent (85 = the canonical 0.85). */
  val DampPct = 85L

  /** Rank-vector broadcast budget in rows. The rank frame is |nodes|
    * rows — bounded by the DATA, not by a model constant, unlike every
    * other broadcast in this library. Below the budget it broadcasts
    * to the edge side each round (zero rank shuffle); above it the
    * per-iteration join falls back to a keyed shuffle join — at 10⁸–10⁹
    * nodes a multi-GB per-round broadcast would exceed executor memory
    * and the broadcast limit. 2M rows of (node, pr) is ≲100 MB, safely
    * under a default executor's broadcast headroom. */
  val BroadcastNodeBudget = 2000000L

  /** `iters` rounds of damped PageRank over `edges(src, dst, w)`.
    * Returns (node, pr) with pr in [[Scale]] fixed-point.
    *
    * Per round, with W(s) = Σ w of s's out-edges and N = |nodes|:
    *   contrib(e) = (pr(src) · w) div W(src)
    *   pr'(n) = ((15 · Scale) div 100) div N + (85 · Σ contrib_in(n)) div 100
    *
    * The rank frame is ≤ N rows, re-joined to the edges each round —
    * broadcast when N ≤ `broadcastNodeBudget`, keyed shuffle join
    * above it (see [[BroadcastNodeBudget]]). N itself comes from one
    * driver-side count over the pinned node frame: a bounded scalar
    * action, and the same frame every iteration reads anyway. Plan
    * depth grows linearly in `iters` (each round references the
    * previous rank exactly once — no exponential-plan trap).
    */
  def pageRank(edges: DataFrame, iters: Int,
               broadcastNodeBudget: Long = BroadcastNodeBudget): DataFrame = {
    // The aggregated edge table is tiny (≤ |nodes|²) but every frame
    // below derives from it — without pinning, each of the 2 + 3·iters
    // references re-runs the full raw-data aggregation (observed: 22
    // parquet scans for 3 iterations). One eager localCheckpoint makes
    // the raw scan happen exactly once.
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(true)
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val ew = e.join(outW, Seq("src")) // (src, dst, w, out_w)

    // pinned: referenced by every round's left join plus the count
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val nNodes = nodes.count()
    // empty graph: keep the pre-gate behavior (empty result), instead
    // of a driver-side division by zero in the literal below
    if (nNodes == 0) return nodes.select(col("node"), lit(0L).as("pr"))
    // Scala Long `/` and Spark/DuckDB integer `div` agree on
    // non-negative operands, so driver-side literals stay oracle-exact
    val hintRank: DataFrame => DataFrame =
      if (nNodes <= broadcastNodeBudget) broadcast else identity

    var rank = nodes.select(col("node"), lit(Scale / nNodes).as("pr"))
    for (_ <- 1 to iters) {
      // `rank` is referenced exactly once per round (and `nodes` is a
      // fixed non-growing frame), so plan depth is linear in `iters` —
      // no exponential-plan trap. pr·w rides DECIMAL(38,0): at real
      // event volumes an edge weight can exceed 2^63/Scale ≈ 9·10^6,
      // and Spark's long multiply wraps SILENTLY; the quotient is ≤ pr
      // so the result is safely BIGINT again
      val contrib = ew.join(hintRank(rank), col("src") === col("node"))
        .select(col("dst"),
          expr("CAST((CAST(pr AS DECIMAL(38,0)) * w) div out_w AS BIGINT)").as("c"))
      val inSum = contrib.groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      rank = nodes.join(inSum, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit((15L * Scale / 100L) / nNodes)
            + expr(s"($DampPct * coalesce(in_sum, 0L)) div 100")).as("pr"))
    }
    rank.select(col("node"), col("pr"))
  }

  /** DuckDB mirror of one rank update, given CTE names for the previous
    * rank (`prev(node, pr)`), the weighted edges (`ew(src, dst, w,
    * out_w)`), and the node table (`nn(node, n_nodes)`). */
  def rankStepSql(prev: String): String =
    s"""SELECT nn.node, nn.n_nodes,
       |       ((15 * $Scale // 100) // nn.n_nodes)
       |       + ($DampPct * COALESCE(i.in_sum, 0)) // 100 AS pr
       |FROM nn LEFT JOIN (
       |  SELECT ew.dst,
       |         SUM(CAST((CAST(p.pr AS HUGEINT) * ew.w) // ew.out_w AS BIGINT)) AS in_sum
       |  FROM ew JOIN $prev p ON ew.src = p.node GROUP BY ew.dst
       |) i ON nn.node = i.dst""".stripMargin

  /** Pure power iteration of the row-stochastic transition matrix —
    * the Markov stationary-distribution estimate (what PageRank is
    * WITHOUT damping: no teleport mass, so the result is the chain's
    * own long-run occupancy, the readout behind "where do sessions
    * settle"). Same [[Scale]] fixed-point arithmetic and plan shape as
    * [[pageRank]] (pinned edge aggregate, size-gated rank join per
    * round, plan depth linear in `iters`); per round
    *   pr'(n) = Σ_in (pr(src)·w) div W(src)  [+ pr(n) if n dangling]
    * Dangling nodes (no out-edges) keep their own mass — the self-loop
    * closure — so total mass is conserved up to div truncation and the
    * iteration cannot leak mass the way a dropped dangling term would.
    */
  def markovStationary(edges: DataFrame, iters: Int,
                       broadcastNodeBudget: Long = BroadcastNodeBudget): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(true)
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val ew = e.join(outW, Seq("src"))
    // nodes carry the dangling flag once; every round's join reads it
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(outW.select(col("src").as("node"), lit(false).as("dangling")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("dangling"), lit(true)).as("dangling"))
      .localCheckpoint(true)
    val nNodes = nodes.count()
    if (nNodes == 0) return nodes.select(col("node"), lit(0L).as("pr"))
    val hintRank: DataFrame => DataFrame =
      if (nNodes <= broadcastNodeBudget) broadcast else identity

    var rank = nodes.select(col("node"), lit(Scale / nNodes).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ew.join(hintRank(rank), col("src") === col("node"))
        .select(col("dst"),
          expr("CAST((CAST(pr AS DECIMAL(38,0)) * w) div out_w AS BIGINT)").as("c"))
      val inSum = contrib.groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      rank = nodes.join(hintRank(rank), "node")
        .join(inSum, col("node") === col("dst"), "left")
        .select(col("node"),
          (coalesce(col("in_sum"), lit(0L))
            + when(col("dangling"), col("pr")).otherwise(0L)).as("pr"))
    }
    rank.select(col("node"), col("pr"))
  }

  /** DuckDB mirror of one [[markovStationary]] update, given the
    * previous rank CTE `prev(node, pr)`, weighted edges `ew(src, dst,
    * w, out_w)`, and nodes `nn(node, dangling)`. */
  def markovStepSql(prev: String): String =
    s"""SELECT nn.node, nn.dangling,
       |       COALESCE(i.in_sum, 0)
       |       + CASE WHEN nn.dangling THEN p.pr ELSE 0 END AS pr
       |FROM nn JOIN $prev p ON nn.node = p.node
       |LEFT JOIN (
       |  SELECT ew.dst,
       |         SUM(CAST((CAST(q.pr AS HUGEINT) * ew.w) // ew.out_w AS BIGINT)) AS in_sum
       |  FROM ew JOIN $prev q ON ew.src = q.node GROUP BY ew.dst
       |) i ON nn.node = i.dst""".stripMargin

  /** Personalized PageRank (Haveliwala, WWW 2002; the random surfer
    * teleports ONLY to the seed set, so rank mass measures proximity
    * to the seeds — the recommendation / related-items form of
    * PageRank). Identical fixed-point integer arithmetic and plan
    * shape as [[pageRank]] (pinned edge aggregate, size-gated rank
    * join per round); the only change is the teleport term: seeds get
    * (15·Scale div 100) div |seeds|, non-seeds get 0, and the initial
    * mass starts entirely on the seeds.
    *
    * PRECONDITION: the seed set must be non-empty — an empty set has
    * no teleport target and the division is undefined. Enforced with
    * an eager `require` (the SQL mirror's `// 0` raises in DuckDB;
    * without the guard Spark's non-ANSI `div` would yield NULL ranks
    * and silently diverge from the oracle).
    */
  def personalizedPageRank(edges: DataFrame, iters: Int, isSeed: Column,
                           broadcastNodeBudget: Long = BroadcastNodeBudget): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .localCheckpoint(true)
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val ew = e.join(outW, Seq("src"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .withColumn("seed", isSeed)
      .localCheckpoint(true)
    val nNodes = nodes.count()
    val nSeeds = nodes.where(col("seed")).count()
    require(nSeeds > 0,
      "personalizedPageRank: the seed predicate matched no node — the " +
        "teleport distribution is undefined on an empty seed set")
    val hintRank: DataFrame => DataFrame =
      if (nNodes <= broadcastNodeBudget) broadcast else identity
    var rank = nodes.select(col("node"), col("seed"),
      when(col("seed"), lit(Scale / nSeeds)).otherwise(0L).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(hintRank(rank.select(col("node"), col("pr"))), col("src") === col("node"))
        .select(col("dst"),
          expr("CAST((CAST(pr AS DECIMAL(38,0)) * w) div out_w AS BIGINT)").as("c"))
      val inSum = contrib.groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      rank = nodes.join(inSum, col("node") === col("dst"), "left")
        .select(col("node"), col("seed"),
          (when(col("seed"), lit((15L * Scale / 100L) / nSeeds)).otherwise(0L)
            + expr(s"($DampPct * coalesce(in_sum, 0L)) div 100")).as("pr"))
    }
    rank.select(col("node"), col("pr"))
  }

  /** DuckDB mirror of one personalized rank update; expects
    * `nn(node, seed, n_seeds)` and `ew` CTEs. */
  def pprStepSql(prev: String): String =
    s"""SELECT nn.node, nn.seed, nn.n_seeds,
       |       (CASE WHEN nn.seed THEN (15 * $Scale // 100) // nn.n_seeds ELSE 0 END)
       |       + ($DampPct * COALESCE(i.in_sum, 0)) // 100 AS pr
       |FROM nn LEFT JOIN (
       |  SELECT ew.dst,
       |         SUM(CAST((CAST(p.pr AS HUGEINT) * ew.w) // ew.out_w AS BIGINT)) AS in_sum
       |  FROM ew JOIN $prev p ON ew.src = p.node GROUP BY ew.dst
       |) i ON nn.node = i.dst""".stripMargin

  /** k-core decomposition by bounded-round peeling (Seidman 1983;
    * Batagelj–Zaveršnik): repeatedly drop nodes of degree < k until
    * the k-core remains — the dense-subgraph extractor that separates
    * genuinely connected communities from incidental edges. Peeling
    * is non-monotone (deleting a node lowers its neighbors' degrees),
    * so the distributed form runs a FIXED number of synchronous
    * rounds — each round one degree aggregate + two semi joins, edges
    * pinned per round like the components loop — and emits a
    * `converged` flag computed FROM THE DATA (min remaining degree ≥
    * k, vacuously true when empty): a graph needing more rounds
    * reports converged = false rather than silently returning a
    * non-core. Fixture graphs converge in ≤ 2 rounds (measured);
    * rounds is a parameter precisely so the flag stays honest if a
    * future fixture needs more.
    *
    * Returns one row (n_core_nodes, n_core_edges, converged).
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.select(col("a"), col("b")).localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val good = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
        .where(col("d") >= k).select(col("v"))
      e = e.join(good.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(good.select(col("v").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
    }
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    e.agg(count(lit(1)).as("n_core_edges"))
      .crossJoin(broadcast(deg.agg(
        count(lit(1)).as("n_core_nodes"),
        coalesce(min(col("d")) >= k, lit(true)).as("converged"))))
      .select(col("n_core_nodes"), col("n_core_edges"), col("converged"))
  }

  /** DuckDB mirror of [[kCore]] given `ed(a, b)`; defines `e$rounds`
    * as the peeled edge set and `dg$rounds` as its degree table. Every
    * round CTE is MATERIALIZED: each `e_i` references `e_{i-1}` three
    * times (degree table twice, filter once), so inlined CTEs would
    * re-expand the whole chain 3^rounds times — the oracle hangs
    * without the hint. */
  def kCoreSql(k: Int, rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      val prev = if (i == 1) "ed" else s"e${i - 1}"
      s"""g$i AS MATERIALIZED (SELECT v FROM (
         |  SELECT v, COUNT(*) AS d FROM (
         |    SELECT a AS v FROM $prev UNION ALL SELECT b FROM $prev) GROUP BY 1)
         |  WHERE d >= $k),
         |e$i AS MATERIALIZED (SELECT a, b FROM $prev
         |  WHERE a IN (SELECT v FROM g$i) AND b IN (SELECT v FROM g$i))"""
        .stripMargin
    }.mkString(",\n")
    s"""$steps,
       |dg$rounds AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM (
       |  SELECT a AS v FROM e$rounds UNION ALL SELECT b FROM e$rounds) GROUP BY 1)"""
      .stripMargin
  }

  /** Exact triangle census over an undirected edge set `(a, b)`
    * (distinct, a < b) — the clustering-coefficient / community-
    * density primitive of graph mining.
    *
    * Degree-ordered node-iterator (Schank & Wagner, WEA 2005; the
    * MapReduce form is Suri & Vassilvitskii, WWW 2011): every edge is
    * oriented from its lower-(degree, id) endpoint to the higher one,
    * wedges enumerate ONLY over out-neighbors, and a wedge (v, w)
    * closes iff the oriented edge v→w exists. Orientation is the
    * whole scale story: out-degree under it is O(√m), so wedge volume
    * is Σ d_out² ~ m^1.5 instead of Σ d² — a star node with 10⁸
    * neighbors (the 100 TB skew case) generates ZERO wedges at its
    * center because all its edges point inward. Every triangle is
    * counted exactly once, anchored at its lowest-ordered vertex.
    *
    * Shape: one degree aggregate, two keyed joins to attach degrees,
    * one `u`-keyed wedge self-join on the pinned oriented table, one
    * (v, w)-keyed semi probe back into it. The (deg, id) order is
    * total, so orientation — and with it every count — is engine- and
    * partitioning-exact. Returns one row (n_edges, n_wedges,
    * n_triangles).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = pinEdgesColumnar(edges.select(col("a"), col("b")))
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val oriented = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst"), col("db").as("dd")))
        .otherwise(
          struct(col("b").as("src"), col("a").as("dst"), col("da").as("dd")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.dd").as("dd"))
      .localCheckpoint(true)
    val wedges = oriented.select(col("src").as("u"), col("dst").as("v"), col("dd").as("dv"))
      .join(oriented.select(col("src").as("u"), col("dst").as("w"), col("dd").as("dw")), "u")
      .where(col("dv") < col("dw") || (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v"), col("w"))
    val closed = wedges.join(
      oriented.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"), "left_semi")
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(wedges.agg(count(lit(1)).as("n_wedges"))))
      .crossJoin(broadcast(closed.agg(count(lit(1)).as("n_triangles"))))
  }

  /** DuckDB mirror of [[triangleStats]], given a CTE `ed(a, b)` with
    * the same distinct a < b edge set. */
  def triangleStatsSql: String =
    // MATERIALIZED: ori is referenced 3× (two wedge sides + the close
    // probe) and dg 2× — inlined CTEs would re-expand the edge builder
    // multiplicatively (the k-core oracle measurably hangs without it)
    s"""dg AS MATERIALIZED (SELECT v, CAST(COUNT(*) AS BIGINT) AS d
       |      FROM (SELECT a AS v FROM ed UNION ALL SELECT b FROM ed) GROUP BY 1),
       |ori AS MATERIALIZED (SELECT CASE WHEN (x.da, x.a) < (x.db, x.b) THEN x.a ELSE x.b END AS src,
       |               CASE WHEN (x.da, x.a) < (x.db, x.b) THEN x.b ELSE x.a END AS dst,
       |               CASE WHEN (x.da, x.a) < (x.db, x.b) THEN x.db ELSE x.da END AS dd
       |        FROM (SELECT ed.a, ed.b, na.d AS da, nb.d AS db
       |              FROM ed JOIN dg na ON ed.a = na.v JOIN dg nb ON ed.b = nb.v) x),
       |wg AS MATERIALIZED (SELECT e1.dst AS v, e2.dst AS w
       |       FROM ori e1 JOIN ori e2 ON e1.src = e2.src
       |       WHERE (e1.dd, e1.dst) < (e2.dd, e2.dst)),
       |tri AS MATERIALIZED (SELECT wg.v, wg.w FROM wg
       |        WHERE EXISTS (SELECT 1 FROM ori o WHERE o.src = wg.v AND o.dst = wg.w))
       |""".stripMargin

  /** Multi-source BFS hop distances over an undirected `(a, b)` edge
    * set, bounded at `maxHops` levels — the k-hop reachability /
    * influence-radius primitive (friend-of-friend expansion, blast-
    * radius queries). Returns `(v, dist)` for every node within
    * `maxHops` of a seed; `dist` is the MINIMUM hop count by
    * construction: level h adds exactly the nodes adjacent to level
    * h−1 that no earlier level labeled, so a node is emitted once, at
    * its first reachable level. Seeds are dist 0 even when isolated.
    *
    * Scale shape: each level is the classic Pregel superstep in
    * DataFrame form — one frontier-keyed semi join into the
    * symmetrized edge table + one anti join against the labeled set,
    * then `localCheckpoint` pins the level so level h+1 reads a
    * materialized frontier instead of re-running the whole lineage
    * (the same pin rule as [[kCore]]'s peeling rounds). Work per
    * level is Σ deg(frontier), never |V|²; `maxHops` bounds plan
    * depth, so this is k-hop reach, not unbounded SSSP — the form
    * that survives a 10⁹-node graph because the frontier, not the
    * graph, drives each join.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int,
              broadcastNodeBudget: Long = BroadcastNodeBudget): DataFrame = {
    val e = pinEdgesColumnar(edges.select(col("a"), col("b")))
    val (sym, bf) = relaxEdges(
      e.unionAll(e.select(col("b").as("a"), col("a").as("b"))), "a",
      broadcastNodeBudget)
    var visited = seeds.select(col("v")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = visited.select(col("v"))
    for (h <- 1 to maxHops) {
      val f = if (bf) broadcast(frontier) else frontier
      // visited ≤ one row per node, so it rides the same budget the
      // frontier hint was picked by
      val vis = if (bf) broadcast(visited) else visited
      val next = sym
        .join(f.select(col("v").as("a")), Seq("a"), "left_semi")
        .select(col("b").as("v")).distinct()
        .join(vis.select(col("v")), Seq("v"), "left_anti")
        .withColumn("dist", lit(h.toLong))
        .localCheckpoint(true)
      visited = visited.unionAll(next)
      frontier = next.select(col("v"))
    }
    visited
  }

  /** DuckDB mirror of [[bfsHops]] given CTEs `ed(a, b)` and
    * `seeds(v)`; defines `bfs(v, dist)`. Levels are explicit chained
    * CTEs (not WITH RECURSIVE): the recursive UNION ALL form
    * enumerates PATHS — Σ deg^h rows at level h, exponential on a
    * dense graph — while the chained form carries each level's node
    * SET exactly once, mirroring the DataFrame loop one-to-one. All
    * MATERIALIZED: each level references every earlier level. */
  def bfsHopsSql(maxHops: Int): String = {
    val levels = (1 to maxHops).map { h =>
      val antis = (0 until h)
        .map(i => s"NOT EXISTS (SELECT 1 FROM f$i WHERE f$i.v = s.b)")
        .mkString("\n        AND ")
      s"""f$h AS MATERIALIZED (SELECT DISTINCT s.b AS v FROM sym s
         |  JOIN f${h - 1} ON s.a = f${h - 1}.v
         |  WHERE $antis)""".stripMargin
    }.mkString(",\n")
    val union = (1 to maxHops)
      .map(h => s"  UNION ALL SELECT v, $h FROM f$h").mkString("\n")
    s"""sym AS MATERIALIZED (SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed),
       |f0 AS MATERIALIZED (SELECT DISTINCT v FROM seeds),
       |$levels,
       |bfs AS (SELECT v, CAST(0 AS BIGINT) AS dist FROM f0
       |$union)""".stripMargin
  }

  /** TIME-RESPECTING earliest-arrival reachability within `maxHops`
    * hops (Kempe, Kleinberg & Kumar, "Connectivity and inference
    * problems for temporal networks", STOC 2000): over timestamped
    * edges `(a, b, t)` a path is valid only if its edge times never
    * DECREASE and its first edge departs at-or-after the seed's
    * `t0` — the diffusion semantics plain BFS gets wrong (an edge
    * that fired before the node was reached cannot spread). Returns
    * `(v, arr)` = the minimal last-edge time over valid paths of
    * ≤ maxHops edges; seeds carry their own `t0` as arrival 0 (an
    * isolated seed surfaces instead of vanishing — the bfsHops rule).
    *
    * The fold is Bellman-Ford-with-rounds on the earliest-arrival
    * recurrence `arr_h(v) = min(arr_{h−1}(v), min{t : (u,v,t),
    * t ≥ arr_{h−1}(u)})` — exact for ≤ h hops because extending the
    * path realizing arr(u) by any edge with t ≥ arr(u) is itself
    * time-respecting, and using the MINIMAL arrival at u only widens
    * the feasible edge set. Note min-arrival is NOT monotone in hop
    * count the way hop-distance is: a longer path can arrive EARLIER,
    * which is why rounds relax arrivals instead of freezing visited
    * nodes like [[bfsHops]].
    *
    * Scale shape: per round one frontier-keyed join into the pinned
    * symmetric edge table + one arrival merge, with the DELTA
    * frontier (only nodes whose arrival improved last round expand —
    * an unimproved node's relaxations were all applied the round it
    * last improved). Work per round is Σ deg(frontier);
    * localCheckpoint pins each round's arrival table.
    */
  /** Shared scaffolding of the bounded-relaxation reach family
    * ([[temporalReach]], [[cheapestPaths]]): `maxHops` synchronous
    * rounds of "candidates from the DELTA frontier, keyed full-outer
    * merge taking the minimum, improved nodes become the next
    * frontier", with each round's state pinned. `init` is the
    * (v, best) seed table; `cand(frontier)` emits this round's
    * (v, cand) proposals — the ONLY part the two operators differ in.
    * Only nodes whose value improved expand next round: an unimproved
    * node's relaxations were all applied the round it last improved,
    * so the delta frontier reaches the same ≤ h-hop fixed point as
    * full relaxation (which the SQL mirrors use). */
  /** Pin a (symmetrized) edge frame hash-partitioned AND sorted on its
    * join key, so every relaxation round's frontier join reuses the ONE
    * exchange+sort paid here instead of re-shuffling the full edge set
    * per round. `localCheckpoint` preserves the physical plan's
    * outputPartitioning/outputOrdering on the resulting LogicalRDD, so
    * EnsureRequirements sees a side that already satisfies the
    * sort-merge join's distribution and ordering — the per-round plan
    * exchanges only the frontier (|frontier| rows, not |E|). The
    * partition count is pinned to the session's shuffle partitions
    * (REPARTITION_BY_NUM, which AQE will not coalesce — a coalesced
    * layout would stop matching the frontier exchange and silently
    * reintroduce the per-round edge shuffle this exists to remove).
    * Before this pin the 3-round reach family re-shuffled+re-sorted
    * the edges every round: ~32 exec-s for events_temporal_reach at
    * sf0.1, the registry's heaviest CPU (r19 verdict, task 3).
    *
    * The pin is `persist()`, NOT the codebase's usual localCheckpoint:
    * measured on this build (Spark 4.1 + AQE), `Dataset.localCheckpoint`
    * yields a LogicalRDD with `UnknownPartitioning(0)` — the layout is
    * physically there but invisible to EnsureRequirements, so every
    * round re-exchanges anyway (probed: the r20 first attempt shipped
    * exactly that and shuffle-write ROSE 66.7→79.2 MB — the repartition
    * added a 4th full-edge shuffle instead of removing three). An
    * InMemoryRelation's scan, by contrast, REPORTS the cached plan's
    * partitioning+ordering, so the round joins plan as exchange-free
    * sort-merge on the edge side — or, when AQE sees a small frontier
    * at runtime, as a broadcast-hash join with the cached edges
    * streaming shuffle-free. Single materialization keeps the same
    * determinism guarantee the checkpoint pin gives. */
  private def pinEdgesByKey(edges: DataFrame, key: String): DataFrame = {
    val parts = edges.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    edges.repartition(parts, col(key)).sortWithinPartitions(key).persist()
  }

  /** Rows-per-task target for the cached edge scan on the
    * broadcast-frontier path: each relaxation round re-reads the full
    * edge set, and at fixture scale a 32-way layout pays ~32 × the
    * per-task fixed cost to move ~85k rows per task (measured on this
    * host: 32 trivial tasks ≈ 4.2 exec-s, ONE task scanning all 2.7M
    * temporal edges ≈ 0.34 exec-s — task overhead, not data, was the
    * reach family's entire CPU bill). Sizing partitions to the data
    * keeps small fixtures on a handful of tasks while a 10⁹-row edge
    * set still fans out to the parent layout's full width. */
  private val RelaxEdgeRowsPerTask = 2000000L

  /** Pin the reach family's ONE-DIRECTIONAL edge frame as a COLUMNAR
    * cache (`persist`), never an eager `localCheckpoint`: the r20 sf1
    * sweep caught the checkpoint form at exponent 1.49 (57.8 s wall,
    * 1487 exec-s for events_temporal_reach on the 27M-edge replica) and
    * per-stage attribution put ~460 of those exec-s in edge PREP — an
    * RDD-object checkpoint stores one Java UnsafeRow object per edge,
    * so pinning `e` AND its symmetrized union held ~55M row objects
    * (multi-GB of heap) and the resulting GC stalls inflated every
    * downstream stage (gcMs 20 875 in the worst run). InMemoryRelation
    * stores compressed column batches (~10× smaller), and only the
    * ONE-directional frame is cached — symmetrization is a narrow
    * union of two cached scans, re-derived per round for free instead
    * of materialized as a second full copy. Re-measured after the
    * switch: the same sf1 run drops to the pinned-path level with flat
    * GC. Single materialization (and thus the family's determinism
    * guarantee) is unchanged — a cache hit is as stable as a
    * checkpoint for the deterministic builders this library feeds. */
  private def pinEdgesColumnar(e: DataFrame): DataFrame = e.persist()

  /** Strategy pick for the bounded-relaxation family, mirroring
    * [[pageRank]]'s node-budget dispatch: pin the symmetrized edge set
    * once, count its distinct endpoints (one bounded driver-side
    * scalar — the same count pageRank documents), and
    *
    *  - `nodes ≤ [[BroadcastNodeBudget]]`: every frontier (≤ one row
    *    per node) is broadcast-hinted, so each round is a map-side
    *    hash join STREAMING the cached edges — zero edge
    *    exchanges, zero edge sorts, for the whole run. The edge scan
    *    is coalesced to [[RelaxEdgeRowsPerTask]]-sized tasks (no
    *    shuffle — LogicalRDD partition merge), which is what actually
    *    cut the family's exec-s: the r20 first attempt pre-partitioned
    *    + cached the edges for exchange-free sort-merge rounds and
    *    exec time did NOT move, because the cost was never the shuffle
    *    — it was ~20 stages × 32 tasks × fixed per-task overhead on
    *    data small enough for 2 tasks.
    *  - above the budget (a frontier too big to ship to every
    *    executor): [[pinEdgesByKey]] — ONE edge shuffle+sort into a
    *    persisted layout whose InMemoryRelation REPORTS its
    *    partitioning (a localCheckpoint's LogicalRDD comes back
    *    `UnknownPartitioning` on this build, probed r20), so every
    *    round's sort-merge join exchanges only the frontier.
    *
    * Returns (edges-to-join, broadcast-the-frontier?). */
  private def relaxEdges(symRaw: DataFrame, key: String,
      broadcastNodeBudget: Long): (DataFrame, Boolean) = {
    // symRaw is the union of two scans of a [[pinEdgesColumnar]] cache;
    // this count materializes that cache and is the only full-edge
    // action the dispatch pays
    val cnt = symRaw.count()
    // sym is symmetrized, so `key` alone covers every endpoint
    val nNodes = symRaw.select(col(key)).distinct().count()
    if (nNodes <= broadcastNodeBudget) {
      val cur = symRaw.rdd.getNumPartitions
      val parts = math.max(1L, math.min(cur.toLong,
        cnt / RelaxEdgeRowsPerTask + 1L)).toInt
      (symRaw.coalesce(parts), true)
    } else (pinEdgesByKey(symRaw, key), false)
  }

  private def boundedRelax(init: DataFrame, maxHops: Int,
      broadcastFrontier: Boolean)(
      cand: DataFrame => DataFrame): DataFrame = {
    var best = init.localCheckpoint(true)
    var frontier = best
    for (_ <- 1 to maxHops) {
      val f = if (broadcastFrontier) broadcast(frontier) else frontier
      val merged = best.join(cand(f), Seq("v"), "full_outer")
        .select(col("v"), col("best"), col("cand"),
          least(coalesce(col("best"), col("cand")),
            coalesce(col("cand"), col("best"))).as("next"))
        .localCheckpoint(true)
      frontier = merged
        .where(col("best").isNull ||
          (col("cand").isNotNull && col("cand") < col("best")))
        .select(col("v"), col("next").as("best"))
      best = merged.select(col("v"), col("next").as("best"))
    }
    best
  }

  def temporalReach(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                    broadcastNodeBudget: Long = BroadcastNodeBudget): DataFrame = {
    val e = pinEdgesColumnar(edges.select(col("a"), col("b"), col("t")))
    val (sym, bf) = relaxEdges(
      e.unionAll(e.select(col("b").as("a"), col("a").as("b"), col("t"))), "a",
      broadcastNodeBudget)
    val init = seeds.select(col("v"), col("t0").as("best"))
      .groupBy(col("v")).agg(min(col("best")).as("best"))
    boundedRelax(init, maxHops, bf) { frontier =>
      sym.join(frontier.select(col("v").as("a"), col("best").as("fa")), Seq("a"))
        .where(col("t") >= col("fa"))
        .groupBy(col("b")).agg(min(col("t")).as("cand"))
        .select(col("b").as("v"), col("cand"))
    }.select(col("v"), col("best").as("arr"))
  }

  /** CHEAPEST-PATH cost within `maxHops` hops (bounded-hop
    * Bellman-Ford; Cormen et al. §24.1) — the weighted completion of
    * the family: [[bfsHops]] minimizes HOPS, [[temporalReach]]
    * minimizes ARRIVAL TIME, this minimizes summed edge COST over
    * integer weights `(a, b, w)`. Returns `(v, dist)` = minimal total
    * weight over ≤ maxHops-edge paths from any seed (seeds at 0; an
    * isolated seed surfaces — the family rule). Bounding hops keeps
    * the plan depth fixed and is also what makes negative-cycle
    * questions moot; weights here are positive costs anyway.
    *
    * Scale shape: identical to [[temporalReach]] — per round ONE
    * delta-frontier-keyed join into the pinned symmetric edge table
    * (only nodes whose distance improved expand; an unimproved node's
    * relaxations were applied the round it last improved) + a keyed
    * full-outer merge; per-round work is Σ deg(frontier), state is
    * one (node, dist) row per node, never per path.
    */
  def cheapestPaths(edges: DataFrame, seeds: DataFrame, maxHops: Int,
                    broadcastNodeBudget: Long = BroadcastNodeBudget): DataFrame = {
    val e = pinEdgesColumnar(edges.select(col("a"), col("b"), col("w")))
    val (sym, bf) = relaxEdges(
      e.unionAll(e.select(col("b").as("a"), col("a").as("b"), col("w"))), "a",
      broadcastNodeBudget)
    val init = seeds.select(col("v")).distinct().withColumn("best", lit(0L))
    boundedRelax(init, maxHops, bf) { frontier =>
      sym.join(frontier.select(col("v").as("a"), col("best").as("fd")), Seq("a"))
        .groupBy(col("b")).agg(min(col("fd") + col("w")).as("cand"))
        .select(col("b").as("v"), col("cand"))
    }.select(col("v"), col("best").as("dist"))
  }

  /** DuckDB mirror of [[cheapestPaths]] given CTEs `wed(a, b, w)` and
    * `seeds(v)`; defines `d$maxHops(v, dist)`. Frontier-free full
    * relaxation per round — same ≤ h-hop fixed point. */
  def cheapestPathsSql(maxHops: Int): String = {
    val rounds = (1 to maxHops).map { h =>
      s"""d$h AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
         |  SELECT v, dist FROM d${h - 1}
         |  UNION ALL
         |  SELECT s.b AS v, p.dist + s.w AS dist FROM wsym s
         |  JOIN d${h - 1} p ON s.a = p.v) u
         |  GROUP BY v)""".stripMargin
    }.mkString(",\n")
    s"""wsym AS MATERIALIZED (SELECT a, b, w FROM wed
       |  UNION ALL SELECT b, a, w FROM wed),
       |d0 AS MATERIALIZED (SELECT DISTINCT v, CAST(0 AS BIGINT) AS dist
       |  FROM seeds),
       |$rounds""".stripMargin
  }

  /** Assortativity effect size in basis points, shared by the Spark
    * query and its DuckDB oracle so both engines run the SAME integer
    * formula. Over SYMMETRIZED edge instances the degree marginals are
    * identical (every (dx, dy) pair appears with its swap), so
    * den_x = den_y = den and Pearson's r = num / sqrt(den_x · den_y)
    * collapses to the LINEAR ratio num / den — no squaring. That is
    * the whole overflow fix: the previous r² form computed
    * 10000·num², which leaves DECIMAL(38,0) once |num| > ~10¹⁷ (at
    * sf0.1 the co-presence num is ~10¹⁸), while DuckDB's HUGEINT kept
    * going — a silent cross-engine split. The linear form's widest
    * intermediate is 10000·|num|, exact to |num| ≤ ~10³⁴ on both
    * engines. `abs`+`sign` keeps the division on non-negative
    * operands, sidestepping trunc-vs-floor divergence on negatives;
    * `greatest(den, 1)` guards the zero-variance (regular) graph.
    *
    * `div` is the Spark spelling of integer division; pass `"//"` for
    * DuckDB. */
  def assortativityRbpSql(div: String): String =
    s"CAST(sign(num) * ((10000 * abs(num)) $div greatest(den_x, 1)) AS BIGINT)"

  /** DuckDB mirror of [[temporalReach]] given CTEs `ted(a, b, t)` and
    * `seeds(v, t0)`; defines `r$maxHops(v, arr)`. Each round relaxes
    * ALL arrivals (no frontier — same fixed point for ≤ h hops), so
    * the chained-CTE fold is the recurrence verbatim. */
  def temporalReachSql(maxHops: Int): String = {
    val rounds = (1 to maxHops).map { h =>
      s"""r$h AS MATERIALIZED (SELECT v, MIN(arr) AS arr FROM (
         |  SELECT v, arr FROM r${h - 1}
         |  UNION ALL
         |  SELECT s.b AS v, s.t AS arr FROM tsym s
         |  JOIN r${h - 1} p ON s.a = p.v AND s.t >= p.arr) u
         |  GROUP BY v)""".stripMargin
    }.mkString(",\n")
    s"""tsym AS MATERIALIZED (SELECT a, b, t FROM ted
       |  UNION ALL SELECT b, a, t FROM ted),
       |r0 AS MATERIALIZED (SELECT v, MIN(t0) AS arr FROM seeds GROUP BY 1),
       |$rounds""".stripMargin
  }

  /** Common-neighbor counts over every wedge-connected pair of an
    * undirected `(a, b)` edge set: rows `(x, y, cn)` with `x < y` and
    * `cn` = the number of shared neighbors — the raw material of both
    * triadic-closure link prediction (score NON-edges by cn) and edge
    * embeddedness (annotate existing edges with cn / neighborhood
    * Jaccard).
    *
    * Scale shape: wedges are enumerated by their CENTER, so the work
    * is Σ deg(u)², and a single hub would make that quadratic — the
    * adjacency is therefore capped at `cap` neighbors per center by
    * the deterministic hash-rank every blocker in the repo uses
    * ([[Sampling.capPerGroup]], mirrored in SQL by
    * [[Sampling.capOrderSql]]), bounding any node's wedge
    * contribution at cap². Pairs seen through a dropped wedge lose
    * only that center's vote; the cap binds nowhere on the driver
    * fixtures (max co-presence degree 17 at sf0.01) so the gate
    * compares the UNCAPPED semantics on both engines, while at 100 TB
    * the cap is the difference between Σ deg² and Σ min(deg, cap)².
    * One self-join keyed on the center + one (x, y) aggregate — two
    * shuffles total, never an all-pairs.
    */
  def commonNeighborCounts(edges: DataFrame, cap: Int = 64): DataFrame = {
    val adj = edges.select(col("a").as("v"), col("b").as("n"))
      .unionAll(edges.select(col("b").as("v"), col("a").as("n")))
    val capped = Sampling.capPerGroup(adj, col("v"), col("n"), cap)
      .select(col("v"), col("n")).localCheckpoint(true)
    capped.select(col("v"), col("n").as("x"))
      .join(capped.select(col("v"), col("n").as("y")), "v")
      .where(col("x") < col("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("cn"))
  }

  /** DuckDB mirror of [[commonNeighborCounts]] given a CTE
    * `ed(a, b)`: defines `adjc` (capped symmetric adjacency) and
    * `cnp(x, y, cn)`. MATERIALIZED — `adjc` is read twice by the
    * wedge join and again by any degree consumer. */
  def commonNeighborSql(cap: Int = 64): String =
    s"""adjc AS MATERIALIZED (SELECT v, n FROM (
       |    SELECT v, n, row_number() OVER (PARTITION BY v
       |      ORDER BY ${Sampling.capOrderSql("n")}) AS rk
       |    FROM (SELECT a AS v, b AS n FROM ed UNION ALL SELECT b, a FROM ed))
       |  WHERE rk <= $cap),
       |cnp AS MATERIALIZED (SELECT l.n AS x, r.n AS y,
       |      CAST(COUNT(*) AS BIGINT) AS cn
       |    FROM adjc l JOIN adjc r ON l.v = r.v AND l.n < r.n
       |    GROUP BY 1, 2)""".stripMargin
}
