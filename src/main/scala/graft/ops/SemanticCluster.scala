package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic clustering / semantic dedup over an embedding column:
  * exact-integer Lloyd iterations of k-means (assign → refit →
  * re-assign, `refits` times) with data-point seeds, emitting
  * per-cluster size, inertia, and the representative (medoid-ish)
  * vector — the "keep one document per embedding cluster" primitive
  * of semantic dedup.
  *
  * Everything is integer arithmetic over [[Vectors.quantize]]d
  * components, so the result is bit-identical across engines /
  * partitionings and the DuckDB oracle can hash-pin it:
  *  - seed distance uses `‖c‖² − 2·x·c` (the per-row `‖x‖²` shift
  *    cannot change a row's argmin, so it is dropped);
  *  - every refit centroid is the TRUNCATED integer mean `Σx_d div m`
  *    (toward zero — Spark `div`, DuckDB `//`, and Scala `Long`
  *    division all agree, verified on negatives), which sits within
  *    one quantization unit (1e-3) of the float mean — below the
  *    embedding noise floor, the same argument that justifies
  *    quantization itself. Distances to the integer centroid then
  *    stay in `long` at ANY cluster size (component diffs are
  *    ~|2·quantized| regardless of m) — no overflow cliff.
  *
  * Scale shape: every assignment pass is a pure scan-stage expression
  * against LITERAL centroids (k·dim longs — same bounded-collect class
  * as the PQ codebooks); each refit is one (cluster, dim)-keyed
  * aggregate with map-side partials (k·dim groups — hot by design, and
  * bounded). No shuffle ever carries a vector. The quantized frame is
  * localCheckpoint-pinned once, so at 100 TB a run of R refits is ONE
  * raw scan + R bounded refit aggregates + one final pass over the
  * pinned frame.
  */
object SemanticCluster {

  /** Argmin over per-cluster score columns; ties → lowest index.
    * `array_position` returns the FIRST occurrence of the min. */
  private def argmin(scores: Seq[Column]): Column =
    array_position(array(scores: _*), array_min(array(scores: _*)))

  /** Full squared distance of the quantized row vector `q` to a
    * literal integer centroid. */
  private def centScore(c: Seq[Long]): Column =
    Vectors.intNorm2(zip_with(col("q"), array(c.map(lit): _*), (x, cd) => x - cd))

  /** Per-cluster truncated-integer-mean centroids of an assignment
    * frame (vec_id, q, cl) — ONE bounded collect per refit (k·dim
    * rows; the member count rides every (cl, d) group, so no second
    * counting job); empty clusters simply don't appear. */
  private def refit(a: DataFrame): Seq[(Long, Seq[Long])] = {
    val s = a.sparkSession
    import s.implicits._
    a.select(col("cl"), posexplode(col("q")).as(Seq("d", "x")))
      .groupBy(col("cl"), col("d"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("m"))
      .as[(Long, Int, Long, Long)].collect()
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (cl, rows) =>
        // truncated integer mean, toward zero — matches DuckDB `//`
        // (measured: -7 // 2 = -3 in DuckDB, like Scala; Python's
        // floor // is the odd one out)
        (cl, rows.sortBy(_._2).map(r => r._3 / r._4).toSeq)
      }
  }

  /** Assign each row of `q` to the nearest of the literal `cents`,
    * labeling with the centroids' ORIGINAL cluster ids (survivors of
    * earlier rounds keep their label). */
  private def reassign(q: DataFrame, cents: Seq[(Long, Seq[Long])]): DataFrame = {
    val clIds = array(cents.map(c => lit(c._1)): _*)
    q.withColumn("cl",
      element_at(clIds, argmin(cents.map(c => centScore(c._2))).cast("int")))
  }

  /** `refits` Lloyd rounds. `seeds` must be a small frame of (id, vec)
    * rows (k rows — it is collected); cluster ids are the seeds' OWN
    * ids (not their rank), so the SQL mirror's `vec_id AS cid` labels
    * agree for ANY seed id set, contiguous or not. Returns one row per
    * non-empty cluster: (cluster, n_members, inertia, rep_vec_id),
    * measured on the assignment against the LAST refit's centroids. */
  def lloyd(emb: DataFrame, vecCol: Column, idCol: Column,
            seeds: DataFrame, refits: Int): DataFrame = {
    require(refits >= 1, "at least one refit round")

    // ---- seeds → literals (bounded: k vectors)
    val seedRows = seeds.select(idCol.cast("long").as("id"),
        Vectors.quantize(vecCol).as("q"))
      .orderBy("id").collect()
    val seedVecs: Seq[Seq[Long]] = seedRows.map(_.getSeq[Long](1).toSeq).toSeq
    val seedIds = array(seedRows.map(r => lit(r.getLong(0))): _*)

    // pinned once: every refit collect and the final pass re-read the
    // quantized frame; unpinned, each job would re-scan + re-quantize
    // the full corpus (2R+2 raw passes for R rounds)
    val q = emb.select(idCol.cast("long").as("vec_id"),
      Vectors.quantize(vecCol).as("q")).localCheckpoint(true)

    // ---- round 0: assign to nearest seed (score = ‖c‖² − 2·x·c);
    // ties → lowest seed id (seeds are id-sorted, argmin takes the
    // first minimum)
    def seedScore(c: Seq[Long]): Column = {
      val cn2 = c.map(x => x * x).sum
      lit(cn2) - lit(2L) * Vectors.intDot(col("q"), array(c.map(lit): _*))
    }
    var a = q.withColumn("cl",
      element_at(seedIds, argmin(seedVecs.map(seedScore)).cast("int")))
    var cents = refit(a)
    for (_ <- 2 to refits) {
      a = reassign(q, cents)
      cents = refit(a)
    }

    // ---- final assignment against the last centroids, with distance
    val scores = cents.map(c => centScore(c._2))
    val a2 = reassign(q, cents).withColumn("d2", array_min(array(scores: _*)))
    a2.groupBy(col("cl").as("cluster"))
      .agg(count(lit(1)).as("n_members"), sum(col("d2")).as("inertia"),
        min_by(col("vec_id"), struct(col("d2"), col("vec_id"))).as("rep_vec_id"))
  }

  /** One Lloyd round — the semantic-dedup default. */
  def lloydOnce(emb: DataFrame, vecCol: Column, idCol: Column,
                seeds: DataFrame): DataFrame =
    lloyd(emb, vecCol, idCol, seeds, refits = 1)

  /** Seed-nearest assignment frame `(vec_id, v, q, cl)` — [[lloyd]]'s
    * round-0 labeling exposed for consumers that need the PER-VECTOR
    * cluster labels rather than the cluster summary (SemDeDup's
    * blocking structure). Same exact-integer `‖c‖² − 2·x·c` argmin and
    * lowest-seed-id tie-break as lloyd, so the kmeans oracle's `a1`
    * CTE mirrors it verbatim. The raw vector `v` rides along for
    * downstream fused `q_dot` scoring; the frame is localCheckpoint-
    * pinned because callers typically self-join it.
    */
  def seedAssignments(emb: DataFrame, vecCol: Column, idCol: Column,
                      seeds: DataFrame): DataFrame = {
    val seedRows = seeds.select(idCol.cast("long").as("id"),
        Vectors.quantize(vecCol).as("q"))
      .orderBy("id").collect()
    // Scoring runs in the codegen'd [[graft.functions.SeedArgmin]]
    // kernel: the centroids ride into generated code as referenced
    // long[]s, so the expression tree is O(1) in k and the n·k·dim
    // multiply-adds run as one primitive loop. The previous form
    // unrolled k separate ‖c‖²−2·x·c column expressions carrying k·dim
    // literals EACH — at SemDeDup's corpus-scaled k = n div 500 that
    // tree held ~10⁵ literal nodes and made the assignment scan the
    // registry's one truly superlinear term (r20 sf1 sweep: exponent
    // 1.05, ~30 of emb_semdedup's 35 s in this projection; an
    // intermediate HOF rewrite measured IDENTICAL — higher-order
    // functions are CodegenFallback, boxed lambda dispatch per
    // element). The n·k op COUNT is the operator's own contract (every
    // vector scores every seed; SemDeDup scales k with the corpus) —
    // see SCALE.md for where that contract stops and IVF-style
    // assignment has to take over.
    val ids = seedRows.map(_.getLong(0))
    val dims = seedRows.map(_.getSeq[Long](1).length).distinct
    require(dims.length <= 1, s"seed vectors disagree on dimension: $dims")
    val dim = dims.headOption.getOrElse(0)
    val flat = seedRows.flatMap(_.getSeq[Long](1)).toArray
    val seedArgmin =
      graft.functions.GraftFunctions.registerSeedArgmin(emb.sparkSession)
    // d2 = ‖x‖² + min score = the exact squared distance to the
    // ASSIGNED centroid (assignment IS the score argmin) — rides along
    // for outlier screens; scan-stage like the assignment itself
    emb.select(idCol.cast("long").as("vec_id"), vecCol.as("v"),
        Vectors.quantize(vecCol).as("q"))
      .withColumn("b", seedArgmin(col("q"), ids, flat, dim))
      .withColumn("cl", col("b.id"))
      .withColumn("d2", Vectors.intNorm2(col("q")) + col("b.sc"))
      .drop("b")
      .localCheckpoint(true)
  }

  /** Farthest-point (k-center / maxmin) traversal — the deterministic
    * stand-in for k-means++ seeding, and a diversity-sampling
    * primitive in its own right (pick k maximally-spread exemplar
    * documents). Start from the lowest-id vector; each step adds the
    * vector maximizing its minimum distance to the chosen set (ties →
    * lowest id). Gonzalez's greedy 2-approximation to the k-center
    * optimum, here in exact integer arithmetic so the SQL mirror picks
    * the identical ids.
    *
    * Scale shape: the quantized frame pins once; each of the k−1
    * steps is one scan-stage min-of-literal-distances expression plus
    * a TakeOrdered(1) — no shuffle carries a vector, and only k rows
    * ever reach the driver.
    *
    * Driver-loop budget: the k−1 steps are SEQUENTIAL driver
    * round-trips by the algorithm's nature (step j's distance
    * expression needs step j−1's pick), so wall time is
    * k × (scan + job-launch latency). That is the right trade at the
    * small k this seeding targets (k ≤ ~64: the per-step scan
    * dominates and each scan is embarrassingly parallel); past that
    * the launch latency serializes and the honest alternatives change
    * algorithm, not plan shape — k-means‖ style oversampling (sample
    * O(k) candidates per pass in ~log k passes, then cluster the
    * candidate set driver-side) or cell-blocked seeding. Batching
    * multiple maxmin steps per action is NOT one of them: within one
    * pass the 2nd pick depends on the 1st, so a "batch" can only
    * guess. */
  def farthestPointSeedIds(emb: DataFrame, vecCol: Column, idCol: Column,
                           k: Int): Seq[Long] = {
    require(k >= 1, "k >= 1")
    val q = emb.select(idCol.cast("long").as("vec_id"),
        Vectors.quantize(vecCol).as("q"))
      .withColumn("n2", Vectors.intNorm2(col("q")))
      .localCheckpoint(true)
    def distTo(c: org.apache.spark.sql.Row): Column =
      col("n2") + lit(c.getLong(2)) -
        lit(2L) * Vectors.intDot(col("q"), array(c.getSeq[Long](1).map(lit): _*))
    val first = q.orderBy(col("vec_id").asc).limit(1).collect()
    require(first.nonEmpty, "farthestPointSeedIds: empty input")
    var chosen = List(first.head)
    for (_ <- 2 to k) {
      val dmin = chosen.map(distTo).reduce(least(_, _))
      // Already-chosen ids are excluded from the argmax: with exact
      // duplicate vectors in the corpus, a chosen point ties any of
      // its twins at dmin = 0 and the lowest-id tie-break would
      // re-pick it — silently collapsing the seed set below k. The
      // SQL mirror (kcenterSeedsCte) drops the picked row from each
      // fd_j fold for the identical reason, keeping both traversals
      // exact. k larger than the corpus now fails loudly instead.
      val chosenIds = chosen.map(_.getLong(0))
      val next = q.where(!col("vec_id").isin(chosenIds: _*))
        .withColumn("dmin", dmin)
        .orderBy(col("dmin").desc, col("vec_id").asc).limit(1)
        .select(col("vec_id"), col("q"), col("n2")).collect()
      require(next.nonEmpty,
        s"farthestPointSeedIds: k = $k exceeds the number of vectors")
      chosen ::= next.head
    }
    chosen.reverse.map(_.getLong(0))
  }
}
