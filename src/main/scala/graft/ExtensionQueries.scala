package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{ApplyChanges, Fixtures, Routing}
import graft.ops.{Dedup, Multimodal, Sessionize, Similarity, Text, Vectors}

/** Extension-operator queries (SURVEY §7.4): training-data-pipeline ops
  * over `documents`/`embeddings`, plus the strict CDC dispatch form and
  * snapshot+stream union. Same oracle-parity conventions as SparkEntry.
  */
object ExtensionQueries {

  private val EMB_DIM = 64

  // --------------------------------------------------------------- CDC

  private def validLog(s: SparkSession, dir: String): DataFrame =
    Routing.validateSplit(Fixtures.employeeCdcLog(s, dir)).valid

  private def qCdcApplyDispatch(s: SparkSession, dir: String): DataFrame =
    ApplyChanges.applyLogDispatch(validLog(s, dir), Seq("emp_id"), col("event_id"))
      .select(col("emp_id"), col("event_id"), col("action"), col("emp_salary"),
        col("last_updated_at").cast("timestamp_ntz").as("last_updated_at"))
      .orderBy("emp_id")

  /** S5: initial snapshot (customer) + CDC stream, unified latest-wins. */
  private def qSnapshotPlusStream(s: SparkSession, dir: String): DataFrame = {
    val snap = Tables.customer(s, dir).select(
      col("c_custkey").as("emp_id"), col("c_name").as("name"),
      floor(col("c_acctbal")).cast("long").as("val"),
      lit("2020-01-01 00:00:00").cast("timestamp_ntz").as("ts"),
      lit(-1L).as("ord"), lit("insert").as("action"), lit("snapshot").as("src"))
    val delta = Fixtures.employeeCdcLog(s, dir).select(
      col("emp_id"), col("emp_FN").as("name"), col("emp_salary").as("val"),
      col("last_updated_at").cast("timestamp_ntz").as("ts"),
      col("event_id").as("ord"), col("action"), lit("stream").as("src"))
    ApplyChanges.latestPerKey(snap.unionAll(delta), Seq("emp_id"), col("ts"),
        tieBreak = Seq(col("ord")))
      .where(lower(col("action")) =!= "delete")
      .select(col("emp_id"), col("name"), col("val"), col("ts"), col("src"))
      .orderBy("emp_id")
  }

  /** K1/S2 wire-format parity, Avro flavor: the CDC log rides a binary
    * Avro body (key = stringified emp_id, exactly the keyed-JSON sink
    * shape of [[graft.cdc.CdcWire.toWire]]) and decodes back to typed
    * columns. The oracle is the identity projection of the log — what
    * this query pins is encode∘decode ≡ id on the real fixture, i.e.
    * that the engine's own `to_avro_flat`/`from_avro_flat` codec
    * ([[graft.functions.AvroCodec]]) loses nothing a CDC message
    * carries (longs, strings, micros timestamps). Corrupt bytes decode
    * to a null struct and route to the DLQ exactly like corrupt JSON —
    * spec-covered; the fixture wire is clean so the filter drops 0.
    */
  private def qCdcAvroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val (toAvro, fromAvro) = graft.functions.AvroCodec.register(s)
    val log = Fixtures.employeeCdcLog(s, dir)
    val st = org.apache.spark.sql.types.StructType.fromDDL(
      "emp_id BIGINT, event_id BIGINT, last_updated_at TIMESTAMP_NTZ, action STRING, " +
        "emp_dob STRING, emp_salary BIGINT, emp_FN STRING, emp_LN STRING, emp_city STRING")
    val wire = log.select(
      graft.cdc.Columns.wireKey(col("emp_id")).as("key"),
      toAvro(struct(
        col("emp_id"), col("event_id"),
        col("last_updated_at").cast("timestamp_ntz").as("last_updated_at"),
        col("action"), col("emp_dob"), col("emp_salary"),
        col("emp_FN"), col("emp_LN"), col("emp_city"))).as("value"))
    wire.select(fromAvro(col("value"), st).as("r"))
      .where(col("r").isNotNull) // corrupt → DLQ; clean fixture drops 0
      .select(col("r.emp_id").as("emp_id"), col("r.event_id").as("event_id"),
        col("r.action").as("action"), col("r.emp_salary").as("emp_salary"),
        col("r.emp_city").as("emp_city"),
        col("r.last_updated_at").as("last_updated_at"))
      .orderBy("emp_id", "event_id")
  }

  // -------------------------------------------------------------- text

  private def qTextTokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
        size(array_distinct(col("tk"))).cast("long").as("n_distinct"))
      .orderBy("doc_id")

  private def qTextQuality(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select((col("doc_id") +: Text.qualitySignals(col("text"))): _*)
      .orderBy("doc_id")

  private def qTextLangid(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select((Seq(col("doc_id"), col("lang")) ++ Text.langScores("text")): _*)
      .withColumn("lang_guess", Text.langGuess)
      .orderBy("doc_id")

  /** Skew-safe distinct users per event type (low-cardinality group key
    * → classic distinct-agg hotspot; two-stage form spreads it). */
  private def qEventsDistinctUsers(s: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.distinctCount(Tables.events(s, dir),
        Seq(col("event_type")), col("user_id"), as = "n_distinct_users")
      .orderBy("event_type")

  /** HLL++ sketch distinct (`approx_count_distinct`) next to the exact
    * two-stage count — the sketch is the 100 TB form (mergeable
    * fixed-size state, one map-side pass, no (group, value) shuffle),
    * and the exact side is the audit. Emitted as a CERTIFICATE: HLL
    * register layouts are engine-specific, so the registered output
    * carries only the oracle-computable exact count plus the hard
    * verdict `ok` = [|est − exact| ≤ 6% of exact, i.e. 3σ at
    * rsd=0.02] as BIGINT — the DuckDB oracle emits the same exact
    * count and a literal 1, so any sketch regression flips `ok` to 0
    * and FAILS THE DRIVER'S HASH GATE (the r14 form exposed the raw
    * estimate and therefore had no oracle at all — a weaker rows-only
    * check). SketchSpec asserts ok across fixtures.
    */
  private def qEventsApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val exact = graft.ops.Skew.distinctCount(ev, Seq(col("event_type")),
      col("user_id"), as = "n_exact")
    val approx = ev.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
    exact.join(approx, "event_type")
      .select(col("event_type"), col("n_exact"),
        (abs(col("n_approx") - col("n_exact")) * lit(10000) / col("n_exact"))
          .cast("long").as("err_x10k"))
      .select(col("event_type"), col("n_exact"),
        (col("err_x10k") <= 600).cast("long").as("ok"))
      .orderBy("event_type")
  }

  /** KMV (k-minimum-values / bottom-k) sketch churn: day-over-day
    * user-set Jaccard estimated from 32-value sketches, next to the
    * exact answer as audit. Unlike HLL registers, a bottom-k sketch
    * over a deterministic injective hash is bit-reproducible in SQL,
    * so this sketch query IS oracle-exact. Mechanics: per day, keep
    * the k smallest user hashes (row_number ≤ k → WindowGroupLimit
    * pre-reduces map-side, k rows per day cross the exchange); merge
    * adjacent days' sketches (k smallest of the union) and estimate
    * J ≈ |both| / k over the merged sketch; estimate the union
    * cardinality as (k−1)·P / h_k (exact k_union when the union is
    * smaller than k — the sketch saw everything). All estimates are
    * integer basis points. At 100 TB the exact side drops away and
    * sketches persist as the mergeable daily profile — the same
    * audit-next-to-sketch pattern as events_approx_distinct, but with
    * a full SQL oracle. */
  private def qEventsKmvChurn(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = 32
    val du = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    // tag rows into both adjacent pair-slots: day d is side a of pair d
    // and side b of pair d-1 — one explode instead of a self-join
    def tagged(src: DataFrame, valCol: String) = src.select(
        explode(array(
          struct(col("d").as("pd"), lit(1).as("in_a"), lit(0).as("in_b")),
          struct(date_sub(col("d"), 1).as("pd"), lit(0).as("in_a"), lit(1).as("in_b")))).as("t"),
        col(valCol))
      .select(col("t.pd").as("pd"), col("t.in_a").as("in_a"),
        col("t.in_b").as("in_b"), col(valCol))
    // exact audit: distinct users per pair with side flags
    val exact = tagged(du, "user_id")
      .groupBy(col("pd"), col("user_id"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .groupBy(col("pd"))
      .agg(count(lit(1)).as("n_union"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_both"),
        max(col("in_a")).as("has_a"), max(col("in_b")).as("has_b"))
      .where(col("has_a") === 1 && col("has_b") === 1)
      .select(col("pd"), col("n_union"), col("n_both"),
        expr("(10000 * n_both) div n_union").as("jaccard_bp"))
    // sketch side: bottom-k hashes per day, then bottom-k of the merge
    val wd = Window.partitionBy(col("d")).orderBy(col("h"))
    val sk = du.withColumn("h", graft.ops.Sampling.hashVal(col("user_id")))
      .withColumn("rk", row_number().over(wd)).where(col("rk") <= K)
      .select(col("d"), col("h"))
    val wp = Window.partitionBy(col("pd")).orderBy(col("h"))
    val est = tagged(sk, "h")
      .groupBy(col("pd"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .withColumn("rk", row_number().over(wp)).where(col("rk") <= K)
      .groupBy(col("pd"))
      .agg(count(lit(1)).as("k_union"),
        sum(col("in_a") * col("in_b")).cast("long").as("k_both"),
        max(col("h")).as("h_k"))
      .select(col("pd"), col("k_union"), col("k_both"),
        expr("(10000 * k_both) div k_union").as("est_jaccard_bp"),
        when(col("k_union") < K, col("k_union"))
          .otherwise(expr(s"((k_union - 1) * ${graft.ops.Sampling.P}) div h_k"))
          .as("est_union"))
    est.join(exact, "pd")
      .select(col("pd").as("day"), col("k_union"), col("k_both"),
        col("est_jaccard_bp"), col("jaccard_bp"), col("est_union"),
        col("n_union"), col("n_both"))
      .orderBy("day")
  }

  /** Sliding-window aggregation (1h windows every 30min) — the batch
    * mirror of the streaming `window()` operator. */
  private def qEventsSlidingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,2)")) * lit(100)).cast("long")
          .as("total_value_x100"))
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        col("window.end").cast("timestamp_ntz").as("w_end"),
        col("event_type"), col("n"), col("total_value_x100"))
      .orderBy("w_start", "event_type")

  /** Inverted-index construction over the top-30 vocabulary: per
    * token, document frequency plus the first 20 posting doc_ids.
    * Scale shape: df is a plain keyed count (map-side partials — the
    * cheap part even for stopwords); the posting LIST is the skew
    * hazard, so it is bounded BEFORE any list materializes — a
    * row_number ≤ 20 rank per token plans as WindowGroupLimit and each
    * map task ships at most 20 rows per token into the exchange. A
    * full production index writes postings bucketed by (token,
    * doc-range) so a stopword's list spans tasks; the bounded slice
    * here is that same discipline in miniature. Postings emit as a
    * comma-joined string (the repo's array-output convention — arrays
    * canonicalize differently across engines, strings don't). */
  private def qTextPostingLists(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(30).select("token")
    val dt = toks.join(broadcast(vocab), Seq("token"), "left_semi")
      .select(col("token"), col("doc_id")).distinct()
    val dfreq = dt.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("token")).orderBy(col("doc_id"))
    val postings = dt.withColumn("rk", row_number().over(w)).where(col("rk") <= 20)
      .groupBy(col("token"))
      .agg(array_join(transform(array_sort(collect_list(col("doc_id"))),
        x => x.cast("string")), ",").as("postings"))
    dfreq.join(postings, "token")
      .select(col("token"), col("df"), col("postings"))
      .orderBy("token")
  }

  /** Event-type transition counts (first-order Markov structure of the
    * event stream): per user, each event pairs with its predecessor
    * via lag over one keyed time-ordered window; the (from, to) counts
    * aggregate map-side. The in-window order (ts, event_id) is unique,
    * so transitions are deterministic on both engines. One shuffle on
    * user_id, a 25-row result — the shape survives any event volume. */
  private def qEventsTransitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("from_type", lag(col("event_type"), 1).over(w))
      .where(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  private def qTextFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Text.fingerprint(col("text")).as("fingerprint"),
        Text.rollingHash(col("text")).as("rolling_hash"),
        Text.bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  // ------------------------------------------------------------- dedup

  /** Memoized MinHash-LSH near-dup pair graph over the `documents`
    * table at `dir` (default parameters). Five registered queries
    * consume this exact frame (`dedup_minhash`, both cluster paths,
    * `split_contamination`, `corpus_dedup_keep_best`); at 100 TB the
    * pair graph is the expensive artifact of the whole dedup family,
    * and recomputing it per downstream consumer is the scale-killer —
    * the production shape is "write the pair table once, every
    * consumer scans it". [[graft.ops.AnnCache]] is the single-JVM
    * analog: first caller pays the shingle→band→verify pipeline
    * (shingles persisted across its two internal consumers), the
    * localCheckpoint pin survives inter-query cache hygiene, and the
    * memo dies with the SparkContext. */
  private def dedupPairs(s: SparkSession, dir: String): DataFrame =
    graft.ops.AnnCache.memo(s, s"dedup-pairs:$dir") {
      graft.ops.AnnCache.pin(
        Dedup.minhashNearDups(Tables.documents(s, dir), col("text"), col("doc_id"),
          shingles = Some(docShingles(s, dir))))
    }

  /** Memoized distinct 3-shingle table over the documents at `dir` —
    * the shared RAW artifact one level below [[dedupPairs]]: the
    * MinHash pair graph, the PPJoin prefix filter, and the containment
    * channel all start from the identical (doc_id, shingle) set, and
    * tokenize+explode+distinct over the corpus is the part that scales
    * with the DATA (everything after it scales with candidates). The
    * production shape at 100 TB is "write the shingle table once,
    * bucketed by shingle; every dedup channel scans it" —
    * [[graft.ops.AnnCache]]'s pin is the single-JVM analog, and unlike
    * the old per-operator `persist`, it survives the inter-query
    * `clearCache` hygiene Verify/Bench run. */
  private def docShingles(s: SparkSession, dir: String): DataFrame =
    graft.ops.AnnCache.memo(s, s"shingles3:$dir") {
      graft.ops.AnnCache.pin(
        Text.distinctShingles(Tables.documents(s, dir), col("text"), col("doc_id"), 3))
    }

  /** Memoized rarest-first ranking scaffold over [[docShingles]]
    * ([[graft.ops.Dedup.rankShingles]]) — threshold-independent, so
    * the Jaccard prefix filter and the containment prefix channel
    * both read ONE pinned (doc_id, shingle, f, rn, n) table instead
    * of each paying the freq group-by + join + doc-keyed window
    * pass. */
  private def docShinglesRanked(s: SparkSession, dir: String): DataFrame =
    graft.ops.AnnCache.memo(s, s"shingles3-ranked:$dir") {
      graft.ops.AnnCache.pin(Dedup.rankShingles(docShingles(s, dir)))
    }

  /** Memoized connected-component labels over [[dedupPairs]]
    * (label-propagation fixpoint). Shared by `dedup_clusters` and
    * `corpus_dedup_keep_best` — the keep-best ending is a per-cluster
    * argmax on top of the SAME labeling, so deriving the labels twice
    * would re-run the iterative fixpoint for an identical answer.
    * (`dedup_clusters_star` keeps its own memo below: its point is
    * exercising the structurally different star-contraction fixpoint
    * against the same oracle.) */
  private def dedupComponents(s: SparkSession, dir: String): DataFrame =
    graft.ops.AnnCache.memo(s, s"dedup-comp:$dir") {
      graft.ops.AnnCache.pin(
        graft.ops.Components.connectedComponents(
          dedupPairs(s, dir).select("doc_a", "doc_b")))
    }

  /** [[dedupComponents]]'s Large-Star/Small-Star twin — the same
    * cluster artifact through the O(log² n) fixpoint, memoized under
    * its own key so the build (the honest star cost) runs once per
    * session and every re-read is an index scan, exactly like the
    * label-prop labels and the ANN indexes. */
  private def dedupComponentsStar(s: SparkSession, dir: String): DataFrame =
    graft.ops.AnnCache.memo(s, s"dedup-comp-star:$dir") {
      graft.ops.AnnCache.pin(
        graft.ops.Components.connectedComponentsStar(
          dedupPairs(s, dir).select("doc_a", "doc_b")))
    }

  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(Tables.documents(s, dir), col("text"), col("doc_id"))
      .orderBy("fingerprint")

  private def qDedupMinhash(s: SparkSession, dir: String): DataFrame =
    dedupPairs(s, dir)
      .orderBy("doc_a", "doc_b")

  private def qDedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(Tables.documents(s, dir), col("text"), col("doc_id"))
      .orderBy("doc_id")

  /** Near-dup pairs → dedup CLUSTERS: connected components over the
    * MinHash-LSH pair graph, one row per clustered doc with its
    * canonical survivor (= min doc id in the component) and the
    * cluster size. The oracle recomputes the same fixpoint with a
    * recursive CTE (min reachable id per node) — an independent
    * formulation of the identical semantics. */
  private def qDedupClusters(s: SparkSession, dir: String): DataFrame = {
    val comp = dedupComponents(s, dir)
    val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "comp")
      .select(col("id").as("doc_id"), col("comp").as("rep_doc_id"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  /** [[qDedupClusters]] with the Large-Star/Small-Star formulation
    * ([[graft.ops.Components.connectedComponentsStar]]) — identical
    * cluster semantics through a structurally different fixpoint
    * (star contraction vs label propagation), gated against the SAME
    * recursive-CTE oracle. Covers the deep-component path at driver
    * level; ComponentsSpec covers it at property level. */
  private def qDedupClustersStar(s: SparkSession, dir: String): DataFrame = {
    val comp = dedupComponentsStar(s, dir)
    val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "comp")
      .select(col("id").as("doc_id"), col("comp").as("rep_doc_id"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  /** The depth-adaptive components path
    * ([[graft.ops.Components.connectedComponentsAdaptive]]): label-prop
    * probe, star contraction only if the probe doesn't converge —
    * the production entry point when cluster-graph depth is unknown.
    * On the shallow LSH fixture the probe converges, so this runs the
    * label-prop cost per invocation (deliberately unmemoized: the
    * query demonstrates the selector, not the memo); the deep branch
    * is property-covered in ComponentsSpec. Same fixpoint, same
    * recursive-CTE oracle as both siblings. */
  private def qDedupClustersAdaptive(s: SparkSession, dir: String): DataFrame = {
    val pairs = dedupPairs(s, dir).select("doc_a", "doc_b")
    val comp = graft.ops.Components.connectedComponentsAdaptive(pairs)
    val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
    comp.join(sizes, "comp")
      .select(col("id").as("doc_id"), col("comp").as("rep_doc_id"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  /** PPJoin prefix-filter near-dup pairs
    * ([[graft.ops.Dedup.prefixFilterPairs]]): the EXACT candidate
    * generator — rarest-token prefixes must intersect for any pair at
    * J ≥ 1/2, so unlike the LSH channels there is no probabilistic
    * miss to calibrate. Oracle mirrors the full prefix construction
    * (global token frequencies, per-doc rank, prefix length
    * arithmetic) in SQL. */
  private def qDedupPrefixFilter(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixFilterPairs(Tables.documents(s, dir), col("text"), col("doc_id"),
        shingles = Some(docShingles(s, dir)), // family memo, clearCache-proof
        rankedShingles = Some(docShinglesRanked(s, dir)))
      .orderBy("doc_a", "doc_b")

  /** Count-Min sketch frequency certificates over the exact top-20 —
    * the mergeable point-count sketch completing the family (HLL
    * distinct, GK quantiles, KMV set ops). The sketch is bounded
    * metadata (width × depth counters); estimates for the top-20 keys
    * read driver-side from the collected sketch exactly like PQ's
    * codebook, while the exact audit is a plain aggregate. No
    * portable SQL computes CMS, so the registered output is the
    * CERTIFICATE form: (user_id, n_exact, ok) where `ok` = est ∈
    * [exact, exact + ⌈ε·N⌉] — the CMS overestimate guarantee — as
    * BIGINT; the oracle emits the exact top-20 plus literal 1, so a
    * sketch regression flips `ok` and fails the driver's hash gate.
    * SketchSpec asserts ok across fixtures. */
  /** The exact top-20 user event counts — single source of truth for
    * the CMS audit ([[qEventsCmsCounts]] collects it to probe the
    * sketch) AND the oracle-pinned `events_cms_exact` query, so a
    * fixture drift that moved the top-20 would fail the DuckDB gate
    * rather than silently re-baselining the sketch's bound check. */
  private def cmsExactTop(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id")).limit(20)

  private def qEventsCmsCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val bytes = ev.agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bytes))
    val slack = math.ceil(0.001 * cms.totalCount()).toLong
    val top = cmsExactTop(s, dir).as[(Long, Long)].collect()
    top.map { case (u, n) => (u, n, cms.estimateCount(u)) }.toSeq
      .toDF("user_id", "n_exact", "n_est")
      .select(col("user_id"), col("n_exact"),
        (col("n_est") >= col("n_exact") &&
          col("n_est") <= col("n_exact") + slack).cast("long").as("ok"))
      .orderBy("user_id")
  }

  /** Oracle-pinned exact half of the CMS audit ([[cmsExactTop]]): the
    * top-20 user counts as plain ANSI SQL, so the DuckDB gate owns the
    * truth the sketch's `within_bound` column is checked against.
    * (events_approx_distinct's exact companion is already pinned the
    * same way — `events_distinct_users` uses the identical
    * Skew.distinctCount expression.) */
  private def qEventsCmsExact(s: SparkSession, dir: String): DataFrame =
    cmsExactTop(s, dir).orderBy("user_id")

  /** Manku-style simhash near-dup pairs (banded 60-bit fingerprints,
    * Hamming ≤ 3 verified by exact popcount). */
  private def qDedupSimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(Tables.documents(s, dir), col("text"), col("doc_id"))
      .orderBy("doc_a", "doc_b")

  private def qDedupNgramBlocked(s: SparkSession, dir: String): DataFrame =
    Dedup.blockedJaccard(Tables.documents(s, dir), col("text"), col("doc_id"),
        Seq(), num = 1, den = 2)
      .orderBy("doc_a", "doc_b")

  /** Edit-distance near-dups: character-level variants (typos, OCR
    * noise) that token-level Jaccard under-scores. Length-difference
    * bound prunes before the quadratic distance runs. */
  private def qDedupEditDistance(s: SparkSession, dir: String): DataFrame =
    Dedup.editDistancePairs(Tables.documents(s, dir), col("text"), col("doc_id"),
        maxDist = 20)
      .orderBy("doc_a", "doc_b")

  /** GK-sketch quantiles (`percentile_approx`) next to their exact rank
    * audit, mirroring events_approx_distinct's sketch-plus-audit
    * pattern: the sketch is the 100 TB form (mergeable bounded state,
    * map-side combine), and the audit proves the rank guarantee
    * |rank(approx_p90) − 0.9·n| ≤ n/accuracy. Registered in
    * CERTIFICATE form (sketch internals are engine-specific): the
    * output carries the oracle-computable (n, target_rank) plus the
    * hard verdict `ok` = [rank guarantee held] as BIGINT, mirrored by
    * a literal 1 in the oracle — a sketch regression flips `ok` and
    * fails the driver's hash gate. SketchSpec asserts ok across
    * fixtures; the true p90 itself is pinned by
    * `events_quantiles_exact`. */
  private def qEventsApproxQuantiles(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
    val approx = ev.groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), lit(0.9), lit(100)).as("p90_approx"),
        count(lit(1)).as("n"))
    ev.join(broadcast(approx), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        first(col("p90_approx")).as("p90_approx"),
        sum(when(col("value") <= col("p90_approx"), 1L).otherwise(0L))
          .as("rank_of_approx"))
      .select(col("event_type"), col("n"),
        col("rank_of_approx"),
        expr("(9 * n + 9) DIV 10").as("target_rank"))
      .withColumn("rank_err", abs(col("rank_of_approx") - col("target_rank")))
      .select(col("event_type"), col("n"), col("target_rank"),
        (col("rank_err") <= col("n") / lit(100) + lit(1))
          .cast("long").as("ok"))
      .orderBy("event_type")
  }

  /** Oracle-pinned exact half of the quantile audit: the TRUE p90 per
    * event type (the value at rank ⌈0.9·n⌉ under (value) order,
    * decimal-exact ×100), as plain ANSI SQL — so a fixture drift that
    * moved the distribution fails the DuckDB gate instead of silently
    * re-baselining `events_approx_quantiles`'s in-data rank bound.
    * This is the AUDIT form: the per-type rank window sorts every row
    * of the group, which is exactly the cost the GK sketch exists to
    * avoid at 100 TB — at scale the sketch replaces it and this query
    * drops away (the kmv-churn pattern). */
  private def qEventsQuantilesExact(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("decimal(18,2)").as("v"))
    val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v").asc)
    ev.withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(n), "event_type")
      .where(col("rn") === expr("(9 * n + 9) div 10"))
      .select(col("event_type"), col("n"),
        (col("v") * 100).cast("long").as("p90_x100"),
        col("rn").as("target_rank"))
      .orderBy("event_type")
  }

  /** The documented at-scale swap for `lineitem_profile`'s five exact
    * COUNT(DISTINCT)s, exercised as a registered query: HLL++ sketches
    * (rsd 0.02) computed in ONE aggregate with NO Expand — the 5× row
    * multiplication the exact form pays disappears, leaving a pure
    * partial-combining single scan (plan-guarded in PlanSpec). The
    * exact audit rides five separate single-column two-stage distinct
    * aggregates — each scan column-pruned to one column, partial
    * distinct map-side, never a 5× Expand — and the per-column
    * relative error feeds the hard verdict. Registered in CERTIFICATE
    * form (HLL register layouts are engine-specific, same as
    * events_approx_distinct): (col_name, nd_exact, ok) where `ok` =
    * [|est − exact| ≤ 6% of exact, 3σ at rsd 0.02] as BIGINT,
    * mirrored by a literal 1 in the oracle — a sketch regression
    * flips `ok` and fails the driver's hash gate. SketchSpec asserts
    * ok across fixtures. */
  private def qLineitemProfileApprox(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val cols = Seq("l_discount", "l_extendedprice", "l_quantity",
      "l_returnflag", "l_shipdate")
    val approxAggs = cols.zipWithIndex.map { case (c, i) =>
      approx_count_distinct(col(c), 0.02).as(s"ad_$i") }
    val approx = li.agg(approxAggs.head, approxAggs.tail: _*)
    val exact = cols.zipWithIndex.map { case (c, i) =>
        li.select(col(c)).distinct().agg(count(lit(1)).as(s"nd_$i")) }
      .reduce((a, b) => a.crossJoin(broadcast(b)))
    approx.crossJoin(broadcast(exact))
      .select(expr("stack(5, " + cols.zipWithIndex.map { case (c, i) =>
          s"'$c', nd_$i, ad_$i" }.mkString(", ") +
        ") as (col_name, nd_exact, nd_approx)"))
      .withColumn("err_x10k",
        (abs(col("nd_approx") - col("nd_exact")) * lit(10000) / col("nd_exact"))
          .cast("long"))
      .select(col("col_name"), col("nd_exact"),
        (col("err_x10k") <= 600).cast("long").as("ok"))
      .orderBy("col_name")
  }

  /** Containment near-dups: the near-SUBSET pairs (quoted/embedded
    * docs) a Jaccard threshold drops — inter/min(|A|,|B|) ≥ 0.8 over
    * the same LSH candidate channel. */
  private def qDedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashContainmentDups(Tables.documents(s, dir), col("text"), col("doc_id"),
        shingles = Some(docShingles(s, dir)))
      .orderBy("doc_a", "doc_b")

  /** The containment-COMPLETE channel
    * ([[graft.ops.Dedup.containmentPrefixPairs]]): prefix filtering
    * with the pigeonhole on the smaller set, prefix ⋈ full-table join
    * — closes the LSH containment channel's documented recall caveat
    * (skewed-size near-subset pairs whose Jaccard sits far below the
    * band tuning). Same exact verify tail and threshold as
    * `dedup_containment`; rides the family shingle memo. */
  private def qDedupContainmentPrefix(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPrefixPairs(Tables.documents(s, dir), col("text"), col("doc_id"),
        shingles = Some(docShingles(s, dir)),
        rankedShingles = Some(docShinglesRanked(s, dir)))
      .orderBy("doc_a", "doc_b")

  /** Per-event-type top-5 users by total value: keyed aggregation with
    * map-side partials first, then a rank window over the (already
    * reduced) per-user totals — WindowGroupLimit caps each partition's
    * sort at k, so no group ever globally sorts. */
  private def qEventsUserTopk(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
      .orderBy(col("total_x100").desc, col("user_id").asc)
    Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(SparkEntry.decSumScaled(col("value"), "decimal(18,2)", 100, "total_x100"),
        count(lit(1)).as("n_events"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= 5)
      .select(col("event_type"), col("rk"), col("user_id"),
        col("total_x100"), col("n_events"))
      .orderBy("event_type", "rk")
  }

  /** Per-label embedding norm statistics over the quantized integer
    * norms — the corpus-health check before ANN indexing (a label whose
    * norms collapse or explode poisons cosine buckets). Quantization
    * makes the sums exact and order-independent; one scan, one keyed
    * shuffle of 4-value partials. */
  private def qEmbNormStats(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"),
        graft.ops.Vectors.intNorm2(graft.ops.Vectors.quantize(col("embedding"))).as("n2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("n2")).as("sum_norm2"),
        min(col("n2")).as("min_norm2"), max(col("n2")).as("max_norm2"))
      .orderBy("label")

  /** INT8 QUANTIZATION ERROR AUDIT — the quality report an embedding
    * store produces before committing to int8 serving (the standard
    * 4× compression: per-vector symmetric scale s = max|x|, code
    * c = round(127·x/s)). Everything runs in the repo's exact
    * milli-unit integer space ([[graft.ops.Vectors.quantize]]) so
    * both engines compute the identical rounding: code and
    * reconstruction use round-half-up on NON-NEGATIVE operands
    * ((|q|·254 + s) div 2s and (c·2s + 127) div 254), sidestepping
    * trunc-vs-floor divergence, and the per-dim error |‖q‖ − r| is
    * sign-free because code and reconstruction carry q's sign.
    * Per label: vector count, summed/max absolute reconstruction
    * error, and summed scale (the denominATOR of any relative-error
    * read) — all BIGINT.
    *
    * Scale shape: pure scan-stage HOF arithmetic per vector + one
    * label aggregate; no join, no window, no collect.
    */
  private def qEmbInt8QuantError(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), graft.ops.Vectors.quantize(col("embedding")).as("q"))
      .withColumn("s", expr(
        "greatest(aggregate(q, 0L, (a, x) -> greatest(a, abs(x))), 1L)"))
      .withColumn("errs", expr(
        """transform(q, x -> abs(abs(x) -
          |  (((abs(x) * 254 + s) div (2 * s)) * 2 * s + 127) div 254))"""
          .stripMargin))
      .withColumn("e_sum", expr("aggregate(errs, 0L, (a, x) -> a + x)"))
      .withColumn("e_max", expr("aggregate(errs, 0L, (a, x) -> greatest(a, x))"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("e_sum")).as("sum_err"),
        max(col("e_max")).as("max_err"),
        sum(col("s")).as("sum_scale"))
      .orderBy("label")

  /** Source-balancing repetition factors — the data-mixing step before
    * packing: per source, token mass and the integer upsampling factor
    * epochs_x100 = ceil(100·max_tokens / tokens), capped at 4 epochs
    * (beyond ~4 repeats, repetition stops buying quality — Muennighoff
    * et al., "Scaling data-constrained language models", 2023). Exact
    * integer arithmetic end to end; the corpus-wide max joins back as a
    * broadcast 1-row aggregate, so the whole plan is one keyed shuffle
    * of per-source partials at any corpus size.
    */
  private def qCorpusMixtureEpochs(s: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col("text"))).cast("long")).as("n_tokens"))
    val mx = perSource.agg(max(col("n_tokens")).as("max_tokens"))
    perSource.crossJoin(broadcast(mx))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        least(expr("(100 * max_tokens + n_tokens - 1) div n_tokens"),
          lit(400L)).as("epochs_x100"))
      .orderBy("source")
  }

  /** Corpus-scaled LSH width for the embedding near-dup channel: the
    * smallest b ∈ [8, 24] with 2^b · 8 ≥ n, i.e. mean sign-bucket
    * occupancy pins at ≤ 8 vectors — the same lesson as
    * [[SemdedupCellTarget]]: a FIXED bucket count means bucket size
    * grows ∝ n and the within-bucket pair join grows ∝ n² (the r15
    * sf1 probe caught exactly that shape on the k-means channel).
    * Because [[graft.ops.Vectors.hyperplanes]] draws planes
    * sequentially from a fixed seed, the b-bit bucket is EXACTLY the
    * 24-bit bucket mod 2^b (prefix property, pinned in VectorsSpec),
    * so the DuckDB oracle computes the full 24-bit bucket and masks
    * with the same smallest-power-of-two scalar — engine-identical at
    * any corpus size. At every driver fixture (n ≤ 2000) this is 8,
    * the r14 constant, so gated outputs are byte-identical. */
  private def embeddingLshBits(n: Long): Int =
    Vectors.scaledLshBits(n, minBits = 8, occupancy = 8)

  private def qDedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Dedup.embeddingNearDups(emb, col("embedding"),
        col("vec_id"), bucketBits = embeddingLshBits(emb.count()),
        num = 40, den = 100)
      .orderBy("vec_a", "vec_b")
  }

  /** Capstone composition — the realistic corpus-cleaning pass a
    * training-data pipeline runs end to end: quality gate (drop short /
    * stopword-heavy docs) → exact dedup (canonical min-id survivor per
    * fingerprint) → MinHash-LSH near-dup removal (drop the non-canonical
    * side of every verified J≥0.5 pair) → token counts for the clean
    * corpus. Every stage is one of the already-oracle-checked operators;
    * this query gates their composition.
    */
  private def qCorpusClean(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val quality = docs.select(col("doc_id"), col("text"))
      .where(!Text.isLowQuality(col("text")))
    val keep = quality.select(col("doc_id"), Text.fingerprint(col("text")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // The cleaned base feeds five consumers (the shingle pipeline's
    // four + the final anti-join): without a persist, each one re-runs
    // the scan → quality gate → fingerprint-groupBy → join chain
    // (measured 9.5s vs 3.5s warm at sf0.1). At 100 TB the equivalent
    // move is writing the cleaned corpus out once between stages.
    val base = quality.join(keep, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupIds = Dedup.minhashNearDups(base, col("text"), col("doc_id"),
        persistShingles = true)
      .select(col("doc_b").as("doc_id")).distinct()
    base.join(dupIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  /** As-of join over events: every click picks up the latest signup of
    * the same user at-or-before its timestamp (right side deduped to
    * one row per (user, ts) so the match is deterministic). Oracle uses
    * DuckDB's native ASOF JOIN — an independent implementation of the
    * same semantics. */
  private def qEventsAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val signups = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("signup_event_id"))
    graft.ops.AsOf.asOfJoin(clicks, signups, Seq("user_id"), "ts", "ts",
        Map("signup_event_id" -> "signup_event_id"))
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("asof_ts").cast("timestamp_ntz").as("asof_ts"),
        col("signup_event_id"))
      .orderBy("user_id", "event_id")
  }

  /** Supervised-label generation — the "did an error follow within the
    * horizon" churn/incident label a training pipeline attaches to
    * each purchase: next_err_ts = the user's earliest error event
    * STRICTLY AFTER the purchase (conditional min over the
    * rows-following frame under the (ts, event_id) total order — the
    * forward twin of events_attribution's strictly-preceding carry),
    * label = 1 iff it lands within 7 days. Exactly ONE user-keyed
    * shuffle feeds the window; labeling is embarrassingly parallel
    * across users, and the frame is rows-based on a total order so
    * both engines agree under timestamp ties.
    */
  private def qEventsErrorLabel(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    Tables.events(s, dir)
      .withColumn("next_err_ts",
        min(when(col("event_type") === "error", col("ts"))).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("next_err_ts").cast("timestamp_ntz").as("next_err_ts"),
        (col("next_err_ts").isNotNull &&
          col("next_err_ts") <= col("ts") + expr("INTERVAL 7 DAY"))
          .cast("long").as("label"))
      .orderBy("event_id")
  }

  /** Hash-ring NEGATIVE SAMPLING — the contrastive-training primitive
    * (k non-matching docs per anchor) without an n×k random join or
    * any driver randomness: docs order on a deterministic hash ring
    * (rank = [[graft.ops.Linkage.globalRank]] over (hash(doc_id),
    * doc_id) — the distributed two-pass ranking, NO single-partition
    * global window), and each anchor pairs with the k next ring
    * positions, wrapping. Hash-ordering makes ring neighbors
    * content-uncorrelated (the property negatives need), the ring
    * guarantees every doc serves as a negative exactly k times (no
    * hub oversampling), and everything after the rank is one keyed
    * join. Anchor count n and shift arithmetic stay non-negative
    * integers, so both engines agree exactly.
    */
  private def qCorpusNegativeSamples(s: SparkSession, dir: String): DataFrame = {
    val K = 3
    val ranked = graft.ops.Linkage.globalRank(
        Tables.documents(s, dir).select(col("doc_id"))
          .withColumn("h", graft.ops.Sampling.hashVal(col("doc_id"))),
        col("h"), col("doc_id"))
      .select(col("doc_id"), col("rank"))
    val tot = ranked.agg(max(col("rank")).as("n"))
    ranked.crossJoin(broadcast(tot))
      .select(col("doc_id"), col("rank"), col("n"),
        explode(expr(s"sequence(1, $K)")).as("j"))
      .withColumn("nrank", expr("(rank + j - 1) % n + 1"))
      .join(ranked.select(col("rank").as("nrank"),
        col("doc_id").as("neg_doc_id")), "nrank")
      .where(col("doc_id") =!= col("neg_doc_id"))
      .select(col("doc_id"), col("j").cast("long").as("j"), col("neg_doc_id"))
      .orderBy("doc_id", "j")
  }

  /** AUDIO-codec round-trip certificate — [[qMultimodalImageioCert]]'s
    * discipline on the `javax.sound.sampled` leg: every tenth doc
    * synthesizes a deterministic 16-bit mono WAV (frame count derived
    * from `n_chars`, an alternating-sign ramp seeded by doc_id),
    * encodes and re-decodes it on the executors, and emits the decoded
    * format fields plus `ok` = [rate/frames/channels match AND the
    * loudness envelope extracted]; the oracle re-derives the fields
    * from the same integer arithmetic and pins ok at 1, so a broken
    * WAV encoder/decoder/envelope path fails the driver's hash gate.
    */
  private def qMultimodalAudioCert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val frames = (64 + nc % 256).toInt
        val pcm = new Array[Byte](frames * 2)
        var i = 0
        while (i < frames) {
          val amp = math.min((i + id % 17).toInt * 5, 24000)
          val v = if (i % 2 == 0) amp else -amp
          pcm(2 * i) = (v & 0xff).toByte
          pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
        val baos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
        val rec = Multimodal.MediaRecord(id, "audio/wav", baos.toByteArray)
        val dec = Multimodal.AudioCodec.decode(rec)
        val ok = dec.exists(f =>
          f.width == 8000 && f.height == frames && f.channels == 1) &&
          Multimodal.AudioCodec.envelopeString(rec.payload).exists(_.nonEmpty)
        (id, 8000L, frames.toLong, if (ok) 1L else 0L)
      })
      .toDF("doc_id", "sample_rate", "n_frames", "ok")
      .orderBy("doc_id")
  }

  /** Range join composed with sessionization: click-sessions become
    * intervals; every purchase is matched to the session of the same
    * user whose [start, end] contains it, where end = last click +
    * the 30 min session gap (session-window close semantics — a bare
    * MIN..MAX of clicks is a near-degenerate interval). Bucketed
    * interval join (30min buckets = the gap), oracle = plain BETWEEN
    * join over the same session CTEs. */
  private def qEventsRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val sessions = Sessionize.sessionStats(ev.where(col("event_type") === "click"),
        key = col("user_id"), ts = col("ts"), gapMicros = 1800L * 1000000L,
        valueCol = col("value"), tieBreak = Seq(col("event_id")))
      .select(col("key").as("user_id"), col("session_id"), col("session_start"),
        (col("session_end") + expr("INTERVAL 30 MINUTES")).as("session_end"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    graft.ops.RangeJoin.pointInInterval(purchases, sessions, Seq("user_id"),
        "ts", "session_start", "session_end", bucketMicros = 1800L * 1000000L)
      .select(col("user_id"), col("session_id"), col("event_id"),
        col("ts").cast("timestamp_ntz").as("ts"),
        col("session_start").cast("timestamp_ntz").as("session_start"),
        col("session_end").cast("timestamp_ntz").as("session_end"))
      .orderBy("user_id", "session_id", "event_id")
  }

  /** Deterministic train/val/test split (90/5/5 by id-hash basis
    * points) with per-split-per-language corpus stats — the
    * reproducible-split primitive every training pipeline needs; the
    * oracle recomputes the identical assignment from the same
    * constants. */
  private def qCorpusSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("split", graft.ops.Sampling.assignSplit(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col("text"))).cast("long")).as("n_tokens"))
      .orderBy("split", "lang")

  /** Funnel analysis: per user, first signup → first click at-or-after
    * it → first purchase at-or-after that; one row per funnel stage
    * with the user count that reached it. Three keyed aggregations
    * (conditional mins), no self-joins over raw events. */
  private def qEventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("t_signup"))
    val s2 = ev.join(s1, "user_id")
      .groupBy(col("user_id"), col("t_signup"))
      .agg(min(when(col("event_type") === "click" && col("ts") >= col("t_signup"),
        col("ts"))).as("t_click"))
    val s3 = ev.join(s2, "user_id")
      .groupBy(col("user_id"), col("t_signup"), col("t_click"))
      .agg(min(when(col("event_type") === "purchase" && col("ts") >= col("t_click"),
        col("ts"))).as("t_purchase"))
    s3.agg(
        count(when(col("t_signup").isNotNull, 1)).as("n_signup"),
        count(when(col("t_click").isNotNull, 1)).as("n_click_after"),
        count(when(col("t_purchase").isNotNull, 1)).as("n_purchase_after"))
      .select(expr("stack(3, 'signup', n_signup, 'click_after', n_click_after, " +
        "'purchase_after', n_purchase_after) as (stage, n_users)"))
      .orderBy("stage")
  }

  /** Cohort retention: users grouped by signup week, counted in each
    * later week they were active (any event type). Two keyed
    * aggregations + one keyed join — the classic retention matrix with
    * no per-user driver work. `week_offset` = whole weeks since the
    * cohort week. */
  private def qEventsRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val cohort = ev.where(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val active = ev.select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .distinct()
    active.join(cohort, "user_id")
      .where(col("week") >= col("cohort_week"))
      .groupBy(col("cohort_week").cast("timestamp_ntz").as("cohort_week"),
        floor(datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Vocabulary heavy hitters: top-100 tokens by corpus frequency
    * (explode → one keyed agg with map-side partials → global top-k;
    * ties broken by token so the result is total-order deterministic). */
  private def qTextVocabTopk(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(100)

  /** BPE training's inner statistic: the most frequent adjacent
    * pre-token pairs across the corpus — the pair the next merge round
    * would fuse (Sennrich et al., ACL 2016). Pairing is per-row array
    * arithmetic ([[Text.pairStats]]: the token list zipped against its
    * own shift — no self-join, no window), so the only shuffle is the
    * pair group-by with map-side partials; top-k with a full (n, left,
    * right) tiebreak keeps the result total-order deterministic. */
  private def qTextBpePairs(s: SparkSession, dir: String): DataFrame =
    Text.pairStats(Tables.documents(s, dir), col("text"))
      .orderBy(col("n").desc, col("left").asc, col("right").asc)
      .limit(30)

  /** Decontamination check: near-duplicate pairs (MinHash-LSH, J≥0.5)
    * whose two documents land in DIFFERENT train/val/test splits (the
    * [[Sampling.assignSplit]] assignment) — i.e. eval-set leakage. A
    * training pipeline runs exactly this before shipping a split. */
  private def qSplitContamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val pairs = dedupPairs(s, dir)
    val splits = docs.select(col("doc_id"),
      graft.ops.Sampling.assignSplit(col("doc_id")).as("split"))
    pairs
      .join(splits.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(splits.as("sb"), col("doc_b") === col("sb.doc_id"))
      .where(col("sa.split") =!= col("sb.split"))
      .select(col("doc_a"), col("doc_b"),
        col("sa.split").as("split_a"), col("sb.split").as("split_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** Bloom-filter contamination screen ([[graft.ops.Bloom]]): the test
    * split's content hashes build a 4096-bit filter (ONE bounded
    * aggregation over the SMALL split, ≤128 words collected), and every
    * train doc probes it as a scan-stage expression against the inlined
    * word array — at 100 TB the exact anti-join shuffles every train
    * fingerprint, while this probe never shuffles the corpus at all.
    * The output is the exact confusion table of the sketch against the
    * exact join (bloom_hit × actually-contaminated): false positives
    * are the sketch's documented price, and a (false, true) row can
    * never appear — Bloom filters have no false negatives, so "clean"
    * verdicts are definitive and only flagged docs need the exact
    * recheck. Both engines run the same integer double-hashing, so the
    * table is oracle-exact, FP rows included.
    */
  private def qSplitBloomContamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"),
      graft.ops.Text.rollingHash(col("text")).as("h"),
      graft.ops.Sampling.assignSplit(col("doc_id")).as("split"))
    val test = docs.where(col("split") === "test").select(col("h"))
    val words = graft.ops.Bloom.filterWords(graft.ops.Bloom.build(test, col("h")))
    val testKeys = test.distinct().withColumnRenamed("h", "th")
    docs.where(col("split") === "train")
      .withColumn("bloom_hit", graft.ops.Bloom.hitExpr(col("h"), words))
      .join(broadcast(testKeys), col("h") === col("th"), "left")
      .groupBy(col("bloom_hit"), col("th").isNotNull.as("actual"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bloom_hit", "actual")
  }

  /** Exact duplicated-substring dedup ([[graft.ops.Spans]]): doc pairs
    * sharing a verbatim run of ≥ 20 tokens, with the longest shared
    * span — the Lee et al. ACL'22 signal that set-similarity dedup
    * under-weights (one long quoted block inside two otherwise
    * different docs). Positioned 8-gram diagonals + one
    * gaps-and-islands window; the gram join is keyed by an integer
    * gram hash with a 50-doc boilerplate cap, so the shuffle stays
    * ~|corpus grams| at any scale.
    */
  private def qDedupSubstringSpan(s: SparkSession, dir: String): DataFrame =
    graft.ops.Spans.sharedSpans(Tables.documents(s, dir), col("text"), col("doc_id"))
      .orderBy("doc_a", "doc_b")

  /** SemDeDup (Abbas et al., arXiv:2303.09540): semantic dedup with
    * k-means cells as the blocking structure — embeddings assign to
    * their nearest seed centroid ([[graft.ops.SemanticCluster
    * .seedAssignments]], the oracle-mirrored round-0 labeling), pairs
    * are scored ONLY within a cell (cos ≥ 0.4, the same fused `q_dot`
    * + DECIMAL(38) cross-multiplication as dedup_embedding_cos), and
    * each duplicate group keeps its min-id representative via the
    * connected-components machinery. vs the hyperplane-LSH channel:
    * k-means cells are the SemDeDup paper's trade — k scales with the
    * corpus so cells stay bounded and the within-cell quadratic never
    * exceeds |cell|², while LSH buckets need no training. Emits every
    * vector with its cell and keep verdict.
    *
    * k = max(4, n div [[SemdedupCellTarget]]) — corpus-SCALED, and
    * that scaling is load-bearing: the r15 sf1 probe measured the
    * fixed-k=4 form at wall exponent 1.75 (4.1 s → 229 s for 10×
    * data) because mean cell size grew with n and the within-cell
    * pair join is |cell|²; with k ∝ n the mean cell pins at the
    * target and the pair work scales linearly. The one driver-side
    * count() is bounded model metadata (it sizes the seed literal
    * set the assignment expression inlines anyway). Both engines
    * compute k from the same count, and at every driver fixture
    * (n ≤ 2000) k = 4 — the formula extends the query to big
    * corpora without moving a byte of the gated output.
    */
  private val SemdedupCellTarget = 500L

  private def qEmbSemdedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val qdot = graft.functions.GraftFunctions.registerQDot(s)
    val k = math.max(4L, emb.count() / SemdedupCellTarget)
    val a = graft.ops.SemanticCluster.seedAssignments(emb, col("embedding"),
        col("vec_id"), emb.where(col("vec_id") < k))
      .withColumn("n2", qdot(col("v"), col("v")))
    val pairs = a.as("x").join(a.as("y"),
        col("x.cl") === col("y.cl") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.cl").as("cell"),
        col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        qdot(col("x.v"), col("y.v")).as("dot"),
        col("x.n2").as("n2a"), col("y.n2").as("n2b"))
      .where(col("dot") > 0 &&
        lit(10000L).cast("decimal(38,0)") *
          col("dot").cast("decimal(38,0)") * col("dot").cast("decimal(38,0)") >=
        lit(1600L).cast("decimal(38,0)") *
          col("n2a").cast("decimal(38,0)") * col("n2b").cast("decimal(38,0)"))
      .select(col("cell"), col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    // Components via the blocked one-shuffle form, NOT the iterative
    // loop: SemDeDup pairs exist only WITHIN a cell (the join condition
    // is x.cl = y.cl), so no component crosses a cell and a per-cell
    // local union-find gives the identical min-id labels in a
    // data-independent number of stages. Semantic-dup graphs CHAIN
    // (a≈b≈c without a≈c) — the union-find handles arbitrary chain
    // depth inside the cell, where the r15 probe's label-prop budget
    // could not; and the r16 verdict measured the iterative form at
    // ~93% stage-scheduling overhead (40 stages, 0.1 MB shuffle).
    val comp = graft.ops.Components.componentsWithinGroups(pairs, col("cell"))
    a.select(col("vec_id"), col("cl"))
      .join(comp, col("vec_id") === comp("id"), "left")
      .select(col("vec_id"), col("cl").as("cluster"),
        (col("comp").isNull || col("comp") === col("vec_id")).as("keep"))
      .orderBy("vec_id")
  }

  /** Fixed weight vector for [[qTextClassifierScore]] — stands in for
    * an offline-trained model; single source of truth for BOTH the
    * Spark literal and the SQL mirror so the inference contract (not
    * the training) is what the gate pins. Knuth-hash spread, centered
    * so scores land on both sides of the keep threshold. */
  private val clfWeights: Seq[Long] =
    (0 until 64).map(b => ((b * 2654435761L) % 1009L) - 504L)

  /** Feature-hashed linear classifier inference
    * ([[graft.ops.Text.hashedLinearScore]]): the fastText/CCNet-style
    * quality-filter serving path as a PURE scan-stage projection — the
    * 64-weight vector rides the plan as a literal, each doc's score is
    * one aggregate() HOF over its token array, and no shuffle touches
    * the corpus (the explode→groupBy formulation would shuffle every
    * token at 100 TB for the same answer).
    */
  private def qTextClassifierScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ops.Text.hashedLinearScore(col("text"), clfWeights).as("score"))
      .withColumn("keep", col("score") >= 0L)
      .orderBy("doc_id")

  /** Embedding-outlier screen: the 20 vectors farthest (exact integer
    * squared distance) from their assigned k-means seed centroid —
    * the corrupt-embedding / out-of-distribution detector an index
    * build runs first (a zeroed or garbage vector poisons cosine
    * buckets and recall audits). Rides the SAME seed-assignment frame
    * as SemDeDup (d2 comes free with the argmin); rank-based cut, no
    * magic distance threshold. TakeOrdered top-20, window over 20
    * rows post-cut.
    */
  private def qEmbOutliers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
    graft.ops.SemanticCluster.seedAssignments(emb, col("embedding"),
        col("vec_id"), emb.where(col("vec_id") < 4))
      .select(col("vec_id"), col("cl"), col("d2"))
      .orderBy(col("d2").desc, col("vec_id").asc).limit(20)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("d2").desc, col("vec_id").asc))
          .cast("long"))
      .select(col("rank"), col("vec_id"), col("cl"), col("d2"))
      .orderBy("rank")
  }

  /** Distribution-drift audit between the event stream's first and
    * second half (by day, pivot = exact midpoint of the observed
    * range): per fixed-width value bin, row counts and share deltas
    * in basis points — the monitoring table a PSI/KS drift alarm
    * reads, with the log-free integer form of the comparison (share
    * deltas, not Σ(a−b)·ln(a/b), so both engines agree bit-for-bit).
    * One binning pass + one 16-key aggregate; the date bounds ride one
    * broadcast row, and the half totals are derived FROM the binned
    * aggregate (every in-scope row lands in exactly one bin, so
    * tot_a = Σ n_a) via a window sum over the ≤16-row post-aggregate
    * frame — never a second events pass (plan-guarded in PlanSpec).
    * Divisors clamp to ≥1 in both engines: a single-day fixture puts
    * every event in half A and Spark's non-ANSI `div 0` → NULL where
    * DuckDB's `// 0` raises — the clamp keeps the engines
    * bit-identical under that drift (n_b = 0 forces the share to 0).
    */
  private def qEventsDriftHalves(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .where(col("value").isNotNull)
      .select(to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,2)").as("v"))
    val b = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val wAll = Window.partitionBy(lit(1))
    ev.crossJoin(broadcast(b))
      .withColumn("in_a",
        col("day") <= expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))"))
      // non-negative dividend: a negative value would split the
      // engines on trunc-vs-floor division (none in the fixture, but
      // the guard costs nothing and survives drift)
      .withColumn("bin",
        least(lit(15L), expr("greatest(CAST(v * 100 AS BIGINT), 0L) div 2000")))
      .groupBy("bin")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))
      .withColumn("tot_a", sum(col("n_a")).over(wAll))
      .withColumn("tot_b", sum(col("n_b")).over(wAll))
      .select(col("bin"), col("n_a"), col("n_b"),
        expr("(10000 * n_a) div greatest(tot_a, 1L)").as("share_a_bp"),
        expr("(10000 * n_b) div greatest(tot_b, 1L)").as("share_b_bp"),
        expr("(10000 * n_a) div greatest(tot_a, 1L) - " +
          "(10000 * n_b) div greatest(tot_b, 1L)").as("drift_bp"))
      .orderBy("bin")
  }

  /** CUPED-ADJUSTED EXPERIMENT READOUT (Deng/Xu/Kohavi/Walker,
    * "Improving the Sensitivity of Online Controlled Experiments by
    * Utilizing Pre-Experiment Data", WSDM 2013) — the industry-
    * standard variance reduction `events_ab_test` lacks: each user's
    * post-period conversion metric Y (second-half purchases) is
    * adjusted by their PRE-period covariate X (first-half activity),
    * with θ = cov(X,Y)/var(X) pooled over all users. Everything in
    * exact integers, the `events_autocorr` convention: pooled moment
    * combinations num = n·Σxy − Σx·Σy and den = n·Σxx − (Σx)² stay
    * well inside BIGINT at any fixture scale (counts, not values);
    * θ, both raw mean differences, and the adjusted uplift are basis
    * points via the sign/abs division pattern (non-negative operands
    * only — trunc-vs-floor never splits the engines). The pre/post
    * pivot is `events_drift_halves`' midpoint convention.
    *
    * Scale shape: one user-keyed aggregate over raw events, pinned
    * once for its two consumers (pooled moments + per-variant sums —
    * both 1-row folds). No window, no data-sized join.
    */
  private def qEventsCuped(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
    val b = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val per = ev.crossJoin(broadcast(b))
      .withColumn("in_pre",
        col("day") <= expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("in_pre"), 1L).otherwise(0L)).as("x"),
        sum(when(!col("in_pre") && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("y"))
      .withColumn("variant",
        when(col("user_id") % 2 === 0, "A").otherwise("B"))
      .localCheckpoint(true) // two 1-row consumers below + nothing else
    val mo = per.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    def side(v: String, suf: String) = per.where(col("variant") === v)
      .agg(count(lit(1)).as(s"n_$suf"), sum(col("x")).as(s"sum_x_$suf"),
        sum(col("y")).as(s"sum_y_$suf"))
    side("A", "a").crossJoin(broadcast(side("B", "b")))
      .crossJoin(broadcast(mo))
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("den", expr("n * sxx - sx * sx"))
      .withColumn("theta_bp", expr(
        "CAST(sign(num) * ((10000 * abs(num)) div greatest(den, 1L)) AS BIGINT)"))
      .withColumn("diff_y_bp", expr(
        "(10000 * sum_y_b) div greatest(n_b, 1L) - " +
          "(10000 * sum_y_a) div greatest(n_a, 1L)"))
      .withColumn("diff_x_bp", expr(
        "(10000 * sum_x_b) div greatest(n_b, 1L) - " +
          "(10000 * sum_x_a) div greatest(n_a, 1L)"))
      .withColumn("adj_uplift_bp", expr(
        "diff_y_bp - CAST(sign(theta_bp * diff_x_bp) * " +
          "((abs(theta_bp) * abs(diff_x_bp)) div 10000) AS BIGINT)"))
      .select(col("n_a"), col("n_b"), col("sum_x_a"), col("sum_x_b"),
        col("sum_y_a"), col("sum_y_b"), col("theta_bp"),
        col("diff_y_bp"), col("diff_x_bp"), col("adj_uplift_bp"))
  }

  /** FIRST-touch attribution — the other standard model next to
    * `events_attribution`'s last-touch: each purchase credits the
    * user's EARLIEST touch ever seen before it (`first(touch,
    * ignoreNulls)` over the same strictly-preceding frame). Shipping
    * both models side by side is the point: the fixture makes them
    * visibly disagree, which is the argument attribution reporting
    * actually has to carry. Same single user-keyed shuffle.
    */
  private def qEventsAttributionFirst(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("touch", first(
        when(col("event_type").isin("click", "view", "signup"),
          col("event_type")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("direct")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("revenue_x100"))
      .orderBy("touch_type")
  }

  /** Max concurrent sessions per day — the sweep-line / interval-
    * overlap operator (capacity planning: "how many sessions were
    * open at once?"). Sessions come from the same 30-min-gap
    * gaps-and-islands build as `events_sessionize`; each session's
    * [start, end] interval is split at midnight into per-day segments
    * (`sequence` over its day span — a session is bounded, so the
    * explode fan-out is its day count, not data-sized), then each
    * segment emits a +1/−1 boundary pair and a per-day running sum
    * over (t ASC, delta DESC) sweeps the day. Ordering +1 before −1
    * at equal timestamps makes overlap INCLUSIVE (a session ending
    * exactly when another starts counts as concurrent, and a
    * single-instant session counts as 1). The per-day max is
    * order-invariant under the remaining ties — within an equal
    * (t, delta) block every permutation yields the same prefix-sum
    * set — so the result is engine- and partitioning-exact.
    *
    * Scale shape: one user-keyed shuffle (sessionize), then the
    * HOT-DAY-SAFE two-pass sweep ([[graft.ops.Intervals
    * .maxConcurrentPerDay]]): running sums inside (day, hour-bucket)
    * partitions + per-bucket offsets from a day-keyed window over the
    * ≤ 25-row bucket summary — no day-wide single task anywhere, so a
    * skewed day at 100 TB fans across its hours. Identical output to
    * the single-sweep form (offset + local run = global run;
    * FrontierAnalyticsSpec pins it against brute force on a
    * one-hot-day fixture, PlanSpec pins the partition spec).
    */
  private def qEventsConcurrency(s: SparkSession, dir: String): DataFrame = {
    val sess = Sessionize.withSessionId(Tables.events(s, dir),
        col("user_id"), col("ts"), gapMicros = 1800L * 1000000L,
        tieBreak = Seq(col("event_id")))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
    val segs = sess
      .select(col("t0"), col("t1"),
        explode(sequence(to_date(col("t0")), to_date(col("t1")))).as("day"))
      .select(col("day"),
        greatest(col("t0"), col("day").cast("timestamp")).as("seg_start"),
        least(col("t1"), date_add(col("day"), 1).cast("timestamp")).as("seg_end"))
    // both boundaries explode from ONE seg row — a union of two segs
    // branches would rebuild the whole sessionize subtree (two scans,
    // two user-keyed shuffles) since Spark doesn't dedup subtrees
    val bounds = segs
      .select(col("day"), explode(array(
        struct(col("seg_start").as("t"), lit(1L).as("delta")),
        struct(col("seg_end").as("t"), lit(-1L).as("delta")))).as("b"))
      .select(col("day"), col("b.t").as("t"), col("b.delta").as("delta"))
    graft.ops.Intervals.maxConcurrentPerDay(bounds)
      .select(col("day"), col("max_concurrent"),
        (col("n_bounds") / 2).cast("long").as("n_active_sessions"))
      .orderBy("day")
  }

  /** Conjunctive (boolean AND) retrieval — the inverted-index probe
    * next to `text_posting_lists`' index build: documents containing
    * ALL query terms, scored by total query-term frequency. The plan
    * IS the classic distributed posting intersection: explode to
    * (doc, term) postings, filter to the (tiny, literal) query
    * vocabulary IN THE SCAN STAGE — so the shuffle carries only
    * candidate postings, Σ df(term) rows, never the corpus — then a
    * two-level aggregate: per-(doc, term) tf first, per-doc term
    * count + tf sum second. The two-level form exists to avoid
    * COUNT(DISTINCT)'s Expand: both aggregates partial map-side, and
    * `n_terms = |terms|` is the intersection test. At 100 TB shuffle
    * volume is the posting lists of the query terms — the same cost
    * a dedicated search engine pays to read them.
    */
  private def qTextConjunctive(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("dup", "spark", "merge")
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("tf_total"))
      .where(col("n_terms") === terms.size)
      .select(col("doc_id"), col("tf_total"))
      .orderBy("doc_id")
  }

  /** χ² FEATURE SELECTION — top-20 terms most associated with the
    * `lang = 'en'` document class (Manning/Raghavan/Schütze, "IntroIR"
    * §13.5: χ² term selection for text classifiers; the corpus-level
    * companion to `text_classifier_score`'s serving pass). Per term
    * the 2×2 presence contingency (a, b, c, d) folds into
    * `χ²·10⁴ = 10⁴·N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`, all exact
    * integers in DECIMAL(38,0)/HUGEINT so the oracle hash-pins it.
    * Integer-exactness envelope: the numerator needs
    * 10⁴·N·(ad−bc)² ≤ 10³⁸, which holds to corpora of ~10⁶ labeled
    * docs — the regime feature selection actually runs in (a labeled
    * SAMPLE, not the raw 100 TB corpus); past that the same plan
    * emits a double score.
    *
    * Scale shape: per-doc distinct terms dedup IN THE SCAN
    * (`array_distinct` before the explode — no shuffle-wide
    * distinct), one term-keyed aggregate, the 1-row class totals
    * broadcast back, and the global top-20 is a TakeOrdered, never a
    * sort of the vocabulary.
    */
  private def qTextChi2Terms(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), (col("lang") === "en").as("cls"), col("text"))
    val tot = d.agg(sum(when(col("cls"), 1L).otherwise(0L)).as("n1"),
      count(lit(1)).as("nn"))
    d.select(col("cls"),
        explode(array_distinct(Text.tokens(col("text")))).as("term"))
      .groupBy(col("term"))
      .agg(sum(when(col("cls"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("cls"), 1L).otherwise(0L)).as("b"))
      .crossJoin(broadcast(tot))
      .select(col("term"), col("a"), col("b"),
        (col("n1") - col("a")).as("c"),
        (col("nn") - col("n1") - col("b")).as("d"), col("nn"))
      .withColumn("chi2_bp", expr(
        """CAST((10000 * CAST(nn AS DECIMAL(38,0))
          |  * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)
          |  * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c))
          | div greatest(CAST(a + b AS DECIMAL(38,0)) * (c + d)
          |              * (a + c) * (b + d), 1) AS BIGINT)""".stripMargin))
      .orderBy(col("chi2_bp").desc, col("term").asc)
      .limit(20)
      .select(col("term"), col("a").as("n_en_with"),
        col("b").as("n_other_with"), col("chi2_bp"))
  }

  /** k-hop reachability ([[graft.ops.Graph.bfsHops]], 3 levels) from
    * the deterministic seed cohort `user_id % 7 = 0` over the shared
    * co-presence graph — the influence-radius / blast-radius query
    * (which users are within 3 collaboration hops of the cohort?).
    * Emits (user_id, dist) with dist = exact minimum hop count; the
    * fixture discriminates all four levels at sf0.01. Seeds are all
    * event users, not just graph nodes, so isolated seeds surface at
    * dist 0 instead of vanishing. The oracle mirrors the level loop
    * as chained CTEs — deliberately NOT WITH RECURSIVE, which
    * enumerates paths (Σ deg^h) where the level form carries node
    * sets (see [[graft.ops.Graph.bfsHopsSql]]).
    */
  private def qEventsBfsReach(s: SparkSession, dir: String): DataFrame = {
    val seeds = Tables.events(s, dir)
      .select(col("user_id").as("v")).where(col("v") % 7 === 0).distinct()
    graft.ops.Graph.bfsHops(coPresenceEdges(s, dir), seeds, maxHops = 3)
      .select(col("v").as("user_id"), col("dist"))
      .orderBy("user_id")
  }

  /** TIME-RESPECTING diffusion reach ([[graft.ops.Graph
    * .temporalReach]], 3 hops) from the same `user_id % 7 = 0` seed
    * cohort over the TIMESTAMPED co-presence contacts — the
    * information-diffusion / contamination-spread query plain BFS
    * answers wrongly: a contact that happened BEFORE a user was
    * reached cannot spread, so edge times along a path must be
    * non-decreasing and the first hop departs at-or-after the seed's
    * own first appearance. Emits each reached user's earliest
    * possible arrival hour; the fixture discriminates (temporal reach
    * ⊂ static reach, and some arrivals realize through LONGER paths
    * that depart earlier — pinned in FrontierAnalyticsSpec). Oracle
    * mirrors the Bellman-Ford rounds as chained CTEs relaxing the
    * full arrival table (same ≤ 3-hop fixed point, frontier-free).
    */
  private def qEventsTemporalReach(s: SparkSession, dir: String): DataFrame = {
    val seeds = Tables.events(s, dir).where(col("user_id") % 7 === 0)
      .groupBy(col("user_id"))
      .agg(min(date_trunc("hour", col("ts"))).as("t0"))
      .select(col("user_id").as("v"), col("t0"))
    graft.ops.Graph.temporalReach(temporalEdges(s, dir), seeds, maxHops = 3)
      .select(col("v").as("user_id"),
        col("arr").cast("timestamp_ntz").as("arr_hour"))
      .orderBy("user_id")
  }

  /** CHEAPEST-REACH cost ([[graft.ops.Graph.cheapestPaths]], 3 hops)
    * from the `user_id % 7 = 0` cohort over STRENGTH-WEIGHTED
    * co-presence ties — the weighted member of the reach family
    * (hops → bfs_reach, time → temporal_reach, cost → this): tie
    * cost is `ceil(100 / ns)` for ns shared cells, so frequent
    * contacts are cheap to traverse and the minimal summed cost is
    * the diffusion-resistance distance. Integer weights end-to-end;
    * the ns ≥ 2 floor keeps one-off collisions out of the graph.
    * Oracle mirrors the Bellman-Ford rounds as chained CTEs (full
    * relaxation — same ≤ 3-hop fixed point).
    */
  private def qEventsCheapestReach(s: SparkSession, dir: String): DataFrame = {
    val capped = cappedCells(s, dir).select(col("cell"), col("user_id"))
    val wed = capped.select(col("cell"), col("user_id").as("a"))
      .join(capped.select(col("cell"), col("user_id").as("b")), "cell")
      .where(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("ns"))
      .where(col("ns") >= 2)
      .select(col("a"), col("b"), expr("(100 + ns - 1) div ns").as("w"))
    val seeds = Tables.events(s, dir)
      .select(col("user_id").as("v")).where(col("v") % 7 === 0).distinct()
    graft.ops.Graph.cheapestPaths(wed, seeds, maxHops = 3)
      .select(col("v").as("user_id"), col("dist").as("cost"))
      .orderBy("user_id")
  }

  /** Time-weighted average value per event type (TWAP /
    * last-observation-carried-forward): each reading holds until the
    * type's NEXT reading, so the mean weights every value by its
    * holding duration in seconds — the correct average for
    * irregularly-sampled series (a plain AVG over-weights bursts; the
    * fixture's burst pattern makes the two visibly diverge). Exact
    * integers throughout: value in cents, weight in whole seconds,
    * `twap_x100 = Σ(v·w) div Σw` with the non-negative-dividend clamp
    * and the weighted sum in DECIMAL(38,0) (cents × seconds × rows
    * crosses 2^63 at ~10¹⁰ row-seconds). The span's LAST reading has
    * no successor and drops from the weighting (standard LOCF-over-
    * observed-span contract; `n_open` reports how many).
    *
    * Scale shape: ONE shuffle (hash by event_type) feeds the lead
    * window and the per-type fold — same single-exchange discipline
    * as events_attribution; no global window, no self-join.
    */
  private def qEventsTwap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("ts"), col("event_id"),
        greatest((col("value").cast("decimal(18,2)") * 100).cast("long"),
          lit(0L)).as("v"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .withColumn("wsec",
        when(col("next_ts").isNotNull,
          unix_timestamp(col("next_ts")) - unix_timestamp(col("ts"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_readings"),
        sum(when(col("wsec").isNull, 1L).otherwise(0L)).as("n_open"),
        // coalesce: a type with a single (open) reading sums NULL, and
        // the engines disagree on greatest(NULL, 1) — clamp to 0 here
        // so the division clamp below sees a real number in both
        coalesce(sum(col("wsec")), lit(0L)).as("total_sec"),
        coalesce(sum(col("v") * col("wsec").cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("vw"),
        sum(col("v")).as("sv"))
      .select(col("event_type"), col("n_readings"), col("n_open"),
        col("total_sec"),
        expr("CAST(vw div greatest(CAST(total_sec AS DECIMAL(38,0)), 1) " +
          "AS BIGINT)").as("twap_x100"),
        // integer division, not AVG: a float mean would round vs
        // truncate differently across engines
        expr("sv div n_readings").as("naive_mean_x100"))
      .orderBy("event_type")
  }

  /** Binned two-sample Kolmogorov–Smirnov drift statistic — the
    * CUMULATIVE companion of `events_drift_halves` (same midpoint
    * split, same 16 value bins, same clamps): per bin the cumulative
    * share of each half in basis points, their signed gap, and the KS
    * statistic (max absolute gap) carried on every row. PSI-style
    * per-bin deltas catch level shifts; the KS max-gap catches a
    * DISTRIBUTIONAL shift that no single bin dominates. Same
    * non-negative-dividend discipline — cumulative counts are
    * monotone non-negative, so trunc-vs-floor division can never
    * split the engines.
    *
    * Scale shape: identical to the drift audit — one events scan into
    * a 16-key aggregate; every window (cumsum, totals, the max gap)
    * sits on the 16-row binned frame.
    */
  private def qEventsDriftKs(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .where(col("value").isNotNull)
      .select(to_date(col("ts")).as("day"),
        col("value").cast("decimal(18,2)").as("v"))
    val b = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val wAll = Window.partitionBy(lit(1))
    val wCum = wAll.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.crossJoin(broadcast(b))
      .withColumn("in_a",
        col("day") <= expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))"))
      .withColumn("bin",
        least(lit(15L), expr("greatest(CAST(v * 100 AS BIGINT), 0L) div 2000")))
      .groupBy("bin")
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("n_b"))
      .withColumn("cum_a", sum(col("n_a")).over(wCum))
      .withColumn("cum_b", sum(col("n_b")).over(wCum))
      .withColumn("tot_a", sum(col("n_a")).over(wAll))
      .withColumn("tot_b", sum(col("n_b")).over(wAll))
      .withColumn("cum_share_a_bp",
        expr("(10000 * cum_a) div greatest(tot_a, 1L)"))
      .withColumn("cum_share_b_bp",
        expr("(10000 * cum_b) div greatest(tot_b, 1L)"))
      .withColumn("gap_bp", col("cum_share_a_bp") - col("cum_share_b_bp"))
      .withColumn("ks_bp", max(abs(col("gap_bp"))).over(wAll))
      .select(col("bin"), col("n_a"), col("n_b"), col("cum_share_a_bp"),
        col("cum_share_b_bp"), col("gap_bp"), col("ks_bp"))
      .orderBy("bin")
  }

  /** Gini concentration / Lorenz-curve audit of customer lifetime
    * revenue — the inequality statistic a marketplace-health or
    * data-balance report leads with, in EXACT integers: customers
    * rank ascending by revenue (zero-order customers included at 0 —
    * concentration among buyers only would understate it), and
    * G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) emits in basis points with
    * the rank-weighted sum widened to DECIMAL(38,0) (i·x crosses 2^63
    * near 10⁹ customers × cents). Chebyshev's sum inequality makes
    * the dividend non-negative, so trunc-vs-floor agree.
    *
    * Scale shape: the revenue rollup is one orders shuffle; the
    * ascending rank rides [[graft.ops.Linkage.globalRank]] (range
    * repartition + per-partition offsets — no single-partition
    * window over customers), and the final fold is ONE aggregate row.
    */
  private def qCustomerGini(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .as("x"))
    val base = Tables.customer(s, dir).select(col("c_custkey"))
      .join(rev, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("x"), lit(0L)).as("x"))
    graft.ops.Linkage.globalRank(base, col("x"), col("c_custkey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("x")).as("total_x100"),
        sum(col("rank").cast("decimal(38,0)") * col("x")).as("ix"))
      .select(col("n_customers"), col("total_x100"),
        expr("""CAST((10000 * (2 * ix - (n_customers + 1)
                * CAST(total_x100 AS DECIMAL(38,0))))
                div greatest(CAST(n_customers AS DECIMAL(38,0))
                * total_x100, 1) AS BIGINT)""").as("gini_bp"))
  }

  /** Global EQUI-DEPTH histogram (ntile(16)) of event value in exact
    * cents — the statistics-collection primitive every cost-based
    * optimizer and data-profiling pass builds (equi-depth beats
    * equi-width under skew: every bucket carries the same row count,
    * so bucket WIDTH is the density signal). Bucket boundaries are
    * engine-exact: ranks come from the deterministic total order
    * (value, event_id) and SQL ntile's uneven-split rule (first
    * N mod k buckets hold one extra row) is reproduced in integer
    * arithmetic from the rank, so the DuckDB `ntile` mirror matches
    * hash-for-hash.
    *
    * Scale shape: the rank rides [[graft.ops.Linkage.globalRank]]
    * (range repartition + per-partition offsets — NO single-partition
    * window over the data), the 1-row total broadcasts back, and the
    * bucket rollup is one keyed aggregate. The classic naive form —
    * `ntile(16) OVER (ORDER BY v)` — funnels the table through one
    * task at 100 TB; this is its distributed equivalent, exactly.
    */
  private def qEventsEquidepth(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val base = Tables.events(s, dir)
      .where(col("value").isNotNull)
      .select((col("value").cast("decimal(18,2)") * 100).cast("long").as("v"),
        col("event_id"))
    val ranked = graft.ops.Linkage.globalRank(base, col("v"), col("event_id"))
    val tot = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(tot))
      // ntile(k): q = n div k, r = n mod k; buckets 1..r hold q+1 rows
      // (greatest guards the n < k corner where the ELSE divisor would
      // be zero — the branch is unreachable there, but neither engine
      // should be asked to prove that)
      .withColumn("bucket",
        expr(s"""CASE WHEN rank <= (n % $k) * (n div $k + 1)
                 THEN (rank - 1) div (n div $k + 1) + 1
                 ELSE (n % $k) + (rank - 1 - (n % $k) * (n div $k + 1))
                      div greatest(n div $k, 1) + 1 END"""))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_values"),
        min(col("v")).as("lo_x100"), max(col("v")).as("hi_x100"))
      .orderBy("bucket")
  }

  /** Exact WEIGHTED percentiles (p25/p50/p75) of lineitem price,
    * weighted by quantity — the robust pricing statistic ("half the
    * UNITS sold sit at-or-below this price", which a row-median
    * misstates whenever cheap items ship in bulk). The crossing rule
    * is the standard left-continuous weighted quantile: the first
    * value in (price, orderkey, linenumber) total order whose
    * cumulative weight reaches ⌈k·W/100⌉. Exact integers end to end
    * (price in cents, weights whole units, ceil as (a+b−1) div b).
    *
    * Scale shape: the cumulative weight rides
    * [[graft.ops.Linkage.globalRunningSum]] — range repartition +
    * per-partition running sums + broadcast offsets, NO
    * single-partition window over the data (the naive
    * `SUM OVER (ORDER BY price)` form is exactly the one-task funnel
    * this primitive exists to kill); the three crossing rows come out
    * of one scan-stage filter against the broadcast 1-row total.
    */
  private def qLineitemWeightedPrice(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("price_x100"),
        col("l_quantity").cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val cum = graft.ops.Linkage.globalRunningSum(base, col("w"),
      col("price_x100"), col("l_orderkey"), col("l_linenumber"))
    val tot = cum.agg(max(col("cum")).as("total"))
    cum.crossJoin(broadcast(tot))
      .select(col("price_x100"), col("w"), col("cum"), col("total"),
        explode(expr("array(25, 50, 75)")).as("pct"))
      .where(expr("cum >= (pct * total + 99) div 100") &&
        expr("cum - w < (pct * total + 99) div 100"))
      .groupBy(col("pct").cast("long").as("pct"))
      // cum is strictly increasing (w >= 1), so exactly one row
      // crosses each target; min is a semantic no-op kept for
      // partition-exactness under any future zero-weight input
      .agg(min(col("price_x100")).as("price_x100"),
        min(col("total")).as("total_units"))
      .orderBy("pct")
  }

  /** CUSUM changepoint monitor (Page, Biometrika 1954) on the daily
    * event-count series — the sequential alarm a pipeline health
    * check runs over ingest volume (a level shift trips the alarm
    * within days even when each single day stays inside its own
    * noise band). Exact integer form, log-free and division-free:
    * deviations are scaled by the day count D so the mean never
    * becomes a fraction (`dev_d = n_d·D − N`, zero-sum by
    * construction), and the one-sided resets ride the prefix-extrema
    * identity — `CUSUM⁺_d = S_d − min(0, min_{j≤d} S_j)` for the
    * running sum S — instead of the recursive max(0, ·) fold, which
    * no window function expresses directly. Alarm thresholds at 2·N
    * scaled units ≈ two mean-days of accumulated excess.
    *
    * Scale shape: ONE shuffle for the daily aggregate; the cumsum /
    * running-extrema windows and the (N, D) scalar all sit on the
    * ≤|days| post-aggregate frame (the parts_abc_analysis rule:
    * global windows only on dimension-sized frames). No division
    * anywhere, so trunc-vs-floor can never split the engines.
    */
  private def qEventsCusum(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val scalar = daily.agg(sum(col("n")).as("total"), count(lit(1)).as("d"))
    val wCum = Window.partitionBy(lit(1)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(scalar))
      .withColumn("dev", col("n") * col("d") - col("total"))
      .withColumn("s_run", sum(col("dev")).over(wCum))
      .withColumn("cusum_pos",
        col("s_run") - least(lit(0L), min(col("s_run")).over(wCum)))
      .withColumn("cusum_neg",
        greatest(lit(0L), max(col("s_run")).over(wCum)) - col("s_run"))
      .select(col("day"), col("n"), col("dev"),
        col("cusum_pos"), col("cusum_neg"),
        (col("cusum_pos") > lit(2L) * col("total")).as("alarm_hi"),
        (col("cusum_neg") > lit(2L) * col("total")).as("alarm_lo"))
      .orderBy("day")
  }

  /** Half-life-decayed engagement score per user — the recency
    * weighting a freshness-aware sampler or engagement ranker uses
    * (yesterday's event counts double tomorrow's). The decay is
    * EXACT dyadic arithmetic: each event contributes
    * `v_x100 div 2^age_days` (half-life = 1 day), the power riding a
    * bigint shift capped at 40 (beyond that the contribution is 0 at
    * any representable value — the cap bounds the shift, it never
    * changes a result). Dividends clamp non-negative so trunc-vs-
    * floor division can never split the engines under fixture drift.
    *
    * Scale shape: the corpus max-day is a 1-row scan-level aggregate
    * broadcast into the scan stage; contributions are per-row
    * projections folded by ONE user-keyed partial-agg shuffle —
    * per-event division before the sum keeps the fold order-free.
    */
  private def qEventsDecayScore(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .where(col("value").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        greatest((col("value").cast("decimal(18,2)") * 100).cast("long"), lit(0L))
          .as("v_x100"))
    val last = ev.agg(max(col("day")).as("d1"))
    ev.crossJoin(broadcast(last))
      .withColumn("age", datediff(col("d1"), col("day")).cast("long"))
      .withColumn("contrib", expr(
        "v_x100 div shiftleft(CAST(1 AS BIGINT), CAST(least(age, 40) AS INT))"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("v_x100")).as("raw_x100"),
        sum(col("contrib")).as("decayed_x100"))
      .orderBy("user_id")
  }

  /** 2-D SKYLINE / Pareto frontier (Börzsönyi, Kossmann & Stocker,
    * "The Skyline Operator", ICDE 2001) over part's (price ↓, size ↑):
    * the points no other part beats on both axes — the
    * cheapest-for-at-least-this-size frontier. Points collapse to
    * per-price maxima first (a same-price smaller size is dominated;
    * equal (price, size) duplicates survive together as one point
    * with n_parts > 1); a point survives iff its size strictly
    * exceeds every size at any strictly lower price.
    *
    * Scale shape — the two-phase partitioned skyline (the
    * distributed-skyline literature's partition-then-merge): phase 1
    * computes LOCAL prefix maxima inside price-bucket partitions
    * (window partitioned by bucket — a keyed sort, never global);
    * phase 2 broadcasts the per-bucket max-size summary (ONE row per
    * bucket, dimension-sized by construction), prefix-maxes it on the
    * tiny frame, and each row compares against its own bucket's local
    * prefix max AND all lower buckets' global max. The only global
    * window in the plan sits on the |buckets|-row summary. The oracle
    * is the independent quadratic NOT-EXISTS dominance formulation.
    */
  private def qPartSkyline(s: SparkSession, dir: String): DataFrame =
    graft.ops.Skyline.frontier2d(Tables.part(s, dir),
        col("p_retailprice"), col("p_size"))
      .select(col("x").as("price"), col("y").cast("long").as("size"),
        col("n_rows").as("n_parts"))
      .orderBy("price")

  /** Lag-k AUTOCORRELATION audit (k = 1..7) of the daily event-count
    * series — the seasonality probe run before trusting any
    * day-over-day drift number (a strong lag-7 says the weekday cycle,
    * not drift, explains the movement). Pearson over calendar-lagged
    * pairs in EXACT integers: per lag, num = n·Σxy − Σx·Σy and the
    * two variance legs den_x/den_y publish as bigints, and the signed
    * effect size r²_bp = sign(num) · (10⁴·num²) div (den_x·den_y)
    * rides DECIMAL(38,0) (num² alone crosses 2^63 at ~3000 daily
    * events over a year) with greatest(·,1) clamps so a constant
    * series yields 0, not an engine-split division.
    *
    * Scale shape: ONE shuffle for the daily aggregate; the lag join
    * explodes the ≤|days| frame 7× and self-joins BROADCAST on the
    * lagged calendar day — every post-aggregate frame is
    * dimension-sized, the 100 TB cost is the daily group-by alone.
    */
  private def qEventsAutocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint(true) // both sides of the lag join + nothing else
    val lagged = daily
      .withColumn("k", explode(expr("sequence(1, 7)")))
      .withColumn("day_k", date_add(col("day"), col("k")))
      .select(col("k"), col("day_k"), col("x").as("x_t"))
    val pairs = lagged.join(broadcast(daily.select(
        col("day").as("day_k"), col("x").as("x_k"))), Seq("day_k"))
    pairs.groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x_t")).as("sx"), sum(col("x_k")).as("sy"),
        sum(col("x_t") * col("x_t")).as("sxx"),
        sum(col("x_k") * col("x_k")).as("syy"),
        sum(col("x_t") * col("x_k")).as("sxy"))
      .select(col("k").cast("long").as("k"), col("n_pairs"),
        (col("n_pairs") * col("sxy") - col("sx") * col("sy")).as("num"),
        (col("n_pairs") * col("sxx") - col("sx") * col("sx")).as("den_x"),
        (col("n_pairs") * col("syy") - col("sy") * col("sy")).as("den_y"))
      .withColumn("r2_bp", expr(
        """CAST(sign(num) * ((10000 * CAST(num AS DECIMAL(38,0)) * num)
          | div greatest(CAST(den_x AS DECIMAL(38,0)) * den_y, 1)) AS BIGINT)"""
          .stripMargin))
      .orderBy("k")
  }

  /** DEGREE ASSORTATIVITY of the co-presence graph (Newman,
    * "Assortative mixing in networks", PRL 2002): the Pearson
    * correlation of endpoint degrees over all directed edge instances
    * — positive = hubs befriend hubs (social mixing), negative =
    * hub-and-spoke. The REGISTERED query emits only the two
    * BIGINT-representable columns — `m` (edge-instance count) and the
    * signed `r_bp_signed` effect size — because the raw moment
    * combinations (num, den_x, den_y) genuinely need 128-bit-class
    * integers: Spark spells that DECIMAL(38,0), DuckDB spells it
    * HUGEINT, and the driver's typed hash encodes those two
    * representations differently EVEN WHEN the values are identical
    * (the r15 red row — values verified equal at sf0.001/0.01/0.1,
    * hash still split on type). The moments stay fully gated:
    * [[assortativityMoments]] keeps the 5-column form and
    * FrontierAnalyticsSpec pins num/den_x/den_y against a driver-side
    * BigInt graph rebuild, plus den_x = den_y (the symmetrization
    * invariant). Inside the computation the moments still ride
    * DECIMAL(38,0)/HUGEINT end to end (m·Σxy alone crosses 2⁶³ at
    * ~10⁷ edge instances of ~10³ degrees, and a wrapped long would
    * corrupt them SILENTLY on the Spark side while DuckDB errored —
    * the worst kind of split). The bp ratio is the LINEAR num/den
    * form of [[graft.ops.Graph.assortativityRbpSql]] — symmetrization
    * makes den_x = den_y so r needs no square at all and the widest
    * intermediate (10000·|num|) is exact to |num| ≤ ~10³⁴ on both
    * engines.
    *
    * Scale shape: one degree aggregate over the pinned edge table,
    * two keyed joins carrying only (endpoint, degree), one 1-row
    * moment fold. No window, no collect.
    */
  private def qEventsAssortativity(s: SparkSession, dir: String): DataFrame =
    assortativityMoments(s, dir).select(col("m"), col("r_bp_signed"))

  /** Full 5-column moment form of [[qEventsAssortativity]] — m plus
    * the exact DECIMAL(38,0) moment combinations and the bp ratio.
    * Spec-gated (FrontierAnalyticsSpec) rather than driver-gated
    * because DECIMAL(38,0) and DuckDB HUGEINT hash differently under
    * the driver's typed compare even at equal values. */
  private[graft] def assortativityMoments(s: SparkSession, dir: String): DataFrame = {
    val e = coPresenceEdges(s, dir)
    val sym = e.unionAll(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a")).agg(count(lit(1)).as("d"))
    sym
      .join(deg.select(col("a"), col("d").as("dx")), "a")
      .join(deg.select(col("a").as("b"), col("d").as("dy")), "b")
      .agg(count(lit(1)).as("m"),
        sum(col("dx").cast("decimal(38,0)")).as("sx"),
        sum(col("dy").cast("decimal(38,0)")).as("sy"),
        sum(col("dx").cast("decimal(38,0)") * col("dx")).as("sxx"),
        sum(col("dy").cast("decimal(38,0)") * col("dy")).as("syy"),
        sum(col("dx").cast("decimal(38,0)") * col("dy")).as("sxy"))
      .select(col("m"),
        expr("CAST(m AS DECIMAL(38,0)) * sxy - sx * sy")
          .cast("decimal(38,0)").as("num"),
        expr("CAST(m AS DECIMAL(38,0)) * sxx - sx * sx")
          .cast("decimal(38,0)").as("den_x"),
        expr("CAST(m AS DECIMAL(38,0)) * syy - sy * sy")
          .cast("decimal(38,0)").as("den_y"))
      .withColumn("r_bp_signed",
        expr(graft.ops.Graph.assortativityRbpSql("div")))
  }

  /** LAST-TOUCH ATTRIBUTION — each purchase credits the user's most
    * recent preceding touch event (click / view / signup; purchases
    * and errors are not touches), the standard product-analytics
    * attribution model; purchases with no prior touch credit
    * 'direct'. The carry is `last(touch, ignoreNulls)` over the
    * strictly-preceding rows frame ordered by (ts, event_id) — the
    * conditional last-value idiom both engines implement natively —
    * and revenue lands in exact cents.
    *
    * Scale shape: ONE shuffle (hash by user_id) feeds the window —
    * attribution is embarrassingly parallel across users — then a
    * 4-row channel aggregate. No global window, no self-join.
    */
  private def qEventsAttribution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("touch", last(
        when(col("event_type").isin("click", "view", "signup"),
          col("event_type")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("direct")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
          .as("revenue_x100"))
      .orderBy("touch_type")
  }

  /** Time-BOUND funnel — `events_funnel` with conversion windows,
    * the form product analytics actually ships (a purchase three
    * weeks after the click is not attribution): each stage must land
    * within 3 days of the previous stage's timestamp (a horizon the
    * fixture discriminates: 15 -> 11 -> 8 users at sf0.001, where an
    * unwindowed funnel converts all 15). Same
    * three-conditional-min shape (no self-join over raw events — each
    * pass joins the per-user stage table, dimension-sized, back to
    * one events scan), the window constraint rides inside the
    * conditional. Timestamp-interval arithmetic is engine-exact.
    */
  private def qEventsFunnelWindowed(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts"))).as("t_signup"))
    val s2 = ev.join(s1, "user_id")
      .groupBy(col("user_id"), col("t_signup"))
      .agg(min(when(col("event_type") === "click" &&
        col("ts") >= col("t_signup") &&
        col("ts") <= col("t_signup") + expr("INTERVAL 3 DAY"),
        col("ts"))).as("t_click"))
    val s3 = ev.join(s2, "user_id")
      .groupBy(col("user_id"), col("t_signup"), col("t_click"))
      .agg(min(when(col("event_type") === "purchase" &&
        col("ts") >= col("t_click") &&
        col("ts") <= col("t_click") + expr("INTERVAL 3 DAY"),
        col("ts"))).as("t_purchase"))
    s3.agg(
        count(when(col("t_signup").isNotNull, 1)).as("n_signup"),
        count(when(col("t_click").isNotNull, 1)).as("n_click_3d"),
        count(when(col("t_purchase").isNotNull, 1)).as("n_purchase_3d"))
      .select(expr("stack(3, 'signup', n_signup, 'click_3d', n_click_3d, " +
        "'purchase_3d', n_purchase_3d) as (stage, n_users)"))
      .orderBy("stage")
  }

  /** Token-budget recipe sampler — the Dolma/RedPajama "data recipe"
    * operator: each source contributes documents up to a fixed token
    * budget, selected as the PREFIX of the source's deterministic
    * hash-priority order (cumulative tokens ≤ budget; the running sum
    * is monotone along the order, so the filter IS a prefix — no
    * driver-side greedy loop). One source-keyed window shuffle, the
    * sanctioned per-group shape (the window never sees more than one
    * source's docs per task); emits each selected doc with its rank
    * and running total so downstream mixtures consume the selection
    * directly.
    */
  private def qCorpusTokenBudget(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val budget = 20000L
    val w = Window.partitionBy(col("source"))
      .orderBy(graft.ops.Sampling.bucket(col("doc_id")).asc, col("doc_id").asc)
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("cum_tokens",
        sum(col("n_tok")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .where(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("rk"), col("n_tok"),
        col("cum_tokens"))
      .orderBy("doc_id")
  }

  /** Winsorization / robust clipping — the feature-engineering
    * operator that tames heavy-tailed numeric columns before
    * training: per event type, values clip to the exact [p1, p99]
    * rank bounds (the same ⌈q·n⌉ rank arithmetic as
    * events_quantiles_exact, both bounds read from ONE window pass
    * via conditional aggregates), and the query emits per-type
    * clipped-tail counts and the clipped decimal sum. The per-type
    * rank window is the audit-grade exact form; at 100 TB the GK
    * sketch supplies the bounds and the clip itself stays a
    * scan-stage projection against the broadcast bounds row.
    */
  private def qEventsWinsorize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("decimal(18,2)").as("v"))
    val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v").asc)
    val bounds = ev.withColumn("rn", row_number().over(w).cast("long"))
      .join(broadcast(n), "event_type")
      .groupBy("event_type")
      .agg(min(when(col("rn") === expr("(n + 99) div 100"), col("v"))).as("p1"),
        min(when(col("rn") === expr("(99 * n + 99) div 100"), col("v"))).as("p99"))
    ev.join(broadcast(bounds), "event_type")
      .select(col("event_type"),
        greatest(col("p1"), least(col("p99"), col("v"))).as("cv"),
        (col("v") < col("p1")).as("lo"), (col("v") > col("p99")).as("hi"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("hi"), 1L).otherwise(0L)).as("n_clipped_hi"),
        (sum(col("cv")) * 100).cast("long").as("clipped_sum_x100"))
      .orderBy("event_type")
  }

  /** Sketch-served winsorize — the 100 TB form [[qEventsWinsorize]]'s
    * scaladoc promises: the [p1, p99] bounds come from the GK sketch
    * (`percentile_approx`: mergeable bounded state, map-side combine —
    * no per-type rank window anywhere in the plan, guarded by
    * SketchSpec), and the clip is a scan-stage projection against the
    * broadcast 1-row-per-type bounds frame. Payload matches the exact
    * form; the audit pins the GK rank guarantee: each clipped tail
    * can hold at most ⌈n/100⌉ + n/accuracy + 1 rows (the exact tail
    * size plus the sketch's worst-case rank slack). Registered in
    * CERTIFICATE form (sketch-derived bounds are engine-specific):
    * the output carries the oracle-computable group count plus the
    * hard verdict `ok` = [both tails within the GK cap] as BIGINT,
    * mirrored by a literal 1 in the oracle — a sketch regression
    * flips `ok` and fails the driver's hash gate, the
    * events_approx_quantiles pattern. The winsorized payload itself
    * is pinned by the exact twin `events_winsorize`.
    */
  private def qEventsWinsorizeApprox(s: SparkSession, dir: String): DataFrame = {
    val acc = 100
    val ev = Tables.events(s, dir)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("decimal(18,2)").as("v"))
    val bounds = ev.groupBy("event_type")
      .agg(percentile_approx(col("v"), lit(0.01), lit(acc)).as("p1"),
        percentile_approx(col("v"), lit(0.99), lit(acc)).as("p99"),
        count(lit(1)).as("n"))
    val tailCap = expr(s"(n + 99) div 100") + col("n") / lit(acc) + lit(1)
    ev.join(broadcast(bounds), "event_type")
      .select(col("event_type"), col("n"),
        greatest(col("p1"), least(col("p99"), col("v"))).as("cv"),
        (col("v") < col("p1")).as("lo"), (col("v") > col("p99")).as("hi"))
      .groupBy("event_type")
      .agg(first(col("n")).as("n"),
        sum(when(col("lo"), 1L).otherwise(0L)).as("n_clipped_lo"),
        sum(when(col("hi"), 1L).otherwise(0L)).as("n_clipped_hi"))
      .select(col("event_type"), col("n"),
        (col("n_clipped_lo") <= tailCap && col("n_clipped_hi") <= tailCap)
          .cast("long").as("ok"))
      .orderBy("event_type")
  }

  /** Tokenizer-vocabulary coverage audit: per-doc out-of-vocabulary
    * rate against the corpus's own top-100 token vocabulary — the
    * health check run before committing to a tokenizer (a rising OOV
    * tail means the vocab under-fits the mixture). The vocabulary is
    * a bounded driver collect (top-100 by (count desc, term) — a
    * total order), then serving is a PURE scan-stage projection: each
    * doc counts its non-vocab tokens with one filter() HOF against
    * the literal array, zero shuffles after the vocab build (the
    * classifier-serving pattern; the explode + anti-join spelling
    * would shuffle every token). */
  private def qTextOovRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 1)
    val vocab = docs.select(explode(col("tk")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(100)
      .select(col("t")).as[String].collect().toSeq
    // membership probe is array_contains against ONE literal array —
    // the isin spelling expands to a |vocab|-branch IN per token
    // (O(|vocab|) per probe and a 100-arm codegen'd comparison chain);
    // array_contains keeps the per-token cost a single array walk and
    // the serving plan stays a zero-exchange scan projection
    val vocabArr = array(vocab.map(lit): _*)
    docs
      .select(col("doc_id"), size(col("tk")).cast("long").as("n_tokens"),
        size(filter(col("tk"), t => !array_contains(vocabArr, t)))
          .cast("long").as("n_oov"))
      .withColumn("oov_bp", expr("(10000 * n_oov) div n_tokens"))
      .orderBy("doc_id")
  }

  /** Overlapping retrieval chunking — the RAG indexing shape (32-token
    * windows, stride 16, 50% overlap, the LangChain/LlamaIndex default
    * family): each doc yields ⌈(n−W)/S⌉+1 windows, the final window
    * clamped to the doc end, emitted as (chunk_idx, start_tok, n_tok,
    * chunk_md5) — the md5 stands in for the chunk payload so the gate
    * pins identity without hauling text. Pure scan-stage
    * sequence+slice+posexplode like the chunk-dedup splitter; zero
    * shuffles before the output sort.
    */
  private def qCorpusRagChunks(s: SparkSession, dir: String): DataFrame = {
    val W = 32; val S = 16
    Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 1)
      .withColumn("nc", expr(
        s"CASE WHEN size(tk) <= $W THEN 0 ELSE (size(tk) - $W + ${S - 1}) div $S END"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), col("nc")), i =>
          struct((i * S + 1).as("start_tok"),
            least(size(col("tk")) - i * S, lit(W)).as("n_tok"),
            md5(array_join(slice(col("tk"), i * S + lit(1), lit(W)), " "))
              .as("chunk_md5")))))
      .select(col("doc_id"), col("pos").cast("long").as("chunk_idx"),
        col("col.start_tok").cast("long").as("start_tok"),
        col("col.n_tok").cast("long").as("n_tok"),
        col("col.chunk_md5").as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** MMR diversity re-rank over the query-0 retrieval shortlist
    * ([[graft.ops.Similarity.mmrRerank]]): top-20 by exact integer
    * dot, then 5 greedy λ=1/2 MMR picks — the near-dup-suppressing
    * context-window selection RAG serving needs after ANN retrieval.
    * The greedy loop runs driver-side over the bounded shortlist (the
    * PQ-codebook pattern); the oracle replays the identical fold as a
    * generated CTE chain. */
  private def qSimMmrRerank(s: SparkSession, dir: String): DataFrame =
    graft.ops.Similarity.mmrRerank(Tables.embeddings(s, dir), col("embedding"),
        col("vec_id"), queryId = 0L, shortlist = 20, k = 5)
      .orderBy("rank")

  /** Hybrid retrieval with Reciprocal Rank Fusion (Cormack, Clarke &
    * Buettcher, SIGIR 2009) — the standard RAG serving pattern: a
    * lexical channel (integer BM25 top-20 on the literal query terms)
    * and a dense channel (exact integer-dot top-20 for the query
    * embedding, doc_id ≡ vec_id in the fixture) fuse by
    * `Σ 1e6 div (60 + rank)` — RRF's 1/(k₀+r) at scale 10⁶ in pure
    * integer division, so the fused ORDER is engine-exact (no float
    * reciprocal crosses the compare). A doc absent from a channel
    * contributes 0 (rank 0 encodes absence in the output).
    *
    * Scale shape: each channel is its existing one-scan serving plan
    * (BM25: zero-join scan + TakeOrdered; dense: brute/ANN top-k);
    * the fusion then runs on two ≤20-row frames — full-outer join,
    * score, top-10 — bounded by the channel k's, never corpus-sized,
    * and the global row_number windows sit on post-limit frames only.
    */
  private def qSimHybridRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
    val dense = Similarity.topKBruteForce(
        emb.where(col("vec_id") =!= 0), emb.where(col("vec_id") === 0),
        col("embedding"), col("vec_id"), k = 20)
      .select(col("vec_id").as("doc_id"), col("rnk").cast("long").as("dense_rank"))
    val lex = graft.ops.Retrieval.bm25TopK(Tables.documents(s, dir),
        col("text"), col("doc_id"), bm25Terms, 20)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("lex_rank"))
    val fused = lex.join(dense, Seq("doc_id"), "full_outer")
      .na.fill(0L, Seq("lex_rank", "dense_rank"))
      .withColumn("rrf_x1e6",
        when(col("lex_rank") > 0, expr("1000000 div (60 + lex_rank)"))
          .otherwise(0L) +
        when(col("dense_rank") > 0, expr("1000000 div (60 + dense_rank)"))
          .otherwise(0L))
      .orderBy(col("rrf_x1e6").desc, col("doc_id"))
      .limit(10)
    fused
      .withColumn("fused_rank", row_number()
        .over(Window.orderBy(col("rrf_x1e6").desc, col("doc_id"))).cast("long"))
      .select(col("fused_rank"), col("doc_id"), col("lex_rank"),
        col("dense_rank"), col("rrf_x1e6"))
      .orderBy("fused_rank")
  }

  /** Leakage-safe split assignment — the decontamination-CORRECT
    * split: every doc gets the split of its near-dup CLUSTER
    * representative (min id in the pair-graph component; singletons
    * represent themselves), so a near-dup pair can never straddle
    * train/test — the failure mode `split_contamination` exists to
    * MEASURE becomes impossible by construction (the doc-level hash
    * split treats near-identical docs as independent coins; cluster-
    * level assignment is the fix GPT-3/PaLM-style decontamination
    * approximates after the fact by deleting eval look-alikes).
    * Rides the memoized pair graph + components; one left join plus
    * the same scan-stage id-hash split as corpus_split, keyed on the
    * representative. */
  private def qCorpusLeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    val comp = dedupComponents(s, dir)
    Tables.documents(s, dir).select(col("doc_id"))
      .join(comp, col("doc_id") === comp("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("rep_doc_id"))
      .withColumn("split", graft.ops.Sampling.assignSplit(col("rep_doc_id")))
      .orderBy("doc_id")
  }

  /** Skip-gram co-occurrence pairs (Mikolov et al. 2013's word2vec
    * training-pair generation; also the GloVe co-occurrence-matrix
    * builder): every (center, context) token pair within a ±2 window,
    * counted corpus-wide, top-30 by (count desc, center, context) —
    * a total order, so the cut is engine-exact. Pair generation is
    * scan-stage zip_with over shifted slices — one zipped array per
    * (offset, direction), the same machinery as text_collocations
    * (an earlier nested sequence+filter+transform spelling built a
    * fresh offset array PER TOKEN POSITION and measured 24 s at
    * sf0.1 against 0.6 s for this form — per-position array
    * allocation is the scan-stage analog of the token self-join this
    * operator exists to avoid); shuffle volume is the DISTINCT pair
    * vocabulary, map-side combined, and the top-30 runs as
    * TakeOrderedAndProject.
    */
  private def qTextSkipgramPairs(s: SparkSession, dir: String): DataFrame = {
    val tk = col("tk")
    def shiftPairs(d: Int, fwd: Boolean) = {
      val left = slice(tk, lit(1), size(tk) - d)
      val right = slice(tk, lit(d + 1), size(tk) - d)
      val zipped =
        if (fwd) zip_with(left, right, (a, b) => struct(a.as("c"), b.as("x")))
        else zip_with(right, left, (a, b) => struct(a.as("c"), b.as("x")))
      when(size(tk) > d, zipped)
        .otherwise(array().cast("array<struct<c:string,x:string>>"))
    }
    val pairs = concat(
      shiftPairs(1, fwd = true), shiftPairs(1, fwd = false),
      shiftPairs(2, fwd = true), shiftPairs(2, fwd = false))
    Tables.documents(s, dir)
      .select(Text.tokens(col("text")).as("tk"))
      .select(explode(pairs).as("p"))
      .groupBy(col("p.c").as("center"), col("p.x").as("context"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("center"), col("context"))
      .limit(30)
  }

  /** Zipf-law corpus-health audit: for the top-30 terms by frequency,
    * emit rank r, frequency f(r), and the cross-multiplied Zipf ratio
    * zipf_bp = 10000·f(r)·r div f(1) — exactly 10000 for a perfectly
    * Zipfian corpus, so systematic drift flags synthetic/templated
    * text (machine-generated corpora flatten the head) without any
    * float log-log fit. The (f desc, term) order is total, so ranks
    * are engine-exact. One token count group-by (map-side combined) +
    * TakeOrderedAndProject top-30 + one broadcast f(1) scalar — the
    * corpus never shuffles more than its distinct vocabulary.
    */
  private def qTextZipfAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = Tables.documents(s, dir)
      .select(explode(Text.tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("term")).limit(30)
    // the window runs over 30 rows (post-limit), not the vocabulary
    val ranked = tf.withColumn("rank",
      row_number().over(Window.orderBy(col("f").desc, col("term"))).cast("long"))
    val top1 = ranked.where(col("rank") === 1).select(col("f").as("f1"))
    ranked.crossJoin(broadcast(top1))
      // DECIMAL(38,0): 10⁴·f·rank crosses 2^63 once f passes ~3·10¹⁴
      // token occurrences — the quotient is ≤ 10⁴·rank, safely BIGINT
      .select(col("rank"), col("term"), col("f"),
        expr("CAST((10000 * CAST(f AS DECIMAL(38,0)) * rank) div f1 AS BIGINT)")
          .as("zipf_bp"))
      .orderBy("rank")
  }

  /** Classifier CALIBRATION audit — the reliability-diagram table the
    * governance family was missing: per fixed-width score bin, how
    * often does the rule-based quality gate ([[Text.isLowQuality]],
    * standing in for held-out labels) disagree with the learned
    * filter? A well-calibrated filter shows low_rate_bp falling
    * monotonically with the bin; a flat table means the classifier
    * ranks noise. Bins are LITERAL edges applied scan-stage (the
    * production calibration shape) — never an ntile over the corpus,
    * which would be a global sort; the +16384 shift keeps the `div`
    * operands non-negative, where Spark's truncating div and DuckDB's
    * flooring `//` agree. One scan, one 16-key aggregate.
    */
  private def qTextClfCalibration(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(graft.ops.Text.hashedLinearScore(col("text"), clfWeights).as("score"),
        Text.isLowQuality(col("text")).as("lq"))
      // the dividend clamps non-negative BEFORE the division: a score
      // below −2¹⁴ would otherwise make Spark's truncating div and
      // DuckDB's flooring // disagree by one bin (the fixture's min is
      // −11.8k today, but score magnitude grows with doc length —
      // exactly the drift-unsafe class the r11 ADVICE flagged)
      .withColumn("bin",
        least(expr("greatest(score + 16384, 0L) div 2000"), lit(15L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lq"), 1L).otherwise(0L)).as("n_low_quality"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
      .withColumn("low_rate_bp", expr("(10000 * n_low_quality) div n_docs"))
      .orderBy("bin")

  /** Corpus-LM commonness score — the integer-exact stand-in for
    * KenLM-style perplexity filtering: score each doc by the mean
    * corpus frequency of its bigram OCCURRENCES (multiplicity kept —
    * a doc repeating a rare bigram stays rare). Log-probabilities
    * can't be engine-exact, raw counts can: rank order matches the
    * unigram-normalized LM on this statistic, and the quotient rides
    * integer `div`. Two keyed shuffles total (corpus bigram count,
    * per-doc fold) — the canonical count-then-join LM shape that
    * scales to any corpus because nothing ever leaves the bigram/doc
    * key spaces.
    */
  private def qTextBigramLm(s: SparkSession, dir: String): DataFrame = {
    val bi = Tables.documents(s, dir)
      .select(col("doc_id"), graft.ops.Text.tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bigram"))
    val counts = bi.groupBy("bigram").agg(count(lit(1)).as("bn"))
    bi.join(counts, "bigram")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(bn) div count(1)").as("commonness"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition quality signals per document (bigram
    * duplicate/top fractions in basis points). */
  private def qTextRepetition(s: SparkSession, dir: String): DataFrame =
    Text.repetitionStats(Tables.documents(s, dir), col("text"), col("doc_id"))
      .orderBy("doc_id")

  /** Per-language deterministic down/up-weighting — the data-mixture
    * primitive (e.g. downsample English, keep all French). Strata
    * absent from the rate map (here: zh) are dropped entirely. */
  private val strataRates = Map("de" -> 5000, "en" -> 2500, "es" -> 5000, "fr" -> 10000)
  private def qCorpusStratified(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .where(graft.ops.Sampling.stratifiedSample(col("doc_id"), col("lang"), strataRates))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Text.tokens(col("text"))).cast("long")).as("n_tokens"))
      .orderBy("lang")

  /** Per-source document cap (the Common-Crawl-style "no domain may
    * dominate the corpus" downsampler): each source keeps at most 30
    * docs, selected by the deterministic id-hash so the kept subsample
    * is uniform, stable under re-runs/repartitioning/corpus growth,
    * and SQL-mirrorable. WindowGroupLimit pre-reduces each map task to
    * its local top-30 per source before the shuffle (PlanSpec pins
    * it) — shuffle volume ∝ sources × cap at any corpus size. */
  private def qCorpusSourceCap(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.capPerGroup(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        col("source"), col("doc_id"), cap = 30)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy("doc_id")

  /** Quality-tiered mixture sampling — the curation step that keeps
    * high-quality text at full rate and down-weights the rest instead
    * of hard-dropping it (low tier keeps 10%, mid 50%, high 100%).
    * Tiering reuses the corpus_clean quality gate; the keep decision
    * is the deterministic id-hash stratified sample, so the mixture is
    * reproducible and SQL-mirrorable. Pure scan-stage arithmetic: zero
    * shuffles before the 3-group aggregate. */
  private def qCorpusQualityMixture(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(Text.tokens(col("text"))).cast("long")
    val tier = when(Text.isLowQuality(col("text")), "low")
      .when(nTok >= 60, "high").otherwise("mid")
    val rates = Map("high" -> 10000, "mid" -> 5000, "low" -> 1000)
    Tables.documents(s, dir)
      .select(col("doc_id"), nTok.as("n_tokens"), tier.as("tier"))
      .withColumn("kept",
        graft.ops.Sampling.stratifiedSample(col("doc_id"), col("tier"), rates))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .orderBy("tier")
  }

  /** Concat-and-chunk sequence packing into 2048-token context windows,
    * sharded by language; per-pack doc/token/straddler counts. */
  private def qCorpusPack(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      size(Text.tokens(col("text"))).cast("long").as("n_tokens"))
    graft.ops.Pack.packStats(docs, col("lang"), col("doc_id"), col("n_tokens"),
        budget = 2048L)
      .select(col("grp").as("lang"), col("pack_id"), col("n_docs"),
        col("n_tokens"), col("n_straddling"))
      .orderBy("lang", "pack_id")
  }

  /** FOLDED-PAIR context packing — the other packing discipline next
    * to `corpus_pack`'s concat-and-chunk: docs rank by (tokens desc,
    * id) on the distributed [[graft.ops.Linkage.globalRank]], and
    * rank i pairs with rank n+1−i — the classic fold that puts the
    * longest doc with the shortest (near-optimal for 2-per-bin
    * packing, and unlike first-fit-decreasing it is ORDER-FREE:
    * deterministic, engine-exact, one keyed join, no sequential bin
    * state anywhere). Emits per pair the two docs, combined tokens,
    * whether the 2048 window holds them, and the fill rate — the
    * padding-waste audit a training-data pipeline runs before
    * committing to a packing recipe. Odd corpus → the middle rank
    * pairs with itself (doc_b null, its own tokens).
    */
  private def qCorpusFoldedPacking(s: SparkSession, dir: String): DataFrame = {
    val ranked = graft.ops.Linkage.globalRank(
        Tables.documents(s, dir)
          .select(col("doc_id"),
            size(Text.tokens(col("text"))).cast("long").as("n_tok")),
        col("n_tok").desc, col("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("rank"))
    val tot = ranked.agg(max(col("rank")).as("n"))
    val lo = ranked.crossJoin(broadcast(tot))
      .where(col("rank") * 2 <= col("n") + 1)
      .select(col("rank").as("pair_id"), col("doc_id").as("doc_a"),
        col("n_tok").as("tok_a"), (col("n") + 1 - col("rank")).as("prank"))
    val hi = ranked.select(col("rank").as("prank"),
      col("doc_id").as("doc_b"), col("n_tok").as("tok_b"))
    lo.join(hi, Seq("prank"))
      .select(col("pair_id"), col("doc_a"),
        when(col("doc_b") =!= col("doc_a"), col("doc_b")).as("doc_b"),
        (col("tok_a") + when(col("doc_b") =!= col("doc_a"), col("tok_b"))
          .otherwise(0L)).as("pair_tokens"))
      .withColumn("fits", (col("pair_tokens") <= 2048L).cast("long"))
      .withColumn("fill_bp",
        expr("least(10000L, (10000 * pair_tokens) div 2048)"))
      .orderBy("pair_id")
  }

  /** A/B experiment readout in exact integers — the experimentation
    * primitive next to the funnel/retention family: users split by the
    * deterministic id parity (the fixture carries no assignment
    * column, and parity IS how a hash-bucketed assignment behaves),
    * conversion = the user ever purchased; per variant the user and
    * converter counts with the conversion rate in basis points, plus
    * the uplift of B over A cross-multiplied to avoid any division
    * asymmetry. One distinct-user aggregate feeds everything; no
    * window, no self-join.
    */
  private def qEventsAbTest(s: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("converted"))
      .withColumn("variant",
        when(pmod(col("user_id"), lit(2)) === 0, "A").otherwise("B"))
    // pinned: the 2-row variant frame feeds itself plus BOTH 1-row
    // uplift sides — unpinned, each branch re-runs the per-user fold
    // from the raw scan (3 scans of events; PlanSpec pins 0 scans in
    // the final plan, i.e. every branch reads this materialization)
    val per = users.groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      .withColumn("conv_bp", expr("(10000 * n_conv) div n_users"))
      .localCheckpoint(true)
    // uplift of B over A in bp of A's rate: (convB·nA − convA·nB)
    // scaled — exact integers, both engines truncate identically on
    // the non-negative clamp
    val a = per.where(col("variant") === "A")
      .select(col("n_users").as("na"), col("n_conv").as("ca"))
    val b = per.where(col("variant") === "B")
      .select(col("n_users").as("nb"), col("n_conv").as("cb"))
    per.crossJoin(broadcast(a)).crossJoin(broadcast(b))
      .select(col("variant"), col("n_users"), col("n_conv"), col("conv_bp"),
        expr("CAST(sign(cb * na - ca * nb) AS BIGINT)").as("uplift_sign"),
        expr("(10000 * abs(cb * na - ca * nb)) div greatest(ca * nb, 1)")
          .as("uplift_abs_bp"))
      .orderBy("variant")
  }

  /** Seasonal-naive forecast BACKTEST — the baseline every capacity /
    * anomaly forecast must beat before it ships (predict each day's
    * event count by the count 7 days earlier), scored over the
    * fixture's own history: per event type the days scored, the total
    * absolute error, and WAPE in basis points (Σ|actual − pred| /
    * Σactual — the weighted form that doesn't explode on quiet days).
    * Exact integers end to end; the daily frame is pinned because the
    * backtest joins it to its own 7-day shift (unpinned, the scan +
    * daily aggregate would run twice).
    *
    * Scale shape: one (type, day) aggregate over the raw events, then
    * everything operates on the dimension-sized daily table — the
    * join and the final fold never touch raw data again.
    */
  private def qEventsForecastBaseline(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    daily.join(
        daily.select(col("event_type"), date_add(col("day"), 7).as("day"),
          col("n").as("pred")),
        Seq("event_type", "day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col("n") - col("pred"))).cast("long").as("sum_abs_err"),
        sum(col("n")).cast("long").as("sum_actual"))
      .withColumn("wape_bp",
        expr("(10000 * sum_abs_err) div greatest(sum_actual, 1L)"))
      .orderBy("event_type")
  }

  /** LAG FEATURE TABLE — the per-entity calendar-lag features every
    * tabular training pipeline materializes from an event log: for
    * each (user, active day), the day's event count, the CALENDAR
    * lag-1 and lag-7 counts (0 when the user was inactive that day —
    * a keyed self-join on day−k, not a positional lag() over observed
    * rows, which would silently skip gaps), and the trailing 7-day
    * total via a RANGE window over integer day numbers (frame by
    * calendar distance, so gaps shrink the window instead of
    * stretching it).
    *
    * Scale shape: one (user, day) aggregate over raw events, then
    * everything is user-keyed — two keyed self-joins carrying only
    * (user, day, n) and one user-partitioned range window. No global
    * window, no collect.
    */
  private def qEventsLagFeatures(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("d", datediff(col("day"), lit("1970-01-01")))
      .localCheckpoint(true) // three consumers below + nothing else
    def lagged(k: Int, as: String) = daily.select(col("user_id"),
      (col("d") + k).as("d"), col("n").as(as))
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rangeBetween(-6, 0)
    daily
      .join(lagged(1, "n_lag1"), Seq("user_id", "d"), "left")
      .join(lagged(7, "n_lag7"), Seq("user_id", "d"), "left")
      .withColumn("n_lag1", coalesce(col("n_lag1"), lit(0L)))
      .withColumn("n_lag7", coalesce(col("n_lag7"), lit(0L)))
      .withColumn("n_7d", sum(col("n")).over(w))
      .select(col("user_id"), col("day"), col("n"), col("n_lag1"),
        col("n_lag7"), col("n_7d"))
      .orderBy("user_id", "day")
  }

  /** Term-weighting inputs: per-doc term frequency (docs 0-24) × corpus
    * document frequency, restricted to the top-30 vocabulary. The float
    * tf-idf weight itself ([[Text.tfIdf]]) is equivalence-tested in
    * ScalaTest, not oracle-hashed — the oracle gates the exact integer
    * inputs. */
  private def qTextTfidf(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc).limit(30).select("token")
    val tf = toks.where(col("doc_id") < 25)
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(vocab), "token").join(dfreq, "token")
      .select(col("doc_id"), col("token"), col("tf"), col("df"))
      .orderBy("doc_id", "token")
  }

  /** VOCABULARY GROWTH CURVE (Heaps' law audit) — per doc in corpus
    * order, how many never-before-seen token types it contributes,
    * plus the running vocabulary size. The curve is the standard
    * corpus-health read before tokenizer training: a healthy crawl
    * grows ∝ n^β (β ≈ 0.5); a flat tail means the crawl is recycling
    * content, a superlinear head means boilerplate explosion. First
    * occurrence = MIN(doc_id) per token — position-free, so the
    * computation is one token aggregate, not a sequential scan.
    *
    * Scale shape: (doc, token) presence distinct + one groupBy(token)
    * min + one groupBy(doc) count; the cumulative rides
    * [[graft.ops.Linkage.globalRunningSum]] — the two-pass
    * range-partitioned prefix sum (per-partition fold + broadcast
    * offsets), NOT a single-partition global window, so the curve
    * computes at any corpus size.
    */
  private def qTextVocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val firstDoc = Tables.documents(s, dir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(min(col("doc_id")).as("doc_id"))
    val newPerDoc = firstDoc.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("new_terms"))
    val dense = Tables.documents(s, dir).select(col("doc_id"))
      .join(newPerDoc, Seq("doc_id"), "left")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
    graft.ops.Linkage.globalRunningSum(dense, col("new_terms"), col("doc_id"))
      .select(col("doc_id"), col("new_terms"), col("cum").as("cum_vocab"))
      .orderBy("doc_id")
  }

  /** PII scrub gate: deterministic synthetic contact strings are
    * appended to a subset of docs (derived from doc_id on BOTH engines
    * — the fixture corpus itself contains no PII, and an all-zero
    * detector output would gate nothing), then counted and masked;
    * the md5 of the redacted text proves the transformation identical
    * byte-for-byte. */
  private def qTextPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val withPii = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 2 === 0,
          concat(lit(" call +1-555-01"), col("doc_id")))
          .otherwise(lit(""))).as("text"))
    withPii.select(col("doc_id"),
        graft.ops.Redact.countEmails(col("text")).as("n_emails"),
        graft.ops.Redact.countPhones(col("text")).as("n_phones"),
        md5(graft.ops.Redact.redact(col("text"))).as("redacted_md5"))
      .orderBy("doc_id")
  }

  /** Exact per-language document-length percentiles (linear
    * interpolation, ×100 as BIGINT) — the length-distribution summary a
    * cleaning pass reports before/after filtering. */
  private def qTextLengthQuantiles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), size(Text.tokens(col("text"))).cast("double").as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        expr("cast(round(percentile(n, 0.5) * 100) as long)").as("p50_x100"),
        expr("cast(round(percentile(n, 0.9) * 100) as long)").as("p90_x100"),
        expr("cast(round(percentile(n, 0.99) * 100) as long)").as("p99_x100"))
      .orderBy("lang")

  /** Length-tier assignment (curriculum/length bucketing) WITHOUT a
    * global sort: per-language quartile cut points come from one
    * aggregation (scaled-integer cuts, same engine-matched percentile
    * form as [[qTextLengthQuantiles]]) and broadcast back; each doc's
    * tier is three integer comparisons in the scan stage. The ntile()
    * spelling of this operator needs a full per-language partition
    * sort — a single-task bottleneck at corpus scale — which is why
    * the cut-point form is the one shipped. */
  private def qTextLengthTiers(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("lang"), size(Text.tokens(col("text"))).cast("long").as("n"))
    val cuts = d.groupBy(col("lang")).agg(
      expr("cast(round(percentile(cast(n as double), 0.25) * 100) as long)").as("c25"),
      expr("cast(round(percentile(cast(n as double), 0.5) * 100) as long)").as("c50"),
      expr("cast(round(percentile(cast(n as double), 0.75) * 100) as long)").as("c75"))
    d.join(broadcast(cuts), "lang")
      .withColumn("tier", lit(1L) +
        when(col("n") * 100 > col("c25"), 1L).otherwise(0L) +
        when(col("n") * 100 > col("c50"), 1L).otherwise(0L) +
        when(col("n") * 100 > col("c75"), 1L).otherwise(0L))
      .groupBy(col("lang"), col("tier"))
      .agg(count(lit(1)).as("n_docs"), min(col("n")).as("min_tokens"),
        max(col("n")).as("max_tokens"), sum(col("n")).as("sum_tokens"))
      .orderBy("lang", "tier")
  }

  /** Time-series densification (gap fill): the hourly rollup left as a
    * sparse table re-emitted on a dense per-type hour grid with zero
    * fills — what anomaly/window passes need so silence reads as 0, not
    * as a missing row. The per-type (min, max) span is a tiny
    * aggregate; the grid explodes map-side from `sequence()`; one keyed
    * left join fills it. */
  private def qEventsHourlyDense(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val span = hourly.groupBy(col("event_type"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val grid = span.select(col("event_type"),
      explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    grid.join(hourly, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("event_type", "hour")
  }

  /** Exact n-gram decontamination (the GPT-3 appendix-C method: flag
    * eval documents sharing a verbatim n-gram with train): per val/test
    * doc, how many of its distinct 5-gram shingles also occur in any
    * train doc. Complements [[qSplitContamination]] (near-dup leakage)
    * with verbatim-overlap leakage. One shingle-keyed semi-join — at
    * corpus scale the train shingle set stays distributed (never
    * broadcast/collected); a bloom filter on train shingles is the
    * cheaper pre-filter when eval ≪ train. */
  private def qSplitNgramLeakage(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val splits = docs.select(col("doc_id"),
      graft.ops.Sampling.assignSplit(col("doc_id")).as("split"))
    val sh = Text.distinctShingles(docs, col("text"), col("doc_id"), 5)
      .join(splits, "doc_id")
    val trainSh = sh.where(col("split") === "train").select("shingle").distinct()
    val evalSh = sh.where(col("split") =!= "train")
    val leaked = evalSh.join(trainSh, Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_leaked"))
    evalSh.groupBy(col("doc_id"), col("split")).agg(count(lit(1)).as("n_shingles"))
      .join(leaked, Seq("doc_id"), "left").na.fill(0L, Seq("n_leaked"))
      .withColumn("leak_bp", expr("(10000 * n_leaked) div n_shingles"))
      .select(col("doc_id"), col("split"), col("n_shingles"), col("n_leaked"),
        col("leak_bp"))
      .orderBy("doc_id")
  }

  /** Lexicon sentiment scoring (the EDBT'16 Spark-sentiment shape):
    * token-in-set counts per document against positive/negative word
    * lists, rates in basis points. Integer division is kept on
    * NONNEGATIVE numerators only (Spark's `div` truncates toward zero
    * while DuckDB's `//` floors — they diverge on negatives); the
    * signed net score is the difference of the two truncated rates,
    * identical on both engines. Pure codegen'd per-row expressions —
    * fuses into the scan, zero shuffles, lexicon swaps are constants.
    */
  private val posLex = Seq("fast", "big", "win", "good")
  private val negLex = Seq("slow", "small", "dup", "bad")

  private def qTextSentiment(s: SparkSession, dir: String): DataFrame = {
    val tk = Text.tokens(col("text"))
    def cnt(words: Seq[String]) =
      size(filter(tk, t => t.isInCollection(words))).cast("long")
    Tables.documents(s, dir)
      .select(col("doc_id"), size(tk).cast("long").as("n_tokens"),
        cnt(posLex).as("n_pos"), cnt(negLex).as("n_neg"))
      .where(col("n_tokens") > 0)
      .withColumn("pos_bp", expr("(10000 * n_pos) div n_tokens"))
      .withColumn("neg_bp", expr("(10000 * n_neg) div n_tokens"))
      .withColumn("net_bp", col("pos_bp") - col("neg_bp"))
      .withColumn("label",
        when(col("n_pos") > col("n_neg"), "pos")
          .when(col("n_pos") < col("n_neg"), "neg").otherwise("neutral"))
      .orderBy("doc_id")
  }

  /** Per-document n-gram novelty versus the train split: the fraction
    * of an eval doc's distinct bigrams never seen in ANY train doc —
    * the novelty/memorization-risk mirror of split_ngram_leakage
    * (which gates the verbatim 5-gram channel). The train shingle set
    * stays distributed: candidates anti-join it on the shingle key —
    * a real corpus vocabulary never broadcasts or collects. */
  private def qSplitNgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val splits = docs.select(col("doc_id"),
      graft.ops.Sampling.assignSplit(col("doc_id")).as("split"))
    val sh = Text.distinctShingles(docs, col("text"), col("doc_id"), 2)
      .join(splits, "doc_id")
    val trainSh = sh.where(col("split") === "train").select("shingle").distinct()
    val evalSh = sh.where(col("split") =!= "train")
    val novel = evalSh.join(trainSh, Seq("shingle"), "left_anti")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_novel"))
    evalSh.groupBy(col("doc_id"), col("split")).agg(count(lit(1)).as("n_bigrams"))
      .join(novel, Seq("doc_id"), "left").na.fill(0L, Seq("n_novel"))
      .withColumn("novelty_bp", expr("(10000 * n_novel) div n_bigrams"))
      .select(col("doc_id"), col("split"), col("n_bigrams"), col("n_novel"),
        col("novelty_bp"))
      .orderBy("doc_id")
  }

  /** Boilerplate-span detection (the C4/RefinedWeb cleaning step that
    * strips nav bars, cookie banners, license headers): the fraction
    * of a doc's distinct 4-gram shingles that are "common" — present
    * in ≥ 3 distinct documents corpus-wide. Docs over 50% common
    * shingles are flagged. Scale shape: the shingle df is one keyed
    * aggregation with map-side partials; the common-shingle set stays
    * DISTRIBUTED and prunes via a left-semi join on the shingle key
    * (a real corpus's boilerplate vocabulary never broadcasts or
    * collects) — the same channel as split_ngram_leakage/novelty.
    * Ratios are integer basis points, engine-exact. */
  private def qTextBoilerplate(s: SparkSession, dir: String): DataFrame = {
    val sh = Text.distinctShingles(Tables.documents(s, dir),
      col("text"), col("doc_id"), 4)
    val common = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .where(col("df") >= 3).select("shingle")
    val perDoc = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val nCommon = sh.join(common, Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_common"))
    perDoc.join(nCommon, Seq("doc_id"), "left").na.fill(0L, Seq("n_common"))
      .withColumn("boilerplate_bp", expr("(10000 * n_common) div n_shingles"))
      .withColumn("flagged", col("boilerplate_bp") >= 5000)
      .orderBy("doc_id")
  }

  /** Blocked record linkage (Fellegi & Sunter, JASA 1969 framing;
    * blocking per Christen's survey, TKDE 2012) — entity resolution
    * of a DIRTY re-keyed feed back to the master table, the classic
    * data-integration op. The dirty feed derives deterministically
    * from the master (the partsupp derive-don't-ship trick): each
    * name gets two adjacent tail characters transposed at a
    * key-dependent position p ∈ {10,11,12,14,15,16} (13 excluded so
    * every perturbation leaves EITHER the 13-char prefix OR the
    * 5-char suffix intact — the completeness invariant the two
    * blocking passes rely on). Candidates come from the union of a
    * prefix-block and a suffix-block equi-join (never all-pairs);
    * verification is bounded `levenshtein(·,·, 2)` (Spark's 3-arg
    * early-exit form; a transposition costs exactly 2, or 0 when the
    * swapped digits are equal); the winner per dirty record is the
    * min-(distance, key) candidate. `is_correct` exposes the
    * ambiguity floor — a transposition CAN produce another
    * customer's exact name, and linkage then rightly prefers the
    * distance-0 impostor (classic ER ambiguity, measured not hidden).
    *
    * Blocking is by DELETION NEIGHBORHOOD (Mor & Fraenkel, CACM 1982;
    * the SymSpell family): each side emits, per window position q, the
    * name with chars [q, q+1] deleted, and candidates equi-join on
    * (q, key). Any pair differing only inside some 2-char window —
    * every adjacent transposition, every single substitution, every
    * adjacent double substitution — shares the key at that window, so
    * the true pair is ALWAYS a candidate (completeness by
    * construction). The first draft blocked on prefix-13/suffix-5
    * substrings instead and measured 5.2 s at sf0.01: TPC-H-style
    * names share `Customer#0000…`, so the prefix block degenerated to
    * one table-sized bucket — a quadratic all-pairs join smuggled in
    * through a low-entropy key. Deletion keys keep 16 of 18 chars and
    * never degenerate.
    *
    * Scale shape: (len−1)× linear key expansion on each side, ONE
    * equi-join on high-entropy (q, key) strings — block size is the
    * number of names within window-2 of each other, the collision
    * structure of the name space, never the table. On this DENSE
    * sequential key space that structure is still ~10² neighbors per
    * record at the trailing-digit windows (every number sharing the
    * first 7 digits is window-local), so the candidate volume is the
    * honest cost of the semantics; what the plan controls is the
    * per-candidate weight: each side carries only (window, key, id,
    * window-chars), the verification distance rides the WINDOW
    * INVARIANT instead of a string scan — a (q, key)-matched pair is
    * equal outside positions {q, q+1} by construction, and for
    * equal-length strings differing in ≤ 2 fixed positions plain
    * levenshtein equals the differing-position count (one edit can't
    * fix two positions, and indel realignments cost the same 2), so
    * `lev = (a≠c) + (b≠d)` over the four dropped chars, exact and
    * O(1) per pair where the prior form ran a bounded levenshtein
    * per pair after two name-carrying joins (14.8 s → 4.9 s → 1.4 s
    * at sf0.1 across the three forms). The winner election is a
    * min(struct) AGGREGATE — no rank window, one narrow shuffle keyed
    * on dirty_id. The oracle keeps the levenshtein formulation — the
    * invariant is exactly what makes the two formulations identical.
    */
  private def qCustomersRecordLinkage(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    val dirty = c
      .withColumn("m", col("c_custkey") % 6)
      .withColumn("p", when(col("m") < 3, col("m") + 10).otherwise(col("m") + 11)
        .cast("int"))
      .select(col("c_custkey").as("dirty_id"),
        concat(
          expr("substring(c_name, 1, p - 1)"),
          expr("substring(c_name, p + 1, 1)"),
          expr("substring(c_name, p, 1)"),
          expr("substring(c_name, p + 2, 100)")).as("dn"))
    val cb = c
      .withColumn("q", explode(expr("sequence(1, length(c_name) - 1)")))
      .select(col("c_custkey"), col("q"), expr(
        "concat(substring(c_name, 1, q - 1), substring(c_name, q + 2, 1000))")
        .as("bk"),
        expr("substring(c_name, q, 2)").as("wc"))
    val db = dirty
      .withColumn("q", explode(expr("sequence(1, length(dn) - 1)")))
      .select(col("dirty_id"), col("q"), expr(
        "concat(substring(dn, 1, q - 1), substring(dn, q + 2, 1000))").as("bk"),
        expr("substring(dn, q, 2)").as("wd"))
    val cand = db.join(cb, Seq("q", "bk"))
      .select(col("dirty_id"), col("c_custkey"),
        ((substring(col("wd"), 1, 1) =!= substring(col("wc"), 1, 1))
          .cast("int") +
         (substring(col("wd"), 2, 1) =!= substring(col("wc"), 2, 1))
          .cast("int")).as("lev"))
      // a pair can match at up to three windows; the distance is a
      // property of the PAIR (diffs are fixed), so min = the value
      .groupBy(col("dirty_id"), col("c_custkey"))
      .agg(min(col("lev")).as("lev"))
    cand
      .groupBy(col("dirty_id"))
      .agg(min(struct(col("lev"), col("c_custkey"))).as("best"),
        count(lit(1)).as("n_cand"))
      .select(col("dirty_id"),
        col("best.c_custkey").as("matched_custkey"),
        col("best.lev").cast("long").as("lev_dist"),
        col("n_cand").cast("long").as("n_cand"),
        (col("best.c_custkey") === col("dirty_id")).as("is_correct"))
      .orderBy("dirty_id")
  }

  /** Sorted-neighborhood linkage (Hernández & Stolfo, SIGMOD 1995) —
    * the OTHER classic blocking strategy, run against the same dirty
    * feed as `customers_record_linkage` so the two channels'
    * recall/precision trade is measurable side by side. Two passes
    * (sort by name, sort by reversed name — the standard multi-pass
    * answer to SNM's high-order-error blindness), window w = 10,
    * cross-source pairs verified by bounded levenshtein, winner =
    * min (lev, key). Unlike deletion-neighborhood blocking SNM is NOT
    * complete — a transposition in the high-order sort positions
    * moves the record far from its twin in BOTH sort orders when the
    * shared prefix is low-entropy — so the output keeps every dirty
    * record with an explicit `found` flag and sentinel −1s: the
    * recall gap is the measured result, not a hidden drop. (On the
    * DENSE fixture the sort window always holds some lev ≤ 2
    * neighbor, so the measured found-rate is 1.0 and the winner
    * coincides with the deletion channel's; SnmLinkageSpec pins the
    * discriminating per-pass correctness metrics instead.)
    *
    * Scale shape: [[graft.ops.Linkage.globalRank]] ranks without a
    * single-partition window (range repartition + per-partition
    * offsets; the only global window touches the |partitions|-row
    * count summary), and [[graft.ops.Linkage.snmCandidates]] joins
    * rank buckets of width w — block size 2w by construction. The
    * oracle mirrors both passes with row_number + a band self-join.
    */
  private def qCustomersSnmLinkage(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    val dirty = c
      .withColumn("m", col("c_custkey") % 6)
      .withColumn("p", when(col("m") < 3, col("m") + 10).otherwise(col("m") + 11)
        .cast("int"))
      .select(col("c_custkey").as("dirty_id"),
        concat(
          expr("substring(c_name, 1, p - 1)"),
          expr("substring(c_name, p + 1, 1)"),
          expr("substring(c_name, p, 1)"),
          expr("substring(c_name, p + 2, 100)")).as("dn"))
    val u = c.select(col("c_custkey").as("id"), col("c_name").as("name"),
        lit(0).as("src"))
      .unionByName(dirty.select(col("dirty_id").as("id"), col("dn").as("name"),
        lit(1).as("src")))
    def pass(key: org.apache.spark.sql.Column): DataFrame =
      graft.ops.Linkage.snmCandidates(
          u.withColumn("skey", key), w = 10,
          col("skey"), col("src"), col("id"))
        .where(col("src_a") =!= col("src_b"))
        .select(
          when(col("src_a") === 1, col("id_a")).otherwise(col("id_b"))
            .as("dirty_id"),
          when(col("src_a") === 1, col("id_b")).otherwise(col("id_a"))
            .as("c_custkey"))
    val cand = pass(col("name")).unionByName(pass(reverse(col("name"))))
      .distinct()
    val linked = cand
      .join(dirty, "dirty_id")
      .join(c, "c_custkey")
      .withColumn("lev", levenshtein(col("dn"), col("c_name"), 2))
      .where(col("lev") >= 0)
      .groupBy(col("dirty_id"))
      .agg(min(struct(col("lev"), col("c_custkey"))).as("best"),
        count(lit(1)).as("n_cand"))
      .select(col("dirty_id"),
        col("best.c_custkey").as("matched_custkey"),
        col("best.lev").cast("long").as("lev_dist"),
        col("n_cand").cast("long").as("n_cand"))
    dirty.select(col("dirty_id")).join(linked, Seq("dirty_id"), "left")
      .select(col("dirty_id"),
        col("matched_custkey").isNotNull.as("found"),
        coalesce(col("matched_custkey"), lit(-1L)).as("matched_custkey"),
        coalesce(col("lev_dist"), lit(-1L)).as("lev_dist"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"))
      .orderBy("dirty_id")
  }

  // -------------------------------------------------------- similarity

  private def qSimTopkBrute(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.topKBruteForce(emb.where(col("vec_id") >= 8),
        emb.where(col("vec_id") < 8), col("embedding"), col("vec_id"), k = 10)
      .select(col("q_vec_id"), col("vec_id"), col("dot"), col("rnk"))
      .orderBy("q_vec_id", "rnk")
  }

  private def qSimTopkLsh(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.topKLsh(emb.where(col("vec_id") >= 8),
        emb.where(col("vec_id") < 8), col("embedding"), col("vec_id"),
        k = 5, bits = 8)
      .select(col("q_vec_id"), col("vec_id"), col("dot"), col("rnk"))
      .orderBy("q_vec_id", "rnk")
  }

  /** Shared self-check for the rows-only ANN queries: join the result
    * against the exact brute-force top-k and emit `in_brute` plus
    * per-query `recall_x100`. One implementation so the recall
    * denominator always tracks `k` — three hand-copies would let a
    * changed k silently misreport recall to the driver's gate. */
  private def withRecallCheck(got: DataFrame, corpus: DataFrame,
                              qs: DataFrame, k: Int): DataFrame = {
    val brute = Similarity.topKBruteForce(corpus, qs,
        col("embedding"), col("vec_id"), k)
      .select(col("q_vec_id").as("b_q"), col("vec_id").as("b_v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("q_vec_id"))
    got.join(broadcast(brute),
        col("q_vec_id") === col("b_q") && col("vec_id") === col("b_v"), "left")
      .withColumn("in_brute", col("b_v").isNotNull)
      .withColumn("recall_x100",
        (lit(100) * sum(when(col("in_brute"), 1L).otherwise(0L)).over(w) / lit(k))
          .cast("long"))
      .select(col("q_vec_id"), col("vec_id"), col("rnk"),
        col("in_brute"), col("recall_x100"))
      .orderBy("q_vec_id", "rnk")
  }

  /** Collapse a row-level ANN result (from [[withRecallCheck]]) to the
    * ORACLE-CHECKABLE audit: one row per query — result count plus a
    * recall_ok flag at a threshold calibrated far below the fixture's
    * measured floor. Exact neighbor sets aren't SQL-expressible
    * (iterative k-means training), but "every query returned exactly k
    * rows and recall cleared the floor" IS deterministic on the seeded
    * fixture — so the driver's DuckDB gate can hash-pin it instead of
    * recording a rows-only non-check. The row-level frames stay
    * exposed ([[simTopkIvfRows]] etc.) for the tighter mean-recall
    * envelopes in ExtensionOpsSpec. */
  private def annAudit(rows: DataFrame, minRecallX100: Int): DataFrame =
    // recall_x100 is CONSTANT within a q_vec_id group today (the
    // full-partition window in withRecallCheck), so any per-group
    // aggregate reads the same value; min() is chosen so that if the
    // semantics ever shift to per-rank/cumulative recall, the gate
    // fails CLOSED (strictest row decides) instead of max() silently
    // passing on the best row.
    rows.groupBy(col("q_vec_id"))
      .agg(count(lit(1)).cast("long").as("n_results"),
        min(col("recall_x100")).as("__r"))
      .select(col("q_vec_id"), col("n_results"),
        (col("__r") >= minRecallX100).as("recall_ok"))
      .orderBy("q_vec_id")

  /** IVF ANN (k-means cells, 2-probe). Exact neighbor rows aren't
    * SQL-expressible — the registered query emits the [[annAudit]]
    * summary (count-exact + recall-floor per query, DuckDB-pinned);
    * row-level `in_brute`/`recall_x100` audit data stays available via
    * [[simTopkIvfRows]] and is envelope-gated in ExtensionOpsSpec.
    *
    * Cell/probe choice is fixture-honest: these synthetic embeddings
    * are near-uniform random, so recall@10 ≈ probed corpus fraction
    * (measured: k=8 cells, nProbe∈{2,4,6} → 0.39/0.75/0.90 at sf0.01
    * and 0.58/0.75/0.90 at sf0.1). 8 cells × 6 probes ⇒ recall 0.90
    * here; real embedding corpora cluster, which is what buys IVF its
    * low probe fractions at scale.
    */
  private[graft] def simTopkIvfRows(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = emb.where(col("vec_id") >= 8)
    val qs = emb.where(col("vec_id") < 8)
    val index = graft.ops.AnnCache.memo(s, s"ivf:$dir:k8") {
      val i = graft.ops.Ivf.build(corpus, col("embedding"), col("vec_id"), k = 8)
      i.copy(assigned = graft.ops.AnnCache.pin(i.assigned))
    }
    val ivf = graft.ops.Ivf.topK(index, qs,
      col("embedding"), col("vec_id"), k = 10, nProbe = 6)
    withRecallCheck(ivf, corpus, qs, k = 10)
  }

  // recall floors: measured per-query minima are 80 (IVF), 40 (PQ), 50
  // (IVF-PQ) at sf0.01 and 80/30/30 at sf0.001; the floors sit ≥ 15
  // recall points below every observed value so a one-neighbor flip
  // from float-merge-order jitter can't cross them
  private def qSimTopkIvf(s: SparkSession, dir: String): DataFrame =
    annAudit(simTopkIvfRows(s, dir), minRecallX100 = 45)

  /** PQ ANN (product quantization + ADC, [[graft.ops.Pq]]).
    * [[annAudit]]-gated like IVF (iterative training isn't
    * SQL-expressible); the row-level frame self-reports `in_brute` and
    * per-query `recall_x100` vs the exact brute-force top-k and stays
    * exposed via [[simTopkPqRows]]. The corpus compresses 64 floats → 8
    * codes; ADC scores are 8 table lookups per pair inside codegen,
    * shortlisting 50 candidates per query that then re-rank EXACTLY
    * against their original vectors (the production PQ deployment
    * shape — raw ADC order on near-uniform random fixtures is
    * structurally lossy; the shortlist + exact re-rank is what makes
    * compressed codes usable, and the recall envelope in
    * ExtensionOpsSpec is calibrated to the fixture). */
  private[graft] def simTopkPqRows(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = emb.where(col("vec_id") >= 8)
    val qs = emb.where(col("vec_id") < 8)
    val index = graft.ops.AnnCache.memo(s, s"pq:$dir:m8k16") {
      val i = graft.ops.Pq.build(corpus, col("embedding"), col("vec_id"),
        dim = EMB_DIM, m = 8, k = 16)
      i.copy(codes = graft.ops.AnnCache.pin(i.codes),
        cents = graft.ops.AnnCache.pin(i.cents))
    }
    val pq = graft.ops.Pq.topKReranked(index, corpus, qs,
      col("embedding"), col("vec_id"), k = 10, shortlist = 50)
    withRecallCheck(pq, corpus, qs, k = 10)
  }

  /** Filtered search on the INDEXED path: the same IVF probe but with
    * `label < 5` evaluated as a scan-stage predicate on the index rows
    * themselves — the label rides INSIDE the index (build metaCols),
    * so no join back to the source table; filtered search costs LESS
    * than unfiltered, never more. Recall audits against the filtered
    * brute force. The separate AnnCache key builds the labeled index
    * once. */
  private[graft] def simTopkIvfFilteredRows(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = emb.where(col("vec_id") >= 8)
    val qs = emb.where(col("vec_id") < 8)
    val index = graft.ops.AnnCache.memo(s, s"ivf-meta:$dir:k8") {
      val i = graft.ops.Ivf.build(corpus, col("embedding"), col("vec_id"),
        k = 8, metaCols = Seq("label" -> col("label")))
      i.copy(assigned = graft.ops.AnnCache.pin(i.assigned))
    }
    val got = graft.ops.Ivf.topK(index, qs, col("embedding"), col("vec_id"),
      k = 10, nProbe = 6, candFilter = col("label") < 5)
    withRecallCheck(got, corpus.where(col("label") < 5), qs, k = 10)
  }

  private def qSimTopkIvfFiltered(s: SparkSession, dir: String): DataFrame =
    annAudit(simTopkIvfFilteredRows(s, dir), minRecallX100 = 45)

  /** Filtered search on the FULL IVF-PQ construction: the label rides
    * in `cellOf` (build metaCols) and the predicate prunes candidates
    * before any ADC scoring; the shortlist and exact re-rank inherit
    * the filter by construction. Audits recall vs the filtered brute
    * force under the same oracle-pinned contract. */
  private[graft] def simTopkIvfPqFilteredRows(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = emb.where(col("vec_id") >= 8)
    val qs = emb.where(col("vec_id") < 8)
    val index = graft.ops.AnnCache.memo(s, s"ivfpq-meta:$dir:c8m8k16") {
      val i = graft.ops.IvfPq.build(corpus, col("embedding"), col("vec_id"),
        dim = EMB_DIM, cells = 8, m = 8, k = 16,
        metaCols = Seq("label" -> col("label")))
      i.copy(pq = i.pq.copy(codes = graft.ops.AnnCache.pin(i.pq.codes),
          cents = graft.ops.AnnCache.pin(i.pq.cents)),
        cellOf = graft.ops.AnnCache.pin(i.cellOf),
        cents = graft.ops.AnnCache.pin(i.cents))
    }
    val got = graft.ops.IvfPq.topK(index, corpus, qs,
      col("embedding"), col("vec_id"), k = 10, nProbe = 6, shortlist = 50,
      candFilter = col("label") < 5)
    withRecallCheck(got, corpus.where(col("label") < 5), qs, k = 10)
  }

  private def qSimTopkIvfPqFiltered(s: SparkSession, dir: String): DataFrame =
    annAudit(simTopkIvfPqFilteredRows(s, dir), minRecallX100 = 15)

  private def qSimTopkPq(s: SparkSession, dir: String): DataFrame =
    annAudit(simTopkPqRows(s, dir), minRecallX100 = 15)

  /** Filtered search on the plain-PQ path — completing the filtered
    * family (brute force, IVF, IVF-PQ, PQ): the label rides the coded
    * table (build metaCols), pruning candidates before any ADC lookup;
    * shortlist + exact re-rank inherit the filter by construction. */
  private[graft] def simTopkPqFilteredRows(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = emb.where(col("vec_id") >= 8)
    val qs = emb.where(col("vec_id") < 8)
    val index = graft.ops.AnnCache.memo(s, s"pq-meta:$dir:m8k16") {
      val i = graft.ops.Pq.build(corpus, col("embedding"), col("vec_id"),
        dim = EMB_DIM, m = 8, k = 16, metaCols = Seq("label" -> col("label")))
      i.copy(codes = graft.ops.AnnCache.pin(i.codes),
        cents = graft.ops.AnnCache.pin(i.cents))
    }
    val got = graft.ops.Pq.topKReranked(index, corpus, qs,
      col("embedding"), col("vec_id"), k = 10, shortlist = 50,
      candFilter = col("label") < 5)
    withRecallCheck(got, corpus.where(col("label") < 5), qs, k = 10)
  }

  private def qSimTopkPqFiltered(s: SparkSession, dir: String): DataFrame =
    annAudit(simTopkPqFilteredRows(s, dir), minRecallX100 = 15)

  /** IVF-PQ ANN ([[graft.ops.IvfPq]]): coarse cells prune the search,
    * PQ residual codes score the survivors, exact q_dot re-ranks the
    * shortlist — the full billion-vector construction. [[annAudit]]
    * gate with the same in_brute/recall_x100 row-level self-check as
    * IVF and PQ, exposed via [[simTopkIvfPqRows]]. */
  private[graft] def simTopkIvfPqRows(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val corpus = emb.where(col("vec_id") >= 8)
    val qs = emb.where(col("vec_id") < 8)
    val index = graft.ops.AnnCache.memo(s, s"ivfpq:$dir:c8m8k16") {
      val i = graft.ops.IvfPq.build(corpus, col("embedding"), col("vec_id"),
        dim = EMB_DIM, cells = 8, m = 8, k = 16)
      i.copy(pq = i.pq.copy(codes = graft.ops.AnnCache.pin(i.pq.codes),
          cents = graft.ops.AnnCache.pin(i.pq.cents)),
        cellOf = graft.ops.AnnCache.pin(i.cellOf),
        cents = graft.ops.AnnCache.pin(i.cents))
    }
    val got = graft.ops.IvfPq.topK(index, corpus, qs,
      col("embedding"), col("vec_id"), k = 10, nProbe = 6, shortlist = 50)
    withRecallCheck(got, corpus, qs, k = 10)
  }

  private def qSimTopkIvfPq(s: SparkSession, dir: String): DataFrame =
    annAudit(simTopkIvfPqRows(s, dir), minRecallX100 = 15)

  /** Incremental ingestion dedup ([[Dedup.incrementalExact]]): the
    * historical half of the corpus is the fingerprint store; the new
    * batch anti-joins it and first-writer-wins within itself. The
    * fixture has no natural exact dups (dedup_exact: every group is a
    * singleton), so the batch re-submits 50 historical docs (crawler
    * re-fetch — must be dropped by the store anti-join) and 50 of its
    * own docs under new ids (intra-batch dup — must lose first-writer-
    * wins), making both drop paths load-bearing. The oracle recomputes
    * both steps directly — NOT IN store + rn=1 — pinning that
    * batch-incremental dedup equals what a full rededup would keep. */
  private def qCorpusIncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val seen = Dedup.exactGroups(docs.where(col("doc_id") < 250),
      col("text"), col("doc_id")).select(col("fingerprint"))
    val batch = docs.where(col("doc_id") >= 250)
      .unionByName(docs.where(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 100000L))
      .unionByName(docs.where(col("doc_id") >= 250 && col("doc_id") < 300)
        .withColumn("doc_id", col("doc_id") + 200000L))
      .select(col("doc_id"), col("source"), col("text"))
    Dedup.incrementalExact(batch, seen, col("text"), col("doc_id"))
      .select(col("doc_id"), col("source"), col("fingerprint"))
      .orderBy("doc_id")
  }

  /** Skew-safe dimension enrichment via [[graft.ops.Skew.saltedJoin]]:
    * the per-user cohort dim joins back to the fact stream with the
    * build side replicated over 8 salts and the probe side scattered
    * by row hash — a hot user's rows land on 8 reducers, not 1. The
    * oracle runs the PLAIN join: hash equality proves the salted form
    * is row-identical, which is the operator's whole contract. */
  private def qEventsSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(
      col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
    val dim = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    graft.ops.Skew.saltedJoin(ev, dim, Seq("user_id"), 8)
      .groupBy(col("cohort_day"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy("cohort_day", "event_type")
  }

  /** Robust dispersion per event type: exact median and MAD (median
    * absolute deviation — the robust spread statistic behind
    * median±k·MAD outlier fences, which one wild value can't drag the
    * way events_anomaly's σ can). Everything is exact integer
    * arithmetic: x doubles to x200 so the even-integer median is
    * integral, and deviations double again (x400) for the same reason
    * — Spark `percentile` and DuckDB `quantile_cont` agree
    * bit-for-bit on integer inputs (the customer_rfm parity basis).
    * Two keyed aggregations plus a broadcast of the 5-row median
    * table; like customer_rfm, the exact percentile buffers each
    * group's values — at open-ended scale the swap is
    * percentile_approx (text_length_quantiles documents that trade).
    */
  private def qEventsValueMad(s: SparkSession, dir: String): DataFrame = {
    val x2 = (round(col("value") * 100) * 2).cast("long")
    val base = Tables.events(s, dir).select(col("event_type"), x2.as("x2"))
    val med = base.groupBy(col("event_type"))
      .agg(percentile(col("x2"), lit(0.5)).cast("long").as("median_x200"))
    base.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("median_x200"),
        (abs(col("x2") - col("median_x200")) * 2).cast("long").as("d4"))
      .groupBy(col("event_type"), col("median_x200"))
      .agg(percentile(col("d4"), lit(0.5)).cast("long").as("mad_x400"),
        count(lit(1)).cast("long").as("n"))
      .orderBy("event_type")
  }

  /** Explicit GROUPING SETS — the asymmetric-subtotal surface cube()
    * can't express without waste: (type, day) detail, per-day totals,
    * and a grand total, but NO per-type-all-days set. One Expand over
    * the input (3 replicas) feeding a single partial-agg shuffle —
    * same plan family as events_cube, with the replica count equal to
    * the set count rather than 2^dims. Labels come from GROUPING()
    * (never NULL indicators), as events_cube establishes. */
  private def qEventsGroupingSets(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_type"),
      to_date(col("ts")).as("day"), col("value"))
    e.groupingSets(
        Seq(Seq(col("event_type"), col("day")), Seq(col("day")), Seq()),
        col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        SparkEntry.decSumScaled(col("value"), "decimal(18,2)", 100, "total_value_x100"),
        grouping(col("event_type")).as("_gt"),
        grouping(col("day")).as("_gd"))
      .select(
        when(col("_gt") === 1, "ALL").otherwise(col("event_type")).as("event_type"),
        when(col("_gd") === 1, lit("1900-01-01").cast("date")).otherwise(col("day")).as("day"),
        col("n"), col("total_value_x100"))
      .orderBy("event_type", "day")
  }

  /** Incremental join-view maintenance ([[graft.ops.DeltaJoin]]): the
    * customer⋈orders view refreshed from base slices plus insert
    * deltas via the delta rule — base⋈base is joined once, every other
    * term probes a base table with a BROADCAST delta. The oracle joins
    * the full tables directly: hash equality proves the four-term
    * union IS the full join. The split (customers by key mod, orders
    * by date) makes every term non-empty, so a dropped term can't
    * pass. Money stays DECIMAL(18,2) through the join and scales to
    * integer cents only in the final aggregate (the house rule). */
  private def qOrdersDeltaJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(
      col("c_custkey").as("custkey"), col("c_nationkey"))
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("custkey"),
      date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    val cut = lit("1997-01-01").cast("timestamp")
    val (c0, dc) = (c.where(pmod(col("custkey"), lit(7)) =!= 0),
      c.where(pmod(col("custkey"), lit(7)) === 0))
    val (o0, dO) = (o.where(col("month") < cut), o.where(col("month") >= cut))
    graft.ops.DeltaJoin.refreshed(c0, dc, o0, dO, Seq("custkey"))
      .groupBy(col("c_nationkey"), col("month"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        (sum(col("price")) * lit(100)).cast("long").as("total_x100"))
      .orderBy("c_nationkey", "month")
  }

  /** Native `session_window` (the merging-window operator the
    * STREAMING sessionizer uses, run in batch) pinned against the
    * gaps-and-islands construction events_sessionize hand-rolls: same
    * 30-minute gap, session end = last event + gap by the operator's
    * definition. Two independent implementations of session semantics
    * agreeing on every window is the point — like
    * dedup_clusters_star vs dedup_clusters, the oracle arbitrates
    * both. One keyed shuffle + in-partition merge, no window pass. */
  private def qEventsSessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).cast("long").as("n_events"))
      .select(col("user_id"),
        col("w.start").cast("timestamp_ntz").as("session_start"),
        col("w.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")

  /** The RETRACTION form of join-view maintenance
    * ([[graft.ops.DeltaJoin.signedIncrement]]/[[graft.ops.DeltaJoin.consolidate]]):
    * every 100th order is corrected in place (retract the old row,
    * insert the row with a 10.00 price adjustment — the z-set encoding
    * of an UPDATE), the signed change stream folds onto the stored
    * view, and the result must equal the direct join of the CORRECTED
    * orders — which is exactly what the oracle computes. The
    * customer-side delta is empty, proving the rule degrades to the
    * single-table case without special-casing. */
  private def qOrdersDeltaRetract(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(
      col("c_custkey").as("custkey"), col("c_nationkey"))
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("custkey"), col("o_orderkey").as("okey"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    val hit = o.where(pmod(col("okey"), lit(100)) === 0)
    val dbS = hit.withColumn("sign", lit(-1L))
      .unionByName(hit
        .withColumn("price", (col("price") + lit(10)).cast("decimal(18,2)"))
        .withColumn("sign", lit(1L)))
    val daS = c.limit(0).withColumn("sign", lit(1L))
    val changes = graft.ops.DeltaJoin.signedIncrement(
      c, daS, o, dbS, Seq("custkey"), "sign")
    graft.ops.DeltaJoin.consolidate(c.join(o, Seq("custkey")), changes, "sign")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        (sum(col("price")) * lit(100)).cast("long").as("total_x100"))
      .orderBy("c_nationkey")
  }

  /** The [[graft.ops.DeltaJoin]] × [[graft.ops.Rollup]] composition:
    * an incrementally-maintained AGGREGATED join view. The stored
    * state is one row per nation — (c_nationkey, n, total) — built
    * from orders before the cut; the change batch carries BOTH shapes
    * a production feed mixes: plain inserts (orders after the cut,
    * sign +1) and in-place corrections (every 100th order retracted
    * and re-inserted with a 10.00 adjustment). The signed change
    * stream flows through the join delta rule (broadcast delta
    * probing customer — zero base-table shuffle) and folds into the
    * view as aggregate deltas (Δn = Σ sign, Δtotal = Σ sign·price),
    * so refresh cost is ∝ |changes| + |view|, never ∝ |orders|. The
    * oracle aggregates the corrected full join directly: hash
    * equality proves the maintained view IS the recomputed aggregate.
    * A correction hitting a same-batch insert (new order with okey %
    * 100 = 0) nets +1 original −1 original +1 corrected = corrected —
    * linearity means intra-batch ordering can't matter, which the
    * construction deliberately exercises. */
  private def qOrdersDeltaRollup(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(
      col("c_custkey").as("custkey"), col("c_nationkey"))
    val o = Tables.orders(s, dir).select(
      col("o_custkey").as("custkey"), col("o_orderkey").as("okey"),
      col("o_orderdate").as("odate"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    val cut = lit("1997-01-01").cast("date")
    val o0 = o.where(col("odate") < cut)
    // stored view: the aggregate of the base join, as Rollup would hold it
    val view0 = c.join(o0, Seq("custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).cast("long").as("n"), sum(col("price")).as("total"))
    // change batch: inserts + retract/insert correction pairs (over ALL
    // orders, so corrections can hit same-batch inserts)
    val hit = o.where(pmod(col("okey"), lit(100)) === 0)
    val dbS = o.where(col("odate") >= cut).withColumn("sign", lit(1L))
      .unionByName(hit.withColumn("sign", lit(-1L)))
      .unionByName(hit
        .withColumn("price", (col("price") + lit(10)).cast("decimal(18,2)"))
        .withColumn("sign", lit(1L)))
    val daS = c.limit(0).withColumn("sign", lit(1L))
    val changes = graft.ops.DeltaJoin.signedIncrement(
      c, daS, o0, dbS, Seq("custkey"), "sign")
    graft.ops.DeltaJoin.aggregatedConsolidate(
        view0, changes, Seq("c_nationkey"), col("price"), "sign")
      .select(col("c_nationkey"), col("n").as("n_orders"),
        (col("total") * lit(100)).cast("long").as("total_x100"))
      .orderBy("c_nationkey")
  }

  /** Sweep-line interval analytics over the SCD2 history: how many
    * employee versions are simultaneously valid at each boundary
    * instant. Each non-delete version contributes +1 at valid_from and
    * −1 at valid_to; grouping deltas per instant FIRST makes the
    * running sum independent of intra-instant event order (the
    * adjacent-versions-share-a-boundary tie), and the +1/−1 events are
    * ~2 rows per version — the sweep never materializes interval
    * overlaps, which is what makes it the scale path where a range
    * self-join explodes. The final running sum is a window over the
    * pre-aggregated boundary-instant frame (like orders_monthly_mom's
    * month frame); at cluster scale it splits into per-time-range
    * partial sums plus broadcast prefix offsets. */
  private def qCdcActiveSweep(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("emp_id"))
      .orderBy(col("last_updated_at"), col("event_id"))
    // lead() runs BEFORE the delete filter: a delete event closes the
    // prior version's validity even though it is not a version itself
    val vers = graft.cdc.Routing
      .validateSplit(graft.cdc.Fixtures.employeeCdcLog(s, dir)).valid
      .withColumn("valid_to", lead(col("last_updated_at"), 1).over(w))
      .where(col("action") =!= "delete")
    val deltas = vers.select(col("last_updated_at").as("t"), lit(1L).as("d"))
      .unionByName(vers.where(col("valid_to").isNotNull)
        .select(col("valid_to").as("t"), lit(-1L).as("d")))
    deltas.groupBy(col("t")).agg(sum(col("d")).cast("long").as("net"))
      .withColumn("n_active", sum(col("net")).over(Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select(col("t").cast("timestamp_ntz").as("ts"), col("net"), col("n_active"))
      .orderBy("ts")
  }

  /** Incremental rollup ([[graft.ops.Rollup]]): facts reduce into
    * per-(day, type) MERGEABLE partials in two independent refresh
    * slices (split at mid-month — the incremental-refresh shape), and
    * the read-time merge folds the union to per-type totals. The
    * oracle aggregates the facts directly in one pass: hash equality
    * proves the partial state is a lossless monoid under any split.
    * Value is pre-quantized `round(value*100)` (the covar parity
    * rule), so sums are exact integers on both engines. */
  private def qEventsRollupMerge(s: SparkSession, dir: String): DataFrame = {
    val facts = Tables.events(s, dir).select(col("event_type"),
      to_date(col("ts")).as("day"), round(col("value") * 100).cast("long").as("x"))
    val cut = lit("2024-01-15").cast("date")
    def slicePartials(sl: DataFrame) = graft.ops.Rollup.partials(
      sl, col("day"), Seq(col("event_type")), col("x"))
    // the split must be EXHAUSTIVE or the mergeability proof is void:
    // a NULL day matches neither <= nor >, so it rides the first slice
    // explicitly (the oracle's direct GROUP BY would count it)
    val merged = graft.ops.Rollup.merge(
      slicePartials(facts.where(col("day") <= cut || col("day").isNull))
        .unionByName(slicePartials(facts.where(col("day") > cut))),
      Seq(col("event_type")))
    merged.select(col("event_type"), col("n"), col("total").as("total_x100"),
        col("vmin").as("vmin_x100"), col("vmax").as("vmax_x100"))
      .orderBy("event_type")
  }

  /** [[graft.ops.Rollup]]'s algebra with SKETCH state: the stored
    * partial per (day, type) is a bottom-K KMV sketch of the distinct
    * user hashes, and the read-time merge to the type grain is set
    * union + re-truncation — the mergeable-monoid shape every
    * distinct-count rollup runs at scale (a COUNT DISTINCT partial
    * is not mergeable; a KMV is). The global K smallest hashes are
    * each among their own day's K smallest, so merging the daily
    * sketches loses nothing — and because the hash is deterministic
    * and injective ([[graft.ops.Sampling.hashVal]]), the whole
    * construction is oracle-EXACT, estimate included (the same
    * property events_kmv_churn rides). Emits the merged estimate
    * beside the exact audit. */
  private def qEventsRollupKmv(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val K = 32
    val du = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("event_type"), col("user_id"))
      .distinct()
    // the stored partial: bottom-K per (day, type) — WindowGroupLimit
    // pre-reduces map-side, so partial size is K rows per bucket
    val wd = Window.partitionBy(col("d"), col("event_type")).orderBy(col("h"))
    val partials = du
      .withColumn("h", graft.ops.Sampling.hashVal(col("user_id")))
      .withColumn("rk", row_number().over(wd)).where(col("rk") <= K)
      .select(col("d"), col("event_type"), col("h"))
    // read-time merge: union, dedup, re-truncate to K, estimate
    val wt = Window.partitionBy(col("event_type")).orderBy(col("h"))
    val merged = partials.select(col("event_type"), col("h")).distinct()
      .withColumn("rk", row_number().over(wt)).where(col("rk") <= K)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("k_union"), max(col("h")).as("h_k"))
      .select(col("event_type"), col("k_union"),
        when(col("k_union") < K, col("k_union"))
          .otherwise(expr(s"((k_union - 1) * ${graft.ops.Sampling.P}) div h_k"))
          .as("est_distinct"))
    val exact = du.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_distinct"))
    merged.join(exact, "event_type").orderBy("event_type")
  }

  /** Z-order key derivation ([[graft.ops.ZOrder]]): the bit-interleave
    * arithmetic gated bit-for-bit against the same arithmetic in
    * DuckDB. The layout/pruning half (range-partition by z, per-file
    * manifest, box skip ratio) is exercised on real written files in
    * ZOrderSpec — file layout isn't observable through a result
    * DataFrame. */
  private def qEventsZorderKey(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .where(col("event_id") < 200)
      .select(col("event_id"), graft.ops.ZOrder.zValue(
        hour(col("ts")), pmod(col("user_id"), lit(256)), 8).as("z"))
      .orderBy("event_id")

  // -------------------------------------------------------- multimodal

  private def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select((col("doc_id") +:
        Multimodal.envelopeFeatures(encode(col("text"), "UTF-8"), col("n_chars"))): _*)
      .orderBy("doc_id")

  /** Perceptual-hash near-dup pairs over a BINARY media column
    * ([[Multimodal.aHashNearDups]]): payload → stub decode → 60-bit
    * piecewise-average hash → Manku band join, Hamming ≤ 3. The whole
    * binary-ingest-to-pairs path is real; only the decode is the
    * documented codec stand-in (UTF-8 recovery of the encoded
    * fixture). The corpus has no natural byte-local near-dups (its
    * dup family is token-level — verified: zero pairs under Hamming 7
    * on raw docs), so the media set unions each doc with an in-place
    * 8-byte corruption — the same-length overlay case (logo stamp,
    * bit rot) aHash exists to catch; truncations move every segment
    * boundary and are out of scope by design. ~2/3 of planted pairs
    * land within Hamming 3 (the honest recall of a mean-threshold
    * hash: the edit also moves the global mean), and pigeonhole
    * banding finds every one of those. The oracle recomputes the
    * identical integer pipeline from the source text. */
  private def qMultimodalPhashDup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val media = docs.select(col("doc_id").as("media_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .unionByName(docs.select((col("doc_id") + 100000L).as("media_id"),
        encode(expr("concat(substr(text, 1, 40), repeat('z', 8), substr(text, 49))"),
          "UTF-8").as("payload")))
    Multimodal.aHashNearDups(media, decode(col("payload"), "UTF-8"),
        col("media_id"))
      .orderBy("media_a", "media_b")
  }

  /** REAL-codec round-trip certificate: every tenth doc synthesizes a
    * deterministic PNG (dimensions derived from `n_chars` by the same
    * formula as [[Multimodal.DecodeStub]], pixels a gradient seeded by
    * doc_id), encodes it through `javax.imageio`, decodes it back
    * through [[Multimodal.ImageCodec]], and emits the decoded
    * dimensions plus the hard verdict `ok` = [decoded width/height/
    * channels match the constructed image AND the luma grid
    * extracted] — the sketch-certificate discipline
    * (events_approx_distinct) applied to a codec: the oracle computes
    * the same dimensions from `n_chars` arithmetic and pins ok at 1,
    * so a broken encoder, decoder, or luma path fails the driver's
    * hash gate, not just a spec. Executor-side `mapPartitions`
    * (payloads never touch the driver), bounded to n/10 rows — the
    * PNG round-trip is ~ms-scale per row, the deliberate price of
    * gating a real codec.
    */
  private def qMultimodalImageioCert(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nc) =>
        val w = (16 + nc % 64).toInt
        val h = (16 + (nc * 7) % 64).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val lum = ((x * 255 / math.max(w - 1, 1)) + id.toInt % 37) % 256
            img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        val rec = Multimodal.MediaRecord(id, "image/png", baos.toByteArray)
        val dec = Multimodal.ImageCodec.decode(rec)
        val ok = dec.exists(f =>
          f.width == w && f.height == h && f.channels == 3) &&
          Multimodal.ImageCodec.lumaString(rec.payload).exists(_.nonEmpty)
        (id, w.toLong, h.toLong, if (ok) 1L else 0L)
      })
      .toDF("doc_id", "width", "height", "ok")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------- round-10 batch

  /** Filtered (hybrid) vector search: top-k restricted to candidates
    * whose metadata passes a predicate (here `label < 5`) — the
    * "search only the docs this user may see / only this language"
    * production shape. The label predicate is a plain scan filter, so
    * it pushes into the parquet reader and the expensive dot product
    * only runs on the matching fraction (PlanSpec pins the pushdown) —
    * at 100 TB a selective filter is the single biggest ANN
    * accelerator, ahead of any index. */
  private def qSimTopkFiltered(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.topKBruteForce(
        emb.where(col("vec_id") >= 8 && col("label") < 5),
        emb.where(col("vec_id") < 8), col("embedding"), col("vec_id"), k = 10)
      .select(col("q_vec_id"), col("vec_id"), col("dot"), col("rnk"))
      .orderBy("q_vec_id", "rnk")
  }

  /** Per-source weighted sample without replacement: each source keeps
    * its 10 smallest [[graft.ops.Sampling.weightedPriority]] docs,
    * biased toward longer documents (weight = n_chars) — the
    * quality/length-weighted curation sampler. Integer-exact
    * Efraimidis–Spirakis-style priority race (see Sampling scaladoc);
    * WindowGroupLimit pre-reduces map-side like corpus_source_cap. */
  private def qCorpusWeightedSample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.weightedCapPerGroup(
        Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars")),
        col("source"), col("doc_id"), col("n_chars"), cap = 10)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy("doc_id")

  /** Damped PageRank (3 rounds, fixed-point integer — see
    * [[graft.ops.Graph]]) over the event-type transition graph: which
    * event types accumulate behavioral mass. The raw 100 TB scan is
    * paid ONCE (the same one-shuffle lag/groupBy as
    * events_transitions); the iterations run on the aggregated
    * |types|² edge table with the rank vector broadcast. */
  private def qEventsPagerank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .where(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    graft.ops.Graph.pageRank(edges, iters = 3)
      .select(col("node").as("event_type"), col("pr"))
      .orderBy("event_type")
  }

  /** Semantic clustering / semantic dedup: one exact-integer Lloyd
    * round of k-means over the embeddings (seeds = vec_id < 4),
    * emitting per-cluster size, inertia, and the representative
    * vector ([[graft.ops.SemanticCluster]]). The whole round is two
    * scan-stage assignment passes against literal centroids plus one
    * bounded (k·dim) refit aggregate — no shuffle ever carries a
    * vector. */
  private def qEmbKmeans(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.ops.SemanticCluster.lloydOnce(emb, col("embedding"), col("vec_id"),
        emb.where(col("vec_id") < 4))
      .orderBy("cluster")
  }

  /** [[qEmbKmeans]] run to a second Lloyd round — assignments move as
    * the centroids leave their seed positions, and the oracle mirrors
    * BOTH rounds as generated CTE chains ([[kmeansOracleSql]]), the
    * same single-source-of-truth pattern as the PageRank rank steps.
    * Cost grows by exactly one scan + one bounded refit aggregate per
    * extra round. */
  private def qEmbKmeans2(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    graft.ops.SemanticCluster.lloyd(emb, col("embedding"), col("vec_id"),
        emb.where(col("vec_id") < 4), refits = 2)
      .orderBy("cluster")
  }

  /** [[qEmbKmeans]] with farthest-point (Gonzalez k-center) seeding
    * instead of lowest-id seeds — the deterministic k-means++ stand-in
    * AND a diversity-sampling primitive (the seeds themselves are k
    * maximally-spread exemplars). The traversal and the Lloyd round
    * are both integer-exact, so the full chain — including the
    * non-contiguous seed ids the traversal picks — hash-matches the
    * generated CTE mirror. */
  private def qEmbKmeansFp(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val ids = graft.ops.SemanticCluster.farthestPointSeedIds(
      emb, col("embedding"), col("vec_id"), k = 4)
    graft.ops.SemanticCluster.lloydOnce(emb, col("embedding"), col("vec_id"),
        emb.where(col("vec_id").isin(ids: _*)))
      .orderBy("cluster")
  }

  /** The canonical ending of the near-dup pipeline: every MinHash-LSH
    * cluster keeps exactly ONE member — the highest-quality one
    * (longest text, tie → lowest id) — and every singleton keeps
    * itself. Composes the oracle-exact cluster labeling with a
    * per-cluster argmax; the extra cost over dedup_clusters is one
    * keyed window on the (small) clustered subset plus an anti-join
    * for the singleton majority, which broadcasts the cluster
    * membership (near-dups are a small fraction of any real corpus).
    * The pair graph + labels come from the [[dedupComponents]] memo —
    * the ending consumes the SAME materialized cluster artifact the
    * rest of the family reads, not a private recomputation. */
  private def qCorpusDedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("n_chars"))
    val comp = dedupComponents(s, dir)
    val sizes = comp.groupBy(col("comp")).agg(count(lit(1)).as("cluster_size"))
    val best = comp.join(sizes, "comp")
      .join(docs, col("id") === col("doc_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("comp")).orderBy(col("n_chars").desc, col("doc_id").asc)))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("cluster_size"))
    val singles = docs.join(comp, docs("doc_id") === comp("id"), "left_anti")
      .select(col("doc_id"), lit(1L).as("cluster_size"))
    best.unionByName(singles).orderBy("doc_id")
  }

  /** LENGTH-WARMUP CURRICULUM ORDER — the training-order assembly
    * step (sequence-length warmup: Li et al., "The Stability-
    * Efficiency Dilemma", 2022): short documents first, so early
    * optimizer steps see short sequences. Docs that fail the shared
    * quality gate ([[graft.ops.Text.isLowQuality]] — the same
    * predicate corpus_clean filters on) never enter the curriculum;
    * survivors bucket into length tiers (50 tokens per tier, capped
    * at tier 9), and WITHIN a tier the order is the deterministic
    * id-hash shuffle (decorrelates source/crawl order — adjacent ids
    * are usually the same crawl slice, and a curriculum that feeds a
    * model one source at a time destabilizes training). The global
    * 1-based rank is [[graft.ops.Linkage.globalRank]]'s exact
    * two-pass ranking — range exchange + partition-local row_number +
    * broadcast offsets, never a single-partition window.
    *
    * Scale shape: one scan computes gate + tier + hash; the rank is
    * the two-pass primitive (the only global window is the
    * |partitions|-row offsets fold). No join on data, no collect.
    */
  private def qCorpusCurriculumOrder(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .where(!graft.ops.Text.isLowQuality(col("text")))
      .select(col("doc_id"),
        size(graft.ops.Text.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("tier", expr("least(n_tokens div 50, 9L)"))
      .withColumn("h", graft.ops.Sampling.hashVal(col("doc_id")))
    graft.ops.Linkage.globalRank(base, col("tier"), col("h"), col("doc_id"))
      .select(col("doc_id"), col("n_tokens"), col("tier"), col("rank"))
      .orderBy("doc_id")
  }

  /** Survivorship merge / GOLDEN RECORD (the master-data-management
    * ending of the dedup family; survivorship rules per Talburt,
    * "Entity Resolution and Information Quality", 2011): one
    * canonical row per near-dup cluster, each attribute elected by
    * its own rule — representative id = min doc_id, best length =
    * max n_chars (the keep-best rule), lang and source = cluster MODE
    * (count-desc, value-asc tie-break). Singletons are their own
    * cluster, so the output is a full deduplicated master table, not
    * just the clustered slice. The oracle re-elects every attribute
    * from the recursive-CTE component labels.
    *
    * Scale shape: rides the memoized component labels (the expensive
    * artifact, built once per session); everything downstream is
    * cluster-keyed group-bys — the two mode elections aggregate
    * (cluster, value) then take a rank-1 window INSIDE cluster
    * partitions, and the three result frames join on the cluster key.
    * No global window, no driver loop. */
  private def qCorpusGoldenRecord(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    val comp = dedupComponents(s, dir)
    val lab = docs.join(comp, docs("doc_id") === comp("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster"),
        col("lang"), col("source"), col("n_chars"))
      // feeds the base aggregate + two mode elections — three
      // consumers of one left join; pin it (family discipline)
      .localCheckpoint(true)
    val base = lab.groupBy(col("cluster")).agg(
      count(lit(1)).as("n_members"),
      min(col("doc_id")).as("rep_doc_id"),
      max(col("n_chars")).as("best_n_chars"))
    def mode(attr: String, out: String): DataFrame = {
      // explicit NULLS LAST: Spark sorts NULLS FIRST ascending, DuckDB
      // NULLS LAST — on a NULL-bearing attribute the default placements
      // would elect different canonical values engine-to-engine
      val w = Window.partitionBy(col("cluster"))
        .orderBy(col("cnt").desc, col(attr).asc_nulls_last)
      lab.groupBy(col("cluster"), col(attr))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("cluster"), col(attr).as(out))
    }
    base.join(mode("lang", "canon_lang"), "cluster")
      .join(mode("source", "canon_source"), "cluster")
      .select(col("cluster"), col("rep_doc_id"), col("n_members"),
        col("best_n_chars"), col("canon_lang"), col("canon_source"))
      .orderBy("cluster")
  }

  /** Frequent-itemset pairs (support + lift) over per-user event-type
    * baskets — the market-basket / co-occurrence mining primitive.
    * Support = users with both types; lift is emitted in integer basis
    * points ((10000·n_ab·N) div (n_a·n_b)) so the oracle hash-pins it.
    * Scale shape: the basket self-join co-partitions on user_id (both
    * sides are the same distinct frame — one exchange, reused), and
    * per-user output is bounded by |item vocabulary|² — at real scale
    * the standard move is capping per-user distinct items first, which
    * [[graft.ops.Sampling.capPerGroup]] already provides. */
  private def qEventsItemsetPairs(s: SparkSession, dir: String): DataFrame = {
    // the distinct basket frame feeds four consumers (both self-join
    // sides, the per-item counts, the user total) — pinned so the raw
    // scan + distinct shuffle run once, not five times (same
    // discipline as Graph.pageRank's edge table)
    val ut = Tables.events(s, dir).select(col("user_id"), col("event_type"))
      .distinct().localCheckpoint(true)
    val n1 = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val tot = ut.select(col("user_id")).distinct().agg(count(lit(1)).as("nt"))
    val p = ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_users"))
    p.join(broadcast(n1.select(col("event_type").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(n1.select(col("event_type").as("type_b"), col("n").as("n_b"))), "type_b")
      .crossJoin(broadcast(tot))
      // numerator and denominator ride DECIMAL(38,0): 10000·n_ab·N and
      // n_a·n_b both exceed 2^63 once user counts pass ~3·10^9, and a
      // wrapped long would corrupt the ratio silently; the quotient is
      // ≤ 10000·N so BIGINT again
      .select(col("type_a"), col("type_b"), col("n_users"),
        expr("CAST((10000 * CAST(n_users AS DECIMAL(38,0)) * nt)" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)").as("lift_bp"))
      .orderBy("type_a", "type_b")
  }

  /** Johnson–Lindenstrauss ±1 sign projection of the embeddings
    * (64 → 16 dims, [[Vectors.signProject]]): the ANN-prefilter /
    * embedding-compression primitive — distances survive (Achlioptas),
    * memory and per-pair compute drop 4×. Integer-exact, so the
    * oracle hash-pins the projected table (sampled components + the
    * full projected norm² — array columns stay out of the compare).
    * Pure scan-stage expression: one scan, zero shuffles before the
    * final sort. */
  private def qEmbRandomProjection(s: SparkSession, dir: String): DataFrame = {
    val proj = Tables.embeddings(s, dir)
      .select(col("vec_id"), Vectors.quantize(col("embedding")).as("qz"))
      .select(col("vec_id"), Vectors.signProject(col("qz"), 16, EMB_DIM).as("p"))
    proj.select(col("vec_id"),
        element_at(col("p"), 1).as("p0"), element_at(col("p"), 2).as("p1"),
        element_at(col("p"), 3).as("p2"), element_at(col("p"), 4).as("p3"),
        Vectors.intNorm2(col("p")).as("pnorm2"))
      .orderBy("vec_id")
  }

  /** EMBEDDING-SPACE DRIFT audit — cosine between the CENTROIDS of
    * two deterministic halves of the embedding table (vec_id parity =
    * the deployment-A/B or before/after-reencode split), plus the
    * squared L2 gap and the worst-drifting dimension's gap — the
    * regression check an embedding pipeline runs when the encoder,
    * preprocessing, or corpus mix changes (the vector-space sibling
    * of `events_drift_halves`). Exact integers throughout: centroids
    * in MILLI-quantized units via `sign(s)·(|s|·1000 div n)` — the
    * abs/sign form makes trunc and floor agree, so Spark's
    * toward-zero `div` and DuckDB's floor `//` cannot split on
    * negative sums — and cosine is emitted as `sign` + `cos²·10⁴`
    * cross-multiplied (the [[graft.ops.Dedup.embeddingNearDups]]
    * convention). Milli-centroid components are bounded by 10⁶
    * regardless of n, so every product fits DECIMAL(38,0)/HUGEINT at
    * ANY corpus size — the naive mean-free form (dot of raw sums)
    * would overflow its square past ~10⁶ rows.
    *
    * Scale shape: scan-stage quantize + posexplode, ONE dim-keyed
    * shuffle whose partial aggregates reduce to 64 rows map-side,
    * then a 64-row fold — no window, no join, no collect.
    */
  private def qEmbCentroidDrift(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(s, dir)
      .select((col("vec_id") % 2 === 0).as("ha"),
        posexplode(Vectors.quantize(col("embedding"))).as(Seq("dim", "qv")))
    q.groupBy(col("dim"))
      .agg(sum(when(col("ha"), col("qv")).otherwise(0L)).as("sa"),
        sum(when(!col("ha"), col("qv")).otherwise(0L)).as("sb"),
        sum(when(col("ha"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("ha"), 1L).otherwise(0L)).as("cb"))
      .select(
        // greatest(·, 1): an empty parity half has sum 0, so the
        // clamped division still yields the correct 0 centroid instead
        // of a Spark-NULL / DuckDB-error engine split
        expr("CAST(sign(sa) AS BIGINT) * ((abs(sa) * 1000) div greatest(ca, 1))")
          .as("ma"),
        expr("CAST(sign(sb) AS BIGINT) * ((abs(sb) * 1000) div greatest(cb, 1))")
          .as("mb"),
        col("ca"), col("cb"))
      .agg(min(col("ca")).as("n_a"), min(col("cb")).as("n_b"),
        sum(col("ma") * col("mb")).as("dot"),
        sum(col("ma") * col("ma")).as("n2a"),
        sum(col("mb") * col("mb")).as("n2b"),
        sum((col("ma") - col("mb")) * (col("ma") - col("mb")))
          .as("l2sq_diff_milli2"),
        max(abs(col("ma") - col("mb"))).as("max_dim_gap"))
      .select(col("n_a"), col("n_b"),
        expr("CAST(sign(dot) AS BIGINT)").as("dot_sign"),
        expr("""CAST((10000 * CAST(dot AS DECIMAL(38,0)) * dot)
                div greatest(CAST(n2a AS DECIMAL(38,0)) * n2b, 1)
                AS BIGINT)""").as("cos2_bp"),
        col("l2sq_diff_milli2"), col("max_dim_gap"))
  }

  /** Deterministic proportional interleave — the training-ORDER
    * primitive the mixture ops stop short of: each source's docs are
    * ranked by the id-hash (shuffle-stable) and spread evenly across
    * one epoch via the integer key `((r−1)·T) div n_s`, so a source
    * with 10% of the corpus occupies every ~10th slot instead of
    * arriving in a block. Emitting the KEY (not a global row_number)
    * keeps the operator shuffle-light: one source-keyed exchange
    * shared by both windows, no single-partition global sort — the
    * consumer range-sorts by ord_key only when it actually writes the
    * epoch. Reproducible across runs/partitionings/engines (integer
    * arithmetic + hash rank). */
  private def qCorpusInterleave(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val bySrc = Window.partitionBy(col("source"))
    val tot = docs.agg(count(lit(1)).as("t"))
    docs
      .withColumn("r", row_number().over(
        bySrc.orderBy(graft.ops.Sampling.bucket(col("doc_id")).asc,
          col("doc_id").asc)).cast("long"))
      .withColumn("n_s", count(lit(1)).over(bySrc).cast("long"))
      .crossJoin(broadcast(tot))
      // (r−1)·T rides DECIMAL(38,0): the product crosses 2^63 once the
      // corpus passes ~3·10^9 docs (T² growth); the key itself is < T,
      // so it lands back in BIGINT
      .select(col("doc_id"), col("source"), col("r"),
        expr("CAST((CAST(r - 1 AS DECIMAL(38,0)) * t) div n_s AS BIGINT)")
          .as("ord_key"))
      .orderBy("doc_id")
  }

  /** Top-20 bigram collocations by integer lift — the PMI-family
    * collocation miner (Church & Hanks, CL 1990) that surfaces
    * multi-word expressions worth protecting from tokenizer splits.
    * Log-PMI can't be engine-exact; the lift RATIO can: lift =
    * P(a,b) / (P(a)·P(b)) = cab·T² / (B·ca·cb) in basis points, with
    * the multiply order (((10⁴·cab·T) div ca)·T) div (B·cb) chosen so
    * the largest intermediate is bounded by 10⁴·T·T (cab ≤ ca keeps
    * the first quotient ≤ 10⁴·T) — inside DECIMAL(38,0) even at
    * T ~ 10¹³ tokens. Shape: two map-side-combined group-bys (unigram,
    * bigram counts), two token-keyed joins of bigram counts against
    * the unigram table, one broadcast scalar total, and a global
    * top-20 that runs as TakeOrderedAndProject (per-partition top-20,
    * never a full sort). Shuffle volume is the distinct-bigram count,
    * not the token count.
    */
  private def qTextCollocations(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val bi = toks.where(size(col("tk")) >= 2)
      .select(explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(count(lit(1)).as("cab"))
      .where(col("cab") >= 20)
    val tot = toks.agg(
      sum(size(col("tk")).cast("long")).as("t"),
      sum(greatest(size(col("tk")) - 1, lit(0)).cast("long")).as("b"))
    bi.join(uni.select(col("w").as("l"), col("cw").as("ca")), "l")
      .join(uni.select(col("w").as("r"), col("cw").as("cb")), "r")
      .crossJoin(broadcast(tot))
      .select(concat(col("l"), lit(" "), col("r")).as("bigram"), col("cab"),
        // Spark's `div` always narrows to BIGINT, so the quotient must
        // be re-widened to DECIMAL(38,0) BEFORE the second ·t — without
        // the cast that multiply runs in 64-bit and wraps silently past
        // ~10⁷ tokens (the DuckDB mirror stays HUGEINT throughout, so
        // the engines would diverge exactly at the documented scale)
        expr("CAST((CAST(((10000 * CAST(cab AS DECIMAL(38,0)) * t) div ca) " +
          "AS DECIMAL(38,0)) * t) " +
          "div (CAST(b AS DECIMAL(38,0)) * cb) AS BIGINT)").as("lift_bp"))
      .orderBy(col("lift_bp").desc, col("bigram"))
      .limit(20)
  }

  /** Chunk granularity ([[graft.ops.Dedup.ChunkTokens]]) — aliased for
    * the SQL mirror. */
  private val ChunkTokens = Dedup.ChunkTokens

  /** C4-style sub-document dedup (Raffel et al., JMLR 2020 dedup every
    * three-sentence span; RefinedWeb dedups lines): each doc splits
    * into consecutive 16-token chunks, every chunk occurrence after
    * the corpus-wide first (by (doc_id, pos)) is marked a duplicate,
    * and the query emits per-doc retention stats — the REMOVAL
    * operator that document-level near-dup detection stops short of
    * (a boilerplate header repeated across 10⁶ docs never makes the
    * docs near-dups, but every copy after the first is noise).
    * Winner selection is a group-by min over the chunk key, NOT a
    * row_number window: partial aggregation collapses a hot chunk
    * (the 100 TB boilerplate case) map-side, where a window would
    * drag every occurrence of the hot key into one task. The
    * (doc_id, pos) pair rides one BIGINT (pos < 2²⁰ — docs beyond 16M
    * tokens would need a wider packing) so MIN stays a single-column
    * aggregate in both engines. Two chunk-keyed shuffles (winner agg +
    * join back) co-partition; the per-doc rollup is the third, keyed
    * by doc.
    */
  private def qCorpusChunkDedup(s: SparkSession, dir: String): DataFrame = {
    val chunks = Dedup.tokenChunks(Tables.documents(s, dir), col("text"), col("doc_id"))
    val winners = chunks.groupBy("chunk").agg(min(col("k")).as("wk"))
    chunks.join(winners, "chunk")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("k") === col("wk"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("n_dup", col("n_chunks") - col("n_kept"))
      .orderBy("doc_id")
  }

  /** Literal query for [[qTextBm25Topk]] — one rare term (df ≈ 5%)
    * against two common ones, so the idf weighting is what the gate
    * actually exercises. */
  private val bm25Terms = Seq("dup", "spark", "hash")

  /** Integer-exact BM25 top-10 ([[graft.ops.Retrieval.bm25TopK]]) —
    * the ranked-retrieval serving shape (search / RAG context
    * selection) as one corpus scan: literal-term tf via scan-stage
    * array filters, one broadcast stats row, TakeOrderedAndProject
    * top-k. See Retrieval's scaladoc for the bit-length idf and
    * cross-multiplied tf-saturation arithmetic.
    */
  private def qTextBm25Topk(s: SparkSession, dir: String): DataFrame =
    graft.ops.Retrieval.bm25TopK(Tables.documents(s, dir),
      col("text"), col("doc_id"), bm25Terms, 10)

  /** DSIR-flavored importance resampling (Xie et al., NeurIPS 2023:
    * Data Selection via Importance Resampling, hashed n-gram
    * features): score every doc by how target-like its token
    * distribution is, where the target is the `lang = 'en'` slice.
    * Training pass: token occurrences hash into 64 buckets (the
    * feature-hashing trick, same `poly_hash` as the classifier) and
    * one 64-key group-by yields raw and target counts; the per-bucket
    * importance ratio w_b = 10⁶·P_target(b)/P_raw(b) =
    * (10⁶·tb·Tr) div (rb·Tt) is computed driver-side in BigInt (the
    * 64-row collect is bounded model metadata, the same pattern as
    * k-means centroids and PQ codebooks). Serving pass: the 64
    * weights ride the plan as a literal array and each doc's score —
    * the MEAN token importance ratio (DSIR's per-token log-ratio sum,
    * made integer-exact as a scaled ratio mean) — is one aggregate()
    * HOF over its token array: a pure scan-stage projection, zero
    * shuffles over the corpus at any scale. keep = score ≥ 10⁶ (doc
    * looks at least corpus-average target-like).
    */
  private def qCorpusImportanceResample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tok = docs
      .select(col("lang"), explode(Text.tokens(col("text"))).as("w"))
      .select(col("lang"), (Text.polyHash(col("w")) % 64).as("b"))
    val bk = tok.groupBy("b").agg(count(lit(1)).as("rb"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tb")).collect()
    val tr = bk.map(_.getAs[Long]("rb")).sum
    val tt = bk.map(_.getAs[Long]("tb")).sum
    val w = Array.fill(64)(0L)
    bk.foreach { r =>
      val (b, rb, tb) =
        (r.getAs[Long]("b").toInt, r.getAs[Long]("rb"), r.getAs[Long]("tb"))
      if (tb > 0 && tt > 0)
        w(b) = ((BigInt(1000000) * tb * tr) / (BigInt(rb) * tt)).toLong
    }
    val wLit = array(w.map(lit).toIndexedSeq: _*)
    docs.select(col("doc_id"), col("lang"), Text.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("lang"), size(col("tk")).cast("long").as("n_tokens"),
        aggregate(col("tk"), lit(0L), (acc, x) =>
          acc + element_at(wLit, (Text.polyHash(x) % 64).cast("int") + 1)).as("sw"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr("sw div n_tokens").as("score"),
        (expr("sw div n_tokens") >= 1000000L).as("keep"))
      .orderBy("doc_id")
  }

  /** Principal-direction projection ([[graft.ops.Pca]]): the corpus
    * Gram matrix aggregates distributed (4096-long bounded collect),
    * three integer power-iteration rounds run driver-side in BigInt,
    * and every vector projects onto the literal converged direction as
    * a scan-stage dot — the anisotropy-axis / whitening primitive for
    * embedding spaces. Oracle replays the identical integer recurrence
    * as CTEs, so pc1 is bit-exact across engines.
    */
  private def qEmbPcaProject(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val dirV = graft.ops.Pca.powerIterate(
      graft.ops.Pca.gram(emb, col("embedding"), EMB_DIM), rounds = 3)
    emb.select(col("vec_id"), col("label"),
        graft.ops.Pca.project(Vectors.quantize(col("embedding")), dirV).as("pc1"))
      .orderBy("vec_id")
  }

  /** Shared co-presence edge builder for the graph-mining family:
    * users sharing ≥ 4 capped (event_type, hour) cells. Blocking runs
    * through cells with the same deterministic hash-rank cap (50
    * users/cell) every dedup blocker uses, so a viral cell can never
    * go quadratic. The ≥ 4 support threshold is the edge analog of
    * every blocker's candidate-verify step: at ≥ 2 the fixture's
    * co-presence graph is near-complete (384k edges over 1.5k users
    * at sf0.1, avg degree 512 — measured) and downstream wedge volume
    * explodes on co-presence NOISE; ≥ 4 keeps real affinity (39k
    * edges, 44k triangles) at 1/60th the work.
    *
    * Memoized (AnnCache pattern, like the dedup pair graph): the
    * triangle census and the k-core both consume the identical edge
    * set, and at 100 TB the pair generation is the expensive artifact
    * — each family member reads the pinned build instead of re-paying
    * the cells self-join (~9 core-seconds per consumer at sf0.1). */
  private def coPresenceEdges(s: SparkSession, dir: String): DataFrame =
    graft.ops.AnnCache.memo(s, s"copresence:$dir") {
      graft.ops.AnnCache.pin(coPresenceEdgesBuild(s, dir))
    }

  /** Capped co-presence cells — the SHARED artifact every graph-edge
    * build reads (static ns ≥ 4 edges, timestamped temporal edges,
    * strength-weighted edges): one events scan + one per-cell
    * hash-rank cap, memoized per session so the three reach queries
    * don't re-scan and re-cap the same frame. `t` rides along for the
    * temporal build; the static builds ignore it (the distinct set is
    * unchanged — t is functionally dependent on the cell). */
  private def cappedCells(s: SparkSession, dir: String): DataFrame =
    graft.ops.AnnCache.memo(s, s"cappedcells:$dir") {
      graft.ops.AnnCache.pin {
        val cells = Tables.events(s, dir)
          .select(col("user_id"),
            concat(col("event_type"), lit("|"),
              date_trunc("hour", col("ts")).cast("string")).as("cell"),
            date_trunc("hour", col("ts")).as("t"))
          .distinct()
        graft.ops.Sampling
          .capPerGroup(cells, col("cell"), col("user_id"), cap = 50)
          .select(col("cell"), col("user_id"), col("t"))
      }
    }

  /** TIMESTAMPED co-presence edges — the temporal sibling of
    * [[coPresenceEdges]]: one edge per (pair, hour-cell) occurrence
    * instead of the ns ≥ 4 aggregate, keeping WHEN each contact
    * happened (the input [[graft.ops.Graph.temporalReach]] needs).
    * Same per-cell hash-rank cap bounds every cell at cap² pairs. */
  private def temporalEdges(s: SparkSession, dir: String): DataFrame =
    graft.ops.AnnCache.memo(s, s"temporaledges:$dir") {
      graft.ops.AnnCache.pin {
        val capped = cappedCells(s, dir)
        capped.select(col("cell"), col("user_id").as("a"), col("t"))
          .join(capped.select(col("cell"), col("user_id").as("b")), "cell")
          .where(col("a") < col("b"))
          .select(col("a"), col("b"), col("t")).distinct()
      }
    }

  private def coPresenceEdgesBuild(s: SparkSession, dir: String): DataFrame = {
    val capped = cappedCells(s, dir).select(col("cell"), col("user_id"))
    capped.select(col("cell"), col("user_id").as("a"))
      .join(capped.select(col("cell"), col("user_id").as("b")), "cell")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("ns"))
      .where(col("ns") >= 4)
      .select(col("a"), col("b"))
  }

  /** Triangle census over the co-presence graph
    * ([[graft.ops.Graph.triangleStats]]): degree-ordered orientation
    * bounds wedge volume at m^1.5 regardless of hub skew. One summary
    * row; every count engine-exact because the (deg, id) orientation
    * order is total. */
  private def qEventsTriangles(s: SparkSession, dir: String): DataFrame =
    graft.ops.Graph.triangleStats(coPresenceEdges(s, dir))

  /** CONNECTED COMPONENTS of the co-presence graph — the community
    * census completing the graph family (pagerank, k-core, triangles,
    * reachability, assortativity all read the same pinned edge set):
    * per component SIZE, how many components exist. The histogram is
    * the canonical fragmentation read (one giant component = a social
    * graph; many small ones = isolated cliques) and is deterministic
    * where per-node labels need a representative convention.
    * Labels come from [[graft.ops.Components.connectedComponentsAdaptive]]
    * (label-prop probe + Large-Star/Small-Star finish — O(log n)
    * rounds on deep graphs, the same engine the dedup clusters run);
    * the oracle recomputes via exact recursive min-reach closure.
    *
    * Scale shape: edge-keyed iterate to the adaptive engine, then one
    * (comp) count + one (size) count. No window, no collect.
    */
  private def qEventsComponents(s: SparkSession, dir: String): DataFrame =
    graft.ops.Components.connectedComponentsAdaptive(
        coPresenceEdges(s, dir)
          .select(col("a").as("doc_a"), col("b").as("doc_b")))
      .groupBy(col("comp")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("component_size"))
      .agg(count(lit(1)).as("n_components"))
      .orderBy("component_size")

  /** 3-core of the co-presence graph ([[graft.ops.Graph.kCore]],
    * 4 peeling rounds — fixture graphs converge in ≤ 2, and the
    * `converged` column in the output certifies it as data): the
    * dense-community extractor over the same edge set the triangle
    * census reads.
    */
  private def qEventsKcore(s: SparkSession, dir: String): DataFrame =
    graft.ops.Graph.kCore(coPresenceEdges(s, dir), k = 3, rounds = 4)

  /** Literal merge table for [[qTextBpeEncode]] — 8 rules in priority
    * order, with hierarchical composition ((sc,an) consumes (s,c) and
    * (a,n) output; (tabl,e) completes a whole-word merge chain). Single
    * source of truth for the Spark expression and the SQL mirror. */
  private val bpeMerges = Seq(
    "s" -> "c", "a" -> "n", "t" -> "a", "b" -> "l",
    "e" -> "r", "sc" -> "an", "ta" -> "bl", "tabl" -> "e")

  /** BPE tokenizer application ([[graft.ops.Text.bpeMergedCount]]):
    * per-doc subword token counts under the literal 8-rule merge
    * table, next to the raw pre-token count — the tokenizer-serving
    * pipeline stage (token budgeting, packing inputs, per-doc cost
    * estimates run on MERGED counts, not whitespace counts). Pure
    * scan-stage projection; compression_bp = how much the merges
    * shrank the symbol stream, exact in basis points.
    */
  private def qTextBpeEncode(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Text.bpeTokenCount(col("text")).as("n_pretokens"),
        Text.bpeMergedCount(bpeMerges).cast("long").as("n_bpe_tokens"),
        length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))
          .cast("long").as("n_chars"))
      .select(col("doc_id"), col("n_pretokens"), col("n_bpe_tokens"),
        expr("CAST(10000 * n_bpe_tokens div greatest(n_chars, 1) AS BIGINT)")
          .as("compression_bp"))
      .orderBy("doc_id")

  /** Stupid-backoff trigram LM scoring (Brants et al., EMNLP 2007 —
    * "Large Language Models in Machine Translation": at web scale the
    * unnormalized 0.4-backoff score replaces Kneser-Ney and quality
    * converges with data). Counts come from the TRAIN split only and
    * the val/test docs are scored against them — held-out scoring is
    * what makes backoff real (a corpus scored on its own counts never
    * backs off). Per trigram position, scaled 10⁶ and integer-exact:
    * c₃>0 → 10⁶·c₃ div c₂(w₁w₂); else bigram seen → 0.4-discounted
    * 4·10⁵·c₂(w₂w₃) div c₁(w₂); else unigram seen → 0.4²-discounted
    * 16·10⁴·c₁(w₃) div T; else 0 (OOV). Doc score = mean over
    * positions. Shape: three map-side-combined count tables from the
    * train split, five gram-keyed joins against the EVAL positions
    * only (the small side), one doc-keyed rollup — the canonical
    * count-then-join LM pipeline; nothing ever shuffles on more than
    * a gram key.
    */
  private def qTextTrigramBackoff(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), Text.tokens(col("text")).as("tk"),
        graft.ops.Sampling.assignSplit(col("doc_id")).as("split"))
    val train = docs.where(col("split") === "train")
    def grams(src: DataFrame, n: Int): DataFrame = {
      val sliced = (0 until n).map(o =>
        slice(col("tk"), lit(o + 1), size(col("tk")) - (n - 1)).as(s"w$o"))
      src.where(size(col("tk")) >= n)
        .select(col("doc_id"), explode(arrays_zip(sliced: _*)).as("g"))
        .select((col("doc_id") +: (0 until n).map(o => col(s"g.w$o").as(s"w$o"))): _*)
    }
    val uni = train.select(explode(col("tk")).as("u1"))
      .groupBy("u1").agg(count(lit(1)).as("c1"))
    val big = grams(train, 2).groupBy(col("w0").as("b1"), col("w1").as("b2"))
      .agg(count(lit(1)).as("c2"))
    val tri = grams(train, 3).groupBy(col("w0").as("t1"), col("w1").as("t2"),
        col("w2").as("t3")).agg(count(lit(1)).as("c3"))
    val tot = train.agg(sum(size(col("tk")).cast("long")).as("t"))
    val pos = grams(docs.where(col("split") =!= "train"), 3)
    val scored = pos
      .join(tri, col("w0") === col("t1") && col("w1") === col("t2") &&
        col("w2") === col("t3"), "left")
      .join(big.select(col("b1").as("p1"), col("b2").as("p2"), col("c2").as("cp")),
        col("w0") === col("p1") && col("w1") === col("p2"), "left")
      .join(big.select(col("b1").as("q1"), col("b2").as("q2"), col("c2").as("cb")),
        col("w1") === col("q1") && col("w2") === col("q2"), "left")
      .join(uni.select(col("u1").as("m1"), col("c1").as("cm")),
        col("w1") === col("m1"), "left")
      .join(uni.select(col("u1").as("m3"), col("c1").as("cw")),
        col("w2") === col("m3"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        // counts reach 10¹³ at full scale: the ×10⁶ product rides
        // DECIMAL(38,0); the quotient is ≤ 10⁶ so it lands in BIGINT
        when(col("c3").isNotNull,
          expr("CAST(1000000 * CAST(c3 AS DECIMAL(38,0)) div cp AS BIGINT)"))
          .when(col("cb").isNotNull,
            expr("CAST(400000 * CAST(cb AS DECIMAL(38,0)) div cm AS BIGINT)"))
          .when(col("cw").isNotNull,
            expr("CAST(160000 * CAST(cw AS DECIMAL(38,0)) div t AS BIGINT)"))
          .otherwise(0L).as("contrib"))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).as("n_trigrams"),
        expr("sum(contrib) div count(1)").as("score"))
      .orderBy("doc_id")
  }

  /** Memoized mutual 5-NN edge set over the embeddings at `dir`
    * ([[graft.ops.Similarity.mutualKnn]], bits = 6 so buckets hold
    * enough peers for a meaningful top-5). Shared by `emb_mutual_knn`
    * and `emb_label_spread` — the bucket self-join + top-k +
    * reciprocity check is the expensive artifact of the kNN-graph
    * family, and the [[graft.ops.AnnCache]] memo (keyed on dir and the
    * hyperparameters, same discipline as [[dedupPairs]]) makes the
    * build run once per session with every later consumer reading the
    * pinned frame. */
  private def mutualKnnEdges(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    // corpus-scaled width (occupancy ≤ 32 peers — comfortably above
    // the top-5 ask, so recall is bucket-bounded, not corpus-bounded);
    // bits = 6 at every driver fixture, the r14 constant
    val bits = Vectors.scaledLshBits(emb.count(), minBits = 6, occupancy = 32)
    graft.ops.AnnCache.memo(s, s"mutual-knn:$dir:k=5:bits=$bits") {
      graft.ops.AnnCache.pin(
        graft.ops.Similarity.mutualKnn(emb,
          col("embedding"), col("vec_id"), k = 5, bits = bits))
    }
  }

  /** Mutual 5-NN graph ([[mutualKnnEdges]]): the reciprocal-neighbor
    * edge set that k-NN-graph clustering and agreement-based semantic
    * dedup consume. Bucket-keyed self-join, WindowGroupLimit top-k,
    * one semi join for reciprocity — engine-exact by integer dot +
    * total rank order.
    */
  private def qEmbMutualKnn(s: SparkSession, dir: String): DataFrame =
    mutualKnnEdges(s, dir)
      .orderBy("vec_a", "vec_b")

  /** Corpus data card (Gebru et al., "Datasheets for Datasets", CACM
    * 2021) — the one-row corpus summary a dataset release ships:
    * volume (docs/tokens/vocab), composition (languages, split
    * sizes), and hygiene (exact-dup count, low-quality count, mean
    * length), every number exact and every signal THE SAME expression
    * the corresponding gate operator uses (fingerprint, isLowQuality,
    * assignSplit) so the card can't drift from the pipeline it
    * describes. One wide aggregate over one scan (the three
    * COUNT(DISTINCT) ride a single Expand, the lineitem_profile
    * pattern — at 100 TB swap the KMV/HLL sketch family in, same as
    * documented there) plus a vocab distinct on the exploded tokens.
    */
  private def qCorpusDatacard(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
      Text.tokens(col("text")).as("tk"), Text.fingerprint(col("text")).as("fp"),
      Text.isLowQuality(col("text")).as("lq"),
      graft.ops.Sampling.assignSplit(col("doc_id")).as("split"))
    val a = base.agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("tk")).cast("long")).as("n_tokens"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("fp")).as("n_unique_docs"),
      sum(when(col("lq"), 1L).otherwise(0L)).as("n_low_quality"),
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
      sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
    val vocab = base.select(explode(col("tk")).as("w"))
      .agg(countDistinct(col("w")).as("vocab_size"))
    a.crossJoin(broadcast(vocab))
      .select(col("n_docs"), col("n_tokens"), col("n_langs"),
        (col("n_docs") - col("n_unique_docs")).as("n_exact_dups"),
        col("n_low_quality"), col("n_train"), col("n_val"), col("n_test"),
        col("vocab_size"), expr("n_tokens div n_docs").as("mean_tokens"))
  }

  /** Longest consecutive-day activity streak per user — the retention
    * metric cohort tables can't express (gaps-and-islands over DISTINCT
    * active days: island key = epoch-day − row_number, constant within
    * a consecutive run). One user-keyed window shuffle; the two
    * aggregates above it reuse the same partitioning (no extra
    * exchange). Integer day arithmetic, so streak boundaries are
    * engine-exact.
    */
  private def qEventsUserStreaks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("d", datediff(col("day"), lit("1970-01-01")).cast("long"))
    val grp = days.withColumn("g",
      col("d") - row_number().over(Window.partitionBy("user_id").orderBy("d")))
    grp.groupBy("user_id", "g").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max(col("len")).as("longest_streak"),
        sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  /** Semi-supervised label spreading over the mutual-kNN graph (Zhu &
    * Ghahramani 2002 label propagation, in the data-annotation role:
    * a 10% labeled seed set annotates the rest of the corpus through
    * embedding-neighborhood majority votes). Two rounds; each
    * unlabeled vector adopts the majority label of its CURRENTLY
    * labeled mutual neighbors (count desc, label asc — a total order,
    * so the spread is engine-exact), seeds never change, and vectors
    * with no labeled neighbor stay null. Rides the same memoized
    * mutual-kNN edge set as `emb_mutual_knn` ([[mutualKnnEdges]] —
    * the expensive build is paid once per session, not per consumer;
    * each round is one edge-keyed join + one majority window on the
    * src key).
    */
  private def qEmbLabelSpread(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir)
    val mk = mutualKnnEdges(s, dir)
    val edges = mk.select(col("vec_a").as("src"), col("vec_b").as("dst"))
      .unionAll(mk.select(col("vec_b").as("src"), col("vec_a").as("dst")))
      .localCheckpoint(true) // 2 rounds re-read it; the kNN build runs once
    val seeds = emb.select(col("vec_id"),
      when(col("vec_id") % 10 === 0, col("label").cast("long")).as("lab"))
    var lab = seeds
    for (_ <- 1 to 2) {
      val nbr = edges
        .join(lab.select(col("vec_id").as("dst"), col("lab").as("nlab")), "dst")
        .where(col("nlab").isNotNull)
        .groupBy(col("src"), col("nlab")).agg(count(lit(1)).as("cnt"))
      val top = nbr.withColumn("rn", row_number().over(
          Window.partitionBy(col("src")).orderBy(col("cnt").desc, col("nlab").asc)))
        .where(col("rn") === 1).select(col("src"), col("nlab"))
      lab = lab.join(top, lab("vec_id") === top("src"), "left")
        .select(col("vec_id"), coalesce(col("lab"), col("nlab")).as("lab"))
    }
    seeds.select(col("vec_id"), col("lab").as("seed_label"))
      .join(lab.withColumnRenamed("lab", "spread_label"), "vec_id")
      .orderBy("vec_id")
  }

  /** ABC / Pareto classification of parts by revenue (the 80/20
    * inventory analysis): parts rank by lineitem revenue, the running
    * share of total revenue classifies A (≤ 70%), B (≤ 90%), C
    * (rest), and the query emits the 3-row class summary. Exactness:
    * revenue rides DECIMAL(18,2)→cents BIGINT, the running share is a
    * cross-multiplied comparison (100·cum vs k·total — no division at
    * all), and the (revenue desc, partkey) rank order is total. Scale
    * shape: the fact-table aggregate is one keyed shuffle; the window
    * then runs over the PART DIMENSION (≤ |parts| rows, 200k/SF in
    * TPC-H terms — dimension-scale by construction), and the class
    * rollup is 3 groups. The single-partition window is confined to
    * the pre-aggregated dimension, never the facts.
    */
  private def qPartsAbcAnalysis(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("partkey"))
      .agg(SparkEntry.decSumScaled(col("l_extendedprice") * (lit(1.0) - col("l_discount")),
        "decimal(18,4)", 10000, "rev_x10k"))
    val w = Window.orderBy(col("rev_x10k").desc, col("partkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = rev.agg(sum(col("rev_x10k")).as("total_x10k"))
    rev.withColumn("cum_x10k", sum(col("rev_x10k")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("cls",
        when(expr("100 * CAST(cum_x10k AS DECIMAL(38,0)) <= 70 * total_x10k"), "A")
          .when(expr("100 * CAST(cum_x10k AS DECIMAL(38,0)) <= 90 * total_x10k"), "B")
          .otherwise("C"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev_x10k")).as("class_rev_x10k"))
      .orderBy("cls")
  }

  /** Personalized PageRank over the same event-type transition graph
    * as `events_pagerank`, seeded on the types below 'm' (click,
    * error) — behavioral proximity to the seed behaviors, the
    * related-items form. Same pinned-edge/broadcast-rank shape and
    * 10¹² fixed-point arithmetic; only the teleport changes.
    */
  private def qEventsPpr(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("src", lag(col("event_type"), 1).over(w))
      .where(col("src").isNotNull)
      .groupBy(col("src"), col("event_type").as("dst"))
      .agg(count(lit(1)).as("w"))
    graft.ops.Graph.personalizedPageRank(edges, iters = 3, col("node") < "m")
      .select(col("node").as("event_type"), col("pr"))
      .orderBy("event_type")
  }

  /** k-anonymity audit (Sweeney 2002) over the events table: treat
    * (event_type, day) as the quasi-identifier and measure
    * re-identification risk — how many quasi-identifier groups have
    * fewer than k = 5 distinct users, and how many users sit in such
    * groups. The governance-side counterpart of text_pii_redact: one
    * keyed aggregate over (type, day), one rollup — no row-level data
    * leaves the aggregate. Emits one row per k-anonymity status so
    * the risky population is a first-class number.
    */
  private def qEventsKanonymity(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("group_size"))
      .withColumn("anonymous", col("group_size") >= 5)
      .groupBy(col("anonymous"))
      .agg(count(lit(1)).as("n_groups"), sum(col("group_size")).as("n_memberships"))
      .orderBy("anonymous")

  /** Benford first-digit distribution scaled to the leading digit
    * of each ×10⁶ expected share so both engines carry identical
    * literals. */
  private val benfordX1m: Map[Int, Long] = Map(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford's-law first-digit audit over order totals — the fraud /
    * synthetic-data detector (Nigrini's digital analysis; naturally
    * occurring amounts follow P(d) = log10(1 + 1/d), fabricated ones
    * rarely do). Exact arithmetic: the first digit comes from the
    * integer cents string, the observed share is ×10⁶ via integer
    * division, the expected share is a hard-coded public constant
    * table (log10 evaluated OFFLINE so no engine's libm enters the
    * result), and the deviation is an exact difference. One scan-stage
    * projection + a 9-group aggregate.
    */
  private def qOrdersBenford(s: SparkSession, dir: String): DataFrame = {
    val expected = benfordX1m.toSeq.sortBy(_._1)
      .map { case (d, e) => (lit(d), lit(e)) }
    val expCol = expected.tail.foldLeft(
      when(col("digit") === expected.head._1, expected.head._2)) {
      case (acc, (d, e)) => acc.when(col("digit") === d, e)
    }
    val digits = Tables.orders(s, dir)
      .select(substring(expr("CAST(CAST(abs(o_totalprice) * 100 AS DECIMAL(18,0)) AS STRING)"),
        1, 1).cast("int").as("digit"))
      .where(col("digit") >= 1) // zero-total orders carry no leading digit
    val tot = digits.agg(count(lit(1)).as("n_total"))
    digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("CAST(1000000 * CAST(n AS DECIMAL(38,0)) div n_total AS BIGINT)")
          .as("share_x1m"),
        expCol.as("benford_x1m"))
      .withColumn("dev_x1m", col("share_x1m") - col("benford_x1m"))
      .orderBy("digit")
  }

  /** Language-ID confusion matrix — the operator-evaluation query for
    * the langid heuristic (same pattern as the Bloom confusion table:
    * the engine measures its OWN classifier against the fixture's
    * ground-truth lang column, and the matrix is first-class data a
    * pipeline owner reads before trusting the filter). One scan-stage
    * classification + one (truth, guess)-keyed aggregate.
    */
  private def qTextLangidConfusion(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select((Seq(col("doc_id"), col("lang")) ++ Text.langScores("text")): _*)
      .withColumn("lang_guess", Text.langGuess)
      .groupBy(col("lang"), col("lang_guess"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_guess")

  // ---------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_apply_dispatch" -> (qCdcApplyDispatch _),
    "snapshot_plus_stream" -> (qSnapshotPlusStream _),
    "text_token_stats" -> (qTextTokenStats _),
    "text_quality" -> (qTextQuality _),
    "text_langid" -> (qTextLangid _),
    "text_fingerprint" -> (qTextFingerprint _),
    "events_distinct_users" -> (qEventsDistinctUsers _),
    "events_sliding_window" -> (qEventsSlidingWindow _),
    "corpus_clean" -> (qCorpusClean _),
    "events_asof_join" -> (qEventsAsofJoin _),
    "events_error_label" -> (qEventsErrorLabel _),
    "corpus_negative_samples" -> (qCorpusNegativeSamples _),
    "events_range_join" -> (qEventsRangeJoin _),
    "corpus_split" -> (qCorpusSplit _),
    "text_vocab_topk" -> (qTextVocabTopk _),
    "text_bpe_pairs" -> (qTextBpePairs _),
    "events_funnel" -> (qEventsFunnel _),
    "events_retention" -> (qEventsRetention _),
    "split_contamination" -> (qSplitContamination _),
    "split_bloom_contamination" -> (qSplitBloomContamination _),
    "text_bigram_lm" -> (qTextBigramLm _),
    "dedup_substring_span" -> (qDedupSubstringSpan _),
    "text_classifier_score" -> (qTextClassifierScore _),
    "emb_semdedup" -> (qEmbSemdedup _),
    "text_repetition" -> (qTextRepetition _),
    "corpus_stratified_sample" -> (qCorpusStratified _),
    "corpus_source_cap" -> (qCorpusSourceCap _),
    "corpus_quality_mixture" -> (qCorpusQualityMixture _),
    "corpus_pack" -> (qCorpusPack _),
    "corpus_folded_packing" -> (qCorpusFoldedPacking _),
    "events_ab_test" -> (qEventsAbTest _),
    "events_forecast_baseline" -> (qEventsForecastBaseline _),
    "events_lag_features" -> (qEventsLagFeatures _),
    "text_tfidf" -> (qTextTfidf _),
    "text_vocab_growth" -> (qTextVocabGrowth _),
    "emb_int8_quant_error" -> (qEmbInt8QuantError _),
    "text_length_quantiles" -> (qTextLengthQuantiles _),
    "text_pii_redact" -> (qTextPiiRedact _),
    "split_ngram_leakage" -> (qSplitNgramLeakage _),
    "split_ngram_novelty" -> (qSplitNgramNovelty _),
    "text_boilerplate" -> (qTextBoilerplate _),
    "text_sentiment" -> (qTextSentiment _),
    "dedup_exact" -> (qDedupExact _),
    "dedup_minhash_lsh" -> (qDedupMinhash _),
    "dedup_simhash" -> (qDedupSimhash _),
    "dedup_simhash_pairs" -> (qDedupSimhashPairs _),
    "dedup_clusters" -> (qDedupClusters _),
    "dedup_clusters_star" -> (qDedupClustersStar _),
    "dedup_clusters_adaptive" -> (qDedupClustersAdaptive _),
    "dedup_ngram_blocked" -> (qDedupNgramBlocked _),
    "dedup_edit_distance" -> (qDedupEditDistance _),
    "dedup_embedding_cos" -> (qDedupEmbedding _),
    "dedup_containment" -> (qDedupContainment _),
    "events_approx_quantiles" -> (qEventsApproxQuantiles _),
    "events_user_topk" -> (qEventsUserTopk _),
    "emb_norm_stats" -> (qEmbNormStats _),
    "emb_centroid_drift" -> (qEmbCentroidDrift _),
    "corpus_mixture_epochs" -> (qCorpusMixtureEpochs _),
    "events_approx_distinct" -> (qEventsApproxDistinct _),
    "events_kmv_churn" -> (qEventsKmvChurn _),
    "events_transitions" -> (qEventsTransitions _),
    "text_posting_lists" -> (qTextPostingLists _),
    "text_length_tiers" -> (qTextLengthTiers _),
    "events_hourly_dense" -> (qEventsHourlyDense _),
    "sim_topk_bruteforce" -> (qSimTopkBrute _),
    "sim_topk_lsh" -> (qSimTopkLsh _),
    "sim_topk_ivf" -> (qSimTopkIvf _),
    "sim_topk_pq" -> (qSimTopkPq _),
    "sim_topk_ivfpq" -> (qSimTopkIvfPq _),
    "multimodal_features" -> (qMultimodalFeatures _),
    "multimodal_phash_dup" -> (qMultimodalPhashDup _),
    "multimodal_imageio_cert" -> (qMultimodalImageioCert _),
    "multimodal_audio_cert" -> (qMultimodalAudioCert _),
    "events_rollup_merge" -> (qEventsRollupMerge _),
    "events_salted_join" -> (qEventsSaltedJoin _),
    "orders_delta_join" -> (qOrdersDeltaJoin _),
    "orders_delta_retract" -> (qOrdersDeltaRetract _),
    "orders_delta_rollup" -> (qOrdersDeltaRollup _),
    "events_session_window" -> (qEventsSessionWindow _),
    "cdc_active_sweep" -> (qCdcActiveSweep _),
    "events_value_mad" -> (qEventsValueMad _),
    "events_grouping_sets" -> (qEventsGroupingSets _),
    "corpus_incremental_dedup" -> (qCorpusIncrementalDedup _),
    "events_zorder_key" -> (qEventsZorderKey _),
    "dedup_prefix_filter" -> (qDedupPrefixFilter _),
    "events_cms_counts" -> (qEventsCmsCounts _),
    "events_rollup_kmv" -> (qEventsRollupKmv _),
    "cdc_avro_roundtrip" -> (qCdcAvroRoundtrip _),
    "sim_topk_filtered" -> (qSimTopkFiltered _),
    "corpus_weighted_sample" -> (qCorpusWeightedSample _),
    "events_pagerank" -> (qEventsPagerank _),
    "emb_kmeans" -> (qEmbKmeans _),
    "corpus_dedup_keep_best" -> (qCorpusDedupKeepBest _),
    "corpus_curriculum_order" -> (qCorpusCurriculumOrder _),
    "events_itemset_pairs" -> (qEventsItemsetPairs _),
    "emb_random_projection" -> (qEmbRandomProjection _),
    "emb_kmeans2" -> (qEmbKmeans2 _),
    "corpus_interleave" -> (qCorpusInterleave _),
    "sim_topk_ivf_filtered" -> (qSimTopkIvfFiltered _),
    "emb_kmeans_fp" -> (qEmbKmeansFp _),
    "sim_topk_ivfpq_filtered" -> (qSimTopkIvfPqFiltered _),
    "sim_topk_pq_filtered" -> (qSimTopkPqFiltered _),
    "text_collocations" -> (qTextCollocations _),
    "corpus_chunk_dedup" -> (qCorpusChunkDedup _),
    "text_bm25_topk" -> (qTextBm25Topk _),
    "corpus_importance_resample" -> (qCorpusImportanceResample _),
    "emb_pca_project" -> (qEmbPcaProject _),
    "events_triangles" -> (qEventsTriangles _),
    "events_components" -> (qEventsComponents _),
    "text_bpe_encode" -> (qTextBpeEncode _),
    "text_trigram_backoff" -> (qTextTrigramBackoff _),
    "emb_mutual_knn" -> (qEmbMutualKnn _),
    "corpus_datacard" -> (qCorpusDatacard _),
    "events_user_streaks" -> (qEventsUserStreaks _),
    "emb_label_spread" -> (qEmbLabelSpread _),
    "parts_abc_analysis" -> (qPartsAbcAnalysis _),
    "events_ppr" -> (qEventsPpr _),
    "events_kcore" -> (qEventsKcore _),
    "events_kanonymity" -> (qEventsKanonymity _),
    "orders_benford" -> (qOrdersBenford _),
    "text_langid_confusion" -> (qTextLangidConfusion _),
    "events_cms_exact" -> (qEventsCmsExact _),
    "events_quantiles_exact" -> (qEventsQuantilesExact _),
    "lineitem_profile_approx" -> (qLineitemProfileApprox _),
    "dedup_containment_prefix" -> (qDedupContainmentPrefix _),
    "text_clf_calibration" -> (qTextClfCalibration _),
    "text_zipf_audit" -> (qTextZipfAudit _),
    "text_skipgram_pairs" -> (qTextSkipgramPairs _),
    "corpus_leakage_safe_split" -> (qCorpusLeakageSafeSplit _),
    "corpus_rag_chunks" -> (qCorpusRagChunks _),
    "sim_mmr_rerank" -> (qSimMmrRerank _),
    "sim_hybrid_rrf" -> (qSimHybridRrf _),
    "events_winsorize" -> (qEventsWinsorize _),
    "events_winsorize_approx" -> (qEventsWinsorizeApprox _),
    "text_oov_rate" -> (qTextOovRate _),
    "events_funnel_windowed" -> (qEventsFunnelWindowed _),
    "corpus_token_budget" -> (qCorpusTokenBudget _),
    "emb_outliers" -> (qEmbOutliers _),
    "events_drift_halves" -> (qEventsDriftHalves _),
    "events_cuped" -> (qEventsCuped _),
    "events_twap" -> (qEventsTwap _),
    "events_drift_ks" -> (qEventsDriftKs _),
    "customer_gini" -> (qCustomerGini _),
    "lineitem_weighted_price" -> (qLineitemWeightedPrice _),
    "events_cusum" -> (qEventsCusum _),
    "events_decay_score" -> (qEventsDecayScore _),
    "customers_record_linkage" -> (qCustomersRecordLinkage _),
    "customers_snm_linkage" -> (qCustomersSnmLinkage _),
    "corpus_golden_record" -> (qCorpusGoldenRecord _),
    "part_skyline" -> (qPartSkyline _),
    "events_autocorr" -> (qEventsAutocorr _),
    "events_attribution" -> (qEventsAttribution _),
    "events_attribution_first" -> (qEventsAttributionFirst _),
    "events_concurrency" -> (qEventsConcurrency _),
    "events_equidepth" -> (qEventsEquidepth _),
    "events_temporal_reach" -> (qEventsTemporalReach _),
    "events_cheapest_reach" -> (qEventsCheapestReach _),
    "events_assortativity" -> (qEventsAssortativity _),
    "text_conjunctive" -> (qTextConjunctive _),
    "text_chi2_terms" -> (qTextChi2Terms _),
    "events_bfs_reach" -> (qEventsBfsReach _),
  )

  // ------------------------------------------------------- oracle SQL

  private val L = Fixtures.cdcLogSql
  private val TK = graft.ops.Text.tokensSql()

  /** Shared DuckDB CTEs for the co-presence edge builder — one source
    * of truth for every graph-mining oracle, mirroring
    * [[coPresenceEdges]] the same way TK mirrors Text.tokens. All
    * MATERIALIZED: the consumers reference `ed` multiple times. */
  private val coPresenceSql: String =
    s"""cells AS MATERIALIZED (SELECT DISTINCT user_id,
       |    event_type || '|' || CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS VARCHAR) AS cell
       |  FROM events),
       |cap AS MATERIALIZED (SELECT cell, user_id FROM (
       |    SELECT cell, user_id, row_number() OVER (PARTITION BY cell
       |      ORDER BY ${graft.ops.Sampling.capOrderSql("user_id")}) AS rk FROM cells)
       |  WHERE rk <= 50),
       |ed AS MATERIALIZED (SELECT x.user_id AS a, y.user_id AS b
       |       FROM cap x JOIN cap y ON x.cell = y.cell AND x.user_id < y.user_id
       |       GROUP BY 1, 2 HAVING COUNT(*) >= 4)""".stripMargin
  private val VALID_WHERE =
    """WHERE NOT (COALESCE(TRY_CAST(substr(emp_dob, 1, 4) AS INT), 0) <= 2007
      |             OR emp_salary <= 100 OR emp_id < 0)""".stripMargin

  private val SHINGLE3 =
    s"""t AS (SELECT doc_id, $TK AS tk FROM documents),
       |sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
       |       FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-2)) AS i) g
       |       WHERE len(tk) >= 3),
       |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)""".stripMargin

  private def jaccardTail(num: Int, den: Int): String =
    s"""inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b, i.inter, ca.n_sh + cb.n_sh - i.inter AS union_sz
       |FROM inter i
       |JOIN cnt ca ON ca.doc_id = i.doc_a
       |JOIN cnt cb ON cb.doc_id = i.doc_b
       |WHERE $den * i.inter >= $num * (ca.n_sh + cb.n_sh - i.inter)
       |ORDER BY doc_a, doc_b""".stripMargin

  private def containmentTail(num: Int, den: Int): String =
    s"""inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b, i.inter, least(ca.n_sh, cb.n_sh) AS min_sz
       |FROM inter i
       |JOIN cnt ca ON ca.doc_id = i.doc_a
       |JOIN cnt cb ON cb.doc_id = i.doc_b
       |WHERE $den * i.inter >= $num * least(ca.n_sh, cb.n_sh)
       |ORDER BY doc_a, doc_b""".stripMargin

  private val stopList = Text.stopwords.map(s => s"'$s'").mkString(", ")

  private val langScoreSql = Text.langMarkers.map { case (lang, ms) =>
    val list = ms.map(m => s"'$m'").mkString(", ")
    s"CAST(len(list_filter(tk, t -> t IN ($list))) AS BIGINT) AS s_$lang"
  }.mkString(",\n       ")

  private val langGuessSql = {
    val langs = Text.langMarkers.map(_._1)
    val cases = langs.map { lang =>
      val others = langs.filterNot(_ == lang).map(o => s"s_$o").mkString(", ")
      s"WHEN s_$lang > 0 AND s_$lang >= greatest($others) THEN '$lang'"
    }.mkString(" ")
    s"CASE $cases ELSE 'und' END"
  }

  private val (simhashBitSumsSql, simhashFpSql) = Dedup.simhashSql()
  private val (simhashWideSumsSql, simhashWideFpSql) =
    Dedup.simhashSqlN(Dedup.simhashPairBits)

  /** Recursive-CTE fixpoint (min reachable id per node) over the
    * MinHash near-dup pair graph — the independent oracle both
    * cluster formulations (label propagation and Large-Star/
    * Small-Star) are gated against. */
  /** DuckDB mirror of [[graft.ops.SemanticCluster.lloyd]] with
    * `refits` rounds, generated so both kmeans queries share one
    * source of truth (the Graph.rankStepSql pattern): seed assignment
    * a1 (`‖c‖² − 2·x·c` score, ties → lowest cid), then per round r a
    * (m_r, sums_r, cent_r) truncated-integer-mean refit and a dd_r /
    * a_{r+1} full-distance re-assignment; the final summary reads
    * a_{refits+1}. */
  private def kmeansOracleSql(refits: Int, seedsCte: String = ""): String = {
    val dim = EMB_DIM
    // default seeds: the k lowest-id vectors; callers may supply any
    // CTE chain ending in seeds(cid, cq, cn2) — e.g. the farthest-point
    // traversal of kcenterSeedsCte
    val seeds = if (seedsCte.nonEmpty) seedsCte else
      s"""seeds AS (SELECT vec_id AS cid, q AS cq,
         |          ${Vectors.intNorm2Sql("q", dim)} AS cn2 FROM q WHERE vec_id < 4)""".stripMargin
    val head =
      s"""WITH q AS (SELECT vec_id, ${Vectors.quantizeSql("embedding")} AS q FROM embeddings),
         |$seeds,
         |d1 AS (SELECT v.vec_id, v.q, s.cid,
         |       s.cn2 - 2 * ${Vectors.intDotSql("v.q", "s.cq", dim)} AS sc
         |       FROM q v CROSS JOIN seeds s),
         |a1 AS (SELECT vec_id, q, cid AS cl FROM (
         |         SELECT *, row_number() OVER (PARTITION BY vec_id
         |                   ORDER BY sc, cid) AS rn FROM d1) WHERE rn = 1)""".stripMargin
    val rounds = (1 to refits).map { r =>
      s""",
         |m$r AS (SELECT cl, COUNT(*) AS m FROM a$r GROUP BY cl),
         |sums$r AS (SELECT cl, i, SUM(q[i]) AS s
         |         FROM a$r, LATERAL (SELECT unnest(generate_series(1, $dim)) AS i) g
         |         GROUP BY cl, i),
         |cent$r AS (SELECT sums$r.cl, list(sums$r.s // m$r.m ORDER BY sums$r.i) AS cv
         |         FROM sums$r JOIN m$r ON sums$r.cl = m$r.cl GROUP BY sums$r.cl),
         |dd$r AS (SELECT v.vec_id, v.q, c.cl,
         |         CAST(list_sum(list_transform(generate_series(1, $dim),
         |           i -> (v.q[i] - c.cv[i]) * (v.q[i] - c.cv[i]))) AS BIGINT) AS d2
         |       FROM q v CROSS JOIN cent$r c),
         |a${r + 1} AS (SELECT vec_id, q, cl, d2 FROM (
         |         SELECT *, row_number() OVER (PARTITION BY vec_id
         |                   ORDER BY d2, cl) AS rn FROM dd$r) WHERE rn = 1)""".stripMargin
    }.mkString
    val fin = refits + 1
    val tail =
      s""",
         |rep AS (SELECT cl, vec_id AS rep_vec_id FROM (
         |         SELECT cl, vec_id, row_number() OVER (PARTITION BY cl
         |                   ORDER BY d2, vec_id) AS rn FROM a$fin) WHERE rn = 1)
         |SELECT a.cl AS cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
         |       CAST(SUM(a.d2) AS BIGINT) AS inertia, MIN(r.rep_vec_id) AS rep_vec_id
         |FROM a$fin a JOIN rep r ON a.cl = r.cl
         |GROUP BY a.cl ORDER BY cluster""".stripMargin
    head + rounds + tail
  }

  /** CTE chain for [[kmeansOracleSql]]'s `seedsCte` mirroring
    * [[graft.ops.SemanticCluster.farthestPointSeedIds]]: fc1 = lowest
    * id, then each fc_j takes the max-min-distance row (ties → lowest
    * id), with fd_j folding the new center into the running min. */
  private def kcenterSeedsCte(k: Int): String = {
    val dim = EMB_DIM
    val head =
      s"""n AS (SELECT vec_id, q, ${Vectors.intNorm2Sql("q", dim)} AS n2 FROM q),
         |fc1 AS (SELECT vec_id, q, n2 FROM n ORDER BY vec_id LIMIT 1),
         |fd1 AS (SELECT v.vec_id, v.q, v.n2,
         |        v.n2 + c.n2 - 2 * ${Vectors.intDotSql("v.q", "c.q", dim)} AS dmin
         |        FROM n v CROSS JOIN fc1 c WHERE v.vec_id <> c.vec_id)""".stripMargin
    val steps = (2 to k).map { j =>
      val pick =
        s""",
           |fc$j AS (SELECT vec_id, q, n2 FROM fd${j - 1}
           |        ORDER BY dmin DESC, vec_id ASC LIMIT 1)""".stripMargin
      // each fold also DROPS the picked row (d.vec_id <> c.vec_id),
      // mirroring the engine's exclusion of already-chosen ids: a
      // duplicate vector would otherwise tie its chosen twin at
      // dmin = 0 and the lowest-id tie-break could re-pick it
      val fold = if (j == k) "" else
        s""",
           |fd$j AS (SELECT d.vec_id, d.q, d.n2,
           |        least(d.dmin, d.n2 + c.n2 - 2 * ${Vectors.intDotSql("d.q", "c.q", dim)}) AS dmin
           |        FROM fd${j - 1} d CROSS JOIN fc$j c WHERE d.vec_id <> c.vec_id)""".stripMargin
      pick + fold
    }.mkString
    val union = (1 to k)
      .map(j => s"SELECT vec_id AS cid, q AS cq, n2 AS cn2 FROM fc$j")
      .mkString(" UNION ALL ")
    s"$head$steps,\nseeds AS ($union)"
  }

  private lazy val dedupClustersCtes: String =
    s"""WITH RECURSIVE $SHINGLE3,
       |${Dedup.minhashBandSqlCtes(8, 4)},
       |ok AS (SELECT doc_id, band, bk FROM (
       |         SELECT *, COUNT(*) OVER (PARTITION BY band, bk) AS bsz FROM band)
       |       WHERE bsz <= 100),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM ok x JOIN ok y
       |         ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
       |inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN sh sa ON sa.doc_id = c.doc_a
       |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
       |  GROUP BY 1, 2),
       |pairs AS (SELECT i.doc_a, i.doc_b
       |  FROM inter i
       |  JOIN cnt ca ON ca.doc_id = i.doc_a
       |  JOIN cnt cb ON cb.doc_id = i.doc_b
       |  WHERE 2 * i.inter >= 1 * (ca.n_sh + cb.n_sh - i.inter)),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
       |cc AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
       |sz AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |       FROM cc GROUP BY 1)""".stripMargin

  private lazy val dedupClustersOracle: String =
    s"""$dedupClustersCtes
       |SELECT cc.id AS doc_id, cc.comp AS rep_doc_id, sz.cluster_size
       |FROM cc JOIN sz ON cc.comp = sz.comp
       |ORDER BY doc_id""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // encode∘decode ≡ id: the oracle is the plain log projection; the
    // Spark side pushes every row through the binary Avro wire first
    "cdc_avro_roundtrip" -> (L +
      """SELECT emp_id, event_id, action, emp_salary, emp_city,
        |       CAST(last_updated_at AS TIMESTAMP) AS last_updated_at
        |FROM cdc_log ORDER BY emp_id, event_id""".stripMargin),

    "cdc_apply_dispatch" -> (L +
      s""", v AS (SELECT * FROM cdc_log $VALID_WHERE),
         |d AS (SELECT *, max(CASE WHEN action = 'delete' THEN event_id END)
         |        OVER (PARTITION BY emp_id) AS _d FROM v),
         |i AS (SELECT *, min(CASE WHEN action = 'insert' AND (_d IS NULL OR event_id > _d)
         |        THEN event_id END) OVER (PARTITION BY emp_id) AS _i FROM d),
         |u AS (SELECT *, max(CASE WHEN action = 'update' AND _i IS NOT NULL AND event_id > _i
         |        THEN event_id END) OVER (PARTITION BY emp_id) AS _u FROM i)
         |SELECT emp_id, event_id, action, emp_salary,
         |       CAST(last_updated_at AS TIMESTAMP) AS last_updated_at
         |FROM u WHERE event_id = COALESCE(_u, _i) ORDER BY emp_id""".stripMargin),

    "snapshot_plus_stream" -> (L +
      """, snap AS (SELECT c_custkey AS emp_id, c_name AS name,
        |    CAST(floor(c_acctbal) AS BIGINT) AS val,
        |    TIMESTAMP '2020-01-01 00:00:00' AS ts,
        |    CAST(-1 AS BIGINT) AS ord, 'insert' AS action, 'snapshot' AS src
        |  FROM customer),
        |delta AS (SELECT emp_id, emp_FN AS name, emp_salary AS val,
        |    CAST(last_updated_at AS TIMESTAMP) AS ts, event_id AS ord, action,
        |    'stream' AS src FROM cdc_log),
        |u AS (SELECT * FROM snap UNION ALL SELECT * FROM delta),
        |r AS (SELECT *, row_number() OVER (PARTITION BY emp_id
        |    ORDER BY ts DESC, ord DESC) AS rn FROM u)
        |SELECT emp_id, name, val, ts, src FROM r
        |WHERE rn = 1 AND action <> 'delete' ORDER BY emp_id""".stripMargin),

    // same validation filter as cdc_scd2_history; lead() before the
    // delete filter (a delete closes the prior version); per-instant
    // delta grouping before the running sum (tie-order independence)
    "cdc_active_sweep" -> (L +
      """, valid AS (
        |  SELECT * FROM cdc_log
        |  WHERE NOT (COALESCE(TRY_CAST(substr(emp_dob, 1, 4) AS INT), 0) <= 2007
        |             OR emp_salary <= 100 OR emp_id < 0)),
        |v AS (SELECT *, lead(last_updated_at) OVER (PARTITION BY emp_id
        |        ORDER BY last_updated_at, event_id) AS valid_to FROM valid),
        |nv AS (SELECT * FROM v WHERE action <> 'delete'),
        |d AS (SELECT last_updated_at AS t, 1 AS dd FROM nv
        |      UNION ALL
        |      SELECT valid_to, -1 FROM nv WHERE valid_to IS NOT NULL),
        |net AS (SELECT t, CAST(SUM(dd) AS BIGINT) AS net FROM d GROUP BY 1)
        |SELECT CAST(t AS TIMESTAMP) AS ts, net,
        |       CAST(SUM(net) OVER (ORDER BY t
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS n_active
        |FROM net ORDER BY ts""".stripMargin),

    "text_token_stats" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents)
         |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |       CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct
         |FROM t ORDER BY doc_id""".stripMargin,

    "corpus_curriculum_order" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |q AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM t
         |      WHERE NOT (len(tk) < 10 OR
         |        100 * len(list_filter(tk, t -> t IN ($stopList))) > 60 * len(tk))),
         |r AS (SELECT doc_id, n_tokens,
         |        CAST(least(n_tokens // 50, 9) AS BIGINT) AS tier FROM q)
         |SELECT doc_id, n_tokens, tier,
         |       CAST(row_number() OVER (ORDER BY tier,
         |         ${graft.ops.Sampling.hashValSql("doc_id")}, doc_id) AS BIGINT) AS rank
         |FROM r ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk,
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(tk, t -> t IN ($stopList))) AS BIGINT) AS n_stop,
         |  CAST(len(list_filter(tk, t -> length(t) <= 2)) AS BIGINT) AS n_short,
         |  CAST(length(norm) - length(regexp_replace(norm, '[^a-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
         |  (len(tk) < 10 OR
         |   100 * len(list_filter(tk, t -> t IN ($stopList))) > 60 * len(tk)) AS is_low_quality
         |FROM t ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, $TK AS tk FROM documents),
         |s AS (SELECT doc_id, lang,
         |       $langScoreSql
         |  FROM t)
         |SELECT doc_id, lang, s_en, s_es, s_de, s_fr,
         |       $langGuessSql AS lang_guess
         |FROM s ORDER BY doc_id""".stripMargin,

    "events_distinct_users" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_transitions" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS from_type
        |  FROM events)
        |SELECT from_type, event_type AS to_type, COUNT(*) AS n
        |FROM o WHERE from_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "text_posting_lists" ->
      s"""WITH toks AS (SELECT doc_id, unnest($TK) AS token FROM documents),
         |vocab AS (SELECT token FROM (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1)
         |          ORDER BY cnt DESC, token ASC LIMIT 30),
         |dt AS (SELECT DISTINCT token, doc_id FROM toks
         |       WHERE token IN (SELECT token FROM vocab)),
         |dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         |top20 AS (SELECT token, doc_id FROM (
         |            SELECT *, row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rk
         |            FROM dt) WHERE rk <= 20),
         |p AS (SELECT token, array_to_string(list_sort(list(doc_id)), ',') AS postings
         |      FROM top20 GROUP BY 1)
         |SELECT dfreq.token, dfreq.df, p.postings
         |FROM dfreq JOIN p ON dfreq.token = p.token
         |ORDER BY dfreq.token""".stripMargin,

    "events_kmv_churn" -> {
      val h = graft.ops.Sampling.hashValSql("user_id")
      s"""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
         |tagu AS (SELECT d AS pd, 1 AS in_a, 0 AS in_b, user_id FROM du
         |         UNION ALL SELECT d - 1, 0, 1, user_id FROM du),
         |exu AS (SELECT pd, user_id, MAX(in_a) AS in_a, MAX(in_b) AS in_b
         |        FROM tagu GROUP BY 1, 2),
         |ex AS (SELECT pd, CAST(COUNT(*) AS BIGINT) AS n_union,
         |         CAST(SUM(in_a * in_b) AS BIGINT) AS n_both
         |       FROM exu GROUP BY 1 HAVING MAX(in_a) = 1 AND MAX(in_b) = 1),
         |sk AS (SELECT d, h FROM (
         |         SELECT d, $h AS h,
         |                row_number() OVER (PARTITION BY d ORDER BY $h) AS rk
         |         FROM du) WHERE rk <= 32),
         |tags AS (SELECT d AS pd, 1 AS in_a, 0 AS in_b, h FROM sk
         |         UNION ALL SELECT d - 1, 0, 1, h FROM sk),
         |mg AS (SELECT pd, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
         |       FROM tags GROUP BY 1, 2),
         |mk AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY pd ORDER BY h) AS rk
         |                      FROM mg) WHERE rk <= 32),
         |es AS (SELECT pd, CAST(COUNT(*) AS BIGINT) AS k_union,
         |         CAST(SUM(in_a * in_b) AS BIGINT) AS k_both,
         |         MAX(h) AS h_k
         |       FROM mk GROUP BY 1)
         |SELECT es.pd AS day, k_union, k_both,
         |       (10000 * k_both) // k_union AS est_jaccard_bp,
         |       (10000 * n_both) // n_union AS jaccard_bp,
         |       CASE WHEN k_union < 32 THEN k_union
         |            ELSE ((k_union - 1) * ${graft.ops.Sampling.P}) // h_k END AS est_union,
         |       n_union, n_both
         |FROM es JOIN ex ON es.pd = ex.pd
         |ORDER BY day""".stripMargin
    },

    "events_rollup_kmv" -> {
      val h = graft.ops.Sampling.hashValSql("user_id")
      s"""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, event_type, user_id
         |            FROM events),
         |hp AS (SELECT d, event_type, $h AS h FROM du),
         |pk AS (SELECT * FROM (
         |         SELECT *, row_number() OVER (PARTITION BY d, event_type ORDER BY h) AS rk
         |         FROM hp) WHERE rk <= 32),
         |mg AS (SELECT DISTINCT event_type, h FROM pk),
         |mk AS (SELECT * FROM (
         |         SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
         |         FROM mg) WHERE rk <= 32),
         |es AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS k_union, MAX(h) AS h_k
         |       FROM mk GROUP BY 1),
         |ex AS (SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
         |       FROM du GROUP BY 1)
         |SELECT es.event_type, k_union,
         |       CASE WHEN k_union < 32 THEN k_union
         |            ELSE ((k_union - 1) * ${graft.ops.Sampling.P}) // h_k END AS est_distinct,
         |       n_distinct
         |FROM es JOIN ex ON es.event_type = ex.event_type
         |ORDER BY es.event_type""".stripMargin
    },

    "events_sliding_window" ->
      """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
        |w AS (SELECT event_type, value,
        |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000
        |                   - k * 1800000000) AS w_start
        |  FROM e, LATERAL (SELECT unnest([0, 1]) AS k) s)
        |SELECT w_start, w_start + INTERVAL 1 HOUR AS w_end, event_type,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_x100
        |FROM w GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin,

    "text_fingerprint" ->
      s"""WITH t AS (SELECT doc_id,
         |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm FROM documents)
         |SELECT doc_id, md5(norm) AS fingerprint,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(norm, ''), c -> CAST(ascii(c) AS BIGINT))),
         |    (acc, c) -> (acc * 31 + c) % 1000000007) AS rolling_hash,
         |  CAST(len(regexp_extract_all(norm, '${Text.bpeTokenPattern}', 0)) AS BIGINT) AS n_bpe_tokens
         |FROM t ORDER BY doc_id""".stripMargin,

    "corpus_split" ->
      s"""SELECT ${graft.ops.Sampling.assignSplitSql("doc_id")} AS split, lang,
         |       COUNT(*) AS n_docs,
         |       CAST(SUM(len($TK)) AS BIGINT) AS n_tokens
         |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
        |  FROM ev GROUP BY 1),
        |s2 AS (SELECT e.user_id, s1.t_signup,
        |    MIN(CASE WHEN e.event_type = 'click' AND e.ts >= s1.t_signup
        |        THEN e.ts END) AS t_click
        |  FROM ev e JOIN s1 ON e.user_id = s1.user_id GROUP BY 1, 2),
        |s3 AS (SELECT e.user_id, s2.t_signup, s2.t_click,
        |    MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= s2.t_click
        |        THEN e.ts END) AS t_purchase
        |  FROM ev e JOIN s2 ON e.user_id = s2.user_id GROUP BY 1, 2, 3),
        |agg AS (SELECT
        |    COUNT(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS n_signup,
        |    COUNT(CASE WHEN t_click IS NOT NULL THEN 1 END) AS n_click_after,
        |    COUNT(CASE WHEN t_purchase IS NOT NULL THEN 1 END) AS n_purchase_after
        |  FROM s3)
        |SELECT stage, n_users FROM (
        |  SELECT 'signup' AS stage, n_signup AS n_users FROM agg
        |  UNION ALL SELECT 'click_after', n_click_after FROM agg
        |  UNION ALL SELECT 'purchase_after', n_purchase_after FROM agg)
        |ORDER BY stage""".stripMargin,

    "events_retention" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |cohort AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
        |  FROM ev WHERE event_type = 'signup' GROUP BY 1),
        |active AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM ev)
        |SELECT c.cohort_week, CAST(floor(date_diff('day', c.cohort_week, a.week) / 7) AS BIGINT) AS week_offset,
        |       COUNT(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN cohort c ON a.user_id = c.user_id
        |WHERE a.week >= c.cohort_week
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "text_vocab_topk" ->
      s"""WITH t AS (SELECT unnest($TK) AS token FROM documents)
         |SELECT token, COUNT(*) AS n FROM t
         |GROUP BY 1 ORDER BY n DESC, token ASC LIMIT 100""".stripMargin,

    // two aligned unnests over the list sliced against its own shift —
    // the same zip-with-shift the engine runs; both slices are empty
    // when a doc has < 2 pre-tokens (the engine's size >= 2 guard)
    "text_bpe_pairs" ->
      s"""WITH t AS (SELECT regexp_extract_all(lower(trim(text)),
         |                    '${Text.bpeTokenPattern}', 0) AS tk
         |           FROM documents),
         |p AS (SELECT unnest(tk[1:len(tk)-1]) AS "left",
         |             unnest(tk[2:len(tk)]) AS "right" FROM t)
         |SELECT "left", "right", CAST(COUNT(*) AS BIGINT) AS n
         |FROM p GROUP BY 1, 2
         |ORDER BY n DESC, "left" ASC, "right" ASC LIMIT 30""".stripMargin,

    "split_contamination" ->
      s"""WITH $SHINGLE3,
         |${Dedup.minhashBandSqlCtes(8, 4)},
         |ok AS (SELECT doc_id, band, bk FROM (
         |         SELECT *, COUNT(*) OVER (PARTITION BY band, bk) AS bsz FROM band)
         |       WHERE bsz <= 100),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM ok x JOIN ok y
         |         ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.doc_a
         |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2),
         |pairs AS (SELECT i.doc_a, i.doc_b
         |  FROM inter i
         |  JOIN cnt ca ON ca.doc_id = i.doc_a
         |  JOIN cnt cb ON cb.doc_id = i.doc_b
         |  WHERE 2 * i.inter >= 1 * (ca.n_sh + cb.n_sh - i.inter)),
         |sp AS (SELECT doc_id, ${graft.ops.Sampling.assignSplitSql("doc_id")} AS split
         |  FROM documents)
         |SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b
         |FROM pairs p
         |JOIN sp sa ON p.doc_a = sa.doc_id
         |JOIN sp sb ON p.doc_b = sb.doc_id
         |WHERE sa.split <> sb.split
         |ORDER BY p.doc_a, p.doc_b""".stripMargin,

    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |gr AS (SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
         |       FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-1)) AS i) u
         |       WHERE len(tk) >= 2),
         |per AS (SELECT doc_id, g, COUNT(*) AS cnt FROM gr GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
         |               CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
         |               CAST(MAX(cnt) AS BIGINT) AS top_gram_n
         |        FROM per GROUP BY 1)
         |SELECT d.doc_id,
         |  COALESCE(a.n_grams, 0) AS n_grams,
         |  COALESCE(a.n_distinct_grams, 0) AS n_distinct_grams,
         |  COALESCE(a.top_gram_n, 0) AS top_gram_n,
         |  CASE WHEN COALESCE(a.n_grams, 0) > 0
         |       THEN (10000 * (a.n_grams - a.n_distinct_grams)) // a.n_grams
         |       ELSE 0 END AS dup_gram_bp,
         |  CASE WHEN COALESCE(a.n_grams, 0) > 0
         |       THEN (10000 * a.top_gram_n) // a.n_grams
         |       ELSE 0 END AS top_gram_bp
         |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "corpus_stratified_sample" ->
      s"""SELECT lang, COUNT(*) AS n_docs, CAST(SUM(len($TK)) AS BIGINT) AS n_tokens
         |FROM documents
         |WHERE ${graft.ops.Sampling.stratifiedSampleSql("doc_id", "lang", strataRates)}
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_quality_mixture" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |c AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |        CASE WHEN len(tk) < 10
         |                  OR 100 * len(list_filter(tk, t -> t IN ($stopList))) > 60 * len(tk)
         |             THEN 'low'
         |             WHEN len(tk) >= 60 THEN 'high' ELSE 'mid' END AS tier
         |      FROM t),
         |k AS (SELECT *, ${graft.ops.Sampling.stratifiedSampleSql("doc_id", "tier",
                Map("high" -> 10000, "mid" -> 5000, "low" -> 1000))} AS kept FROM c)
         |SELECT tier, COUNT(*) AS n_docs,
         |       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    "corpus_source_cap" ->
      s"""WITH r AS (SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source
         |       ORDER BY ${graft.ops.Sampling.capOrderSql("doc_id")}) AS BIGINT) AS rk
         |  FROM documents)
         |SELECT doc_id, source, rk FROM r WHERE rk <= 30
         |ORDER BY doc_id""".stripMargin,

    "corpus_folded_packing" ->
      s"""WITH d AS (SELECT doc_id,
         |    CAST(len(${graft.ops.Text.tokensSql()}) AS BIGINT) AS n_tok
         |  FROM documents),
         |r AS (SELECT doc_id, n_tok, CAST(row_number() OVER (
         |    ORDER BY n_tok DESC, doc_id) AS BIGINT) AS rank FROM d),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
         |lo AS (SELECT rank AS pair_id, doc_id AS doc_a, n_tok AS tok_a,
         |         (SELECT n FROM n) + 1 - rank AS prank
         |       FROM r WHERE rank * 2 <= (SELECT n FROM n) + 1),
         |p AS (SELECT lo.pair_id, lo.doc_a,
         |        CASE WHEN hi.doc_id <> lo.doc_a THEN hi.doc_id END AS doc_b,
         |        lo.tok_a + CASE WHEN hi.doc_id <> lo.doc_a
         |                        THEN hi.n_tok ELSE 0 END AS pair_tokens
         |      FROM lo JOIN r hi ON hi.rank = lo.prank)
         |SELECT pair_id, doc_a, doc_b, pair_tokens,
         |       CAST(pair_tokens <= 2048 AS BIGINT) AS fits,
         |       least(10000, (10000 * pair_tokens) // 2048) AS fill_bp
         |FROM p ORDER BY pair_id""".stripMargin,

    "events_forecast_baseline" ->
      """WITH d AS MATERIALIZED (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_scored,
        |       CAST(SUM(abs(a.n - b.n)) AS BIGINT) AS sum_abs_err,
        |       CAST(SUM(a.n) AS BIGINT) AS sum_actual,
        |       (10000 * CAST(SUM(abs(a.n - b.n)) AS BIGINT))
        |         // greatest(CAST(SUM(a.n) AS BIGINT), 1) AS wape_bp
        |FROM d a JOIN d b
        |  ON a.event_type = b.event_type AND a.day = b.day + 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_lag_features" ->
      """WITH d AS MATERIALIZED (SELECT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |dd AS MATERIALIZED (SELECT user_id, day, n,
        |    datediff('day', DATE '1970-01-01', day) AS dnum FROM d)
        |SELECT a.user_id, a.day, a.n,
        |       COALESCE(l1.n, 0) AS n_lag1,
        |       COALESCE(l7.n, 0) AS n_lag7,
        |       CAST(SUM(a.n) OVER (PARTITION BY a.user_id ORDER BY a.dnum
        |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        |FROM dd a
        |LEFT JOIN dd l1 ON l1.user_id = a.user_id AND l1.dnum = a.dnum - 1
        |LEFT JOIN dd l7 ON l7.user_id = a.user_id AND l7.dnum = a.dnum - 7
        |ORDER BY a.user_id, a.day""".stripMargin,

    "text_vocab_growth" ->
      s"""WITH tok AS (SELECT DISTINCT doc_id, token FROM (
         |    SELECT doc_id, unnest(${graft.ops.Text.tokensSql()}) AS token
         |    FROM documents)),
         |f AS (SELECT token, MIN(doc_id) AS doc_id FROM tok GROUP BY 1),
         |n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS new_terms
         |      FROM f GROUP BY 1)
         |SELECT d.doc_id, COALESCE(n.new_terms, 0) AS new_terms,
         |       CAST(SUM(COALESCE(n.new_terms, 0)) OVER (ORDER BY d.doc_id)
         |         AS BIGINT) AS cum_vocab
         |FROM documents d LEFT JOIN n USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "emb_int8_quant_error" ->
      s"""WITH q AS (SELECT label, ${Vectors.quantizeSql("embedding")} AS q
         |           FROM embeddings),
         |sc AS (SELECT label, q,
         |         -- COALESCE matches Spark's aggregate(..., 0L, ...) fold,
         |         -- which returns 0 (not NULL) on a zero-length embedding;
         |         -- DuckDB's list_max/list_sum return NULL there (r16 ADVICE)
         |         greatest(COALESCE(
         |           list_max(list_transform(q, x -> abs(x))), 0), 1) AS s
         |       FROM q),
         |e AS (SELECT label, s,
         |        CAST(COALESCE(list_sum(list_transform(q, x -> abs(abs(x) -
         |          (((abs(x) * 254 + s) // (2 * s)) * 2 * s + 127) // 254))), 0)
         |          AS BIGINT) AS e_sum,
         |        CAST(COALESCE(list_max(list_transform(q, x -> abs(abs(x) -
         |          (((abs(x) * 254 + s) // (2 * s)) * 2 * s + 127) // 254))), 0)
         |          AS BIGINT) AS e_max
         |      FROM sc)
         |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
         |       CAST(SUM(e_sum) AS BIGINT) AS sum_err,
         |       CAST(MAX(e_max) AS BIGINT) AS max_err,
         |       CAST(SUM(s) AS BIGINT) AS sum_scale
         |FROM e GROUP BY 1 ORDER BY label""".stripMargin,

    "events_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS converted,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
        |  FROM events GROUP BY user_id),
        |per AS (SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
        |          CAST(SUM(converted) AS BIGINT) AS n_conv
        |        FROM u GROUP BY 1),
        |a AS (SELECT n_users AS na, n_conv AS ca FROM per WHERE variant = 'A'),
        |b AS (SELECT n_users AS nb, n_conv AS cb FROM per WHERE variant = 'B')
        |SELECT variant, n_users, n_conv,
        |       (10000 * n_conv) // n_users AS conv_bp,
        |       CAST(sign(cb * na - ca * nb) AS BIGINT) AS uplift_sign,
        |       (10000 * abs(cb * na - ca * nb)) // greatest(ca * nb, 1)
        |         AS uplift_abs_bp
        |FROM per, a, b ORDER BY variant""".stripMargin,

    "corpus_pack" ->
      s"""WITH t AS (SELECT doc_id, lang, CAST(len($TK) AS BIGINT) AS n FROM documents),
         |c AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY lang ORDER BY doc_id
         |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM t)
         |SELECT lang, (cum - n) // 2048 AS pack_id, COUNT(*) AS n_docs,
         |       CAST(SUM(n) AS BIGINT) AS n_tokens,
         |       CAST(COUNT(CASE WHEN n > 0 AND (cum - n) // 2048 <> (cum - 1) // 2048
         |                       THEN 1 END) AS BIGINT) AS n_straddling
         |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "text_tfidf" ->
      s"""WITH toks AS (SELECT doc_id, unnest($TK) AS token FROM documents),
         |vocab AS (SELECT token FROM (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1)
         |          ORDER BY cnt DESC, token ASC LIMIT 30),
         |tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
         |       FROM toks WHERE doc_id < 25 GROUP BY 1, 2),
         |dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
         |          FROM (SELECT DISTINCT doc_id, token FROM toks) GROUP BY 1)
         |SELECT tf.doc_id, tf.token, tf.tf, dfreq.df
         |FROM tf JOIN vocab USING (token) JOIN dfreq USING (token)
         |ORDER BY doc_id, token""".stripMargin,

    "text_pii_redact" ->
      s"""WITH p AS (SELECT doc_id,
         |  text ||
         |  CASE WHEN doc_id % 3 = 0
         |       THEN ' contact user' || doc_id || '@example.com' ELSE '' END ||
         |  CASE WHEN doc_id % 2 = 0
         |       THEN ' call +1-555-01' || doc_id ELSE '' END AS text
         |  FROM documents)
         |SELECT doc_id,
         |  ${graft.ops.Redact.countEmailsSql("text")} AS n_emails,
         |  ${graft.ops.Redact.countPhonesSql("text")} AS n_phones,
         |  md5(${graft.ops.Redact.redactSql("text")}) AS redacted_md5
         |FROM p ORDER BY doc_id""".stripMargin,

    "split_bloom_contamination" -> {
      val normExpr = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
      val B = graft.ops.Bloom
      s"""WITH d AS (SELECT doc_id,
         |             ${graft.ops.Text.polyHashSql("norm")} AS h,
         |             ${graft.ops.Sampling.assignSplitSql("doc_id")} AS split
         |           FROM (SELECT doc_id, $normExpr AS norm FROM documents)),
         |tkeys AS (SELECT h FROM d WHERE split = 'test'),
         |f AS (${B.buildSql("tkeys")}),
         |tr AS (SELECT doc_id, h FROM d WHERE split = 'train'),
         |pos AS (SELECT doc_id,
         |          unnest(list_value(${(0 until B.Hashes).map(i => B.positionSql("h", i)).mkString(", ")})) AS pos
         |        FROM tr),
         |hit AS (SELECT p.doc_id,
         |          SUM(CASE WHEN f.bits IS NOT NULL
         |                    AND (f.bits >> CAST(p.pos % 32 AS INT)) % 2 = 1
         |                   THEN 1 ELSE 0 END) AS nhit
         |        FROM pos p LEFT JOIN f ON CAST(p.pos // 32 AS INT) = f.word
         |        GROUP BY 1),
         |act AS (SELECT DISTINCT h FROM tkeys)
         |SELECT (hit.nhit = ${B.Hashes}) AS bloom_hit,
         |       (a.h IS NOT NULL) AS actual,
         |       CAST(COUNT(*) AS BIGINT) AS n
         |FROM tr JOIN hit ON tr.doc_id = hit.doc_id
         |LEFT JOIN act a ON tr.h = a.h
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "dedup_substring_span" ->
      (graft.ops.Spans.sharedSpansSql(TK) + "\nORDER BY 1, 2"),

    "emb_semdedup" -> {
      val dim = EMB_DIM
      s"""WITH RECURSIVE q AS (SELECT vec_id, ${Vectors.quantizeSql("embedding")} AS q FROM embeddings),
         |seeds AS (SELECT vec_id AS cid, q AS cq,
         |          ${Vectors.intNorm2Sql("q", dim)} AS cn2 FROM q
         |          WHERE vec_id < (SELECT greatest(4, count(*) // $SemdedupCellTarget)
         |                          FROM embeddings)),
         |d1 AS (SELECT v.vec_id, v.q, s.cid,
         |       s.cn2 - 2 * ${Vectors.intDotSql("v.q", "s.cq", dim)} AS sc
         |       FROM q v CROSS JOIN seeds s),
         |a1 AS (SELECT vec_id, q, cid AS cl FROM (
         |         SELECT *, row_number() OVER (PARTITION BY vec_id
         |                   ORDER BY sc, cid) AS rn FROM d1) WHERE rn = 1),
         |n AS (SELECT vec_id, cl, q, ${Vectors.intNorm2Sql("q", dim)} AS n2 FROM a1),
         |p AS (SELECT x.vec_id AS doc_a, y.vec_id AS doc_b,
         |       ${Vectors.intDotSql("x.q", "y.q", dim)} AS dot,
         |       x.n2 AS n2a, y.n2 AS n2b
         |      FROM n x JOIN n y ON x.cl = y.cl AND x.vec_id < y.vec_id),
         |pairs AS (SELECT doc_a, doc_b FROM p
         |  WHERE dot > 0 AND 10000 * CAST(dot AS HUGEINT) * dot >= 1600 * CAST(n2a AS HUGEINT) * n2b),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |cc AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
         |SELECT a1.vec_id, a1.cl AS cluster,
         |       (cc.comp IS NULL OR cc.comp = a1.vec_id) AS keep
         |FROM a1 LEFT JOIN cc ON a1.vec_id = cc.id
         |ORDER BY vec_id""".stripMargin
    },

    "text_classifier_score" ->
      s"""WITH s AS (SELECT doc_id,
         |             CAST(${graft.ops.Text.hashedLinearScoreSql(TK, clfWeights)} AS BIGINT) AS score
         |           FROM documents)
         |SELECT doc_id, score, (score >= 0) AS keep
         |FROM s ORDER BY doc_id""".stripMargin,

    "text_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |b0 AS (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS l, unnest(tk[2:len(tk)]) AS r
         |       FROM t WHERE len(tk) >= 2),
         |b AS (SELECT doc_id, l || ' ' || r AS bigram FROM b0),
         |c AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS bn FROM b GROUP BY 1)
         |SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |       CAST(SUM(c.bn) // COUNT(*) AS BIGINT) AS commonness
         |FROM b JOIN c USING (bigram)
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "split_ngram_leakage" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4] AS shingle
         |       FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-4)) AS i) g
         |       WHERE len(tk) >= 5),
         |sp AS (SELECT doc_id, ${graft.ops.Sampling.assignSplitSql("doc_id")} AS split
         |       FROM documents),
         |shs AS (SELECT sh.doc_id, sh.shingle, sp.split FROM sh JOIN sp ON sh.doc_id = sp.doc_id),
         |tr AS (SELECT DISTINCT shingle FROM shs WHERE split = 'train'),
         |ev AS (SELECT * FROM shs WHERE split <> 'train'),
         |lk AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_leaked FROM ev
         |       WHERE shingle IN (SELECT shingle FROM tr) GROUP BY 1),
         |ec AS (SELECT doc_id, split, CAST(COUNT(*) AS BIGINT) AS n_shingles
         |       FROM ev GROUP BY 1, 2)
         |SELECT ec.doc_id, ec.split, ec.n_shingles,
         |       COALESCE(lk.n_leaked, 0) AS n_leaked,
         |       (10000 * COALESCE(lk.n_leaked, 0)) // ec.n_shingles AS leak_bp
         |FROM ec LEFT JOIN lk ON ec.doc_id = lk.doc_id
         |ORDER BY ec.doc_id""".stripMargin,

    "text_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id,
         |         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] AS shingle
         |       FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-3)) AS i) g
         |       WHERE len(tk) >= 4),
         |cm AS (SELECT shingle FROM (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
         |       WHERE df >= 3),
         |pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM sh GROUP BY 1),
         |nc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_common FROM sh
         |       WHERE shingle IN (SELECT shingle FROM cm) GROUP BY 1)
         |SELECT pd.doc_id, pd.n_shingles, COALESCE(nc.n_common, 0) AS n_common,
         |       (10000 * COALESCE(nc.n_common, 0)) // pd.n_shingles AS boilerplate_bp,
         |       (10000 * COALESCE(nc.n_common, 0)) // pd.n_shingles >= 5000 AS flagged
         |FROM pd LEFT JOIN nc ON pd.doc_id = nc.doc_id
         |ORDER BY pd.doc_id""".stripMargin,

    "text_sentiment" -> {
      val pl = posLex.map(w => s"'$w'").mkString(", ")
      val nl = negLex.map(w => s"'$w'").mkString(", ")
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |c AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(tk, x -> x IN ($pl))) AS BIGINT) AS n_pos,
         |  CAST(len(list_filter(tk, x -> x IN ($nl))) AS BIGINT) AS n_neg
         |  FROM t WHERE len(tk) > 0),
         |b AS (SELECT *, (10000 * n_pos) // n_tokens AS pos_bp,
         |        (10000 * n_neg) // n_tokens AS neg_bp FROM c)
         |SELECT doc_id, n_tokens, n_pos, n_neg, pos_bp, neg_bp,
         |       pos_bp - neg_bp AS net_bp,
         |       CASE WHEN n_pos > n_neg THEN 'pos'
         |            WHEN n_pos < n_neg THEN 'neg' ELSE 'neutral' END AS label
         |FROM b ORDER BY doc_id""".stripMargin
    },

    "split_ngram_novelty" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] AS shingle
         |       FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-1)) AS i) g
         |       WHERE len(tk) >= 2),
         |sp AS (SELECT doc_id, ${graft.ops.Sampling.assignSplitSql("doc_id")} AS split
         |       FROM documents),
         |shs AS (SELECT sh.doc_id, sh.shingle, sp.split FROM sh JOIN sp ON sh.doc_id = sp.doc_id),
         |tr AS (SELECT DISTINCT shingle FROM shs WHERE split = 'train'),
         |ev AS (SELECT * FROM shs WHERE split <> 'train'),
         |nv AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel FROM ev
         |       WHERE shingle NOT IN (SELECT shingle FROM tr) GROUP BY 1),
         |ec AS (SELECT doc_id, split, CAST(COUNT(*) AS BIGINT) AS n_bigrams
         |       FROM ev GROUP BY 1, 2)
         |SELECT ec.doc_id, ec.split, ec.n_bigrams,
         |       COALESCE(nv.n_novel, 0) AS n_novel,
         |       (10000 * COALESCE(nv.n_novel, 0)) // ec.n_bigrams AS novelty_bp
         |FROM ec LEFT JOIN nv ON ec.doc_id = nv.doc_id
         |ORDER BY ec.doc_id""".stripMargin,

    "text_length_quantiles" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(round(quantile_cont(len($TK), 0.5) * 100) AS BIGINT) AS p50_x100,
         |  CAST(round(quantile_cont(len($TK), 0.9) * 100) AS BIGINT) AS p90_x100,
         |  CAST(round(quantile_cont(len($TK), 0.99) * 100) AS BIGINT) AS p99_x100
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_length_tiers" ->
      s"""WITH d AS (SELECT lang, CAST(len($TK) AS BIGINT) AS n FROM documents),
         |cuts AS (SELECT lang,
         |  CAST(round(quantile_cont(CAST(n AS DOUBLE), 0.25) * 100) AS BIGINT) AS c25,
         |  CAST(round(quantile_cont(CAST(n AS DOUBLE), 0.5) * 100) AS BIGINT) AS c50,
         |  CAST(round(quantile_cont(CAST(n AS DOUBLE), 0.75) * 100) AS BIGINT) AS c75
         |  FROM d GROUP BY 1),
         |t AS (SELECT d.lang, n,
         |  1 + (CASE WHEN 100 * n > c25 THEN 1 ELSE 0 END)
         |    + (CASE WHEN 100 * n > c50 THEN 1 ELSE 0 END)
         |    + (CASE WHEN 100 * n > c75 THEN 1 ELSE 0 END) AS tier
         |  FROM d JOIN cuts ON d.lang = cuts.lang)
         |SELECT lang, CAST(tier AS BIGINT) AS tier, COUNT(*) AS n_docs,
         |       MIN(n) AS min_tokens, MAX(n) AS max_tokens,
         |       CAST(SUM(n) AS BIGINT) AS sum_tokens
         |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_hourly_dense" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT event_type, MIN(hour) AS h0, MAX(hour) AS h1
        |         FROM hourly GROUP BY 1),
        |grid AS (SELECT event_type,
        |           unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
        |         FROM span)
        |SELECT g.event_type, g.hour, COALESCE(h.n, 0) AS n
        |FROM grid g LEFT JOIN hourly h
        |  ON g.event_type = h.event_type AND g.hour = h.hour
        |ORDER BY 1, 2""".stripMargin,

    "events_error_label" ->
      """WITH w AS (SELECT event_id, user_id,
        |    CAST(ts AS TIMESTAMP) AS ts, event_type,
        |    min(CASE WHEN event_type = 'error'
        |             THEN CAST(ts AS TIMESTAMP) END) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_err_ts
        |  FROM events)
        |SELECT event_id, user_id, ts, next_err_ts,
        |       CAST(next_err_ts IS NOT NULL AND
        |            next_err_ts <= ts + INTERVAL 7 DAY AS BIGINT) AS label
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "corpus_negative_samples" ->
      s"""WITH r AS (SELECT doc_id, CAST(row_number() OVER (
         |    ORDER BY ${graft.ops.Sampling.hashValSql("doc_id")}, doc_id) AS BIGINT) AS rank
         |  FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |p AS (SELECT doc_id, rank, CAST(j AS BIGINT) AS j
         |      FROM r, (SELECT unnest(generate_series(1, 3)) AS j) g),
         |q AS (SELECT doc_id, j,
         |        ((rank + j - 1) % (SELECT n FROM n)) + 1 AS nrank FROM p)
         |SELECT q.doc_id, q.j, r2.doc_id AS neg_doc_id
         |FROM q JOIN r r2 ON r2.rank = q.nrank
         |WHERE q.doc_id <> r2.doc_id
         |ORDER BY q.doc_id, q.j""".stripMargin,

    "events_asof_join" ->
      """WITH clicks AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'),
        |signups AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    max(event_id) AS signup_event_id
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        |SELECT c.user_id, c.event_id, c.ts, s.ts AS asof_ts, s.signup_event_id
        |FROM clicks c ASOF JOIN signups s
        |  ON c.user_id = s.user_id AND c.ts >= s.ts
        |ORDER BY c.user_id, c.event_id""".stripMargin,

    "events_range_join" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE event_type = 'click'),
        |b AS (SELECT *, CASE WHEN us - lag(us) OVER
        |     (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |     > 1800000000 THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
        |     ORDER BY ts ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM b),
        |sess AS (SELECT user_id, session_id, MIN(ts) AS session_start,
        |    MAX(ts) + INTERVAL 30 MINUTE AS session_end
        |  FROM s GROUP BY 1, 2),
        |p AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT p.user_id, sess.session_id, p.event_id, p.ts,
        |       sess.session_start, sess.session_end
        |FROM p JOIN sess ON p.user_id = sess.user_id
        | AND p.ts BETWEEN sess.session_start AND sess.session_end
        |ORDER BY p.user_id, sess.session_id, p.event_id""".stripMargin,

    "corpus_clean" ->
      s"""WITH q0 AS (SELECT doc_id, text, $TK AS tk0 FROM documents),
         |ok0 AS (SELECT doc_id, text FROM q0
         |        WHERE NOT (len(tk0) < 10
         |                   OR 100 * len(list_filter(tk0, t -> t IN ($stopList))) > 60 * len(tk0))),
         |keep AS (SELECT min(doc_id) AS doc_id FROM (
         |           SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |           FROM ok0) GROUP BY fp),
         |base AS (SELECT o.doc_id, o.text FROM ok0 o JOIN keep k ON o.doc_id = k.doc_id),
         |t AS (SELECT doc_id, $TK AS tk FROM base),
         |sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
         |       FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-2)) AS i) g
         |       WHERE len(tk) >= 3),
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |${Dedup.minhashBandSqlCtes(8, 4)},
         |ok AS (SELECT doc_id, band, bk FROM (
         |         SELECT *, COUNT(*) OVER (PARTITION BY band, bk) AS bsz FROM band)
         |       WHERE bsz <= 100),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM ok x JOIN ok y
         |         ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.doc_a
         |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2),
         |dups AS (SELECT DISTINCT i.doc_b
         |  FROM inter i
         |  JOIN cnt ca ON ca.doc_id = i.doc_a
         |  JOIN cnt cb ON cb.doc_id = i.doc_b
         |  WHERE 2 * i.inter >= 1 * (ca.n_sh + cb.n_sh - i.inter))
         |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM t
         |WHERE doc_id NOT IN (SELECT doc_b FROM dups)
         |ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
        |       COUNT(*) AS n_docs, MIN(doc_id) AS rep_doc_id
        |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin,

    "dedup_minhash_lsh" ->
      s"""WITH $SHINGLE3,
         |${Dedup.minhashBandSqlCtes(8, 4)},
         |ok AS (SELECT doc_id, band, bk FROM (
         |         SELECT *, COUNT(*) OVER (PARTITION BY band, bk) AS bsz FROM band)
         |       WHERE bsz <= 100),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM ok x JOIN ok y
         |         ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |${jaccardTail(1, 2)}""".stripMargin,

    "dedup_containment" ->
      s"""WITH $SHINGLE3,
         |${Dedup.minhashBandSqlCtes(8, 4)},
         |ok AS (SELECT doc_id, band, bk FROM (
         |         SELECT *, COUNT(*) OVER (PARTITION BY band, bk) AS bsz FROM band)
         |       WHERE bsz <= 100),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM ok x JOIN ok y
         |         ON x.band = y.band AND x.bk = y.bk AND x.doc_id < y.doc_id),
         |${containmentTail(8, 10)}""".stripMargin,

    "events_user_topk" ->
      """WITH t AS (SELECT event_type, user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_x100,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY total_x100 DESC, user_id ASC) AS rk FROM t)
        |SELECT event_type, CAST(rk AS BIGINT) AS rk, user_id, total_x100, n_events
        |FROM r WHERE rk <= 5 ORDER BY event_type, rk""".stripMargin,

    "emb_norm_stats" ->
      s"""WITH q AS (SELECT label, ${Vectors.quantizeSql("embedding")} AS q FROM embeddings),
         |n AS (SELECT label, ${Vectors.intNorm2Sql("q", EMB_DIM)} AS n2 FROM q)
         |SELECT label, COUNT(*) AS n_vecs, CAST(SUM(n2) AS BIGINT) AS sum_norm2,
         |       MIN(n2) AS min_norm2, MAX(n2) AS max_norm2
         |FROM n GROUP BY 1 ORDER BY label""".stripMargin,

    "emb_centroid_drift" ->
      s"""WITH q AS (SELECT vec_id % 2 = 0 AS ha,
         |             ${Vectors.quantizeSql("embedding")} AS qz
         |           FROM embeddings),
         |e AS (SELECT ha, i AS dim, qz[i] AS qv
         |      FROM q, LATERAL (SELECT unnest(generate_series(1, $EMB_DIM)) AS i) g),
         |s AS (SELECT dim,
         |        CAST(SUM(CASE WHEN ha THEN qv ELSE 0 END) AS BIGINT) AS sa,
         |        CAST(SUM(CASE WHEN NOT ha THEN qv ELSE 0 END) AS BIGINT) AS sb,
         |        CAST(SUM(CASE WHEN ha THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |        CAST(SUM(CASE WHEN NOT ha THEN 1 ELSE 0 END) AS BIGINT) AS cb
         |      FROM e GROUP BY 1),
         |m AS (SELECT CAST(sign(sa) AS BIGINT)
         |               * ((abs(sa) * 1000) // greatest(ca, 1)) AS ma,
         |             CAST(sign(sb) AS BIGINT)
         |               * ((abs(sb) * 1000) // greatest(cb, 1)) AS mb,
         |             ca, cb FROM s),
         |a AS (SELECT MIN(ca) AS n_a, MIN(cb) AS n_b,
         |             CAST(SUM(ma * mb) AS BIGINT) AS dot,
         |             CAST(SUM(ma * ma) AS BIGINT) AS n2a,
         |             CAST(SUM(mb * mb) AS BIGINT) AS n2b,
         |             CAST(SUM((ma - mb) * (ma - mb)) AS BIGINT)
         |               AS l2sq_diff_milli2,
         |             CAST(MAX(abs(ma - mb)) AS BIGINT) AS max_dim_gap
         |      FROM m)
         |SELECT n_a, n_b, CAST(sign(dot) AS BIGINT) AS dot_sign,
         |       CAST((10000 * CAST(dot AS HUGEINT) * dot)
         |            // greatest(CAST(n2a AS HUGEINT) * n2b, 1) AS BIGINT)
         |         AS cos2_bp,
         |       l2sq_diff_milli2, max_dim_gap
         |FROM a""".stripMargin,

    "corpus_mixture_epochs" ->
      s"""WITH s AS (SELECT source, COUNT(*) AS n_docs,
         |            CAST(SUM(len($TK)) AS BIGINT) AS n_tokens
         |          FROM documents GROUP BY 1),
         |m AS (SELECT MAX(n_tokens) AS max_tokens FROM s)
         |SELECT source, n_docs, n_tokens,
         |       LEAST((100 * max_tokens + n_tokens - 1) // n_tokens,
         |             CAST(400 AS BIGINT)) AS epochs_x100
         |FROM s, m ORDER BY source""".stripMargin,

    "dedup_simhash" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |tok AS (SELECT doc_id, ${Text.polyHashSql("u.t")} AS d
         |        FROM t, LATERAL (SELECT unnest(tk) AS t) u),
         |bits AS (SELECT doc_id, $simhashBitSumsSql FROM tok GROUP BY doc_id)
         |SELECT doc_id, CAST($simhashFpSql AS BIGINT) AS simhash
         |FROM bits ORDER BY doc_id""".stripMargin,

    // shared by dedup_clusters / dedup_clusters_star /
    // dedup_clusters_adaptive: all three operators compute the
    // identical fixpoint, so one oracle gates them all
    "dedup_clusters" -> dedupClustersOracle,
    "dedup_clusters_star" -> dedupClustersOracle,
    "dedup_clusters_adaptive" -> dedupClustersOracle,

    // NOT IN store + first-in-batch — what a full rededup would keep;
    // the batch unions re-fetched historical docs and intra-batch
    // re-submissions, mirroring the engine's planted construction
    "corpus_incremental_dedup" ->
      """WITH f AS (SELECT doc_id, source,
        |             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |               AS fingerprint FROM documents),
        |seen AS (SELECT DISTINCT fingerprint FROM f WHERE doc_id < 250),
        |b AS (SELECT doc_id, source, fingerprint FROM f WHERE doc_id >= 250
        |      UNION ALL
        |      SELECT doc_id + 100000, source, fingerprint FROM f WHERE doc_id < 50
        |      UNION ALL
        |      SELECT doc_id + 200000, source, fingerprint FROM f
        |      WHERE doc_id >= 250 AND doc_id < 300),
        |batch AS (SELECT *, row_number() OVER (PARTITION BY fingerprint
        |            ORDER BY doc_id) AS rn FROM b)
        |SELECT doc_id, source, fingerprint FROM batch
        |WHERE rn = 1
        |  AND fingerprint NOT IN (SELECT fingerprint FROM seen)
        |ORDER BY doc_id""".stripMargin,

    // doubled scales keep every median integral: x200 values are even
    // ints, deviations double again to x400 — quantile_cont on integer
    // inputs matches Spark `percentile` bit-for-bit (customer_rfm rule)
    "events_value_mad" ->
      """WITH e AS (SELECT event_type,
        |             CAST(round(value * 100, 0) AS BIGINT) * 2 AS x2 FROM events),
        |m AS (SELECT event_type, CAST(quantile_cont(x2, 0.5) AS BIGINT) AS median_x200
        |      FROM e GROUP BY 1),
        |d AS (SELECT e.event_type, median_x200, abs(x2 - median_x200) * 2 AS d4
        |      FROM e JOIN m USING (event_type))
        |SELECT event_type, median_x200,
        |       CAST(quantile_cont(d4, 0.5) AS BIGINT) AS mad_x400,
        |       CAST(COUNT(*) AS BIGINT) AS n
        |FROM d GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // GROUPING() labels (not NULL indicators), as events_cube; the
    // per-day and grand-total sets get sentinel labels on both sides
    "events_grouping_sets" ->
      """SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END AS event_type,
        |       CASE WHEN GROUPING(day) = 1 THEN DATE '1900-01-01' ELSE day END AS day,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_x100
        |FROM (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, value
        |      FROM events)
        |GROUP BY GROUPING SETS ((event_type, day), (day), ())
        |ORDER BY 1, 2""".stripMargin,

    // gaps-and-islands reconstruction of session_window's semantics:
    // break on gap > 30 min, end = last event + gap
    "events_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |x AS (SELECT user_id, ts,
        |        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                  <= INTERVAL 30 MINUTE
        |             THEN 0 ELSE 1 END AS brk FROM e),
        |g AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT user_id, MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin,

    // the direct join of the CORRECTED table — equality pins the
    // signed-multiset (retract+insert) maintenance path end to end
    "orders_delta_retract" ->
      """WITH c AS (SELECT c_custkey AS custkey, c_nationkey FROM customer),
        |o AS (SELECT o_custkey AS custkey, o_orderkey AS okey,
        |        CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders),
        |corrected AS (SELECT custkey, okey,
        |    CASE WHEN okey % 100 = 0 THEN price + 10 ELSE price END AS price
        |  FROM o)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(price) * 100 AS BIGINT) AS total_x100
        |FROM c JOIN corrected USING (custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the direct aggregate of the CORRECTED full join — equality pins
    // the maintained (view + aggregate-delta) state as exactly the
    // recomputed aggregate
    "orders_delta_rollup" ->
      """WITH c AS (SELECT c_custkey AS custkey, c_nationkey FROM customer),
        |o AS (SELECT o_custkey AS custkey,
        |        CASE WHEN o_orderkey % 100 = 0
        |             THEN CAST(o_totalprice AS DECIMAL(18,2)) + 10
        |             ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
        |      FROM orders)
        |SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(price) * 100 AS BIGINT) AS total_x100
        |FROM c JOIN o USING (custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the direct full join — equality pins the delta rule's four-term
    // union as exactly the full join
    "orders_delta_join" ->
      """WITH c AS (SELECT c_custkey AS custkey, c_nationkey FROM customer),
        |o AS (SELECT o_custkey AS custkey,
        |        date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month,
        |        CAST(o_totalprice AS DECIMAL(18,2)) AS price FROM orders)
        |SELECT c_nationkey, CAST(month AS TIMESTAMP) AS month,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(price) * 100 AS BIGINT) AS total_x100
        |FROM c JOIN o USING (custkey)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the PLAIN join — equality pins the salted join's row-identity
    "events_salted_join" ->
      """WITH ev AS (SELECT user_id, event_type,
        |              CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |dim AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT cohort_day, event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM ev JOIN dim USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the engine merges two-slice partials; the oracle aggregates the
    // facts directly — equality pins partial-state mergeability
    "events_rollup_merge" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS total_x100,
        |       CAST(MIN(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS vmin_x100,
        |       CAST(MAX(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS vmax_x100
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_zorder_key" ->
      s"""SELECT event_id,
         |  ${graft.ops.ZOrder.zValueSql("hour(CAST(ts AS TIMESTAMP))", "((user_id % 256 + 256) % 256)", 8)} AS z
         |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,

    // full prefix construction mirrored on the SHARED shingle CTE:
    // global shingle frequencies, per-doc (freq, shingle) rank,
    // L = n - ceil(n/2) + 1 via the nonneg-exact (n+1)//2, prefix
    // candidate join, exact Jaccard >= 1/2 verify
    "dedup_prefix_filter" ->
      s"""WITH $SHINGLE3,
         |freq AS (SELECT shingle, COUNT(*) AS f FROM sh GROUP BY 1),
         |rk AS (SELECT doc_id, sh.shingle,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f, sh.shingle) AS rn,
         |         COUNT(*) OVER (PARTITION BY doc_id) AS n
         |       FROM sh JOIN freq USING (shingle)),
         |pre AS (SELECT doc_id, shingle FROM rk WHERE rn <= n - ((n + 1) // 2) + 1),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM pre x JOIN pre y
         |         ON x.shingle = y.shingle AND x.doc_id < y.doc_id),
         |inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |          FROM cand c
         |          JOIN sh a ON a.doc_id = c.doc_a
         |          JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |          GROUP BY 1, 2)
         |SELECT i.doc_a, i.doc_b, CAST(i.inter AS BIGINT) AS inter,
         |       CAST(ca.n_sh + cb.n_sh - i.inter AS BIGINT) AS union_sz
         |FROM inter i
         |JOIN cnt ca ON ca.doc_id = i.doc_a
         |JOIN cnt cb ON cb.doc_id = i.doc_b
         |WHERE 2 * i.inter >= ca.n_sh + cb.n_sh - i.inter
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_simhash_pairs" -> {
      val bandW = Dedup.simhashPairBits / Dedup.simhashPairBands
      val bandList = (0 until Dedup.simhashPairBands).mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |tok AS (SELECT doc_id, ${Text.polyHashSql("u.t")} AS d
         |        FROM t, LATERAL (SELECT unnest(tk) AS t) u),
         |bits AS (SELECT doc_id, $simhashWideSumsSql FROM tok GROUP BY doc_id),
         |fp AS (SELECT doc_id, CAST($simhashWideFpSql AS BIGINT) AS simhash FROM bits),
         |banded AS (SELECT doc_id, simhash, b.band,
         |        (simhash >> (b.band * $bandW)) % ${1L << bandW} AS bv
         |        FROM fp, LATERAL (SELECT unnest($bandList) AS band) b),
         |ok AS (SELECT doc_id, simhash, band, bv FROM (
         |         SELECT *, COUNT(*) OVER (PARTITION BY band, bv) AS bsz FROM banded)
         |       WHERE bsz <= 100),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |         CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |         FROM ok x JOIN ok y
         |         ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b, hamming FROM cand
         |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin
    },

    "dedup_ngram_blocked" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |k0 AS (SELECT doc_id, tk[1] AS _f, tk[-1] AS _l FROM t),
         |k AS (SELECT doc_id, _f, _l FROM (
         |        SELECT *, COUNT(*) OVER (PARTITION BY _f, _l) AS bsz FROM k0)
         |      WHERE bsz <= 200),
         |cand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
         |         FROM k x JOIN k y ON x._f = y._f
         |          AND x._l = y._l AND x.doc_id < y.doc_id),
         |sh AS (SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] AS shingle
         |       FROM t, LATERAL (SELECT unnest(generate_series(1, len(tk)-1)) AS i) g
         |       WHERE len(tk) >= 2),
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |${jaccardTail(1, 2)}""".stripMargin,

    "dedup_edit_distance" ->
      s"""WITH t AS (SELECT doc_id,
         |         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm,
         |         $TK AS tk FROM documents),
         |k0 AS (SELECT doc_id, norm, len(norm) AS ln, tk[1] AS _f, tk[-1] AS _l
         |       FROM t WHERE len(tk) >= 1),
         |k AS (SELECT doc_id, norm, ln, _f, _l FROM (
         |        SELECT *, COUNT(*) OVER (PARTITION BY _f, _l) AS bsz FROM k0)
         |      WHERE bsz <= 200),
         |cand AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
         |                x.norm AS na, y.norm AS nb
         |         FROM k x JOIN k y ON x._f = y._f AND x._l = y._l
         |          AND x.doc_id < y.doc_id AND abs(x.ln - y.ln) <= 20)
         |SELECT doc_a, doc_b, CAST(levenshtein(na, nb) AS BIGINT) AS edit_dist
         |FROM cand WHERE levenshtein(na, nb) <= 20
         |ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_embedding_cos" ->
      s"""WITH q AS (SELECT vec_id, ${Vectors.quantizeSql("embedding")} AS q FROM embeddings),
         |pw AS (SELECT ${Vectors.scaledLshPow2Sql("embeddings", 8, 8)} AS p),
         |n AS (SELECT vec_id, q, ${Vectors.intNorm2Sql("q", EMB_DIM)} AS n2,
         |       (${Vectors.signBucketSql("q", 24)}) % (SELECT p FROM pw)
         |         AS bucket FROM q),
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       ${Vectors.intDotSql("a.q", "b.q", EMB_DIM)} AS dot,
         |       a.n2 AS n2a, b.n2 AS n2b
         |      FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, dot FROM p
         |WHERE dot > 0 AND 10000 * CAST(dot AS HUGEINT) * dot >= 1600 * CAST(n2a AS HUGEINT) * n2b
         |ORDER BY vec_a, vec_b""".stripMargin,

    "sim_topk_bruteforce" ->
      s"""WITH q AS (SELECT vec_id, ${Vectors.quantizeSql("embedding")} AS q FROM embeddings),
         |scored AS (SELECT s.vec_id AS q_vec_id, c.vec_id,
         |       ${Vectors.intDotSql("c.q", "s.q", EMB_DIM)} AS dot
         |      FROM q c CROSS JOIN q s WHERE c.vec_id >= 8 AND s.vec_id < 8),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |       ORDER BY dot DESC, vec_id ASC) AS rnk FROM scored)
         |SELECT q_vec_id, vec_id, dot, CAST(rnk AS INT) AS rnk FROM r
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,

    "sim_topk_lsh" ->
      s"""WITH q AS (SELECT vec_id, ${Vectors.quantizeSql("embedding")} AS q FROM embeddings),
         |n AS (SELECT vec_id, q, ${Vectors.signBucketSql("q", 8)} AS bucket FROM q),
         |scored AS (SELECT s.vec_id AS q_vec_id, c.vec_id,
         |       ${Vectors.intDotSql("c.q", "s.q", EMB_DIM)} AS dot
         |      FROM n c JOIN n s ON c.bucket = s.bucket
         |      WHERE c.vec_id >= 8 AND s.vec_id < 8),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |       ORDER BY dot DESC, vec_id ASC) AS rnk FROM scored)
         |SELECT q_vec_id, vec_id, dot, CAST(rnk AS INT) AS rnk FROM r
         |WHERE rnk <= 5 ORDER BY q_vec_id, rnk""".stripMargin,

    // the ANN audit contract: every query vector yields exactly
    // least(k=10, candidate availability) results and clears its
    // calibrated recall floor. The neighbor SETS can't be
    // SQL-expressed (iterative k-means training), but this summary is
    // deterministic on the seeded fixture — the engine-side recall_ok
    // is computed against the in-engine exact brute-force top-k, so a
    // broken index (empty cells, collapsed codebook, lost shortlist)
    // fails the hash compare. The expected count derives from the
    // fixture (LEAST over the candidate pool), not a hard-coded 10,
    // so a regenerated fixture with a scarcer pool fails as a recall
    // problem, not a spurious row-count mismatch. Residual
    // assumption, probed-cells-local and NOT SQL-derivable: whenever
    // the GLOBAL pool holds ≥ k candidates, the probed cells retain
    // ≥ k too — true by a wide margin on all measured fixtures
    // (calibration next to the 45/15 recall floors).
    "sim_topk_ivf" ->
      """SELECT vec_id AS q_vec_id,
        |       LEAST(CAST(10 AS BIGINT), (SELECT COUNT(*) FROM embeddings
        |              WHERE vec_id >= 8)) AS n_results,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY 1""".stripMargin,

    // same audit contract as sim_topk_ivf, with the candidate pool
    // restricted by the engine's metadata predicate (label < 5)
    "sim_topk_ivf_filtered" ->
      """SELECT vec_id AS q_vec_id,
        |       LEAST(CAST(10 AS BIGINT), (SELECT COUNT(*) FROM embeddings
        |              WHERE vec_id >= 8 AND label < 5)) AS n_results,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY 1""".stripMargin,

    "sim_topk_ivfpq_filtered" ->
      """SELECT vec_id AS q_vec_id,
        |       LEAST(CAST(10 AS BIGINT), (SELECT COUNT(*) FROM embeddings
        |              WHERE vec_id >= 8 AND label < 5)) AS n_results,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY 1""".stripMargin,

    "sim_topk_pq_filtered" ->
      """SELECT vec_id AS q_vec_id,
        |       LEAST(CAST(10 AS BIGINT), (SELECT COUNT(*) FROM embeddings
        |              WHERE vec_id >= 8 AND label < 5)) AS n_results,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY 1""".stripMargin,
    "sim_topk_pq" ->
      """SELECT vec_id AS q_vec_id,
        |       LEAST(CAST(10 AS BIGINT), (SELECT COUNT(*) FROM embeddings
        |              WHERE vec_id >= 8)) AS n_results,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY 1""".stripMargin,
    "sim_topk_ivfpq" ->
      """SELECT vec_id AS q_vec_id,
        |       LEAST(CAST(10 AS BIGINT), (SELECT COUNT(*) FROM embeddings
        |              WHERE vec_id >= 8)) AS n_results,
        |       TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 8 ORDER BY 1""".stripMargin,

    "multimodal_features" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       CAST(16 + n_chars % 64 AS BIGINT) AS width,
        |       CAST(16 + (n_chars * 7) % 64 AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin,

    // codec certificates: fields re-derive from the same n_chars
    // arithmetic; ok is pinned at 1 (see the query scaladocs — a broken
    // encode/decode/feature path flips it and fails the hash gate)
    "multimodal_audio_cert" ->
      """SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |       64 + n_chars % 256 AS n_frames,
        |       CAST(1 AS BIGINT) AS ok
        |FROM documents WHERE doc_id % 10 = 0
        |ORDER BY doc_id""".stripMargin,

    "multimodal_imageio_cert" ->
      """SELECT doc_id, 16 + n_chars % 64 AS width,
        |       16 + (n_chars * 7) % 64 AS height,
        |       CAST(1 AS BIGINT) AS ok
        |FROM documents WHERE doc_id % 10 = 0
        |ORDER BY doc_id""".stripMargin,

    // the identical integer aHash pipeline from the source text:
    // per-char codes, 60 segment sums with cross-multiplied mean
    // thresholds (nonneg // == div), band join, exact popcount verify
    "multimodal_phash_dup" -> {
      val bits = Multimodal.aHashBits
      val bandW = bits / Multimodal.aHashBands
      val bandList = (0 until Multimodal.aHashBands).mkString("[", ", ", "]")
      s"""WITH m AS (SELECT doc_id AS media_id, text AS content FROM documents
         |           UNION ALL
         |           SELECT doc_id + 100000,
         |                  substr(text, 1, 40) || repeat('z', 8) || substr(text, 49)
         |           FROM documents),
         |c AS (SELECT media_id AS doc_id, list_transform(string_split(content, ''),
         |             ch -> CAST(ascii(ch) AS BIGINT)) AS codes FROM m),
         |cc AS (SELECT doc_id, codes, CAST(len(codes) AS BIGINT) AS n,
         |         list_reduce(list_prepend(CAST(0 AS BIGINT), codes),
         |           (a, x) -> a + x) AS total FROM c),
         |fp AS (SELECT doc_id,
         |    CAST(SUM(CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT),
         |        codes[(k.k * n) // $bits + 1 : ((k.k + 1) * n) // $bits]),
         |        (a, x) -> a + x) * n
         |      > total * (((k.k + 1) * n) // $bits - (k.k * n) // $bits)
         |      THEN (CAST(1 AS BIGINT) << k.k) ELSE 0 END) AS BIGINT) AS phash
         |  FROM cc, LATERAL (SELECT unnest(generate_series(0, ${bits - 1})) AS k) k
         |  GROUP BY doc_id),
         |banded AS (SELECT doc_id, phash, b.band,
         |    (phash >> (b.band * $bandW)) % ${1L << bandW} AS bv
         |  FROM fp, LATERAL (SELECT unnest($bandList) AS band) b),
         |ok AS (SELECT doc_id, phash, band, bv FROM (
         |         SELECT *, COUNT(*) OVER (PARTITION BY band, bv) AS bsz FROM banded)
         |       WHERE bsz <= 100),
         |cand AS (SELECT DISTINCT x.doc_id AS media_a, y.doc_id AS media_b,
         |         CAST(bit_count(xor(x.phash, y.phash)) AS BIGINT) AS hamming
         |         FROM ok x JOIN ok y
         |         ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
         |SELECT media_a, media_b, hamming FROM cand
         |WHERE hamming <= 3 ORDER BY media_a, media_b""".stripMargin
    },

    "sim_topk_filtered" ->
      s"""WITH q AS (SELECT vec_id, label, ${Vectors.quantizeSql("embedding")} AS q FROM embeddings),
         |scored AS (SELECT s.vec_id AS q_vec_id, c.vec_id,
         |       ${Vectors.intDotSql("c.q", "s.q", EMB_DIM)} AS dot
         |      FROM q c CROSS JOIN q s
         |      WHERE c.vec_id >= 8 AND c.label < 5 AND s.vec_id < 8),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_vec_id
         |       ORDER BY dot DESC, vec_id ASC) AS rnk FROM scored)
         |SELECT q_vec_id, vec_id, dot, CAST(rnk AS INT) AS rnk FROM r
         |WHERE rnk <= 10 ORDER BY q_vec_id, rnk""".stripMargin,

    "corpus_weighted_sample" ->
      s"""SELECT doc_id, source, rk FROM (
         |  SELECT doc_id, source, CAST(row_number() OVER (
         |    PARTITION BY source
         |    ORDER BY ${graft.ops.Sampling.weightedPrioritySql("doc_id", "n_chars")}, doc_id
         |  ) AS BIGINT) AS rk FROM documents)
         |WHERE rk <= 10 ORDER BY doc_id""".stripMargin,

    "events_pagerank" -> {
      import graft.ops.Graph
      s"""WITH o AS (SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |                          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS src
         |  FROM events),
         |e AS (SELECT src, event_type AS dst, COUNT(*) AS w
         |      FROM o WHERE src IS NOT NULL GROUP BY 1, 2),
         |ow AS (SELECT src, SUM(w) AS out_w FROM e GROUP BY src),
         |ew AS (SELECT e.src, e.dst, e.w, ow.out_w FROM e JOIN ow ON e.src = ow.src),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT node, (SELECT COUNT(*) FROM nodes) AS n_nodes FROM nodes),
         |r0 AS (SELECT node, n_nodes, ${Graph.Scale} // n_nodes AS pr FROM nn),
         |r1 AS (${Graph.rankStepSql("r0")}),
         |r2 AS (${Graph.rankStepSql("r1")}),
         |r3 AS (${Graph.rankStepSql("r2")})
         |SELECT node AS event_type, CAST(pr AS BIGINT) AS pr
         |FROM r3 ORDER BY event_type""".stripMargin
    },

    "emb_kmeans" -> kmeansOracleSql(refits = 1),
    "emb_kmeans2" -> kmeansOracleSql(refits = 2),
    "emb_kmeans_fp" -> kmeansOracleSql(refits = 1, seedsCte = kcenterSeedsCte(4)),

    "corpus_interleave" ->
      s"""WITH t AS (SELECT COUNT(*) AS t FROM documents),
         |r AS (SELECT doc_id, source,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY ${graft.ops.Sampling.bucketSql("doc_id")}, doc_id) AS r,
         |        COUNT(*) OVER (PARTITION BY source) AS n_s
         |      FROM documents)
         |SELECT doc_id, source, CAST(r AS BIGINT) AS r,
         |       CAST((CAST(r - 1 AS HUGEINT) * t.t) // n_s AS BIGINT) AS ord_key
         |FROM r CROSS JOIN t ORDER BY doc_id""".stripMargin,

    "corpus_dedup_keep_best" ->
      s"""$dedupClustersCtes,
         |best AS (SELECT doc_id, cluster_size FROM (
         |    SELECT cc.id AS doc_id, sz.cluster_size,
         |           row_number() OVER (PARTITION BY cc.comp
         |                              ORDER BY d.n_chars DESC, cc.id ASC) AS rn
         |    FROM cc JOIN sz ON cc.comp = sz.comp
         |    JOIN documents d ON d.doc_id = cc.id) WHERE rn = 1)
         |SELECT doc_id, cluster_size FROM best
         |UNION ALL
         |SELECT doc_id, CAST(1 AS BIGINT) AS cluster_size FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM cc)
         |ORDER BY doc_id""".stripMargin,

    "events_itemset_pairs" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |n1 AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY 1),
        |tot AS (SELECT COUNT(DISTINCT user_id) AS nt FROM ut),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
        |             COUNT(*) AS n_users
        |      FROM ut a JOIN ut b ON a.user_id = b.user_id
        |                         AND a.event_type < b.event_type
        |      GROUP BY 1, 2)
        |SELECT p.type_a, p.type_b, p.n_users,
        |       CAST((10000 * CAST(p.n_users AS HUGEINT) * tot.nt)
        |            // (CAST(na.n AS HUGEINT) * nb.n) AS BIGINT) AS lift_bp
        |FROM p
        |CROSS JOIN tot
        |JOIN n1 na ON na.event_type = p.type_a
        |JOIN n1 nb ON nb.event_type = p.type_b
        |ORDER BY type_a, type_b""".stripMargin,

    "emb_random_projection" ->
      s"""WITH q AS (SELECT vec_id, ${Vectors.quantizeSql("embedding")} AS q FROM embeddings),
         |p AS (SELECT vec_id, ${Vectors.signProjectSql("q", 16, EMB_DIM)} AS p FROM q)
         |SELECT vec_id, p[1] AS p0, p[2] AS p1, p[3] AS p2, p[4] AS p3,
         |       ${Vectors.intNorm2Sql("p", 16)} AS pnorm2
         |FROM p ORDER BY vec_id""".stripMargin,

    "text_collocations" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw
         |       FROM (SELECT unnest(tk) AS w FROM t) GROUP BY 1),
         |bc AS (SELECT l, r, CAST(COUNT(*) AS BIGINT) AS cab
         |       FROM (SELECT unnest(tk[1:len(tk)-1]) AS l, unnest(tk[2:len(tk)]) AS r
         |             FROM t WHERE len(tk) >= 2)
         |       GROUP BY 1, 2 HAVING COUNT(*) >= 20),
         |tot AS (SELECT CAST(SUM(len(tk)) AS BIGINT) AS t,
         |               CAST(SUM(GREATEST(len(tk) - 1, 0)) AS BIGINT) AS b FROM t)
         |SELECT bc.l || ' ' || bc.r AS bigram, bc.cab AS cab,
         |       CAST((((10000 * CAST(bc.cab AS HUGEINT) * tot.t) // ua.cw) * tot.t)
         |            // (CAST(tot.b AS HUGEINT) * ub.cw) AS BIGINT) AS lift_bp
         |FROM bc JOIN uc ua ON bc.l = ua.w JOIN uc ub ON bc.r = ub.w CROSS JOIN tot
         |ORDER BY lift_bp DESC, bigram LIMIT 20""".stripMargin,

    "corpus_chunk_dedup" -> {
      val C = ChunkTokens
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |c AS (SELECT doc_id, i AS pos,
         |        array_to_string(tk[(i*$C+1):(i*$C+$C)], ' ') AS chunk
         |      FROM t, LATERAL (SELECT unnest(generate_series(0, (len(tk)-1)//$C)) AS i) g),
         |w AS (SELECT chunk, MIN(doc_id*1048576 + pos) AS wk FROM c GROUP BY 1)
         |SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks,
         |       CAST(SUM(CASE WHEN c.doc_id*1048576 + c.pos = w.wk THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |       CAST(COUNT(*) - SUM(CASE WHEN c.doc_id*1048576 + c.pos = w.wk THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |FROM c JOIN w USING (chunk) GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "text_bm25_topk" -> graft.ops.Retrieval.bm25TopKSql(bm25Terms, 10, TK),

    "corpus_importance_resample" ->
      s"""WITH t AS (SELECT doc_id, lang, $TK AS tk FROM documents),
         |tok AS (SELECT doc_id, lang, ${graft.ops.Text.polyHashSql("w")} % 64 AS b
         |        FROM (SELECT doc_id, lang, unnest(tk) AS w FROM t)),
         |bk AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rb,
         |         CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tb
         |       FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(SUM(rb) AS BIGINT) AS tr, CAST(SUM(tb) AS BIGINT) AS tt FROM bk),
         |wt AS (SELECT b, CASE WHEN tb > 0 AND tt > 0
         |         THEN (1000000 * CAST(tb AS HUGEINT) * tr) // (CAST(rb AS HUGEINT) * tt)
         |         ELSE 0 END AS wb FROM bk CROSS JOIN tot),
         |ds AS (SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, SUM(wt.wb) AS sw
         |       FROM tok JOIN wt USING (b) GROUP BY 1)
         |SELECT d.doc_id, d.lang, ds.n_tokens,
         |       CAST(ds.sw // ds.n_tokens AS BIGINT) AS score,
         |       (ds.sw // ds.n_tokens >= 1000000) AS keep
         |FROM ds JOIN documents d ON ds.doc_id = d.doc_id
         |ORDER BY 1""".stripMargin,

    "emb_pca_project" -> graft.ops.Pca.projectSql(EMB_DIM, rounds = 3),

    "events_triangles" ->
      s"""WITH $coPresenceSql,
         |${graft.ops.Graph.triangleStatsSql}
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ed) AS n_edges,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM wg) AS n_wedges,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM tri) AS n_triangles""".stripMargin,

    "events_components" ->
      s"""WITH RECURSIVE $coPresenceSql,
         |edges AS (SELECT a AS src, b AS dst FROM ed
         |          UNION ALL SELECT b, a FROM ed),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach(id, r) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
         |cc AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id),
         |sz AS (SELECT comp, CAST(COUNT(*) AS BIGINT) AS sz FROM cc GROUP BY 1)
         |SELECT sz AS component_size, CAST(COUNT(*) AS BIGINT) AS n_components
         |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_bpe_encode" -> {
      val pat = graft.ops.Text.bpeTokenPattern
      s"""WITH b AS (SELECT doc_id,
         |    CAST(len(regexp_extract_all(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '$pat', 0)) AS BIGINT) AS n_pretokens,
         |    CAST(${graft.ops.Text.bpeMergedCountSql(bpeMerges)} AS BIGINT) AS n_bpe_tokens,
         |    CAST(length(regexp_replace(lower(trim(text)), '\\s+', '', 'g')) AS BIGINT) AS n_chars
         |  FROM documents)
         |SELECT doc_id, n_pretokens, n_bpe_tokens,
         |       CAST(10000 * n_bpe_tokens // GREATEST(n_chars, 1) AS BIGINT) AS compression_bp
         |FROM b ORDER BY doc_id""".stripMargin
    },

    "text_trigram_backoff" ->
      s"""WITH d AS (SELECT doc_id, $TK AS tk,
         |             ${graft.ops.Sampling.assignSplitSql("doc_id")} AS split FROM documents),
         |tr AS (SELECT * FROM d WHERE split = 'train'),
         |uni AS (SELECT w AS u1, CAST(COUNT(*) AS BIGINT) AS c1
         |        FROM (SELECT unnest(tk) AS w FROM tr) GROUP BY 1),
         |big AS (SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS c2 FROM (
         |          SELECT unnest(tk[1:len(tk)-1]) AS b1, unnest(tk[2:len(tk)]) AS b2
         |          FROM tr WHERE len(tk) >= 2) GROUP BY 1, 2),
         |tri AS (SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS c3 FROM (
         |          SELECT unnest(tk[1:len(tk)-2]) AS t1, unnest(tk[2:len(tk)-1]) AS t2,
         |                 unnest(tk[3:len(tk)]) AS t3
         |          FROM tr WHERE len(tk) >= 3) GROUP BY 1, 2, 3),
         |tot AS (SELECT CAST(SUM(len(tk)) AS BIGINT) AS t FROM tr),
         |pos AS (SELECT doc_id, unnest(tk[1:len(tk)-2]) AS w0,
         |               unnest(tk[2:len(tk)-1]) AS w1, unnest(tk[3:len(tk)]) AS w2
         |        FROM d WHERE split <> 'train' AND len(tk) >= 3),
         |sc AS (SELECT pos.doc_id,
         |         CASE WHEN tri.c3 IS NOT NULL
         |                THEN CAST(1000000 * CAST(tri.c3 AS HUGEINT) // bp.c2 AS BIGINT)
         |              WHEN bq.c2 IS NOT NULL
         |                THEN CAST(400000 * CAST(bq.c2 AS HUGEINT) // um.c1 AS BIGINT)
         |              WHEN uw.c1 IS NOT NULL
         |                THEN CAST(160000 * CAST(uw.c1 AS HUGEINT) // tot.t AS BIGINT)
         |              ELSE 0 END AS contrib
         |       FROM pos
         |       LEFT JOIN tri ON pos.w0 = tri.t1 AND pos.w1 = tri.t2 AND pos.w2 = tri.t3
         |       LEFT JOIN big bp ON pos.w0 = bp.b1 AND pos.w1 = bp.b2
         |       LEFT JOIN big bq ON pos.w1 = bq.b1 AND pos.w2 = bq.b2
         |       LEFT JOIN uni um ON pos.w1 = um.u1
         |       LEFT JOIN uni uw ON pos.w2 = uw.u1
         |       CROSS JOIN tot)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
         |       CAST(SUM(contrib) // COUNT(*) AS BIGINT) AS score
         |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,

    "emb_mutual_knn" ->
      s"""WITH ${graft.ops.Similarity.mutualKnnSqlCtes(5, 6, 32, EMB_DIM)}
         |SELECT vec_a, vec_b, dot FROM mk ORDER BY 1, 2""".stripMargin,

    "emb_label_spread" ->
      s"""WITH ${graft.ops.Similarity.mutualKnnSqlCtes(5, 6, 32, EMB_DIM)},
         |ed AS (SELECT vec_a AS src, vec_b AS dst FROM mk
         |       UNION ALL SELECT vec_b, vec_a FROM mk),
         |l0 AS (SELECT vec_id,
         |         CASE WHEN vec_id % 10 = 0 THEN CAST(label AS BIGINT) END AS lab
         |       FROM embeddings),
         |n1 AS (SELECT ed.src, l0.lab AS nlab, COUNT(*) AS cnt
         |       FROM ed JOIN l0 ON ed.dst = l0.vec_id
         |       WHERE l0.lab IS NOT NULL GROUP BY 1, 2),
         |t1 AS (SELECT src, nlab FROM (
         |         SELECT src, nlab, row_number() OVER (PARTITION BY src
         |           ORDER BY cnt DESC, nlab) AS rn FROM n1) WHERE rn = 1),
         |l1 AS (SELECT l0.vec_id, COALESCE(l0.lab, t1.nlab) AS lab
         |       FROM l0 LEFT JOIN t1 ON l0.vec_id = t1.src),
         |n2 AS (SELECT ed.src, l1.lab AS nlab, COUNT(*) AS cnt
         |       FROM ed JOIN l1 ON ed.dst = l1.vec_id
         |       WHERE l1.lab IS NOT NULL GROUP BY 1, 2),
         |t2 AS (SELECT src, nlab FROM (
         |         SELECT src, nlab, row_number() OVER (PARTITION BY src
         |           ORDER BY cnt DESC, nlab) AS rn FROM n2) WHERE rn = 1),
         |l2 AS (SELECT l1.vec_id, COALESCE(l1.lab, t2.nlab) AS lab
         |       FROM l1 LEFT JOIN t2 ON l1.vec_id = t2.src)
         |SELECT l0.vec_id, l0.lab AS seed_label, l2.lab AS spread_label
         |FROM l0 JOIN l2 ON l0.vec_id = l2.vec_id ORDER BY 1""".stripMargin,

    "corpus_datacard" ->
      s"""WITH b AS (SELECT doc_id, lang, $TK AS tk,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         |    ${graft.ops.Sampling.assignSplitSql("doc_id")} AS split,
         |    text FROM documents),
         |q AS (SELECT *, (len(tk) < 10 OR
         |        100 * len(list_filter(tk, t -> t IN ($stopList))) > 60 * len(tk)) AS lq
         |      FROM b),
         |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         |        CAST(SUM(len(tk)) AS BIGINT) AS n_tokens,
         |        CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
         |        CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_docs,
         |        CAST(SUM(CASE WHEN lq THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
         |        CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |        CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
         |        CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
         |      FROM q),
         |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab_size
         |      FROM (SELECT unnest(tk) AS w FROM b))
         |SELECT a.n_docs, a.n_tokens, a.n_langs,
         |       a.n_docs - a.n_unique_docs AS n_exact_dups,
         |       a.n_low_quality, a.n_train, a.n_val, a.n_test,
         |       v.vocab_size,
         |       CAST(a.n_tokens // a.n_docs AS BIGINT) AS mean_tokens
         |FROM a CROSS JOIN v""".stripMargin,

    "events_user_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |d AS (SELECT user_id, CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS d
        |      FROM days),
        |g AS (SELECT user_id,
        |        d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS g FROM d),
        |s AS (SELECT user_id, g, CAST(COUNT(*) AS BIGINT) AS len FROM g GROUP BY 1, 2)
        |SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
        |       CAST(SUM(len) AS BIGINT) AS n_active_days,
        |       CAST(COUNT(*) AS BIGINT) AS n_streaks
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,

    "parts_abc_analysis" ->
      """WITH rev AS (SELECT l_partkey AS partkey,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS rev_x10k
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(SUM(rev_x10k) AS BIGINT) AS total_x10k FROM rev),
        |c AS (SELECT partkey, rev_x10k,
        |        SUM(rev_x10k) OVER (ORDER BY rev_x10k DESC, partkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_x10k
        |      FROM rev),
        |k AS (SELECT CASE WHEN 100 * CAST(cum_x10k AS HUGEINT) <= 70 * CAST(total_x10k AS HUGEINT) THEN 'A'
        |                  WHEN 100 * CAST(cum_x10k AS HUGEINT) <= 90 * CAST(total_x10k AS HUGEINT) THEN 'B'
        |                  ELSE 'C' END AS cls, rev_x10k
        |      FROM c CROSS JOIN tot)
        |SELECT cls, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |       CAST(SUM(rev_x10k) AS BIGINT) AS class_rev_x10k
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_ppr" -> {
      import graft.ops.Graph
      s"""WITH o AS (SELECT user_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id
         |                          ORDER BY CAST(ts AS TIMESTAMP), event_id) AS src
         |  FROM events),
         |e AS (SELECT src, event_type AS dst, COUNT(*) AS w
         |      FROM o WHERE src IS NOT NULL GROUP BY 1, 2),
         |ow AS (SELECT src, SUM(w) AS out_w FROM e GROUP BY src),
         |ew AS (SELECT e.src, e.dst, e.w, ow.out_w FROM e JOIN ow ON e.src = ow.src),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT node, node < 'm' AS seed,
         |         (SELECT COUNT(*) FROM nodes WHERE node < 'm') AS n_seeds
         |       FROM nodes),
         |r0 AS (SELECT node, seed, n_seeds,
         |         CASE WHEN seed THEN ${Graph.Scale} // n_seeds ELSE 0 END AS pr
         |       FROM nn),
         |r1 AS (${Graph.pprStepSql("r0")}),
         |r2 AS (${Graph.pprStepSql("r1")}),
         |r3 AS (${Graph.pprStepSql("r2")})
         |SELECT node AS event_type, CAST(pr AS BIGINT) AS pr
         |FROM r3 ORDER BY event_type""".stripMargin
    },

    "events_kcore" ->
      s"""WITH $coPresenceSql,
         |${graft.ops.Graph.kCoreSql(3, 4)}
         |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dg4) AS n_core_nodes,
         |       (SELECT CAST(COUNT(*) AS BIGINT) FROM e4) AS n_core_edges,
         |       COALESCE((SELECT MIN(d) >= 3 FROM dg4), TRUE) AS converged""".stripMargin,

    "events_kanonymity" ->
      """WITH d AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day, user_id FROM events),
        |g AS (SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS group_size
        |      FROM d GROUP BY 1, 2)
        |SELECT (group_size >= 5) AS anonymous, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |       CAST(SUM(group_size) AS BIGINT) AS n_memberships
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "orders_benford" -> {
      val cases = benfordX1m.toSeq.sortBy(_._1)
        .map { case (d, e) => s"WHEN $d THEN $e" }.mkString(" ")
      s"""WITH dg AS (SELECT CAST(substr(
         |    CAST(CAST(abs(o_totalprice) * 100 AS DECIMAL(18,0)) AS VARCHAR), 1, 1)
         |    AS INT) AS digit FROM orders),
         |f AS (SELECT digit FROM dg WHERE digit >= 1),
         |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM f),
         |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1),
         |j AS (SELECT c.digit, c.n,
         |        CAST(1000000 * CAST(c.n AS HUGEINT) // t.n_total AS BIGINT) AS share_x1m,
         |        CAST(CASE c.digit $cases END AS BIGINT) AS benford_x1m
         |      FROM c CROSS JOIN t)
         |SELECT digit, n, share_x1m, benford_x1m,
         |       share_x1m - benford_x1m AS dev_x1m
         |FROM j ORDER BY digit""".stripMargin
    },

    "text_langid_confusion" ->
      s"""WITH t AS (SELECT doc_id, lang, $TK AS tk FROM documents),
         |s AS (SELECT doc_id, lang,
         |       $langScoreSql
         |  FROM t),
         |g AS (SELECT lang, $langGuessSql AS lang_guess FROM s)
         |SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n
         |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_cms_exact" ->
      """SELECT user_id, n_exact FROM (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM events
        |  GROUP BY 1 ORDER BY n_exact DESC, user_id LIMIT 20)
        |ORDER BY user_id""".stripMargin,

    // Sketch CERTIFICATES: the oracle computes the exact half and
    // pins the verdict at 1 — the Spark side computes the verdict
    // from the live sketch, so an out-of-envelope sketch flips ok to
    // 0 and the driver's hash compare catches it. See the query
    // scaladocs for each bound.
    "events_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
        |       CAST(1 AS BIGINT) AS ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_approx_quantiles" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       (9 * CAST(COUNT(*) AS BIGINT) + 9) // 10 AS target_rank,
        |       CAST(1 AS BIGINT) AS ok
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_cms_counts" ->
      """SELECT user_id, n_exact, CAST(1 AS BIGINT) AS ok FROM (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM events
        |  GROUP BY 1 ORDER BY n_exact DESC, user_id LIMIT 20)
        |ORDER BY user_id""".stripMargin,

    "events_winsorize_approx" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(1 AS BIGINT) AS ok
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "lineitem_profile_approx" ->
      """SELECT col_name, nd_exact, CAST(1 AS BIGINT) AS ok FROM (
        |  SELECT 'l_discount' AS col_name,
        |         CAST(COUNT(DISTINCT l_discount) AS BIGINT) AS nd_exact
        |  FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice',
        |    CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_quantity',
        |    CAST(COUNT(DISTINCT l_quantity) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_returnflag',
        |    CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT 'l_shipdate',
        |    CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) FROM lineitem)
        |ORDER BY col_name""".stripMargin,

    "events_quantiles_exact" ->
      """WITH ev AS (SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v
        |            FROM events WHERE value IS NOT NULL),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1),
        |r AS (SELECT event_type, v,
        |        row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn FROM ev)
        |SELECT r.event_type, n.n, CAST(r.v * 100 AS BIGINT) AS p90_x100,
        |       rn AS target_rank
        |FROM r JOIN n USING (event_type)
        |WHERE rn = (9 * n.n + 9) // 10 ORDER BY 1""".stripMargin,

    "dedup_containment_prefix" ->
      s"""WITH $SHINGLE3,
         |freq AS (SELECT shingle, COUNT(*) AS f FROM sh GROUP BY 1),
         |rk AS (SELECT doc_id, sh.shingle, f,
         |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY f, sh.shingle) AS rn,
         |         COUNT(*) OVER (PARTITION BY doc_id) AS n
         |       FROM sh JOIN freq USING (shingle)),
         |pc AS (SELECT doc_id,
         |         MAX(CASE WHEN f > 100 THEN 1 ELSE 0 END) AS pc
         |       FROM rk WHERE rn <= n - ((n * 8 + 9) // 10) + 1
         |       GROUP BY 1),
         |pre AS (SELECT rk.doc_id, shingle, rn, n, pc.pc FROM rk
         |        JOIN pc USING (doc_id)
         |        WHERE rn <= n - ((n * 8 + 9) // 10) + 1 AND f <= 100),
         |ful AS (SELECT rk.doc_id, shingle, rn, n, pc.pc FROM rk
         |        JOIN pc USING (doc_id) WHERE f <= 100),
         |cand AS (SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
         |                greatest(x.doc_id, y.doc_id) AS doc_b
         |         FROM pre x JOIN ful y
         |         ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
         |            AND (x.pc = 1 OR y.pc = 1 OR
         |                 1 + least(x.n - x.rn, y.n - y.rn) >=
         |                 (8 * least(x.n, y.n) + 9) // 10)),
         |${containmentTail(8, 10)}""".stripMargin,

    "text_clf_calibration" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |s AS (SELECT CAST(${graft.ops.Text.hashedLinearScoreSql("tk", clfWeights)} AS BIGINT) AS score,
         |        (len(tk) < 10
         |         OR 100 * len(list_filter(tk, t -> t IN ($stopList))) > 60 * len(tk)) AS lq
         |      FROM t),
         |b AS (SELECT least(greatest(score + 16384, 0) // 2000, 15) AS bin,
         |             score, lq FROM s)
         |SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(SUM(CASE WHEN lq THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
         |       MIN(score) AS min_score, MAX(score) AS max_score,
         |       CAST((10000 * SUM(CASE WHEN lq THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS low_rate_bp
         |FROM b GROUP BY 1 ORDER BY bin""".stripMargin,

    "text_zipf_audit" ->
      s"""WITH t AS (SELECT $TK AS tk FROM documents),
         |tf AS (SELECT u.term, CAST(COUNT(*) AS BIGINT) AS f
         |       FROM t, LATERAL (SELECT unnest(tk) AS term) u
         |       GROUP BY 1 ORDER BY f DESC, u.term LIMIT 30),
         |r AS (SELECT term, f,
         |        CAST(row_number() OVER (ORDER BY f DESC, term) AS BIGINT) AS rank
         |      FROM tf),
         |f1 AS (SELECT f AS f1 FROM r WHERE rank = 1)
         |SELECT rank, term, f,
         |       CAST((10000 * CAST(f AS HUGEINT) * rank) // f1 AS BIGINT) AS zipf_bp
         |FROM r CROSS JOIN f1 ORDER BY rank""".stripMargin,

    "text_skipgram_pairs" ->
      s"""WITH t AS (SELECT $TK AS tk FROM documents),
         |p AS (SELECT tk[i] AS center, tk[j] AS context
         |      FROM t,
         |        LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) gi,
         |        LATERAL (SELECT unnest(generate_series(greatest(1, i - 2),
         |                               least(len(tk), i + 2))) AS j) gj
         |      WHERE j <> i AND len(tk) >= 2)
         |SELECT center, context, CAST(COUNT(*) AS BIGINT) AS n
         |FROM p GROUP BY 1, 2
         |ORDER BY n DESC, center, context LIMIT 30""".stripMargin,

    "corpus_leakage_safe_split" ->
      s"""$dedupClustersCtes
         |SELECT d.doc_id,
         |       COALESCE(cc.comp, d.doc_id) AS rep_doc_id,
         |       ${graft.ops.Sampling.assignSplitSql("COALESCE(cc.comp, d.doc_id)")} AS split
         |FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
         |ORDER BY doc_id""".stripMargin,

    "corpus_rag_chunks" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |t2 AS (SELECT * FROM t WHERE len(tk) >= 1),
         |c AS (SELECT doc_id, i AS chunk_idx, i * 16 + 1 AS start_tok,
         |        least(len(tk) - i * 16, 32) AS n_tok,
         |        md5(array_to_string(tk[(i*16+1):(i*16+32)], ' ')) AS chunk_md5
         |      FROM t2, LATERAL (SELECT unnest(generate_series(0,
         |        CASE WHEN len(tk) <= 32 THEN 0 ELSE (len(tk) - 32 + 15) // 16 END)) AS i) g)
         |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
         |       CAST(start_tok AS BIGINT) AS start_tok,
         |       CAST(n_tok AS BIGINT) AS n_tok, chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "sim_mmr_rerank" ->
      s"""WITH ${graft.ops.Similarity.mmrRerankSql(0L, 20, 5, EMB_DIM)}
         |SELECT rank, vec_id, dot_q, mmr FROM picks ORDER BY rank""".stripMargin,

    "sim_hybrid_rrf" ->
      s"""WITH lexb AS (SELECT * FROM (
         |${graft.ops.Retrieval.bm25TopKSql(bm25Terms, 20)}) x),
         |lex AS (SELECT doc_id, CAST(row_number() OVER (
         |          ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank FROM lexb),
         |q AS (SELECT vec_id, ${graft.ops.Vectors.quantizeSql("embedding")} AS qz
         |      FROM embeddings),
         |qq AS (SELECT qz AS qqz FROM q WHERE vec_id = 0),
         |sc AS (SELECT c.vec_id AS doc_id,
         |         ${graft.ops.Vectors.intDotSql("c.qz", "qqz", EMB_DIM)} AS dot
         |       FROM q c CROSS JOIN qq WHERE c.vec_id <> 0),
         |dense AS (SELECT doc_id, rnk AS dense_rank FROM (
         |            SELECT doc_id, CAST(row_number() OVER (
         |              ORDER BY dot DESC, doc_id) AS BIGINT) AS rnk FROM sc) r
         |          WHERE rnk <= 20),
         |f AS (SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         |             COALESCE(l.lex_rank, 0) AS lex_rank,
         |             COALESCE(d.dense_rank, 0) AS dense_rank
         |      FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id),
         |scr AS (SELECT *,
         |          (CASE WHEN lex_rank > 0 THEN 1000000 // (60 + lex_rank) ELSE 0 END)
         |        + (CASE WHEN dense_rank > 0 THEN 1000000 // (60 + dense_rank) ELSE 0 END)
         |          AS rrf_x1e6 FROM f),
         |t AS (SELECT * FROM scr ORDER BY rrf_x1e6 DESC, doc_id LIMIT 10)
         |SELECT CAST(row_number() OVER (ORDER BY rrf_x1e6 DESC, doc_id) AS BIGINT)
         |         AS fused_rank,
         |       doc_id, lex_rank, dense_rank, CAST(rrf_x1e6 AS BIGINT) AS rrf_x1e6
         |FROM t ORDER BY fused_rank""".stripMargin,

    "events_winsorize" ->
      """WITH ev AS (SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v
        |            FROM events WHERE value IS NOT NULL),
        |n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1),
        |r AS (SELECT event_type, v,
        |        row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn FROM ev),
        |b AS (SELECT r.event_type,
        |        MIN(CASE WHEN rn = (n.n + 99) // 100 THEN v END) AS p1,
        |        MIN(CASE WHEN rn = (99 * n.n + 99) // 100 THEN v END) AS p99
        |      FROM r JOIN n USING (event_type) GROUP BY 1),
        |c AS (SELECT ev.event_type,
        |        greatest(b.p1, least(b.p99, ev.v)) AS cv,
        |        (ev.v < b.p1) AS lo, (ev.v > b.p99) AS hi
        |      FROM ev JOIN b USING (event_type))
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CASE WHEN lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
        |       CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
        |       CAST(SUM(cv) * 100 AS BIGINT) AS clipped_sum_x100
        |FROM c GROUP BY 1 ORDER BY event_type""".stripMargin,

    "events_funnel_windowed" ->
      """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
        |s1 AS (SELECT user_id,
        |    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup
        |  FROM ev GROUP BY 1),
        |s2 AS (SELECT e.user_id, s1.t_signup,
        |    MIN(CASE WHEN e.event_type = 'click' AND e.ts >= s1.t_signup
        |        AND e.ts <= s1.t_signup + INTERVAL 3 DAY
        |        THEN e.ts END) AS t_click
        |  FROM ev e JOIN s1 ON e.user_id = s1.user_id GROUP BY 1, 2),
        |s3 AS (SELECT e.user_id, s2.t_signup, s2.t_click,
        |    MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= s2.t_click
        |        AND e.ts <= s2.t_click + INTERVAL 3 DAY
        |        THEN e.ts END) AS t_purchase
        |  FROM ev e JOIN s2 ON e.user_id = s2.user_id GROUP BY 1, 2, 3),
        |agg AS (SELECT
        |    COUNT(CASE WHEN t_signup IS NOT NULL THEN 1 END) AS n_signup,
        |    COUNT(CASE WHEN t_click IS NOT NULL THEN 1 END) AS n_click_3d,
        |    COUNT(CASE WHEN t_purchase IS NOT NULL THEN 1 END) AS n_purchase_3d
        |  FROM s3)
        |SELECT stage, n_users FROM (
        |  SELECT 'signup' AS stage, n_signup AS n_users FROM agg
        |  UNION ALL SELECT 'click_3d', n_click_3d FROM agg
        |  UNION ALL SELECT 'purchase_3d', n_purchase_3d FROM agg)
        |ORDER BY stage""".stripMargin,

    "text_oov_rate" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |t2 AS (SELECT * FROM t WHERE len(tk) >= 1),
         |v AS (SELECT u.t FROM (
         |        SELECT u.t, COUNT(*) AS c
         |        FROM t2, LATERAL (SELECT unnest(tk) AS t) u GROUP BY 1
         |        ORDER BY c DESC, u.t LIMIT 100) u),
         |a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |        CAST(SUM(CASE WHEN tok.t IN (SELECT t FROM v) THEN 0 ELSE 1 END)
         |             AS BIGINT) AS n_oov
         |      FROM t2, LATERAL (SELECT unnest(tk) AS t) tok GROUP BY 1)
         |SELECT doc_id, n_tokens, n_oov,
         |       (10000 * n_oov) // n_tokens AS oov_bp
         |FROM a ORDER BY doc_id""".stripMargin,

    "corpus_token_budget" ->
      s"""WITH d AS (SELECT doc_id, source, CAST(len($TK) AS BIGINT) AS n_tok
         |           FROM documents),
         |r AS (SELECT doc_id, source, n_tok,
         |        CAST(row_number() OVER w AS BIGINT) AS rk,
         |        CAST(SUM(n_tok) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
         |                              AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |      FROM d
         |      WINDOW w AS (PARTITION BY source
         |                   ORDER BY ${graft.ops.Sampling.bucketSql("doc_id")}, doc_id))
         |SELECT doc_id, source, rk, n_tok, cum_tokens
         |FROM r WHERE cum_tokens <= 20000 ORDER BY doc_id""".stripMargin,

    "emb_outliers" -> {
      val dim = EMB_DIM
      s"""WITH q AS (SELECT vec_id, ${Vectors.quantizeSql("embedding")} AS q FROM embeddings),
         |seeds AS (SELECT vec_id AS cid, q AS cq,
         |          ${Vectors.intNorm2Sql("q", dim)} AS cn2 FROM q WHERE vec_id < 4),
         |d1 AS (SELECT v.vec_id, v.q, s.cid,
         |       s.cn2 - 2 * ${Vectors.intDotSql("v.q", "s.cq", dim)} AS sc
         |       FROM q v CROSS JOIN seeds s),
         |a1 AS (SELECT vec_id, q, cid AS cl, sc FROM (
         |         SELECT *, row_number() OVER (PARTITION BY vec_id
         |                   ORDER BY sc, cid) AS rn FROM d1) WHERE rn = 1),
         |o AS (SELECT vec_id, cl, ${Vectors.intNorm2Sql("q", dim)} + sc AS d2
         |      FROM a1 ORDER BY d2 DESC, vec_id LIMIT 20)
         |SELECT CAST(row_number() OVER (ORDER BY d2 DESC, vec_id) AS BIGINT) AS rank,
         |       vec_id, cl, d2
         |FROM o ORDER BY rank""".stripMargin
    },

    "events_drift_halves" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day, CAST(value AS DECIMAL(18,2)) AS v
        |            FROM events WHERE value IS NOT NULL),
        |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |h AS (SELECT CASE WHEN ev.day <= b.d0 + CAST((b.d1 - b.d0) // 2 AS INTEGER)
        |             THEN 1 ELSE 0 END AS in_a,
        |             least(15, greatest(CAST(v * 100 AS BIGINT), 0) // 2000) AS bin
        |      FROM ev CROSS JOIN b),
        |g AS (SELECT bin, CAST(SUM(in_a) AS BIGINT) AS n_a,
        |             CAST(SUM(1 - in_a) AS BIGINT) AS n_b FROM h GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS tot_a,
        |             CAST(SUM(n_b) AS BIGINT) AS tot_b FROM g)
        |SELECT bin, n_a, n_b,
        |       (10000 * n_a) // greatest(tot_a, 1) AS share_a_bp,
        |       (10000 * n_b) // greatest(tot_b, 1) AS share_b_bp,
        |       (10000 * n_a) // greatest(tot_a, 1)
        |         - (10000 * n_b) // greatest(tot_b, 1) AS drift_bp
        |FROM g CROSS JOIN t ORDER BY bin""".stripMargin,

    "events_cuped" ->
      """WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |            event_type FROM events),
        |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |per AS (SELECT user_id,
        |    CAST(SUM(CASE WHEN ev.day <= b.d0 + CAST((b.d1 - b.d0) // 2 AS INTEGER)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN ev.day > b.d0 + CAST((b.d1 - b.d0) // 2 AS INTEGER)
        |             AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM ev CROSS JOIN b GROUP BY user_id),
        |mo AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx,
        |         CAST(SUM(x * y) AS BIGINT) AS sxy FROM per),
        |va AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a,
        |         CAST(SUM(x) AS BIGINT) AS sum_x_a,
        |         CAST(SUM(y) AS BIGINT) AS sum_y_a
        |       FROM per WHERE user_id % 2 = 0),
        |vb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b,
        |         CAST(SUM(x) AS BIGINT) AS sum_x_b,
        |         CAST(SUM(y) AS BIGINT) AS sum_y_b
        |       FROM per WHERE user_id % 2 <> 0),
        |t AS (SELECT *, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
        |      FROM va CROSS JOIN vb CROSS JOIN mo),
        |u AS (SELECT *,
        |        CAST(sign(num) * ((10000 * abs(num)) // greatest(den, 1))
        |          AS BIGINT) AS theta_bp,
        |        (10000 * sum_y_b) // greatest(n_b, 1)
        |          - (10000 * sum_y_a) // greatest(n_a, 1) AS diff_y_bp,
        |        (10000 * sum_x_b) // greatest(n_b, 1)
        |          - (10000 * sum_x_a) // greatest(n_a, 1) AS diff_x_bp
        |      FROM t)
        |SELECT n_a, n_b, sum_x_a, sum_x_b, sum_y_a, sum_y_b, theta_bp,
        |       diff_y_bp, diff_x_bp,
        |       diff_y_bp - CAST(sign(theta_bp * diff_x_bp)
        |         * ((abs(theta_bp) * abs(diff_x_bp)) // 10000) AS BIGINT)
        |         AS adj_uplift_bp
        |FROM u""".stripMargin,

    "events_attribution_first" ->
      """WITH t AS (SELECT *,
        |             first_value(CASE WHEN event_type IN ('click','view','signup')
        |                        THEN event_type END IGNORE NULLS)
        |               OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |               AS touch
        |           FROM events)
        |SELECT COALESCE(touch, 'direct') AS touch_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         AS BIGINT) AS revenue_x100
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |                  epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |b AS (SELECT *, CASE WHEN us - lag(us) OVER
        |       (PARTITION BY user_id ORDER BY ts, event_id)
        |       > 1800000000 THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id
        |       ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM b),
        |sess AS (SELECT user_id, sid, MIN(ts) AS t0, MAX(ts) AS t1
        |         FROM s GROUP BY 1, 2),
        |segs AS (SELECT CAST(d.day AS DATE) AS day,
        |           greatest(t0, CAST(CAST(d.day AS DATE) AS TIMESTAMP)) AS seg_start,
        |           least(t1, CAST(CAST(d.day AS DATE) + INTERVAL 1 DAY
        |                          AS TIMESTAMP)) AS seg_end
        |         FROM sess, LATERAL (SELECT unnest(generate_series(
        |           CAST(t0 AS DATE), CAST(t1 AS DATE), INTERVAL 1 DAY)) AS day) d),
        |bd AS (SELECT day, seg_start AS t, CAST(1 AS BIGINT) AS delta FROM segs
        |       UNION ALL SELECT day, seg_end, -1 FROM segs),
        |r AS (SELECT day, SUM(delta) OVER (PARTITION BY day
        |       ORDER BY t ASC, delta DESC ROWS UNBOUNDED PRECEDING) AS run FROM bd)
        |SELECT day, CAST(MAX(run) AS BIGINT) AS max_concurrent,
        |       CAST(COUNT(*) // 2 AS BIGINT) AS n_active_sessions
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_conjunctive" ->
      s"""WITH t AS (SELECT doc_id, $TK AS tk FROM documents),
         |p AS (SELECT doc_id, tok AS term FROM t,
         |        LATERAL (SELECT unnest(tk) AS tok) u
         |      WHERE tok IN ('dup', 'spark', 'merge')),
         |g AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
         |      FROM p GROUP BY 1, 2),
         |a AS (SELECT doc_id, COUNT(*) AS n_terms, SUM(tf) AS tf_total
         |      FROM g GROUP BY 1)
         |SELECT doc_id, CAST(tf_total AS BIGINT) AS tf_total
         |FROM a WHERE n_terms = 3 ORDER BY doc_id""".stripMargin,

    "events_equidepth" ->
      """WITH v AS (SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
        |             AS v, event_id
        |           FROM events WHERE value IS NOT NULL),
        |nt AS (SELECT v, ntile(16) OVER (ORDER BY v, event_id) AS bucket FROM v)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |       CAST(COUNT(*) AS BIGINT) AS n_values,
        |       MIN(v) AS lo_x100, MAX(v) AS hi_x100
        |FROM nt GROUP BY 1 ORDER BY 1""".stripMargin,

    "text_chi2_terms" ->
      s"""WITH t AS (SELECT doc_id, lang = 'en' AS cls, $TK AS tk
         |           FROM documents),
         |tot AS (SELECT CAST(SUM(CASE WHEN cls THEN 1 ELSE 0 END) AS BIGINT)
         |               AS n1,
         |               CAST(COUNT(*) AS BIGINT) AS nn FROM t),
         |p AS (SELECT DISTINCT doc_id, cls, u.term
         |      FROM t, LATERAL (SELECT unnest(tk) AS term) u),
         |per AS (SELECT term,
         |          CAST(SUM(CASE WHEN cls THEN 1 ELSE 0 END) AS BIGINT) AS a,
         |          CAST(SUM(CASE WHEN NOT cls THEN 1 ELSE 0 END) AS BIGINT) AS b
         |        FROM p GROUP BY 1),
         |s AS (SELECT term, a, b, n1 - a AS c, nn - n1 - b AS d, nn
         |      FROM per, tot)
         |SELECT term, a AS n_en_with, b AS n_other_with,
         |       CAST((10000 * CAST(nn AS HUGEINT)
         |             * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
         |             * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c))
         |            // greatest(CAST(a + b AS HUGEINT) * (c + d)
         |                        * (a + c) * (b + d), 1) AS BIGINT) AS chi2_bp
         |FROM s ORDER BY chi2_bp DESC, term LIMIT 20""".stripMargin,

    "events_bfs_reach" ->
      s"""WITH $coPresenceSql,
         |seeds AS (SELECT DISTINCT user_id AS v FROM events
         |          WHERE user_id % 7 = 0),
         |${graft.ops.Graph.bfsHopsSql(3)}
         |SELECT v AS user_id, dist FROM bfs ORDER BY user_id""".stripMargin,

    "events_temporal_reach" ->
      s"""WITH tcells AS MATERIALIZED (SELECT DISTINCT user_id,
         |    event_type || '|' ||
         |      CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS VARCHAR) AS cell,
         |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS t
         |  FROM events),
         |tcap AS MATERIALIZED (SELECT cell, user_id, t FROM (
         |    SELECT cell, user_id, t, row_number() OVER (PARTITION BY cell
         |      ORDER BY ${graft.ops.Sampling.capOrderSql("user_id")}) AS rk
         |    FROM tcells) WHERE rk <= 50),
         |ted AS MATERIALIZED (SELECT DISTINCT x.user_id AS a, y.user_id AS b, x.t
         |     FROM tcap x JOIN tcap y
         |     ON x.cell = y.cell AND x.user_id < y.user_id),
         |seeds AS MATERIALIZED (SELECT user_id AS v,
         |    MIN(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS t0
         |  FROM events WHERE user_id % 7 = 0 GROUP BY 1),
         |${graft.ops.Graph.temporalReachSql(3)}
         |SELECT v AS user_id, CAST(arr AS TIMESTAMP) AS arr_hour
         |FROM r3 ORDER BY user_id""".stripMargin,

    "events_cheapest_reach" ->
      s"""WITH cells AS MATERIALIZED (SELECT DISTINCT user_id,
         |    event_type || '|' ||
         |      CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS VARCHAR) AS cell
         |  FROM events),
         |cap AS MATERIALIZED (SELECT cell, user_id FROM (
         |    SELECT cell, user_id, row_number() OVER (PARTITION BY cell
         |      ORDER BY ${graft.ops.Sampling.capOrderSql("user_id")}) AS rk
         |    FROM cells) WHERE rk <= 50),
         |wed AS MATERIALIZED (SELECT a, b, (100 + ns - 1) // ns AS w FROM (
         |    SELECT x.user_id AS a, y.user_id AS b,
         |           CAST(COUNT(*) AS BIGINT) AS ns
         |    FROM cap x JOIN cap y ON x.cell = y.cell AND x.user_id < y.user_id
         |    GROUP BY 1, 2 HAVING COUNT(*) >= 2) g),
         |seeds AS MATERIALIZED (SELECT DISTINCT user_id AS v FROM events
         |  WHERE user_id % 7 = 0),
         |${graft.ops.Graph.cheapestPathsSql(3)}
         |SELECT v AS user_id, dist AS cost FROM d3 ORDER BY user_id""".stripMargin,

    "events_assortativity" ->
      s"""WITH $coPresenceSql,
         |sym AS MATERIALIZED (SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed),
         |deg AS MATERIALIZED (SELECT a, CAST(COUNT(*) AS BIGINT) AS d
         |  FROM sym GROUP BY 1),
         |xy AS (SELECT da.d AS dx, db.d AS dy FROM sym s
         |       JOIN deg da ON da.a = s.a JOIN deg db ON db.a = s.b),
         |mo AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m,
         |              CAST(SUM(CAST(dx AS HUGEINT)) AS HUGEINT) AS sx,
         |              CAST(SUM(CAST(dy AS HUGEINT)) AS HUGEINT) AS sy,
         |              CAST(SUM(CAST(dx AS HUGEINT) * dx) AS HUGEINT) AS sxx,
         |              CAST(SUM(CAST(dy AS HUGEINT) * dy) AS HUGEINT) AS syy,
         |              CAST(SUM(CAST(dx AS HUGEINT) * dy) AS HUGEINT) AS sxy
         |       FROM xy),
         |nd AS (SELECT m, m * sxy - sx * sy AS num,
         |              m * sxx - sx * sx AS den_x,
         |              m * syy - sy * sy AS den_y FROM mo)
         |SELECT CAST(m AS BIGINT) AS m,
         |       ${graft.ops.Graph.assortativityRbpSql("//")} AS r_bp_signed
         |FROM nd""".stripMargin,

    "events_twap" ->
      """WITH ev AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |                   greatest(CAST(CAST(value AS DECIMAL(18,2)) * 100
        |                     AS BIGINT), CAST(0 AS BIGINT)) AS v
        |            FROM events WHERE value IS NOT NULL),
        |l AS (SELECT *,
        |        lead(ts) OVER (PARTITION BY event_type
        |          ORDER BY ts, event_id) AS next_ts
        |      FROM ev),
        |wgt AS (SELECT event_type, v,
        |          CASE WHEN next_ts IS NOT NULL
        |               THEN epoch_us(next_ts) // 1000000
        |                  - epoch_us(ts) // 1000000 END AS wsec
        |        FROM l),
        |a AS (SELECT event_type,
        |        CAST(COUNT(*) AS BIGINT) AS n_readings,
        |        CAST(SUM(CASE WHEN wsec IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |          AS n_open,
        |        CAST(COALESCE(SUM(wsec), 0) AS BIGINT) AS total_sec,
        |        CAST(COALESCE(SUM(CAST(v AS HUGEINT) * wsec), 0) AS HUGEINT)
        |          AS vw,
        |        CAST(SUM(v) AS BIGINT) AS sv
        |      FROM wgt GROUP BY 1)
        |SELECT event_type, n_readings, n_open, total_sec,
        |       CAST(vw // greatest(CAST(total_sec AS HUGEINT), 1) AS BIGINT)
        |         AS twap_x100,
        |       sv // n_readings AS naive_mean_x100
        |FROM a ORDER BY event_type""".stripMargin,

    "events_drift_ks" ->
      """WITH ev AS (SELECT CAST(ts AS DATE) AS day,
        |                   CAST(value AS DECIMAL(18,2)) AS v
        |            FROM events WHERE value IS NOT NULL),
        |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
        |g AS (SELECT least(15, greatest(CAST(v * 100 AS BIGINT), 0) // 2000)
        |               AS bin,
        |             CAST(SUM(CASE WHEN day <= d0 + CAST((d1 - d0) // 2 AS INTEGER)
        |                      THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |             CAST(SUM(CASE WHEN day <= d0 + CAST((d1 - d0) // 2 AS INTEGER)
        |                      THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |      FROM ev CROSS JOIN b GROUP BY 1),
        |cu AS (SELECT *,
        |         CAST(SUM(n_a) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
        |           AS BIGINT) AS cum_a,
        |         CAST(SUM(n_b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
        |           AS BIGINT) AS cum_b,
        |         CAST(SUM(n_a) OVER () AS BIGINT) AS tot_a,
        |         CAST(SUM(n_b) OVER () AS BIGINT) AS tot_b
        |       FROM g),
        |sh AS (SELECT bin, n_a, n_b,
        |              (10000 * cum_a) // greatest(tot_a, 1) AS cum_share_a_bp,
        |              (10000 * cum_b) // greatest(tot_b, 1) AS cum_share_b_bp
        |       FROM cu)
        |SELECT bin, n_a, n_b, cum_share_a_bp, cum_share_b_bp,
        |       cum_share_a_bp - cum_share_b_bp AS gap_bp,
        |       CAST(MAX(abs(cum_share_a_bp - cum_share_b_bp)) OVER ()
        |         AS BIGINT) AS ks_bp
        |FROM sh ORDER BY bin""".stripMargin,

    "customer_gini" ->
      """WITH rev AS (SELECT o_custkey,
        |               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                 AS BIGINT)) AS BIGINT) AS x
        |             FROM orders GROUP BY 1),
        |base AS (SELECT c.c_custkey, COALESCE(r.x, 0) AS x
        |         FROM customer c LEFT JOIN rev r ON r.o_custkey = c.c_custkey),
        |rk AS (SELECT x, CAST(row_number() OVER (ORDER BY x, c_custkey)
        |         AS BIGINT) AS i FROM base)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
        |       CAST(SUM(x) AS BIGINT) AS total_x100,
        |       CAST((10000 * (2 * CAST(SUM(CAST(i AS HUGEINT) * x) AS HUGEINT)
        |              - (COUNT(*) + 1) * CAST(SUM(x) AS HUGEINT)))
        |            // greatest(CAST(COUNT(*) AS HUGEINT) * SUM(x), 1)
        |         AS BIGINT) AS gini_bp
        |FROM rk""".stripMargin,

    "lineitem_weighted_price" ->
      """WITH b AS (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |             AS BIGINT) AS price_x100,
        |           CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
        |           FROM lineitem),
        |c AS (SELECT price_x100, w,
        |        CAST(SUM(w) OVER (ORDER BY price_x100, l_orderkey, l_linenumber
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |          AS BIGINT) AS cum
        |      FROM b),
        |t AS (SELECT MAX(cum) AS total FROM c),
        |k AS (SELECT unnest([25, 50, 75]) AS pct)
        |SELECT CAST(k.pct AS BIGINT) AS pct,
        |       MIN(c.price_x100) AS price_x100,
        |       MIN(t.total) AS total_units
        |FROM c, t, k
        |WHERE c.cum >= (k.pct * t.total + 99) // 100
        |  AND c.cum - c.w < (k.pct * t.total + 99) // 100
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "events_cusum" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |                      CAST(COUNT(*) AS BIGINT) AS n
        |               FROM events GROUP BY 1),
        |sc AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
        |              CAST(COUNT(*) AS BIGINT) AS d FROM daily),
        |dev AS (SELECT day, n, n * d - total AS dev, total
        |        FROM daily CROSS JOIN sc),
        |runs AS (SELECT *,
        |           CAST(SUM(dev) OVER (ORDER BY day
        |             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_run
        |         FROM dev),
        |ex AS (SELECT *,
        |         CAST(MIN(s_run) OVER (ORDER BY day
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_min,
        |         CAST(MAX(s_run) OVER (ORDER BY day
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_max
        |       FROM runs)
        |SELECT day, n, dev,
        |       s_run - least(CAST(0 AS BIGINT), run_min) AS cusum_pos,
        |       greatest(CAST(0 AS BIGINT), run_max) - s_run AS cusum_neg,
        |       (s_run - least(CAST(0 AS BIGINT), run_min)) > 2 * total AS alarm_hi,
        |       (greatest(CAST(0 AS BIGINT), run_max) - s_run) > 2 * total AS alarm_lo
        |FROM ex ORDER BY day""".stripMargin,

    "events_decay_score" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |                   greatest(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT),
        |                            CAST(0 AS BIGINT)) AS v_x100
        |            FROM events WHERE value IS NOT NULL),
        |l AS (SELECT MAX(day) AS d1 FROM ev),
        |c AS (SELECT user_id, v_x100,
        |             v_x100 // (CAST(1 AS BIGINT) <<
        |               least(CAST(d1 - day AS BIGINT), 40)) AS contrib
        |      FROM ev CROSS JOIN l)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(v_x100) AS BIGINT) AS raw_x100,
        |       CAST(SUM(contrib) AS BIGINT) AS decayed_x100
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "customers_record_linkage" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer),
        |d1 AS (SELECT c_custkey AS dirty_id, c_name AS n,
        |              CAST(CASE WHEN c_custkey % 6 < 3 THEN c_custkey % 6 + 10
        |                   ELSE c_custkey % 6 + 11 END AS INTEGER) AS p
        |       FROM c),
        |dirty AS (SELECT dirty_id,
        |            substr(n, 1, p - 1) || substr(n, p + 1, 1) ||
        |            substr(n, p, 1) || substr(n, p + 2, 100) AS dn
        |          FROM d1),
        |cb0 AS (SELECT c_custkey, c_name,
        |               unnest(range(1, length(c_name))) AS q FROM c),
        |cb AS (SELECT c_custkey, c_name, q,
        |              substr(c_name, 1, q - 1) || substr(c_name, q + 2, 1000)
        |                AS bk FROM cb0),
        |db0 AS (SELECT dirty_id, dn,
        |               unnest(range(1, length(dn))) AS q FROM dirty),
        |db AS (SELECT dirty_id, dn, q,
        |              substr(dn, 1, q - 1) || substr(dn, q + 2, 1000) AS bk
        |       FROM db0),
        |cand AS (SELECT DISTINCT d.dirty_id, d.dn, c.c_custkey, c.c_name
        |         FROM db d JOIN cb c ON d.q = c.q AND d.bk = c.bk),
        |v AS (SELECT dirty_id, c_custkey,
        |             CAST(levenshtein(dn, c_name) AS BIGINT) AS lev
        |      FROM cand WHERE levenshtein(dn, c_name) <= 2),
        |r AS (SELECT *,
        |        CAST(COUNT(*) OVER (PARTITION BY dirty_id) AS BIGINT) AS n_cand,
        |        row_number() OVER (PARTITION BY dirty_id
        |          ORDER BY lev, c_custkey) AS rn
        |      FROM v)
        |SELECT dirty_id, c_custkey AS matched_custkey, lev AS lev_dist,
        |       n_cand, (c_custkey = dirty_id) AS is_correct
        |FROM r WHERE rn = 1 ORDER BY dirty_id""".stripMargin,

    "customers_snm_linkage" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer),
        |d1 AS (SELECT c_custkey AS dirty_id, c_name AS n,
        |              CAST(CASE WHEN c_custkey % 6 < 3 THEN c_custkey % 6 + 10
        |                   ELSE c_custkey % 6 + 11 END AS INTEGER) AS p
        |       FROM c),
        |dirty AS (SELECT dirty_id,
        |            substr(n, 1, p - 1) || substr(n, p + 1, 1) ||
        |            substr(n, p, 1) || substr(n, p + 2, 100) AS dn
        |          FROM d1),
        |u AS (SELECT c_custkey AS id, c_name AS name, 0 AS src FROM c
        |      UNION ALL
        |      SELECT dirty_id, dn, 1 FROM dirty),
        |r1 AS (SELECT *, row_number() OVER (ORDER BY name, src, id) AS rnk
        |       FROM u),
        |p1 AS (SELECT a.id AS id_a, a.src AS src_a, b.id AS id_b, b.src AS src_b
        |       FROM r1 a JOIN r1 b
        |       ON b.rnk > a.rnk AND b.rnk - a.rnk <= 10),
        |r2 AS (SELECT *, row_number() OVER (ORDER BY reverse(name), src, id)
        |         AS rnk FROM u),
        |p2 AS (SELECT a.id AS id_a, a.src AS src_a, b.id AS id_b, b.src AS src_b
        |       FROM r2 a JOIN r2 b
        |       ON b.rnk > a.rnk AND b.rnk - a.rnk <= 10),
        |pp AS (SELECT * FROM p1 UNION SELECT * FROM p2),
        |cand AS (SELECT DISTINCT
        |           CASE WHEN src_a = 1 THEN id_a ELSE id_b END AS dirty_id,
        |           CASE WHEN src_a = 1 THEN id_b ELSE id_a END AS c_custkey
        |         FROM pp WHERE src_a <> src_b),
        |v AS (SELECT x.dirty_id, x.c_custkey,
        |             CAST(levenshtein(d.dn, c.c_name) AS BIGINT) AS lev
        |      FROM cand x
        |      JOIN dirty d ON d.dirty_id = x.dirty_id
        |      JOIN c ON c.c_custkey = x.c_custkey
        |      WHERE levenshtein(d.dn, c.c_name) <= 2),
        |e AS (SELECT dirty_id, c_custkey AS matched_custkey,
        |             lev AS lev_dist, n_cand FROM (
        |        SELECT *,
        |          CAST(COUNT(*) OVER (PARTITION BY dirty_id) AS BIGINT)
        |            AS n_cand,
        |          row_number() OVER (PARTITION BY dirty_id
        |            ORDER BY lev, c_custkey) AS rn
        |        FROM v) x WHERE rn = 1)
        |SELECT d.dirty_id, e.dirty_id IS NOT NULL AS found,
        |       COALESCE(e.matched_custkey, -1) AS matched_custkey,
        |       COALESCE(e.lev_dist, -1) AS lev_dist,
        |       COALESCE(e.n_cand, 0) AS n_cand
        |FROM dirty d LEFT JOIN e ON e.dirty_id = d.dirty_id
        |ORDER BY d.dirty_id""".stripMargin,

    "corpus_golden_record" ->
      s"""$dedupClustersCtes,
         |lab AS (SELECT d.doc_id, COALESCE(cc.comp, d.doc_id) AS cluster,
         |               d.lang, d.source, d.n_chars
         |        FROM documents d LEFT JOIN cc ON cc.id = d.doc_id),
         |base AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members,
         |                CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id,
         |                CAST(MAX(n_chars) AS BIGINT) AS best_n_chars
         |         FROM lab GROUP BY 1),
         |lm AS (SELECT cluster, lang AS canon_lang FROM (
         |         SELECT cluster, lang, row_number() OVER (PARTITION BY cluster
         |           ORDER BY COUNT(*) DESC, lang NULLS LAST) AS rn
         |         FROM lab GROUP BY cluster, lang) x WHERE rn = 1),
         |sm AS (SELECT cluster, source AS canon_source FROM (
         |         SELECT cluster, source, row_number() OVER (PARTITION BY cluster
         |           ORDER BY COUNT(*) DESC, source NULLS LAST) AS rn
         |         FROM lab GROUP BY cluster, source) x WHERE rn = 1)
         |SELECT b.cluster, b.rep_doc_id, b.n_members, b.best_n_chars,
         |       lm.canon_lang, sm.canon_source
         |FROM base b JOIN lm ON lm.cluster = b.cluster
         |JOIN sm ON sm.cluster = b.cluster
         |ORDER BY b.cluster""".stripMargin,

    "part_skyline" ->
      """WITH g AS (SELECT p_retailprice AS price, p_size AS size,
        |                  CAST(COUNT(*) AS BIGINT) AS n_parts
        |           FROM part GROUP BY 1, 2),
        |tp AS (SELECT * FROM (SELECT *, row_number() OVER (
        |         PARTITION BY price ORDER BY size DESC) AS rn FROM g) x
        |       WHERE rn = 1)
        |SELECT price, CAST(size AS BIGINT) AS size, n_parts
        |FROM tp a
        |WHERE NOT EXISTS (SELECT 1 FROM tp b
        |                  WHERE b.price < a.price AND b.size >= a.size)
        |ORDER BY price""".stripMargin,

    "events_autocorr" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |                      CAST(COUNT(*) AS BIGINT) AS x
        |               FROM events GROUP BY 1),
        |lagged AS (SELECT k, day + CAST(k AS INTEGER) AS day_k, x AS x_t
        |           FROM daily, (SELECT unnest(range(1, 8)) AS k) ks),
        |pairs AS (SELECT l.k, l.x_t, d.x AS x_k
        |          FROM lagged l JOIN daily d ON d.day = l.day_k),
        |a AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |             CAST(SUM(x_t) AS BIGINT) AS sx,
        |             CAST(SUM(x_k) AS BIGINT) AS sy,
        |             CAST(SUM(x_t * x_t) AS BIGINT) AS sxx,
        |             CAST(SUM(x_k * x_k) AS BIGINT) AS syy,
        |             CAST(SUM(x_t * x_k) AS BIGINT) AS sxy
        |      FROM pairs GROUP BY 1),
        |d AS (SELECT CAST(k AS BIGINT) AS k, n_pairs,
        |             n_pairs * sxy - sx * sy AS num,
        |             n_pairs * sxx - sx * sx AS den_x,
        |             n_pairs * syy - sy * sy AS den_y
        |      FROM a)
        |SELECT k, n_pairs, num, den_x, den_y,
        |       CAST(CAST(sign(num) AS HUGEINT)
        |         * ((10000 * CAST(num AS HUGEINT) * num)
        |            // greatest(CAST(den_x AS HUGEINT) * den_y, 1))
        |         AS BIGINT) AS r2_bp
        |FROM d ORDER BY k""".stripMargin,

    "events_attribution" ->
      """WITH t AS (SELECT *,
        |             last_value(CASE WHEN event_type IN ('click','view','signup')
        |                        THEN event_type END IGNORE NULLS)
        |               OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |               AS touch
        |           FROM events)
        |SELECT COALESCE(touch, 'direct') AS touch_type,
        |       CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
        |         AS BIGINT) AS revenue_x100
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
