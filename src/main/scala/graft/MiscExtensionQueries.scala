package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.cdc.{ApplyChanges, Fixtures, Routing}
import graft.ops.{Dedup, Multimodal, Sessionize, Similarity, Text, Vectors}

/** Extension queries — CDC forms, multimodal certificates, and relational/tabular profiles.
  * Builders + their DuckDB oracle mirrors for this family; shared
  * fragments come from [[ExtensionQueriesBase]]. Registered into the
  * single public registry by [[ExtensionQueries]].
  */
private[graft] trait MiscExtensionQueries extends ExtensionQueriesBase {
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

  private def qMultimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select((col("doc_id") +:
        Multimodal.envelopeFeatures(encode(col("text"), "UTF-8"), col("n_chars"))): _*)
      .orderBy("doc_id")

  /** Fulfillment-lag SLA profile per order priority — the
    * supply-chain sibling of events_conversion_lag: for every
    * lineitem the whole-day gap from order placement to line
    * shipment, then exact rank-pick p50 / p90 / max per priority
    * class (the value AT a target rank is deterministic under ties).
    * The readout that answers "does 1-URGENT actually ship faster?"
    * with exact integers.
    *
    * Scale shape: orders(key, date, priority) joins INTO the lineitem
    * scan — at the driver fixtures it broadcasts; at 100 TB both
    * sides are fact-sized and the keyed shuffle join is the correct
    * shape, which is why the join keys on l_orderkey rather than
    * anything derived. Ranks and counts ride ONE priority-keyed
    * exchange (the inter_arrival fold).
    */
  private def qOrdersFulfillmentLag(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lags = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_d"))
      .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_d"),
            col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("ship_d"), col("order_d")).cast("long").as("lag_days"))
    val r = lags
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("o_orderpriority")).orderBy(col("lag_days").asc)))
      .withColumn("n_lines",
        count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
    r.groupBy(col("o_orderpriority"))
      .agg(max(col("n_lines")).as("n_lines"),
        max(when(col("rn") === expr("(n_lines + 1) div 2"), col("lag_days")))
          .as("p50_lag_days"),
        max(when(col("rn") === expr("(9 * n_lines + 9) div 10"), col("lag_days")))
          .as("p90_lag_days"),
        max(col("lag_days")).as("max_lag_days"))
      .orderBy("o_orderpriority")
  }

  /** Retail-price dispersion per part type — the pricing-consistency
    * readout (a high coefficient of variation inside one type means
    * the catalog mixes incomparable goods or mispriced rows): exact
    * integer mean, truncated-mean variance (the SF-independent
    * emb_dim_variance form), integer sqrt with the ±1 adjustment
    * against the exact square (the power-analysis isqrt idiom — float
    * sqrt rounding cannot split the engines), CV in bp.
    *
    * Scale shape: ONE type-keyed aggregate over the part scan; all the
    * statistic arithmetic runs on the |types|-row frame.
    */
  private def qPartPriceDispersion(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_type"),
        (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
          .as("x"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("s1"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"))
      .withColumn("mean_x100", expr("CAST(s1 div n AS BIGINT)"))
      .withColumn("var_c2", expr(
        "CAST(greatest(s2 div n - (s1 div n) * (s1 div n), 0) AS BIGINT)"))
      .withColumn("r0", floor(sqrt(col("var_c2"))).cast("long"))
      .withColumn("sd_x100", expr(
        """CASE WHEN (r0 + 1) * (r0 + 1) <= var_c2 THEN r0 + 1
          |     WHEN r0 * r0 > var_c2 THEN r0 - 1 ELSE r0 END""".stripMargin))
      .withColumn("cv_bp", expr("(10000 * sd_x100) div greatest(mean_x100, 1)"))
      .select(col("p_type"), col("n"), col("mean_x100"), col("sd_x100"),
        col("cv_bp"))
      .orderBy("p_type")

  /** Nation revenue-share shift — the geographic-mix readout: per
    * nation and year, revenue, its share of the year's total in bp,
    * and the year-over-year share delta (NULL for a nation's first
    * year — honest, not zero-filled). Shares on DECIMAL(38) so the
    * 10⁴ cross product never wraps.
    *
    * Scale shape: customer and nation are broadcast dimensions into
    * the orders scan; ONE (nation, year) aggregate; totals and the lag
    * window run on the calendar×25-row frame.
    */
  private def qCustomerNationShift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.orders(s, dir)
      .select(col("o_custkey"),
        year(to_date(col("o_orderdate"))).cast("long").as("yr"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("spend"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("yr"))
      .agg(sum(col("spend")).as("rev_x100"))
      // pinned: year totals and the share/lag output both read this
      // (nation, year) frame — unpinned, each branch re-scans the
      // three-table join
      .transform(graft.ops.AnnCache.pinQuery)
    val yt = rev.groupBy(col("yr")).agg(sum(col("rev_x100")).as("total"))
    rev.join(broadcast(yt), "yr")
      .select(col("n_name"), col("yr"), col("rev_x100"),
        expr("CAST((10000 * CAST(rev_x100 AS DECIMAL(38,0))) div " +
          "greatest(total, 1) AS BIGINT)").as("share_bp"))
      .withColumn("share_delta_bp",
        col("share_bp") - lag(col("share_bp"), 1).over(
          Window.partitionBy(col("n_name")).orderBy(col("yr"))))
      .orderBy("n_name", "yr")
  }

  /** Repeat-purchase cadence — exact p50/p90/max days between a
    * customer's consecutive orders, per market segment: the
    * replenishment-cycle readout behind reorder nudges and churn
    * windows. Rank-picked percentiles (the value AT a rank is
    * deterministic under ties), counted over repeat customers only.
    *
    * Scale shape: one customer-keyed window for the order lag, one
    * segment-keyed exchange for ranks+counts+picks (the
    * fulfillment-lag fold); customer is a broadcast dimension.
    */
  private def qOrdersRepeatGap(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("order_d"), col("o_orderkey"))
    val gaps = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("order_d"))
      .withColumn("prev_d", lag(col("order_d"), 1).over(w))
      .where(col("prev_d").isNotNull)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        datediff(col("order_d"), col("prev_d")).cast("long").as("gap_days"))
    val r = gaps
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("c_mktsegment")).orderBy(col("gap_days").asc)))
      .withColumn("n_gaps",
        count(lit(1)).over(Window.partitionBy(col("c_mktsegment"))))
    r.groupBy(col("c_mktsegment"))
      .agg(max(col("n_gaps")).as("n_gaps"),
        max(when(col("rn") === expr("(n_gaps + 1) div 2"), col("gap_days")))
          .as("p50_gap_days"),
        max(when(col("rn") === expr("(9 * n_gaps + 9) div 10"), col("gap_days")))
          .as("p90_gap_days"),
        max(col("gap_days")).as("max_gap_days"))
      .orderBy("c_mktsegment")
  }

  /** Fulfillment-lag TREND per order priority — the SLA trajectory
    * readout ("is URGENT getting faster quarter over quarter?"): the
    * exact least-squares slope of the monthly mean ship lag (×100)
    * against the month index, in the cross-multiplied integer form
    * slope·10⁴ = (100·(k·Σxy − Σx·Σy)) div (k·Σx² − (Σx)²). Every
    * operand is bounded by the CALENDAR (month indexes, month count)
    * and the lag domain — not by data size — so plain BIGINTs hold at
    * any SF, and both engines truncate identically.
    *
    * Scale shape: the fact-fact keyed join feeds ONE (priority, month)
    * aggregate; the regression folds run on that calendar-sized frame.
    */
  private def qOrdersPriorityLagTrend(s: SparkSession, dir: String): DataFrame = {
    val lags = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_d"))
      .join(Tables.orders(s, dir)
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("order_d"),
            col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        (year(col("order_d")) * 12 + month(col("order_d"))).cast("long").as("x"),
        datediff(col("ship_d"), col("order_d")).cast("long").as("lag_days"))
    val monthly = lags.groupBy(col("o_orderpriority"), col("x"))
      .agg(count(lit(1)).as("n"), sum(col("lag_days")).as("s"))
      .select(col("o_orderpriority"), col("x"),
        expr("(100 * s) div n").as("y"))
    monthly.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("k_months"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("o_orderpriority"), col("k_months"),
        expr("(100 * (k_months * sxy - sx * sy)) div " +
          "greatest(k_months * sxx - sx * sx, 1)").as("slope_x10000"))
      .withColumn("improving", col("slope_x10000") < 0L)
      .orderBy("o_orderpriority")
  }

  /** Year-over-year customer value-tier migration — the retention
    * matrix a revenue team reads ("do 4×-mean customers stay 4×?"):
    * customers tier by their spend's truncated multiple of the YEAR
    * MEAN (cross-multiplied — sub-mean / 1-2× / 2-4× / 4×+, no ranks,
    * no percentile windows), and consecutive-year pairs count into the
    * (from_tier, to_tier) transition matrix.
    *
    * Scale shape: one (customer, year) aggregate, year means join back
    * broadcast (calendar-sized), the year+1 self-join keys on
    * (customer, year) — nothing data-sized in any window, DECIMAL(38)
    * on the spend·n_cust cross product (it clears 2⁶³ near 10¹⁹).
    */
  private def qOrdersCustomerMigration(s: SparkSession, dir: String): DataFrame = {
    val cy = Tables.orders(s, dir)
      .select(col("o_custkey"),
        year(to_date(col("o_orderdate"))).cast("long").as("yr"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("spend"))
      .groupBy(col("o_custkey"), col("yr"))
      .agg(sum(col("spend")).as("spend"))
      // pinned: year means and the tier projection both read this
      // (customer, year) frame — unpinned, each branch re-scans orders
      .transform(graft.ops.AnnCache.pinQuery)
    val ym = cy.groupBy(col("yr"))
      .agg(count(lit(1)).as("n_cust"), sum(col("spend")).as("total"))
    val tiered = cy.join(broadcast(ym), "yr")
      .select(col("o_custkey"), col("yr"),
        expr("CAST((CAST(spend AS DECIMAL(38,0)) * n_cust) div " +
          "greatest(total, 1) AS BIGINT)").as("m"))
      .select(col("o_custkey"), col("yr"),
        when(col("m") === 0L, "sub-mean")
          .when(col("m") < 2L, "1-2x")
          .when(col("m") < 4L, "2-4x")
          .otherwise("4x+").as("tier"))
      .transform(graft.ops.AnnCache.pinQuery) // both sides of the year+1 self-join
    tiered.as("a").join(tiered.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
          col("b.yr") === col("a.yr") + 1L)
      .groupBy(col("a.tier").as("from_tier"), col("b.tier").as("to_tier"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("from_tier", "to_tier")
  }

  /** Calendar-month seasonality index of order revenue — the demand-
    * planning readout: each month-of-year's revenue share against the
    * uniform 1/12 baseline, ×100 (100 = flat, 120 = a 20%-over-index
    * month). Revenue in cents through the exact decimal path; index =
    * (12·100·rev_m) div rev_total with the shared truncation.
    *
    * Scale shape: ONE month-of-year aggregate over the scan (12 output
    * rows); the total joins back broadcast. Nothing else touches data.
    */
  private def qOrdersSeasonalityIndex(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(s, dir)
      .select(month(to_date(col("o_orderdate"))).cast("long").as("month_of_year"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("rev_x100"))
      .groupBy(col("month_of_year"))
      .agg(count(lit(1)).as("n_orders"), sum(col("rev_x100")).as("rev_x100"))
      // pinned: the total fold and the output both read this 12-row
      // frame — unpinned, each branch re-scans orders
      .transform(graft.ops.AnnCache.pinQuery)
    m.crossJoin(broadcast(m.agg(sum(col("rev_x100")).as("total"))))
      .select(col("month_of_year"), col("n_orders"), col("rev_x100"),
        // decimal(38): 1200·rev clears 2⁶³ near 10¹⁶ cents of revenue
        expr("CAST((1200 * CAST(rev_x100 AS DECIMAL(38,0))) div " +
          "greatest(total, 1) AS BIGINT)").as("seasonal_index_x100"))
      .orderBy("month_of_year")
  }

  /** Monthly open-order backlog — the operations timeline behind
    * "are we shipping faster than we book?": an order opens at its
    * order month and closes at the month of its LAST shipped line, so
    * backlog at end of month m = opens ≤ m − closes ≤ m. Orders with
    * no shipped lines stay open (left join keeps them), which is the
    * honest operational read. The cdc_active_sweep delta idiom on the
    * orders grain: ±1 deltas per month, one running sum.
    *
    * Scale shape: one order-keyed aggregate over lineitem (max ship
    * date), one keyed join to orders — both fact-sized, correctly a
    * shuffle join at 100 TB — then everything runs on the MONTH
    * frame, bounded by the calendar span; the running sum is
    * [[graft.ops.Linkage.globalRunningSum]]'s two-pass exchange.
    */
  private def qOrdersBacklogTimeline(s: SparkSession, dir: String): DataFrame = {
    val lo = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_d"))
      .groupBy(col("l_orderkey")).agg(max(col("ship_d")).as("close_d"))
    val om = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        trunc(to_date(col("o_orderdate")), "month").as("open_m"))
      .join(lo, col("o_orderkey") === col("l_orderkey"), "left")
    val deltas = om.select(col("open_m").as("month"),
        lit(1L).as("o"), lit(0L).as("c"))
      .unionByName(om.where(col("close_d").isNotNull)
        .select(trunc(col("close_d"), "month").as("month"),
          lit(0L).as("o"), lit(1L).as("c")))
    val monthly = deltas.groupBy(col("month"))
      .agg(sum(col("o")).as("n_opened"), sum(col("c")).as("n_closed"))
      .withColumn("net", col("n_opened") - col("n_closed"))
    graft.ops.Linkage.globalRunningSum(monthly, col("net"), col("month"))
      .select(col("month"), col("n_opened"), col("n_closed"),
        col("cum").as("backlog_eom"))
      .orderBy("month")
  }

  /** One-way ANOVA of line revenue across return-flag classes — the
    * "is this grouping real money or noise" screen, computed in the
    * exact sum-of-squares identity on cents: per group n_g, Σx, Σx²;
    * between-SS = Σ_g (s_g² div n_g) − S² div N, within-SS = Σx² −
    * Σ_g (s_g² div n_g), F×10⁴ = (10⁴·SSB·(N−k)) div (SSW·(k−1)).
    * Every operand rides DECIMAL(38)/HUGEINT (s_g² reaches ~10³² at
    * 10¹⁶ cents of group revenue) and every truncation is the shared
    * `div`, so the statistic is engine-exact where a float ANOVA is
    * not. `significant` compares against the df₁=2, df₂→∞ critical
    * value 2.9957 (×10⁴) — k is 3 by the data dictionary.
    * SS outputs are normalized per row (div N) so the emitted BIGINTs
    * stay inside int64 at any SF.
    *
    * Scale shape: one flag-keyed aggregate over the scan (3 rows);
    * the fold and the F arithmetic run on that 3-row frame.
    */
  private def qLineitemAnovaReturnflag(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("x"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("x").cast("decimal(38,0)")).as("s_g"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("q_g"))
      .withColumn("bg", expr("CAST((s_g * s_g) div n_g AS DECIMAL(38,0))"))
    g.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("s_g")).as("s"), sum(col("q_g")).as("q"),
        sum(col("bg")).as("b"))
      .select(col("k"), col("n"),
        expr("CAST(b - (s * s) div n AS DECIMAL(38,0))").as("ssb"),
        expr("CAST(q - b AS DECIMAL(38,0))").as("ssw"))
      .select(col("k"), col("n"),
        expr("CAST(ssb div n AS BIGINT)").as("ssb_per_row"),
        expr("CAST(ssw div n AS BIGINT)").as("ssw_per_row"),
        expr("CAST((10000 * ssb * (n - k)) div " +
          "greatest(ssw * (k - 1), 1) AS BIGINT)").as("f_x10000"))
      .withColumn("significant", col("f_x10000") >= 29957L)
  }

  /** Supplier market concentration per part type — the
    * Herfindahl–Hirschman index every sourcing/risk team reads. The
    * DOJ merger threshold of 2500 is on percent-scale shares; this
    * query works in basis points, so the equivalent flag level is
    * 2500 × 100² = 25,000,000 bp². Revenue = extendedprice cents
    * summed per (type, supplier); share in bp against the type total
    * (truncated identically on both engines); HHI = Σ share_bp² —
    * bounded by 10⁸ regardless of data size, so no overflow at any
    * SF. Emits the supplier count and the top supplier's share beside
    * the index so the readout is self-explaining.
    *
    * Scale shape: part is a broadcast dimension; one (type, supplier)
    * aggregate over the fact table, then everything runs on the
    * dimension-sized (type, supplier) frame — type totals join back
    * broadcast, the final fold is per type. No window over data.
    */
  private def qSupplierHhi(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("rev_x100"))
    val pt = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
    val per = li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_type"), col("l_suppkey"))
      .agg(sum(col("rev_x100")).as("rev"))
    val tot = per.groupBy(col("p_type")).agg(sum(col("rev")).as("total"))
    per.join(broadcast(tot), "p_type")
      .select(col("p_type"),
        expr("(10000 * rev) div greatest(total, 1)").as("share_bp"))
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("share_bp") * col("share_bp")).as("hhi"),
        max(col("share_bp")).as("top_share_bp"))
      // the DOJ 2500 threshold is on PERCENT-scale shares; on the bp²
      // scale used here that is 2500 × 100² = 25,000,000 (a flat field
      // of n equal suppliers scores 10⁸/n, so the percent-scale 2500
      // would flag everything)
      .withColumn("concentrated", col("hhi") >= 25000000L)
      .orderBy("p_type")
  }

  /** Discount lift per brand — the merchandising elasticity readout:
    * does a discounted line actually move more units? Per p_brand the
    * discounted/undiscounted line counts and quantity sums (quantity
    * ×100 through the exact decimal path), plus the cross-multiplied
    * mean-quantity lift in bp — (sum_disc·n_full) vs (sum_full·n_disc),
    * so no per-row division and no floats anywhere.
    *
    * Scale shape: part is a DIMENSION — the join broadcasts it into
    * the lineitem scan; one brand-keyed aggregate (25 rows), no
    * window. At 100 TB the fact side never shuffles.
    */
  private def qLineitemDiscountLift(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_discount"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
          .as("qty_x100"))
    val pt = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        sum(when(col("l_discount") > 0, 1L).otherwise(0L)).as("n_disc"),
        sum(when(col("l_discount") > 0, col("qty_x100")).otherwise(0L))
          .as("qty_disc_x100"),
        sum(when(col("l_discount") > 0, 0L).otherwise(1L)).as("n_full"),
        sum(when(col("l_discount") > 0, 0L).otherwise(col("qty_x100")))
          .as("qty_full_x100"))
      .withColumn("mean_disc_x100",
        expr("qty_disc_x100 div greatest(n_disc, 1)"))
      .withColumn("mean_full_x100",
        expr("qty_full_x100 div greatest(n_full, 1)"))
      // lift on the TRUNCATED means, not cross-multiplied sums: the
      // sum×count product would clear 2^63 around sf10, while means
      // are bounded by the quantity domain at any scale; the sub-unit
      // truncation is identical on both engines
      .withColumn("lift_sign",
        expr("CAST(sign(mean_disc_x100 - mean_full_x100) AS BIGINT)"))
      .withColumn("lift_abs_bp",
        expr("(10000 * abs(mean_disc_x100 - mean_full_x100)) " +
          "div greatest(mean_full_x100, 1)"))
      .orderBy("p_brand")
  }

  /** Video-style stride frame sampling over the binary media column
    * ([[Multimodal.frameSample]]): payload → 16-byte frames → keep
    * every 4th → envelope + exact first-byte checksum of the sampled
    * frames. The thinning step every vision pipeline runs before
    * per-frame decode; the checksum makes WHICH frames were kept an
    * oracle-checkable fact (the fixture is ASCII, so the oracle
    * recomputes the same bytes via ascii()/substr — the same
    * byte==char mirror the phash oracle uses).
    */
  private def qMultimodalFrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(
        Tables.documents(s, dir)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
        col("payload"), col("doc_id"), frameBytes = 16, stride = 4)
      .orderBy("media_id")

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

  protected def miscExtQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_active_sweep" -> (qCdcActiveSweep _),
    "cdc_apply_dispatch" -> (qCdcApplyDispatch _),
    "cdc_avro_roundtrip" -> (qCdcAvroRoundtrip _),
    "customer_gini" -> (qCustomerGini _),
    "customers_record_linkage" -> (qCustomersRecordLinkage _),
    "customers_snm_linkage" -> (qCustomersSnmLinkage _),
    "lineitem_profile_approx" -> (qLineitemProfileApprox _),
    "lineitem_weighted_price" -> (qLineitemWeightedPrice _),
    "multimodal_audio_cert" -> (qMultimodalAudioCert _),
    "lineitem_discount_lift" -> (qLineitemDiscountLift _),
    "supplier_hhi" -> (qSupplierHhi _),
    "orders_backlog_timeline" -> (qOrdersBacklogTimeline _),
    "orders_seasonality_index" -> (qOrdersSeasonalityIndex _),
    "orders_priority_lag_trend" -> (qOrdersPriorityLagTrend _),
    "orders_customer_migration" -> (qOrdersCustomerMigration _),
    "customer_nation_shift" -> (qCustomerNationShift _),
    "orders_repeat_gap" -> (qOrdersRepeatGap _),
    "part_price_dispersion" -> (qPartPriceDispersion _),
    "lineitem_anova_returnflag" -> (qLineitemAnovaReturnflag _),
    "orders_fulfillment_lag" -> (qOrdersFulfillmentLag _),
    "multimodal_features" -> (qMultimodalFeatures _),
    "multimodal_frame_sample" -> (qMultimodalFrameSample _),
    "multimodal_imageio_cert" -> (qMultimodalImageioCert _),
    "multimodal_phash_dup" -> (qMultimodalPhashDup _),
    "orders_benford" -> (qOrdersBenford _),
    "orders_delta_join" -> (qOrdersDeltaJoin _),
    "orders_delta_retract" -> (qOrdersDeltaRetract _),
    "orders_delta_rollup" -> (qOrdersDeltaRollup _),
    "part_skyline" -> (qPartSkyline _),
    "parts_abc_analysis" -> (qPartsAbcAnalysis _),
    "snapshot_plus_stream" -> (qSnapshotPlusStream _),
  )

  protected def miscExtOracles: Map[String, String] = Map(
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

    // encode∘decode ≡ id: the oracle is the plain log projection; the
    // Spark side pushes every row through the binary Avro wire first
    "cdc_avro_roundtrip" -> (L +
      """SELECT emp_id, event_id, action, emp_salary, emp_city,
        |       CAST(last_updated_at AS TIMESTAMP) AS last_updated_at
        |FROM cdc_log ORDER BY emp_id, event_id""".stripMargin),

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

    // codec certificates: fields re-derive from the same n_chars
    // arithmetic; ok is pinned at 1 (see the query scaladocs — a broken
    // encode/decode/feature path flips it and fails the hash gate)
    "multimodal_audio_cert" ->
      """SELECT doc_id, CAST(8000 AS BIGINT) AS sample_rate,
        |       64 + n_chars % 256 AS n_frames,
        |       CAST(1 AS BIGINT) AS ok
        |FROM documents WHERE doc_id % 10 = 0
        |ORDER BY doc_id""".stripMargin,

    "multimodal_features" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |       CAST(16 + n_chars % 64 AS BIGINT) AS width,
        |       CAST(16 + (n_chars * 7) % 64 AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin,

    "orders_fulfillment_lag" ->
      """WITH l AS (SELECT li.l_orderkey,
        |    date_diff('day', CAST(o.o_orderdate AS DATE),
        |              CAST(li.l_shipdate AS DATE)) AS lag_days,
        |    o.o_orderpriority
        |  FROM lineitem li JOIN orders o ON li.l_orderkey = o.o_orderkey),
        |r AS (SELECT o_orderpriority, CAST(lag_days AS BIGINT) AS lag_days,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY lag_days) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_lines
        |  FROM l)
        |SELECT o_orderpriority, CAST(MAX(n_lines) AS BIGINT) AS n_lines,
        |       MAX(CASE WHEN rn = (n_lines + 1) // 2 THEN lag_days END)
        |         AS p50_lag_days,
        |       MAX(CASE WHEN rn = (9 * n_lines + 9) // 10 THEN lag_days END)
        |         AS p90_lag_days,
        |       MAX(lag_days) AS max_lag_days
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "part_price_dispersion" ->
      """WITH x AS (SELECT p_type,
        |    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM part),
        |g AS (SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s1,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2
        |  FROM x GROUP BY 1),
        |v AS (SELECT p_type, n, CAST(s1 // n AS BIGINT) AS mean_x100,
        |    CAST(greatest(s2 // n - (s1 // n) * (s1 // n), 0) AS BIGINT)
        |      AS var_c2
        |  FROM g),
        |r AS (SELECT *, CAST(floor(sqrt(CAST(var_c2 AS DOUBLE))) AS BIGINT)
        |        AS r0 FROM v),
        |sd AS (SELECT p_type, n, mean_x100,
        |    CASE WHEN (r0 + 1) * (r0 + 1) <= var_c2 THEN r0 + 1
        |         WHEN r0 * r0 > var_c2 THEN r0 - 1 ELSE r0 END AS sd_x100
        |  FROM r)
        |SELECT p_type, n, mean_x100, sd_x100,
        |       (10000 * sd_x100) // greatest(mean_x100, 1) AS cv_bp
        |FROM sd ORDER BY p_type""".stripMargin,

    "customer_nation_shift" ->
      """WITH rev AS (SELECT n.n_name,
        |    CAST(year(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS yr,
        |    CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS rev_x100
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |yt AS (SELECT yr, CAST(SUM(rev_x100) AS BIGINT) AS total
        |  FROM rev GROUP BY 1),
        |sh AS (SELECT rev.n_name, rev.yr, rev.rev_x100,
        |    CAST((10000 * CAST(rev_x100 AS HUGEINT))
        |      // greatest(total, 1) AS BIGINT) AS share_bp
        |  FROM rev JOIN yt ON rev.yr = yt.yr)
        |SELECT n_name, yr, rev_x100, share_bp,
        |       share_bp - lag(share_bp) OVER (PARTITION BY n_name ORDER BY yr)
        |         AS share_delta_bp
        |FROM sh ORDER BY n_name, yr""".stripMargin,

    "orders_repeat_gap" ->
      """WITH g0 AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_d,
        |    lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS prev_d
        |  FROM orders),
        |gaps AS (SELECT c.c_mktsegment,
        |    CAST(date_diff('day', prev_d, order_d) AS BIGINT) AS gap_days
        |  FROM g0 JOIN customer c ON g0.o_custkey = c.c_custkey
        |  WHERE prev_d IS NOT NULL),
        |r AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY gap_days) AS BIGINT) AS rn,
        |    CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n_gaps
        |  FROM gaps)
        |SELECT c_mktsegment, CAST(MAX(n_gaps) AS BIGINT) AS n_gaps,
        |       MAX(CASE WHEN rn = (n_gaps + 1) // 2 THEN gap_days END)
        |         AS p50_gap_days,
        |       MAX(CASE WHEN rn = (9 * n_gaps + 9) // 10 THEN gap_days END)
        |         AS p90_gap_days,
        |       MAX(gap_days) AS max_gap_days
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "orders_priority_lag_trend" ->
      """WITH lags AS (SELECT o.o_orderpriority,
        |    CAST(year(CAST(o.o_orderdate AS DATE)) * 12
        |      + month(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS x,
        |    CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
        |      CAST(l.l_shipdate AS DATE)) AS BIGINT) AS lag_days
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |m AS (SELECT o_orderpriority, x,
        |    (100 * CAST(SUM(lag_days) AS BIGINT))
        |      // CAST(COUNT(*) AS BIGINT) AS y
        |  FROM lags GROUP BY 1, 2),
        |f AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS k_months,
        |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM m GROUP BY 1)
        |SELECT o_orderpriority, k_months,
        |       (100 * (k_months * sxy - sx * sy))
        |         // greatest(k_months * sxx - sx * sx, 1) AS slope_x10000,
        |       (100 * (k_months * sxy - sx * sy))
        |         // greatest(k_months * sxx - sx * sx, 1) < 0 AS improving
        |FROM f ORDER BY o_orderpriority""".stripMargin,

    "orders_customer_migration" ->
      """WITH cy AS (SELECT o_custkey,
        |    CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS spend
        |  FROM orders GROUP BY 1, 2),
        |ym AS (SELECT yr, CAST(COUNT(*) AS BIGINT) AS n_cust,
        |    CAST(SUM(spend) AS BIGINT) AS total FROM cy GROUP BY 1),
        |ti AS (SELECT cy.o_custkey, cy.yr,
        |    CASE WHEN (CAST(spend AS HUGEINT) * n_cust)
        |           // greatest(total, 1) = 0 THEN 'sub-mean'
        |         WHEN (CAST(spend AS HUGEINT) * n_cust)
        |           // greatest(total, 1) < 2 THEN '1-2x'
        |         WHEN (CAST(spend AS HUGEINT) * n_cust)
        |           // greatest(total, 1) < 4 THEN '2-4x'
        |         ELSE '4x+' END AS tier
        |  FROM cy JOIN ym ON cy.yr = ym.yr)
        |SELECT a.tier AS from_tier, b.tier AS to_tier,
        |       CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM ti a JOIN ti b ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "orders_seasonality_index" ->
      """WITH m AS (SELECT CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT)
        |      AS month_of_year,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS rev_x100
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(rev_x100) AS BIGINT) AS total FROM m)
        |SELECT month_of_year, n_orders, rev_x100,
        |       CAST((1200 * CAST(rev_x100 AS HUGEINT))
        |         // greatest(total, 1) AS BIGINT) AS seasonal_index_x100
        |FROM m, t ORDER BY month_of_year""".stripMargin,

    "orders_backlog_timeline" ->
      """WITH lo AS (SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS close_d
        |  FROM lineitem GROUP BY 1),
        |om AS (SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS open_m,
        |    lo.close_d
        |  FROM orders o LEFT JOIN lo ON o.o_orderkey = lo.l_orderkey),
        |d AS (SELECT open_m AS month, 1 AS o, 0 AS c FROM om
        |  UNION ALL
        |  SELECT date_trunc('month', close_d), 0, 1 FROM om
        |  WHERE close_d IS NOT NULL),
        |m AS (SELECT month, CAST(SUM(o) AS BIGINT) AS n_opened,
        |    CAST(SUM(c) AS BIGINT) AS n_closed FROM d GROUP BY 1)
        |SELECT CAST(month AS DATE) AS month, n_opened, n_closed,
        |       CAST(SUM(n_opened - n_closed) OVER (ORDER BY month) AS BIGINT)
        |         AS backlog_eom
        |FROM m ORDER BY month""".stripMargin,

    "lineitem_anova_returnflag" ->
      """WITH x AS (SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM lineitem),
        |g AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s_g,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q_g
        |  FROM x GROUP BY 1),
        |gb AS (SELECT *, (s_g * s_g) // n_g AS bg FROM g),
        |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(s_g) AS HUGEINT) AS s, CAST(SUM(q_g) AS HUGEINT) AS q,
        |    CAST(SUM(bg) AS HUGEINT) AS b FROM gb),
        |ss AS (SELECT k, n, b - (s * s) // n AS ssb, q - b AS ssw FROM t)
        |SELECT k, n, CAST(ssb // n AS BIGINT) AS ssb_per_row,
        |       CAST(ssw // n AS BIGINT) AS ssw_per_row,
        |       CAST((10000 * ssb * (n - k))
        |         // greatest(ssw * (k - 1), 1) AS BIGINT) AS f_x10000,
        |       CAST((10000 * ssb * (n - k))
        |         // greatest(ssw * (k - 1), 1) AS BIGINT) >= 29957 AS significant
        |FROM ss""".stripMargin,

    "supplier_hhi" ->
      """WITH li AS (SELECT l_partkey, l_suppkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS rev_x100
        |  FROM lineitem),
        |per AS (SELECT p.p_type, li.l_suppkey,
        |    CAST(SUM(rev_x100) AS BIGINT) AS rev
        |  FROM li JOIN part p ON li.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |t AS (SELECT p_type, CAST(SUM(rev) AS BIGINT) AS total
        |  FROM per GROUP BY 1),
        |sh AS (SELECT per.p_type,
        |    (10000 * rev) // greatest(total, 1) AS share_bp
        |  FROM per JOIN t ON per.p_type = t.p_type)
        |SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |       CAST(SUM(share_bp * share_bp) AS BIGINT) AS hhi,
        |       CAST(MAX(share_bp) AS BIGINT) AS top_share_bp,
        |       CAST(SUM(share_bp * share_bp) AS BIGINT) >= 25000000
        |         AS concentrated
        |FROM sh GROUP BY p_type ORDER BY p_type""".stripMargin,

    "lineitem_discount_lift" ->
      """WITH li AS (SELECT l_partkey, l_discount,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qty_x100
        |  FROM lineitem),
        |j AS (SELECT p.p_brand, li.l_discount, li.qty_x100
        |      FROM li JOIN part p ON li.l_partkey = p.p_partkey),
        |g AS (SELECT p_brand,
        |    CAST(SUM(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_disc,
        |    CAST(SUM(CASE WHEN l_discount > 0 THEN qty_x100 ELSE 0 END)
        |      AS BIGINT) AS qty_disc_x100,
        |    CAST(SUM(CASE WHEN l_discount > 0 THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_full,
        |    CAST(SUM(CASE WHEN l_discount > 0 THEN 0 ELSE qty_x100 END)
        |      AS BIGINT) AS qty_full_x100
        |  FROM j GROUP BY 1),
        |m AS (SELECT *, qty_disc_x100 // greatest(n_disc, 1) AS mean_disc_x100,
        |        qty_full_x100 // greatest(n_full, 1) AS mean_full_x100
        |      FROM g)
        |SELECT p_brand, n_disc, qty_disc_x100, n_full, qty_full_x100,
        |       mean_disc_x100, mean_full_x100,
        |       CAST(sign(mean_disc_x100 - mean_full_x100) AS BIGINT)
        |         AS lift_sign,
        |       (10000 * abs(mean_disc_x100 - mean_full_x100))
        |         // greatest(mean_full_x100, 1) AS lift_abs_bp
        |FROM m ORDER BY p_brand""".stripMargin,

    // LEFT JOIN LATERAL so a zero-frame payload keeps its row (the
    // Spark side always emits one row per media)
    "multimodal_frame_sample" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len, text
        |  FROM documents),
        |f AS (SELECT media_id, byte_len,
        |    (byte_len + 15) // 16 AS n_frames, text FROM m)
        |SELECT media_id, byte_len, n_frames,
        |  CAST(COALESCE(SUM(CASE WHEN k.k % 4 = 0 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_sampled,
        |  CAST(COALESCE(SUM(CASE WHEN k.k % 4 = 0
        |      THEN ascii(substr(text, CAST(k.k * 16 + 1 AS INT), 1))
        |      ELSE 0 END), 0) AS BIGINT) AS checksum
        |FROM f LEFT JOIN LATERAL (SELECT unnest(generate_series(0,
        |    CAST(n_frames - 1 AS BIGINT))) AS k) k ON TRUE
        |GROUP BY 1, 2, 3 ORDER BY media_id""".stripMargin,

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

  )
}
