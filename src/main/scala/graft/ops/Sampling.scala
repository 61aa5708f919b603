package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splits for training pipelines.
  *
  * Everything is keyed on a hash of the row's id — NOT an RNG: the
  * sample is reproducible across runs, engines, partitionings, and
  * retries (Bernoulli `sample()` is none of those), rows keep their
  * assignment when the corpus grows, and the exact same split is
  * computable in plain SQL (the DuckDB oracle uses the same constants,
  * generated from this object).
  *
  * Bucket = ((id·a + b) mod p) mod 10000 — basis points, so rates are
  * exact integers. One scan, zero shuffles; the predicate is a pure
  * codegen'd expression that pushes into the scan stage.
  */
object Sampling {

  val P = 1000000007L
  // a < 2^63 / p so (id mod p)·a + b never overflows int64 — DuckDB
  // errors on BIGINT overflow and Spark silently wraps; both are fatal
  // to cross-engine determinism
  val A = 2862933555L % P
  val B = 1442695040888963L % P
  val Buckets = 10000L

  /** Raw affine hash in [0, P) — injective for ids below P, so
    * distinct small ids never collide (what KMV sketches rely on). */
  def hashVal(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(P)) * lit(A) + lit(B), lit(P))

  /** SQL mirror of [[hashVal]]. */
  def hashValSql(idExpr: String): String =
    s"((CAST($idExpr AS BIGINT) % $P + $P) % $P * $A + $B) % $P"

  /** Stable per-id bucket in [0, 10000) basis points. */
  def bucket(id: Column): Column = hashVal(id) % lit(Buckets)

  /** SQL mirror of [[bucket]] (the +p/%p dance normalizes DuckDB's
    * signed % to Spark's non-negative pmod). */
  def bucketSql(idExpr: String): String =
    s"(((CAST($idExpr AS BIGINT) % $P + $P) % $P * $A + $B) % $P) % $Buckets"

  /** Keep ~rateBp/10000 of rows, deterministically by id. */
  def hashSample(id: Column, rateBp: Int): Column = bucket(id) < rateBp

  /** Train/val/test assignment by basis-point thresholds
    * (e.g. 9000/500 → 90% train, 5% val, 5% test). */
  def assignSplit(id: Column, trainBp: Int = 9000, valBp: Int = 500): Column = {
    val b = bucket(id)
    when(b < trainBp, "train")
      .when(b < trainBp + valBp, "val")
      .otherwise("test")
  }

  /** SQL mirror of [[assignSplit]]. */
  def assignSplitSql(idExpr: String, trainBp: Int = 9000, valBp: Int = 500): String =
    s"CASE WHEN ${bucketSql(idExpr)} < $trainBp THEN 'train' " +
      s"WHEN ${bucketSql(idExpr)} < ${trainBp + valBp} THEN 'val' ELSE 'test' END"

  /** Per-stratum rates (basis points): keep a row iff its bucket is
    * below its stratum's rate; strata absent from `rates` are dropped. */
  def stratifiedSample(id: Column, stratum: Column, rates: Map[String, Int]): Column =
    rates.foldLeft(lit(false)) { case (acc, (st, bp)) =>
      acc || (stratum === st && bucket(id) < bp)
    }

  /** SQL mirror of [[stratifiedSample]] (strata sorted so the generated
    * text is deterministic; OR is commutative so order can't matter). */
  def stratifiedSampleSql(idExpr: String, stratumExpr: String,
                          rates: Map[String, Int]): String =
    rates.toSeq.sorted.map { case (st, bp) =>
      s"($stratumExpr = '$st' AND ${bucketSql(idExpr)} < $bp)"
    }.mkString("(", " OR ", ")")

  /** Cap each group at `cap` rows, chosen deterministically by the
    * id-hash (an over-represented domain/source keeps a stable uniform
    * subsample, not its first-by-ingest rows). The (bucket, id) order
    * is unique, so the kept set is partition-independent and
    * SQL-mirrorable. Scale shape: one keyed shuffle; the row_number ≤
    * cap filter is recognized by Catalyst's WindowGroupLimit, so each map
    * task pre-reduces to its local top-cap per group BEFORE the
    * exchange — shuffle volume ∝ groups × cap, not rows (PlanSpec pins
    * this). The row_number itself is returned as `rk`. */
  def capPerGroup(df: org.apache.spark.sql.DataFrame, group: Column, id: Column,
                  cap: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(bucket(id).asc, id.asc)
    df.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= cap)
  }

  /** SQL mirror of [[capPerGroup]]'s window order. */
  def capOrderSql(idExpr: String): String =
    s"${bucketSql(idExpr)}, $idExpr"

  /** SQL text of the weighted priority `(hash(id) · 2^20) div
    * max(weight, 1)` — smaller = kept first. The integer-exact
    * analogue of the Efraimidis–Spirakis exponential race (keys
    * `-ln(u)/w`, keep the n smallest): the uniform integer key
    * `hash(id)` is divided by the row's weight, so heavier rows get
    * systematically smaller priorities and a top-n by priority is a
    * weighted sample without replacement. Integer division instead of
    * float `ln`/`pow` because the two engines' libm roundings differ —
    * the keep SET is what the oracle hashes, and it must be
    * bit-identical (both `div` and DuckDB `//` truncate toward zero;
    * everything here is non-negative anyway). hash < 2^30 and the 2^20
    * scale keep the product under 2^50: no overflow either side. */
  def weightedPrioritySql(idExpr: String, weightExpr: String): String =
    s"(${hashValSql(idExpr)} * 1048576) // greatest($weightExpr, 1)"

  /** Weighted [[capPerGroup]]: each group keeps its `cap` smallest
    * [[weightedPrioritySql]]-priority rows — the per-source weighted-
    * sample-without-replacement primitive (e.g. keep 10 docs per
    * source, biased toward longer documents). The priority is computed
    * through internal temp columns so `expr`'s integer `div` sees
    * fixed names — arbitrary caller Columns (aliases, qualified refs,
    * computed expressions) never get stringified into SQL text. Same
    * scale shape as capPerGroup: one keyed shuffle, WindowGroupLimit
    * pre-reduces map-side. */
  def weightedCapPerGroup(df: org.apache.spark.sql.DataFrame, group: Column,
                          id: Column, weight: Column,
                          cap: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(group).orderBy(col("__graft_wp").asc, id.asc)
    df.withColumn("__graft_h", hashVal(id))
      .withColumn("__graft_w", greatest(weight.cast("long"), lit(1L)))
      .withColumn("__graft_wp", expr("(__graft_h * 1048576) div __graft_w"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= cap)
      .drop("__graft_h", "__graft_w", "__graft_wp")
  }
}
