package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental maintenance of an inner equi-join view (the classic
  * delta rule for insert-only streams, e.g. Blakeley et al., SIGMOD
  * 1986): with base tables A₀, B₀ and insert batches dA, dB,
  *
  *   (A₀∪dA) ⋈ (B₀∪dB) = (A₀⋈B₀) ∪ (dA⋈B₀) ∪ (A₀⋈dB) ∪ (dA⋈dB)
  *
  * so a materialized join view is refreshed by UNIONing three delta
  * joins onto the stored result — the base-to-base join is never
  * recomputed. This is the join-view analog of [[Rollup]]'s mergeable
  * aggregate partials; compose the two for an incrementally-maintained
  * aggregated join.
  *
  * Scale: the deltas are micro-batch sized, so every term that touches
  * a base table broadcasts its delta side — maintenance cost is a scan
  * of each base table probed by an in-memory hash of the delta
  * (∝ |A|+|B| in I/O, ∝ |dA|+|dB| in join work, zero shuffle of the
  * base tables). With a key-bucketed base store
  * ([[graft.sinks]]' bucketed layout) the probed scan narrows to the
  * buckets the delta keys land in and the I/O term drops to
  * ∝ touched buckets. Insert-only by contract: deletes/updates need
  * the signed-count multiset form instead.
  */
object DeltaJoin {

  /** The rows ADDED to A⋈B by insert batches `da` / `db` — union onto
    * the stored view to refresh it. `keys` are the equi-join columns
    * (same names both sides, as for `Dataset.join`). */
  def increment(a0: DataFrame, da: DataFrame,
                b0: DataFrame, db: DataFrame,
                keys: Seq[String]): DataFrame =
    broadcast(da).join(b0, keys)
      .unionByName(a0.join(broadcast(db), keys))
      .unionByName(da.join(broadcast(db), keys))

  /** Full refreshed view: the stored base join plus [[increment]].
    * Callers with a materialized `a0 ⋈ b0` pass it as `prior` to skip
    * recomputing it. */
  def refreshed(a0: DataFrame, da: DataFrame,
                b0: DataFrame, db: DataFrame,
                keys: Seq[String],
                prior: Option[DataFrame] = None): DataFrame =
    prior.getOrElse(a0.join(b0, keys))
      .unionByName(increment(a0, da, b0, db, keys))

  /** The signed-multiset (z-set) form that handles UPDATES and DELETES,
    * not just inserts: each delta row carries `signCol` (+1 insert,
    * −1 retract; an update is a retract of the old row plus an insert
    * of the new). The join of two signed deltas multiplies signs, so
    * the same three-term rule emits a signed CHANGE stream for the
    * view; folding it onto the stored view and dropping rows whose
    * net count reaches zero ([[consolidate]]) yields exactly the join
    * of the corrected tables. Same cost shape as [[increment]] —
    * broadcast deltas probing base tables.
    *
    * Base rows are implicit +1; the emitted rows carry `signCol` =
    * the product. */
  def signedIncrement(a0: DataFrame, da: DataFrame,
                      b0: DataFrame, db: DataFrame,
                      keys: Seq[String], signCol: String): DataFrame = {
    val daB0 = broadcast(da).join(b0, keys)
    val a0Db = a0.join(broadcast(db), keys)
      // a0 carries no sign column; db's sign is the product
    val daDb = da.withColumnRenamed(signCol, "__sa")
      .join(broadcast(db.withColumnRenamed(signCol, "__sb")), keys)
      .withColumn(signCol, col("__sa") * col("__sb"))
      .drop("__sa", "__sb")
    daB0.unionByName(a0Db).unionByName(daDb, allowMissingColumns = false)
  }

  /** Fold a signed change stream onto the (implicitly +1) stored view:
    * group by every payload column, sum signs, keep rows with net
    * count > 0, re-expanding multiplicity — the z-set integration
    * step. One shuffle on the full row, map-side combined.
    *
    * A net count that goes NEGATIVE means an over-retraction — a
    * retract for a row the view never held, which is an upstream
    * invariant violation, not a z-set state. By default such rows are
    * dropped (net ≤ 0 rows vanish, the mathematically consistent
    * z-set reading); `strict = true` instead fails the job at the
    * first negative net with the offending row rendered into the
    * error, so pipelines that want the invariant ENFORCED surface the
    * corruption at the consolidate instead of as silent view drift.
    * The check rides the same aggregate — no extra pass. */
  def consolidate(view: DataFrame, changes: DataFrame,
                  signCol: String, strict: Boolean = false): DataFrame = {
    val cols = view.columns.toSeq
    val all = view.withColumn(signCol, lit(1L))
      .unionByName(changes.select((cols.map(col) :+
        col(signCol).cast("long")): _*))
    val netted = all.groupBy(cols.map(col): _*)
      .agg(sum(col(signCol)).as("__net"))
    val checked =
      if (!strict) netted
      else netted.withColumn("__net",
        when(col("__net") < 0, raise_error(concat(
          lit("over-retraction: net count "), col("__net"),
          lit(" for row ("),
          concat_ws(", ", cols.map(c => col(c).cast("string")): _*),
          lit(")")))).otherwise(col("__net")))
    checked
      .where(col("__net") > 0)
      .withColumn("__dup", explode(sequence(lit(1L), col("__net"))))
      .drop("__net", "__dup")
  }

  /** The [[DeltaJoin]] × [[Rollup]] composition the two files' docs
    * promise: an incrementally-maintained AGGREGATED join view. The
    * stored view holds one row per group — (keys..., n, total) — and a
    * signed change stream (from [[signedIncrement]]) folds into it as
    * aggregate DELTAS: Δn = Σ sign, Δtotal = Σ sign·value per group,
    * merged onto the stored row by addition. The join rows are never
    * re-materialized — refresh cost is ∝ |changes|, grouped and
    * map-side combined, plus a shuffle of the (tiny) view.
    *
    * Only abelian-group aggregates survive retraction this way (count
    * and sum have inverses; min/max are monoid-only — a retracted
    * minimum needs the insert-only [[Rollup]] partials path or a
    * re-scan of the group). Groups whose maintained count reaches 0
    * vanish from the view, exactly as the group vanishes from the
    * direct aggregate. A count driven NEGATIVE is an over-retraction
    * ([[consolidate]]'s invariant violation): dropped by default,
    * surfaced per-row under `strict`.
    *
    * `value` must be an exact type (long / decimal) — the house rule;
    * a float total would drift from the recomputed aggregate. */
  def aggregatedConsolidate(view: DataFrame, changes: DataFrame,
                            keys: Seq[String], value: Column,
                            signCol: String,
                            strict: Boolean = false): DataFrame = {
    val delta = changes.groupBy(keys.map(col): _*)
      .agg(sum(col(signCol)).cast("long").as("n"),
        sum(col(signCol) * value).as("total"))
    val merged = view.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("__n"), sum(col("total")).as("__total"))
    val checked =
      if (!strict) merged
      else merged.withColumn("__n",
        when(col("__n") < 0, raise_error(concat(
          lit("over-retraction: maintained count "), col("__n"),
          lit(" for group ("),
          concat_ws(", ", keys.map(k => col(k).cast("string")): _*),
          lit(")")))).otherwise(col("__n")))
    checked.where(col("__n") > 0)
      .select((keys.map(col) :+ col("__n").cast("long").as("n") :+
        col("__total").as("total")): _*)
  }
}
