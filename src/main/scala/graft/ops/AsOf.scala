package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, attach the latest right
  * row of the same key with `rightTs <= leftTs`.
  *
  * Spark-first shape: instead of a range join (whose candidate set is
  * |left|·|right-rows-before| per key) the two sides are UNIONED and
  * the right columns are carried forward with `last(_, ignoreNulls)`
  * over one keyed, time-ordered window — exactly one hash shuffle on
  * the key, linear work per key, no join explosion. Right rows at the
  * same timestamp as a left row ARE visible to it (<= semantics, ties
  * ordered right-before-left), matching SQL `ASOF JOIN ... ON l.k = r.k
  * AND l.ts >= r.ts` (the DuckDB oracle formulation). Left rows with no
  * prior right row are dropped (inner as-of).
  *
  * At 100 TB this is the shape you want: shuffle volume = |left|+|right|,
  * AQE-splittable, and the window state is one row of carried values.
  */
object AsOf {

  /** @param rightCols right-side columns to carry (renamed as given)
    * @return left rows + carried right columns + `asof_ts` (the matched
    *         right timestamp), inner-as-of semantics
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightCols: Map[String, String]): DataFrame = {
    val carried = rightCols.values.toSeq
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq
    val l = left.select(
      (keys.map(col) ++ Seq(col(leftTs).as("_ts"), lit(1).as("_side")) ++
        leftCols.map(col) ++
        rightCols.map { case (_, as) => lit(null).as(as) }.toSeq): _*)
    val r = right.select(
      (keys.map(col) ++ Seq(col(rightTs).as("_ts"), lit(0).as("_side")) ++
        leftCols.map(c => lit(null).as(c)) ++
        rightCols.map { case (src, as) => col(src).as(as) }.toSeq): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the whole right row rides in ONE struct: the struct is non-null
    // for every right row, so (a) a right row whose carried values are
    // NULL still matches, and (b) the matched row's NULLs are emitted
    // as-is instead of being papered over by an older row's values
    val packed = when(col("_side") === 0,
      struct((col("_ts").as("_rts") +: carried.map(col)): _*))
    val withCarry = l.unionByName(r).select(
      (keys.map(col) ++ Seq(col("_ts"), col("_side"),
        last(packed, ignoreNulls = true).over(w).as("_m")) ++
        leftCols.map(col)): _*)
    withCarry
      .where(col("_side") === 1 && col("_m").isNotNull)
      .select((keys.map(col) ++ Seq(col("_ts").as(leftTs)) ++ leftCols.map(col) ++
        (col("_m._rts").as("asof_ts") +: carried.map(c => col(s"_m.$c").as(c)))): _*)
  }
}
