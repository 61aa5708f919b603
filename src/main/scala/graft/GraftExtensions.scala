package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{AdcLookupSum, AHash60, PolyHash, QuantizedDotProduct}

/** Session-extension entry point: registers the library's custom
  * Catalyst expressions as SQL functions at session build time —
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`). The operators also
  * self-register idempotently ([[graft.functions.GraftFunctions]]), so
  * the extension is for users who want `q_dot` / `poly_hash` available
  * in plain `spark.sql` from the first query.
  *
  * Deliberately NO custom optimizer rules: the one candidate we
  * prototyped (inferring single-column envelopes from cross-table
  * disjunctions so they push through joins) is already subsumed on
  * Spark 4 — the optimizer extracts each side's sub-disjunction from
  * an OR spanning a join and pushes the FULL per-side OR into both
  * parquet scans, which prunes strictly more than any envelope hull.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("q_dot"),
      new ExpressionInfo(classOf[QuantizedDotProduct].getName, "q_dot"),
      (exprs: Seq[Expression]) => QuantizedDotProduct(exprs(0), exprs(1))),
    (FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)),
    (FunctionIdentifier("adc_sum"),
      new ExpressionInfo(classOf[AdcLookupSum].getName, "adc_sum"),
      (exprs: Seq[Expression]) =>
        graft.functions.GraftFunctions.adcSumBuilder(exprs)),
    (FunctionIdentifier("a_hash"),
      new ExpressionInfo(classOf[AHash60].getName, "a_hash"),
      (exprs: Seq[Expression]) => AHash60(exprs.head)),
    (FunctionIdentifier("to_avro_flat"),
      new ExpressionInfo(classOf[graft.functions.ToAvroFlat].getName, "to_avro_flat"),
      (exprs: Seq[Expression]) => graft.functions.ToAvroFlat(exprs.head)),
    (FunctionIdentifier("from_avro_flat"),
      new ExpressionInfo(classOf[graft.functions.FromAvroFlat].getName, "from_avro_flat"),
      (exprs: Seq[Expression]) =>
        graft.functions.AvroCodec.fromAvroBuilder(exprs)))
}
