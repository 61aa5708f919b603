package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Literal
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{PolyHash, QuantizedDotProduct}

/** The session-extension entry point registers exactly the library's
  * custom expressions with working builders. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extension applies cleanly and describes all functions") {
    new GraftExtensions()(new SparkSessionExtensions) // must not throw
    assert(GraftExtensions.functions.map(_._1.funcName).sorted ===
      Seq("a_hash", "adc_sum", "from_avro_flat", "poly_hash", "q_dot",
        "to_avro_flat"))
  }

  test("injected builders construct the custom expressions") {
    val byName = GraftExtensions.functions.map(f => f._1.funcName -> f._3).toMap
    val ph = byName("poly_hash")(Seq(Literal("abc")))
    assert(ph.isInstanceOf[PolyHash])
    assert(ph.eval() === ("abc".foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)))
    val qd = byName("q_dot")(Seq(Literal(null), Literal(null)))
    assert(qd.isInstanceOf[QuantizedDotProduct])
    val adc = byName("adc_sum")(Seq(Literal(null), Literal(null), Literal(16)))
    assert(adc.isInstanceOf[graft.functions.AdcLookupSum])
    assert(adc.asInstanceOf[graft.functions.AdcLookupSum].k === 16)
    val ah = byName("a_hash")(Seq(Literal("x")))
    assert(ah.isInstanceOf[graft.functions.AHash60])
    assert(ah.eval() === 0L) // single char: every segment mean == global mean
  }
}
