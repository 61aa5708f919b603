package graft

import org.apache.spark.sql.functions._
import graft.cdc.CdcWire

/** Contract hardening: wire-format forward compatibility and the
  * overflow guard on scaled-BIGINT outputs. */
class ContractSpec extends SparkSpec {
  import spark.implicits._

  test("wire parse tolerates unknown fields and missing optionals (forward compat)") {
    // a NEWER producer may append fields; an OLDER message may omit
    // non-key fields — neither may break the parse or corrupt-route
    val rows = Seq(
      // extra field the schema doesn't know
      """{"action_id":"0","emp_id":"7","emp_FN":"A","emp_LN":"B","emp_dob":"2010-01-01","emp_city":"X","emp_salary":"1000","action":"INSERT","last_updated_at":"2024-01-01 00:00:01","new_field":"ignored"}""",
      // missing optional fields → nulls, still decodable (has id+action)
      """{"emp_id":"8","action":"delete"}""",
      // garbage → corrupt
      """not json"""
    ).toDF("value")
    val parsed = CdcWire.fromWire(rows)
    val byId = parsed.collect().map(r => Option(r.getAs[Long]("emp_id")) -> r).toMap
    assert(byId(Some(7L)).getAs[Boolean]("corrupt") === false)
    assert(byId(Some(7L)).getAs[String]("action") === "insert") // P5 lowercase
    assert(byId(Some(8L)).getAs[Boolean]("corrupt") === false)
    assert(byId(Some(8L)).getAs[String]("emp_FN") === null)
    assert(byId(None).getAs[Boolean]("corrupt") === true)
  }

  test("registry parity: every query has an oracle and every oracle a query") {
    // the driver downgrades an oracle-less query to a weak rows-only
    // check SILENTLY — this pin turns a forgotten oracleSql entry into
    // a loud failure; an orphan oracle is a typo'd key (the column-name
    // trap's cheaper cousin)
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries with no oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles with no query: ${(o -- q).toSeq.sorted}")
    assert(q.size >= 242, s"registry shrank: ${q.size}")
  }

  test("checkedLong raises on BIGINT overflow instead of silently nulling") {
    // non-ANSI Spark would emit NULL where DuckDB raises — the guard
    // must turn the quiet divergence into a loud failure
    val ok = Seq(1L).toDF("v")
      .select(SparkEntry.checkedLong(col("v").cast("decimal(38,0)") * 2, "out"))
      .collect()
    assert(ok.head.getLong(0) === 2L)
    val boom = intercept[Exception] {
      Seq(Long.MaxValue).toDF("v")
        .select(SparkEntry.checkedLong(col("v").cast("decimal(38,0)") * 10, "out"))
        .collect()
    }
    assert(boom.getMessage.contains("overflows BIGINT") ||
      Option(boom.getCause).exists(_.getMessage.contains("overflows BIGINT")))
  }
}
