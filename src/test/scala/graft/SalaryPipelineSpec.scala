package graft

import java.sql.Date
import graft.cdc.SalaryPipeline

/** Project-1 pipeline semantics (pdf p.3-7): department membership,
  * hire-year filter, floored salary, grouped totals.
  */
class SalaryPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("ECC", Date.valueOf("2012-01-01"), BigDecimal("1000.99")),
    ("ECC", Date.valueOf("2009-12-31"), BigDecimal("5000.00")), // hire < 2010: out
    ("CIT", Date.valueOf("2010-01-01"), BigDecimal("2000.50")),
    ("CIT", Date.valueOf("2015-06-15"), BigDecimal("3000.49")),
    ("EMS", Date.valueOf("2020-02-02"), BigDecimal("123.01")),
    ("HR",  Date.valueOf("2015-01-01"), BigDecimal("9999.99"))  // dept out
  ).toDF("department", "hire_date", "salary")

  test("filters + floor + totals match hand computation") {
    val got = SalaryPipeline.run(rows).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ECC: floor(1000.99)=1000; CIT: 2000+3000; EMS: 123
    assert(got === Map("ECC" -> 1000L, "CIT" -> 5000L, "EMS" -> 123L))
  }

  test("golden total structure: sum of floors, not floor of sum") {
    val df = Seq(
      ("ECC", Date.valueOf("2011-01-01"), BigDecimal("10.60")),
      ("ECC", Date.valueOf("2011-01-01"), BigDecimal("10.60"))
    ).toDF("department", "hire_date", "salary")
    val got = SalaryPipeline.run(df).collect().head.getLong(1)
    assert(got === 20L) // floor(10.6)+floor(10.6), not floor(21.2)=21
  }
}
