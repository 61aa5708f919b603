package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Project-1 pipeline (kafka_project_instruction.pdf p.2-7): filter rows
  * by department membership (F3) and hire year (F4), floor the salary
  * (P7), and maintain per-department totals (A4).
  *
  * A4 in the reference is a per-message `ON CONFLICT ... DO UPDATE SET
  * total_salary = total_salary + s` upsert-accumulate (pdf p.6). On
  * Spark that is a plain hash aggregation — partial (map-side) sums per
  * partition, one shuffle on the group key, final merge. Totals are
  * LongType: the PDF's own `int4 total_salary` overflows on real data
  * (SURVEY §1.2) — a bug we deliberately do not copy.
  */
object SalaryPipeline {
  def filterEmployees(df: DataFrame,
                      departments: Seq[String],
                      minHireYear: Int,
                      dept: Column = col("department"),
                      hireDate: Column = col("hire_date")): DataFrame =
    df.where(dept.isin(departments: _*) && year(hireDate) >= minHireYear)

  def departmentTotals(df: DataFrame,
                       dept: Column = col("department"),
                       salary: Column = col("salary")): DataFrame =
    df.groupBy(dept.as("department"))
      .agg(sum(Columns.flooredSalary(salary)).as("total_salary"))

  /** Full project-1 pipeline: CSV rows → filters → floored salary →
    * running totals. Golden totals (pdf p.7): EMS 3,779,570 ·
    * CIT 9,102,142 · ECC 2,042,698.
    */
  def run(df: DataFrame,
          departments: Seq[String] = Seq("ECC", "CIT", "EMS"),
          minHireYear: Int = 2010): DataFrame =
    departmentTotals(filterEmployees(df, departments, minHireYear))
}
