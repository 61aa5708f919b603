package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic CDC event-log derivation from the driver's `events`
  * fixture (TESTDATA.md). The reference's change log is an `emp_cdc`
  * table of (row image, action, timestamp) (project2_dag.py:34-43); we
  * derive an equivalent log from `events` with pure column arithmetic so
  * the DuckDB oracle can reproduce it exactly (see
  * [[graft.SparkEntry.oracleSql]] — the SQL mirror of this transform).
  *
  * Mapping: `user_id` → employee key (shifted by −2 so negative ids
  * exist for the F2 check), `ts` → event time, `event_type` →
  * insert/update/delete action, `value`/`event_id` → salary and dob with
  * ranges that exercise every validation predicate.
  */
object Fixtures {
  def employeeCdcLog(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).select(
      (col("user_id") - 2).as("emp_id"),
      col("event_id"),
      col("ts").as("last_updated_at"),
      when(col("event_type") === "signup", "insert")
        .when(col("event_type") === "error", "delete")
        .otherwise("update").as("action"),
      expr("cast(make_date(cast(2004 + event_id % 16 as int), cast(1 + event_id % 12 as int), cast(1 + event_id % 28 as int)) as string)")
        .as("emp_dob"),
      (expr("cast(floor(value * 100) as bigint)") + 50L).as("emp_salary"),
      concat(lit("FN"), col("user_id")).as("emp_FN"),
      concat(lit("LN"), col("user_id")).as("emp_LN"),
      concat(lit("City"), pmod(col("user_id"), lit(10))).as("emp_city"))
  }

  /** DuckDB CTE producing the identical log — prefix for every CDC oracle. */
  val cdcLogSql: String =
    """WITH cdc_log AS (
      |  SELECT CAST(user_id - 2 AS BIGINT) AS emp_id,
      |         event_id,
      |         CAST(ts AS TIMESTAMP) AS last_updated_at,
      |         CASE event_type WHEN 'signup' THEN 'insert'
      |                         WHEN 'error' THEN 'delete'
      |                         ELSE 'update' END AS action,
      |         CAST(make_date(CAST(2004 + event_id % 16 AS INT),
      |                        CAST(1 + event_id % 12 AS INT),
      |                        CAST(1 + event_id % 28 AS INT)) AS VARCHAR) AS emp_dob,
      |         CAST(floor(value * 100) AS BIGINT) + 50 AS emp_salary,
      |         'FN' || CAST(user_id AS VARCHAR) AS emp_FN,
      |         'LN' || CAST(user_id AS VARCHAR) AS emp_LN,
      |         'City' || CAST(user_id % 10 AS VARCHAR) AS emp_city
      |  FROM events)
      |""".stripMargin
}
