package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R1: valid/invalid stream split → DLQ (consumer.py:50-58).
  *
  * One parent DataFrame, two filtered children. In streaming the caller
  * wraps this in `foreachBatch { b => b.persist(); ... }` so the source
  * is read once per micro-batch (see [[graft.streaming.CdcStream]]).
  */
object Routing {
  final case class Split(valid: DataFrame, invalid: DataFrame)

  /** Split on the reference's F2 predicate, annotating the invalid branch
    * with per-rule flags (the reference's DLQ message carries no reason —
    * flags cost nothing and make the DLQ actionable).
    */
  def validateSplit(events: DataFrame,
                    dob: Column = col("emp_dob"),
                    salary: Column = col("emp_salary"),
                    id: Column = col("emp_id")): Split = {
    val invalid = Columns.isInvalid(dob, salary, id)
    Split(
      valid = events.where(!invalid),
      invalid = events.where(invalid)
        .withColumn("bad_dob", Columns.dobYear(dob) <= 2007)
        .withColumn("bad_salary", salary <= 100)
        .withColumn("bad_id", id < 0))
  }
}
