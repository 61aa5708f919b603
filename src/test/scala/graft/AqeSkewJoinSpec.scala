package graft

import org.apache.spark.sql.functions._

/** AQE skew-join splitting — the runtime half of the skew story
  * (Skew.scala is the plan-time half: salting + two-stage distinct).
  * A shuffle join with one hot key must get its oversized partition
  * split into parallel sub-tasks by AdaptiveSparkPlanExec, not
  * serialize the stage on one straggler task. The thresholds here are
  * shrunk so the fixture-sized hot key trips the same code path a
  * multi-GB hot key trips in production.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val confs = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false")

  test("hot-key shuffle join is split by AQE (skew=true in the executed plan)") {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ~200k rows on key 0 vs a uniform spread over the 200 right keys:
      // key 0's shuffle partition dwarfs every other
      val left = spark.range(0, 250000)
        .select(when($"id" < 200000, 0L).otherwise($"id" % 200).as("k"),
          concat(lit("pad_pad_pad_pad_pad_"), $"id").as("payload"))
      val right = spark.range(0, 200).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = left.join(right, "k")
      // right keys are unique → every left row matches exactly once.
      // collect() executes THIS DataFrame's query execution, so its
      // adaptive plan is finalized (count() would execute a different
      // QueryExecution and leave this one isFinalPlan=false)
      assert(joined.collect().length === 250000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE must mark and split the skewed join partition:\n" + plan.take(2000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
