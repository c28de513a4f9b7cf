package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins that Adaptive Query Execution really does the runtime re-planning
  * the scaladocs lean on: [[Scale.saltedJoin]] is documented as the tool
  * for "the pathological keys AQE's split threshold misses" — this spec
  * proves the complementary claim, that AQE handles MODERATE skew on its
  * own, so the engine's default path (no salting) is safe for it. */
class AqeSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed shuffle-join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // tiny thresholds so the test-sized hot key counts as skewed
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // hot key 0 carries 20k wide rows; the rest are singletons on keys 1..1000
      val left = spark.range(0, 21000).select(
        when(col("id") < 20000, 0L).otherwise(col("id") - 19999L).as("k"),
        concat(lit("x" * 100), col("id")).as("payload"))
      val right = (0L to 1000L).map(k => (k, s"r$k")).toDF("k", "name")
      val joined = left.join(right, "k")
      // collect() (not count(): that builds a separate agg plan) so THIS
      // DataFrame's adaptive plan executes and finalizes
      assert(joined.collect().length === 21000)
      // the FINAL adaptive plan (post-execution) must mark the hot
      // partition as skew-split
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(2000))
      assert(finalPlan.contains("SortMergeJoin(skew=true)"),
        s"AQE did not skew-split the join:\n${finalPlan.take(3000)}")
      assert(finalPlan.contains("AQEShuffleRead coalesced and skewed"),
        s"hot side's shuffle read not marked skewed:\n${finalPlan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
