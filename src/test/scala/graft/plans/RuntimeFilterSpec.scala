package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — Spark's InjectRuntimeFilter builds
  * a bloom filter from the SELECTIVE side of a shuffle join at runtime and
  * pushes `might_contain` onto the big probe side's scan, so most probe
  * rows die before the exchange. At 100 TB this is the difference between
  * shuffling the full fact table and shuffling only the ~month of rows
  * that can possibly join — the engine relies on it for selective
  * fact-dim shuffle joins, so this spec pins (1) that the rewrite engages
  * under the documented conf, and (2) that it never changes results.
  *
  * Isolated via `newSession()` (separate SQLConf over the shared
  * SparkContext): the thresholds below must not leak into the other
  * suites' plan pins.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def query(s: SparkSession) = {
    val orders = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1995-03-01")) &&
        col("o_orderdate") < to_timestamp(lit("1995-06-01")))
      .select("o_orderkey", "o_orderpriority")
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_quantity")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).cast("long").as("n"),
        graft.Exact.sumD(col("l_quantity")).as("qty"))
      .orderBy("o_orderpriority")
  }

  test("bloom filter engages on the probe side and preserves results exactly") {
    val tuned = spark.newSession()
    // force a shuffle join (no broadcast) and make the tiny test scan
    // qualify as a "big" application side so the rewrite fires
    tuned.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    tuned.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    tuned.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
    tuned.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")

    val q = query(tuned)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("might_contain") || opt.toLowerCase.contains("bloomfilter"),
      s"runtime bloom filter did not engage:\n$opt")

    // results identical to the default-config session (broadcast plan)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = query(spark).collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty && (got sameElements want),
      s"bloom-filtered results diverge: got=${got.toSeq} want=${want.toSeq}")
  }

  test("the filter does not engage for a broadcast-able join (no wasted bloom build)") {
    val plain = spark.newSession()
    plain.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    val opt = query(plain).queryExecution.optimizedPlan.toString
    assert(!opt.contains("might_contain"),
      s"bloom filter should not fire when the dim side broadcasts:\n$opt")
  }
}
