package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Observation metrics must equal a direct recomputation — same rows, same
  * null counts, same Exact totals — while the observed plan itself stays a
  * single scan (the whole point: metrics without a second pass).
  */
class MetricsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("audited() metrics match direct recomputation after one action") {
    val base = Tables.orders(spark, sf)
      .withColumn("maybe_null", when(col("o_orderkey") % 7 === 0, col("o_totalprice")))
    val (df, obs) = Metrics.audited(
      base, "load_audit",
      nullCheckCols = Seq("maybe_null"),
      totalCols = Seq("o_totalprice"))
    val written = df.count() // the "real" action
    val m = obs.get
    assert(m("n_rows") === written)
    val direct = base.agg(
      count(lit(1)).as("n"),
      sum(when(col("maybe_null").isNull, 1L).otherwise(0L)).as("nn"),
      graft.Exact.sumD(col("o_totalprice")).as("t")).head()
    assert(m("n_null_maybe_null") === direct.getLong(1))
    assert(m("total_o_totalprice") === direct.getDouble(2))
  }

  test("the observed plan reads the source once (no second metrics scan)") {
    val (df, _) = Metrics.audited(
      Tables.orders(spark, sf), "scan_audit", Seq("o_orderdate"))
    val scans = "orders.parquet".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(scans === 1)
  }
}
