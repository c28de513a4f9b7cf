package graft

import org.apache.spark.sql.execution.FormattedMode

/** Regression guards for the physical-plan properties the engine is
  * designed around — if one of these breaks, a 100 TB run regresses even
  * though every correctness gate stays green.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.explainString(FormattedMode)

  test("q_scan_project: filter and projection reach the parquet scan") {
    val plan = formatted("q_scan_project")
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("LessThan(l_shipdate"), "shipdate predicate not pushed")
    assert(plan.contains("GreaterThanOrEqual(l_quantity,45.0)"), "quantity predicate not pushed")
    // pruned read schema: only the 4 referenced columns
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_quantity:double,l_shipdate:timestamp_ntz>"))
  }

  test("q_rank_quartile: dimension joins broadcast; window and final agg share one shuffle") {
    val plan = formatted("q_rank_quartile")
    assert(plan.contains("BroadcastHashJoin"), "dimension joins should broadcast")
    assert(!plan.contains("SortMergeJoin"), "no SMJ expected in the single-pass form")
    // exactly 2 non-broadcast exchanges: revenue agg + join_key repartition
    val shuffles = """\(\d+\) Exchange\b""".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected 2 shuffles, got $shuffles:\n$plan")
    // single lineitem scan (the CTE+join form had two)
    val scans = "lineitem.parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 lineitem scan, got $scans")
  }

  test("q_pricing_summary: partial/final hash aggregation with pushed date filter") {
    val plan = formatted("q_pricing_summary")
    assert(plan.contains("HashAggregate"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("grouped top-k lowers to partial+final WindowGroupLimit (bounded heaps, no full sort needed)") {
    // proof the BUILT-IN covers the operator — the reason no custom
    // SparkPlan exists for top-k-per-group (SURVEY.md §4.3)
    import org.apache.spark.sql.functions._
    val df = Tables.lineitem(spark, sf)
    val plan = graft.ops.Scale.topKPerGroup(df, Seq("l_returnflag"), col("l_quantity").desc, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
    assert(plan.contains("Partial") && plan.contains("Final"))
  }

  test("q_sim_topk: query side broadcasts against the corpus") {
    val plan = formatted("q_sim_topk")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"))
  }
}
