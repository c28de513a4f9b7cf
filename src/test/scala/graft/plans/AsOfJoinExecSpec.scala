package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The custom as-of physical operator: semantics on crafted edges, parity
  * with the composed window form on real data, and the physical plan the
  * strategy + EnsureRequirements are supposed to produce. */
class AsOfJoinExecSpec extends SparkSpec {
  import spark.implicits._

  private def exec(
      l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    graft.ops.TemporalJoins.asOfJoinExec(l, "t", r, "rt", Seq("k"))

  test("backward as-of: latest right at-or-before; null-extends; equal time matches") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 9L, "d"))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 6L, "r6"))
      .toDF("k", "rt", "rv")
    val out = exec(l, r).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        if (x.isNullAt(3)) null else x.getLong(3).toString,
        x.getString(4))).toSet
    assert(out === Set(
      (1L, 10L, "a", "10", "r10"),   // equal time matches (<=)
      (1L, 20L, "b", "15", "r15"),   // latest of {10, 15}
      (2L, 5L, "c", null, null),     // right exists but only LATER -> null
      (3L, 9L, "d", null, null)))    // no right rows for the key at all
  }

  test("null keys never match, on either side") {
    val l = Seq((Some(1L), 10L, "a"), (None, 10L, "b")).toDF("k", "t", "lv")
    val r = Seq((Some(1L), 5L, "r5"), (None, 5L, "rnull")).toDF("k", "rt", "rv")
    val out = exec(l, r).collect()
      .map(x => (x.getString(2), if (x.isNullAt(4)) null else x.getString(4))).toSet
    assert(out === Set(("a", "r5"), ("b", null)))
  }

  test("exec == composed window form on the events stream (parity at sf0.001)") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id").as("k"), col("ts").as("t"))
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("k"), col("ts").as("rt"))
      .agg(max("event_id").as("p_id"))
      .select("k", "rt", "p_id")
    val viaExec = exec(clicks, purch)
      .select("event_id", "k", "t", "p_id", "rt")
    val viaWindow = graft.ops.TemporalJoins
      .asOfJoin(clicks, "t", purch.withColumnRenamed("rt", "w_rt"), "w_rt", Seq("k"))
      .select(col("event_id"), col("k"), col("t"), col("p_id"), col("w_rt").as("rt"))
    assert(viaExec.count() === clicks.count(), "ASOF LEFT keeps every left row")
    assert(viaExec.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaExec).isEmpty,
      "custom exec and composed window form must agree row-for-row")
  }

  test("physical plan: AsOfJoinExec with co-partitioned exchanges + sorts, payload shuffled once") {
    val l = Seq((1L, 10L, "a")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, "r")).toDF("k", "rt", "rv")
    val plan = exec(l, r).queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix when printing (the same
    // way SortMergeJoinExec prints "SortMergeJoin")
    assert(plan.contains("AsOfJoin "), s"strategy did not plan the node:\n$plan")
    // EnsureRequirements gave each side its own hash exchange + sort —
    // the SortMergeJoin shape, not a union/window or a nested loop
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2, plan)
    assert(!plan.contains("Window"), "no window over a unioned stream")
    assert(!plan.contains("Union"), "sides must not union")
  }
}
