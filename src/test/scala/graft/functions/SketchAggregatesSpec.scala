package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The TypedImperativeAggregate KMV sketch must (1) equal the window-rank
  * formulation exactly, (2) be invariant to partitioning — the union-merge
  * is commutative/associative — and (3) actually run as a partial/final
  * ObjectHashAggregate, the property that bounds shuffle traffic to k longs
  * per map-side group at scale.
  */
class SketchAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = {
    SketchAggregates.register(spark)
    // 3 groups × 400 rows with duplicates (each value appears twice)
    (0 until 1200).map(i => (s"g${i % 3}", (i / 2 * 2654435761L) % 1000000007L))
      .toDF("g", "hv")
  }

  private def windowForm(k: Int) =
    graft.ops.Scale.topKPerGroup(data.distinct(), Seq("g"), col("hv").asc, k)
      .groupBy("g").agg(sort_array(collect_list("hv")).as("sk"))

  test("kmv_sketch equals the window-rank bottom-k, duplicates collapsed") {
    val agg = data.groupBy("g")
      .agg(SketchAggregates.kmv_sketch(col("hv"), 10).as("sk"))
    val expected = windowForm(10)
    assert(agg.join(expected.toDF("g", "sk2"), "g")
      .filter(col("sk") =!= col("sk2")).count() === 0L)
  }

  test("kmv_sketch is partitioning-invariant (merge order cannot matter)") {
    val one = data.repartition(1).groupBy("g")
      .agg(SketchAggregates.kmv_sketch(col("hv"), 10).as("sk")).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val many = data.repartition(13).groupBy("g")
      .agg(SketchAggregates.kmv_sketch(col("hv"), 10).as("sk")).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(one === many)
  }

  test("kmv_sketch holds fewer than k when the group has fewer distinct values") {
    val tiny = Seq(("a", 5L), ("a", 5L), ("a", 7L)).toDF("g", "hv")
    val r = tiny.groupBy("g")
      .agg(SketchAggregates.kmv_sketch(col("hv"), 10).as("sk"))
      .collect().head.getSeq[Long](1)
    assert(r === Seq(5L, 7L))
  }

  test("kmv_sketch plans as partial+final ObjectHashAggregate (map-side combine)") {
    val plan = data.groupBy("g")
      .agg(SketchAggregates.kmv_sketch(col("hv"), 10).as("sk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_kmv_sketch"), s"no partial aggregation:\n$plan")
  }

  test("kmv_sketch resolves through the SQL surface") {
    data.createOrReplaceTempView("kmv_input")
    val r = spark.sql(
      "SELECT g, kmv_sketch(hv, 3) AS sk FROM kmv_input GROUP BY g ORDER BY g")
      .collect()
    assert(r.length === 3 && r.forall(_.getSeq[Long](1).size === 3))
  }
}
