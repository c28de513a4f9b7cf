package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants for the embedding-space operators that the DuckDB
  * oracle cannot express (non-vacuity, cross-query consistency, plan
  * shape of the blocked pair join).
  */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("semDedup: non-vacuous on both sides, and the min-id member of every cell survives") {
    val out = Similarity.semDedup.fn(spark, sf).cache()
    assert(out.filter(col("kept") === false).count() > 0,
      "no vector dropped — τ too high for this corpus, the dedup is vacuous")
    assert(out.filter(col("kept") === true).count() > 0,
      "every vector dropped — τ too low, the dedup erases the corpus")
    // canonical-keep is id-ordered: a cell's smallest id has no lower-id
    // cell-mate, so it can never be dropped
    val minPerCell = out.groupBy("cell").agg(min("vec_id").as("vec_id"))
    val droppedMin = out.filter(col("kept") === false)
      .join(minPerCell, Seq("cell", "vec_id"))
    assert(droppedMin.count() === 0, "the min-id member of a cell must always be kept")
  }

  test("semDedup: pair join is cell-blocked (no cartesian / nested-loop join)") {
    val plan = Similarity.semDedup.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "semantic dedup must block on cell, never all-pairs")
    // the pair join itself must key on cell (hash or sort-merge — never a
    // nested loop); the only BNLJs in the tree are the broadcast-tiny
    // centroid assignments (corpus × 8 centroids), which always print as
    // BuildRight Cross joins
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cell".r
      .findFirstIn(plan).isDefined,
      "the pairwise cosine join must be keyed on the cell id")
    assert("BroadcastNestedLoopJoin (?!BuildRight, Cross)".r.findFirstIn(plan).isEmpty,
      "any nested-loop join must be the broadcast-tiny centroid assignment")
  }

  test("clusterStats: cells partition the corpus and every cell is populated") {
    val stats = Similarity.clusterStats.fn(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(stats.agg(sum("n_members")).head.getLong(0) === n,
      "cell membership must partition the corpus exactly")
    assert(stats.count() === 8, "all 8 quantizer cells must be populated at this sf")
    assert(stats.filter(col("n_members") <= 0).count() === 0)
  }

  test("semDedup agrees with clusterStats cell assignment cardinality") {
    val byQuery = Similarity.semDedup.fn(spark, sf)
      .groupBy("cell").count().withColumnRenamed("count", "n_sem")
    val byStats = Similarity.clusterStats.fn(spark, sf)
      .select(col("cell"), col("n_members"))
    val bad = byQuery.join(byStats, "cell")
      .filter(col("n_sem") =!= col("n_members"))
    assert(bad.count() === 0, "both queries must see the identical cell assignment")
  }
}
