package graft.queries

import graft.QuerySpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-structural curation passes over the near-dup candidate graph —
  * the third tier of graph analysis after connected components (merge
  * anything connected) and LPA communities (majority-support clusters):
  * k-core peeling isolates the densely-duplicated boilerplate kernel, and
  * bounded multi-source BFS measures how far contamination spreads from a
  * seed set through near-dup links (the "blast radius" question a curation
  * pipeline asks when an eval-set document is found inside the corpus).
  *
  * Both run the Pregel-style iterate shape shared with
  * [[TextDedup.pagerank]]: a fixed number of synchronous rounds, each one
  * or two vertex-keyed equi-joins plus a partial-aggregated shuffle, with
  * the per-round vertex table localCheckpoint'ed so plan depth stays
  * constant instead of growing a join tower. All arithmetic is integer,
  * so the DuckDB oracle unrolls the identical rounds with bit-equal
  * results.
  *
  * Reference context: the reference pipeline has no graph pass at all
  * (its dedup is exact key-match, `/root/reference/src/main.py` staging);
  * these are extension operators for the LLM-curation surface.
  */
object GraphOps {

  private def edgesSql =
    """edges AS (SELECT a_id AS src, b_id AS dst FROM cand
                 UNION ALL SELECT b_id, a_id FROM cand)"""

  /** Symmetrized candidate edges, cached via the shared LSH memo. */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val cand = TextDedup.minhashCandShared(s, d)
    cand.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(cand.select(col("b_id").as("src"), col("a_id").as("dst")))
  }

  /** K-core by synchronous peeling over symmetrized (src, dst) edges;
    * returns survivors as (doc_id, core_deg). Factored for the property
    * specs (GraphProfilingSpec peels crafted topologies). */
  private[graft] def kcoreOf(edgesIn: DataFrame, k: Int, rounds: Int): DataFrame = {
    val e = edgesIn.localCheckpoint()
    var alive = e.select(col("src").as("v")).distinct().localCheckpoint()
    var deg: DataFrame = null
    for (i <- 1 to rounds) {
      val ei = e
        .join(alive.toDF("src"), "src")
        .join(alive.toDF("dst"), "dst")
      deg = ei.groupBy(col("src").as("v")).agg(count(lit(1)).as("dg"))
      val next = deg.filter(col("dg") >= k).select("v")
      alive = if (i < rounds) next.localCheckpoint() else next
    }
    deg.filter(col("dg") >= k)
      .select(col("v").as("doc_id"), col("dg").cast("long").as("core_deg"))
  }

  /** Min-hop distances from a (v) seed set through symmetrized edges,
    * bounded depth; returns (doc_id, hops). Factored for the specs. */
  private[graft] def minHops(edgesIn: DataFrame, seeds: DataFrame, hops: Int): DataFrame = {
    val e = edgesIn.localCheckpoint()
    var dist = seeds.select(col("v"), lit(0).as("hop")).localCheckpoint()
    for (i <- 1 to hops) {
      val expanded = e.join(dist.toDF("src", "hop"), "src")
        .select(col("dst").as("v"), (col("hop") + 1).as("hop"))
      val next = dist.unionByName(expanded)
        .groupBy("v").agg(min("hop").as("hop"))
      dist = if (i < hops) next.localCheckpoint() else next
    }
    dist.select(col("v").as("doc_id"), col("hop").cast("long").as("hops"))
  }

  /** 2-core of the candidate graph by synchronous peeling, 3 fixed rounds:
    * repeatedly drop vertices with degree < 2 in the surviving subgraph,
    * then report each survivor with its within-core degree. A vertex that
    * survives the 2-core sits on a cycle of near-dup candidate pairs —
    * template/boilerplate neighborhoods — while chain artifacts of LSH
    * banding (trees in the graph) peel away entirely; CC and LPA both keep
    * them. Fixed rounds make the result deterministic and SQL-unrollable;
    * the fully-peeled fixpoint is reached when a round removes nothing
    * (at web scale you iterate until that, shape per round unchanged).
    *
    * Scale shape per round: two vertex-keyed semi-joins (edges ⋉ alive on
    * src and dst) + one map-side-combinable degree count. The alive set
    * only shrinks; it is |nodes|-bounded and checkpointed, so every
    * round's physical plan is two shuffles deep regardless of round
    * count. Never an all-pairs product; edge count is LSH-band-bounded. */
  val kcore = {
    val K = 2
    def roundSql(i: Int): String =
      s"""e$i AS (SELECT e.src, e.dst FROM edges e
                  JOIN a${i - 1} x ON x.v = e.src
                  JOIN a${i - 1} y ON y.v = e.dst),
          d$i AS (SELECT src AS v, count(*) AS dg FROM e$i GROUP BY 1),
          a$i AS (SELECT v FROM d$i WHERE dg >= $K)"""
    QuerySpec(
      "q_kcore",
      s"""WITH ${TextDedup.shingleSql(3)},
          ${TextDedup.minhashCandSql},
          $edgesSql,
          a0 AS (SELECT DISTINCT src AS v FROM edges),
          ${(1 to 3).map(roundSql).mkString(",\n")}
          SELECT v AS doc_id, CAST(dg AS BIGINT) AS core_deg
          FROM d3 WHERE dg >= $K""") {
      (s, d) => kcoreOf(edges(s, d), K, 3)
    }
  }

  /** Multi-source BFS, 3 synchronous hops: min-hop distance from the seed
    * set {doc_id ≡ 0 (mod 17)} through candidate edges — the contamination
    * blast-radius query (seeds = docs flagged by an upstream detector;
    * the result says which docs sit within 3 near-dup hops and how
    * close). Min-hop is computed frontier-free as
    * d_i = MIN over (d_{i-1} ∪ expand(d_{i-1})) — re-relaxing settled
    * vertices is idempotent under MIN, which keeps each round a single
    * join + partial-aggregated MIN shuffle with no visited-set state
    * (the delta-frontier refinement halves the join input at depth ≫ 3
    * but needs an anti-join per round; at 3 hops the flat form moves
    * less).
    *
    * Scale shape per round: one equi-join of the |reached|-row distance
    * table onto edges keyed on src, one (dst, hop) MIN shuffle with
    * map-side combine. Distance table checkpoints per round — constant
    * plan depth, vertex-partitioned throughout. */
  val bfsHops = {
    def roundSql(i: Int): String =
      s"""d$i AS (SELECT v, MIN(hop) AS hop FROM (
                    SELECT v, hop FROM d${i - 1}
                    UNION ALL
                    SELECT e.dst AS v, p.hop + 1 AS hop
                    FROM edges e JOIN d${i - 1} p ON p.v = e.src) t
                  GROUP BY v)"""
    QuerySpec(
      "q_bfs_hops",
      s"""WITH ${TextDedup.shingleSql(3)},
          ${TextDedup.minhashCandSql},
          $edgesSql,
          nodes AS (SELECT DISTINCT src AS v FROM edges),
          d0 AS (SELECT v, 0 AS hop FROM nodes WHERE v % 17 = 0),
          ${(1 to 3).map(roundSql).mkString(",\n")}
          SELECT v AS doc_id, CAST(hop AS BIGINT) AS hops FROM d3""") {
      (s, d) =>
        val e = edges(s, d)
        val seeds = e.select(col("src").as("v")).distinct()
          .filter(col("v") % 17 === 0)
        minHops(e, seeds, 3)
    }
  }

  val specs: Seq[QuerySpec] = Seq(kcore, bfsHops)
}
