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
      deg = kcoreRound(e, alive)
      val next = deg.filter(col("dg") >= k).select("v")
      alive = if (i < rounds) next.localCheckpoint() else next
    }
    deg.filter(col("dg") >= k)
      .select(col("v").as("doc_id"), col("dg").cast("long").as("core_deg"))
  }

  /** ONE peel round's surviving-subgraph degree count — factored as a
    * named, fingerprint-gatable unit (q_builder_kcore_round; see
    * [[graft.PlanFingerprints]] for what each loop's own fingerprint
    * does and does not show of its round body). */
  private[graft] def kcoreRound(e: DataFrame, alive: DataFrame): DataFrame =
    e.join(alive.toDF("src"), "src")
      .join(alive.toDF("dst"), "dst")
      .groupBy(col("src").as("v")).agg(count(lit(1)).as("dg"))

  /** ONE frontier-free BFS relaxation round (q_builder_bfs_round). */
  private[graft] def bfsRound(e: DataFrame, dist: DataFrame): DataFrame =
    dist.unionByName(
        e.join(dist.toDF("src", "hop"), "src")
          .select(col("dst").as("v"), (col("hop") + 1).as("hop")))
      .groupBy("v").agg(min("hop").as("hop"))

  /** Min-hop distances from a (v) seed set through symmetrized edges,
    * bounded depth; returns (doc_id, hops). Factored for the specs. */
  private[graft] def minHops(edgesIn: DataFrame, seeds: DataFrame, hops: Int): DataFrame = {
    val e = edgesIn.localCheckpoint()
    var dist = seeds.select(col("v"), lit(0).as("hop")).localCheckpoint()
    for (i <- 1 to hops) {
      val next = bfsRound(e, dist)
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

  /** Common-neighbor link prediction over the candidate graph: for every
    * vertex pair at distance 2, the shared-neighbor count and neighborhood
    * Jaccard (|N(a)∩N(b)| / |N(a)∪N(b)|, ×10⁶ integer-scaled) — the
    * "should these two docs ALSO be a candidate pair?" score that patches
    * LSH misses: a pair sharing most of its duplicate neighborhood is a
    * near-dup the bands happened to split (same role as
    * q_dedup_lsh_recall's gate, but graph-native and cheap enough to run
    * on the full candidate set). Every distance-2 pair is scored;
    * `is_new` = 1 marks pairs with NO direct edge — the predicted links
    * (the synthetic corpus' candidate graph is all small cliques below
    * sf0.1, so scoring existing pairs too keeps the query informative at
    * every scale; the production consumer filters is_new = 1).
    *
    * Scale shape: wedge enumeration is one self-equi-join of the edge
    * list on the middle vertex (the [[TextDedup.triangleCount]] shape) —
    * bounded by Σ deg², which the LSH banding's near-unique band keys
    * keep linear-ish; the pair aggregation is map-side combinable; degrees
    * join per-endpoint. Never all-pairs: only distance-2 pairs material-
    * ize. Jaccard denominator by inclusion-exclusion — no set shuffles,
    * just the two degree scalars. */
  val linkPredict = QuerySpec(
    "q_link_predict",
    s"""WITH ${TextDedup.shingleSql(3)},
        ${TextDedup.minhashCandSql},
        $edgesSql,
        deg AS (SELECT src AS v, count(*) AS dg FROM edges GROUP BY 1),
        wedge AS (SELECT e1.src AS a, e2.dst AS b, count(*) AS cn
                  FROM edges e1 JOIN edges e2
                    ON e1.dst = e2.src AND e1.src < e2.dst
                  GROUP BY 1, 2)
        SELECT w.a AS a_id, w.b AS b_id, CAST(w.cn AS BIGINT) AS n_common,
               CAST((w.cn * 1000000) // (da.dg + db.dg - w.cn) AS BIGINT)
                 AS jaccard_ppm,
               CAST(CASE WHEN c.a_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_new
        FROM wedge w
        JOIN deg da ON da.v = w.a
        JOIN deg db ON db.v = w.b
        LEFT JOIN cand c ON c.a_id = w.a AND c.b_id = w.b""") {
    (s, d) =>
      val cand = TextDedup.minhashCandShared(s, d)
        .withColumn("_hit", lit(1))
      val e = edges(s, d)
      val deg = e.groupBy(col("src").as("v")).agg(count(lit(1)).as("dg"))
      val wedge = e.toDF("a", "m")
        .join(e.toDF("m", "b"), "m")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("cn"))
      wedge
        .join(deg.toDF("a", "da"), "a")
        .join(deg.toDF("b", "db"), "b")
        .join(cand.toDF("a", "b", "_hit"), Seq("a", "b"), "left")
        .select(col("a").as("a_id"), col("b").as("b_id"),
          col("cn").cast("long").as("n_common"),
          expr("(cn * 1000000L) div (da + db - cn)").cast("long").as("jaccard_ppm"),
          when(col("_hit").isNull, 1L).otherwise(0L).cast("long").as("is_new"))
  }

  /** The crafted worst-case topology for [[graphAdversarial]]: one
    * super-node (doc 0) star-linked to EVERY even doc — degree n/2, the
    * pathological key skew for the dst-keyed propagation join — while
    * the odd docs form a single maximum-diameter chain (1–3–5–…, n/2
    * hops — the worst case for round count). Derived entirely from the
    * documents table's ids so both engines see the identical graph.
    * Symmetrized, like every edge input to [[TextDedup.connectedComponents]].
    *
    * Every vertex also carries a SELF-LOOP: the star/chain construction
    * assumes contiguous doc_ids (an isolated odd id — a gap leaving some
    * odd o with neither o−2 nor o+2, or a lone odd — would otherwise
    * appear in NO edge, and the Spark side would silently emit fewer rows
    * than the one-per-document oracle). Self-loops don't change any
    * component, so under today's contiguous ids the closed-form oracle
    * still matches exactly — but if testdata generation ever changes, the
    * gate diverges LOUDLY on labels instead of silently dropping rows. */
  private[graft] def adversarialEdges(s: SparkSession, d: String): DataFrame = {
    val ids = graft.Tables.documents(s, d).select("doc_id")
    val star = ids.filter(col("doc_id") % 2 === 0 && col("doc_id") > 0)
      .select(lit(0L).as("src"), col("doc_id").as("dst"))
    val odds = ids.filter(col("doc_id") % 2 === 1)
    val chain = odds.toDF("src").join(odds.toDF("dst"), expr("dst = src + 2"))
    val e = star.unionByName(chain)
    e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .unionByName(ids.select(col("doc_id").as("src"), col("doc_id").as("dst")))
  }

  /** Adversarial-topology gate for the graph family — the skew analogue
    * of q_dedup_adversarial_bucket / q_sim_adversarial_bucket: the REAL
    * pointer-jump CC runs over [[adversarialEdges]]' star/chain hybrid
    * and must reproduce the closed-form ground truth (evens incl. the
    * hub → component 0; odds → component 1). What it proves, under
    * worst-case degree skew AND worst-case diameter at once:
    *   - the hot dst=0 key carries n/2 rows of NARROW (id, label) pairs
    *     through the per-round join — skew AQE can split, never text —
    *     and the min-label groupBy partial-aggregates map-side, so no
    *     single reducer sees the super-node's neighborhood unreduced;
    *   - pointer jumping keeps the round count logarithmic in the n/2
    *     chain diameter (GraphProfilingSpec pins the bound; a plain
    *     propagate-only loop would need n/2 rounds and fail maxRounds).
    * The oracle is the closed form — derivable because the topology is a
    * deterministic function of doc_id — so the gate is independent of
    * any CC implementation on either engine. */
  val graphAdversarial = QuerySpec(
    "q_graph_adversarial",
    """SELECT doc_id,
              CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END AS BIGINT) AS cluster_id
       FROM documents""") {
    (s, d) =>
      TextDedup.connectedComponents(adversarialEdges(s, d))
        .select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** Personalized PageRank from a seed set — graph-propagated relevance
    * for seed-expansion data selection: teleport mass is confined to the
    * curated seed docs (doc_id ≡ 0 mod 17, the [[bfsHops]] seed set), so
    * after k rounds a doc's rank measures how much seed mass reaches it
    * through near-dup links with per-hop decay — the smooth
    * generalization of the BFS blast radius (hops → decaying relevance),
    * and the standard "find more like my curated set" selection signal.
    * 3 synchronous rounds, integer 10¹²-unit mass (SUM(pr div deg) and
    * the 15/85 split are exact integer ops, so the oracle unrolls the
    * identical rounds bit-equally). Non-seed docs with no inbound seed
    * path stay at rank 0 and ride along — their zero IS the signal.
    *
    * Scale shape per round: identical to [[TextDedup.pagerank]] (degree
    * pre-joined onto the checkpointed edge table, one rank-onto-edges
    * equi-join + one partial-aggregated contribution shuffle, rank table
    * checkpointed per round) — the teleport mask is a per-row projection
    * against the broadcast seed count. */
  val pprSeed = {
    val Scale = 1000000000000L
    def iterSql(i: Int): String = {
      val prev = s"pr${i - 1}"
      s"""ct$i AS (SELECT e.dst AS doc_id, CAST(SUM(p.pr // d.deg) AS BIGINT) AS contrib
                   FROM edges e JOIN $prev p ON p.doc_id = e.src
                                JOIN deg d ON d.src = e.src
                   GROUP BY 1),
          pr$i AS (SELECT nodes.doc_id,
                          (15 * (CASE WHEN nodes.doc_id % 17 = 0
                                      THEN $Scale // ns.n ELSE 0 END)) // 100
                            + (85 * COALESCE(ct$i.contrib, 0)) // 100 AS pr
                   FROM nodes CROSS JOIN ns
                   LEFT JOIN ct$i ON ct$i.doc_id = nodes.doc_id)"""
    }
    QuerySpec(
      "q_ppr_seed",
      s"""WITH ${TextDedup.shingleSql(3)},
          ${TextDedup.minhashCandSql},
          $edgesSql,
          nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
          ns AS (SELECT COUNT(*) AS n FROM nodes WHERE doc_id % 17 = 0),
          deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
          pr0 AS (SELECT doc_id, CASE WHEN doc_id % 17 = 0
                                      THEN $Scale // ns.n ELSE 0 END AS pr
                  FROM nodes CROSS JOIN ns),
          ${(1 to 3).map(iterSql).mkString(",\n")}
          SELECT doc_id, pr FROM pr3""") {
      (s, d) =>
        TextDedup.pagerankRounds(edges(s, d), Some(col("doc_id") % 17 === 0))
    }
  }

  /** The crafted weighted DIRECTED graph for [[graphSssp]], derived
    * entirely from the documents table's ids so both engines see the
    * identical topology (the [[adversarialEdges]] convention). Three edge
    * families over the even ids:
    *   - express: 0 → i, weight 100, for EVERY even i ≥ 2 — the 1-hop
    *     path a hop-count BFS would always pick;
    *   - head chain: i → i+2, weight 1, for even i ≤ 14 — so ids 2..16
    *     are cheaper by chain (i/2 < 100) but need up to 8 hops;
    *   - hub: one 0 → h edge at weight 10 (h = max(18, 2·(n div 4)) —
    *     data-derived, mid-table; the floor keeps the hub chain DISJOINT
    *     from the head chain, whose last edge lands on 16 — without it a
    *     sub-36-row table would let head-chain paths continue into the
    *     hub chain and break the closed form) plus a chain
    *     h → h+2 → … → h+12 at weight 1 — so the
    *     hub neighborhood's cheapest path (10 + (i−h)/2 ≤ 16) BEATS its
    *     1-hop express (100) while using up to 7 hops: cheapest ≠ fewest
    *     hops, which is exactly what separates weighted relaxation from
    *     the min-hop BFS of [[minHops]].
    * Odd ids appear in no edge — unreachable by construction. Every even
    * id gets its express edge from the ids TABLE (not an assumed range),
    * so the output row set matches the one-per-document oracle even if
    * testdata generation ever broke id contiguity; a gap could only shift
    * a chain DISTANCE, which then fails the closed-form gate loudly
    * rather than dropping rows silently (the q_graph_adversarial
    * lesson, ADVICE r9). */
  private[graft] def ssspEdges(s: SparkSession, d: String): DataFrame = {
    val ids = graft.Tables.documents(s, d).select("doc_id")
    val evens = ids.filter(col("doc_id") % 2 === 0)
    val express = evens.filter(col("doc_id") >= 2)
      .select(lit(0L).as("src"), col("doc_id").cast("long").as("dst"),
        lit(100L).as("w"))
    val headEv = evens.filter(col("doc_id") <= 16)
    val chain = headEv.toDF("src").join(headEv.toDF("dst"), expr("dst = src + 2"))
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
        lit(1L).as("w"))
    val hubRow = broadcast(ids.agg(expr("greatest(18L, 2 * (count(1) div 4))").as("hub")))
    val hubEntry = hubRow.select(lit(0L).as("src"), col("hub").cast("long").as("dst"),
      lit(10L).as("w"))
    val hubEv = evens.crossJoin(hubRow)
      .filter(col("doc_id") >= col("hub") && col("doc_id") <= col("hub") + 12)
      .select("doc_id")
    val hubChain = hubEv.toDF("src").join(hubEv.toDF("dst"), expr("dst = src + 2"))
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
        lit(1L).as("w"))
    express.unionByName(chain).unionByName(hubEntry).unionByName(hubChain)
  }

  /** ONE weighted min-plus relaxation round (q_builder_sssp_round). */
  private[graft] def ssspRelax(edges: DataFrame, dist: DataFrame): DataFrame =
    edges
      .join(dist.toDF("src", "sdist"), "src")
      .select(col("dst").as("v"), (col("sdist") + col("w")).as("dist"))
      .unionByName(dist)
      .groupBy("v").agg(min("dist").as("dist"))

  /** Single-source shortest paths over weighted directed (src, dst, w)
    * edges by synchronous min-plus relaxation (distributed Bellman–Ford),
    * returning ((v, dist) for every reachable vertex, rounds executed).
    *
    * Per round: one equi-join of the |reached|-row distance table onto
    * edges keyed on src (the edge table is localCheckpoint'ed ONCE,
    * pre-partitioned on src, so the edge side never re-exchanges), then
    * one (dst, min) shuffle with map-side combine — the weighted
    * generalization of [[minHops]]' MIN-idempotent frontier-free
    * relaxation. The distance table checkpoints per round with the
    * replaced round's blocks released immediately (the
    * [[TextDedup.connectedComponentsWithRounds]] discipline), so plan
    * depth and block residency are constant in round count.
    *
    * Convergence: the (row count, dist sum) pair — a new vertex changes
    * the count; an improved distance strictly decreases the sum at equal
    * count; and a round is a deterministic function of the distance
    * table, so an UNCHANGED pair is a fixpoint. One scalar action per
    * round, cheap against cached blocks. Rounds to fixpoint = the hop
    * length of the longest cheapest path (+1 to observe no change) —
    * a property of the GRAPH, not the data size; production graphs with
    * large weighted diameters want the pointer-doubling distance-product
    * form instead (the [[TextDedup.connectedComponents]] treatment).
    * Fails loudly (releasing all blocks) if `maxRounds` is hit without a
    * fixpoint — a silent stop would emit non-minimal distances. */
  /** Shared fixpoint-loop driver for the run-to-convergence kernels
    * ([[ssspWithRounds]], [[bidiReachTagged]]) — ONE copy of the
    * checkpoint/probe/release discipline instead of one per kernel (a
    * future fix to the detector or the release-on-throw path must not
    * need hand-syncing across near-copies). Per round: relax →
    * localCheckpoint → release the previous round's blocks → (count,
    * sum(dist)) probe; converged when a round changes neither — sound
    * for MIN-monotone relaxations (count non-decreasing, tracked sum of
    * minima non-increasing, so an unchanged pair means an unchanged
    * state). Throws loudly past maxRounds (after releasing the state
    * blocks); on success the final state's blocks are handed to the
    * CALLER to lease or release. */
  private def fixpointLoop(
      seed: DataFrame, relax: DataFrame => DataFrame, maxRounds: Int, what: String)
      : (DataFrame, Int, Seq[org.apache.spark.rdd.RDD[_]]) = {
    // LAZY checkpoint + probe fusion (r12): the (count, sum) probe is
    // the action that materializes the round's checkpoint blocks, so a
    // round costs ONE driver job, not two (materialize, then probe).
    // The previous round's blocks are released only AFTER the probe has
    // landed — the lazy-checkpoint ordering rule.
    var (dist, distRdds) = TextDedup.localCheckpointLazyTracked(seed)
    def state(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), coalesce(sum("dist"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = state(dist)
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val relaxed = relax(dist)
      rounds += 1
      val (next, nextRdds) = TextDedup.localCheckpointLazyTracked(relaxed)
      val cur = state(next)
      TextDedup.release(distRdds)
      dist = next
      distRdds = nextRdds
      converged = cur == prev
      prev = cur
    }
    if (!converged) {
      TextDedup.release(distRdds)
      throw new IllegalStateException(
        s"$what did not reach a fixpoint in $rounds rounds")
    }
    (dist, rounds, distRdds)
  }

  private[graft] def ssspWithRounds(
      edges0: DataFrame, sourceId: Long, maxRounds: Int = 15): (DataFrame, Int) = {
    val (edges, edgesRdds) = TextDedup.localCheckpointTracked(
      edges0.toDF("src", "dst", "w").repartition(col("src")))
    try {
      val seed = edges.sparkSession.range(1)
        .select(lit(sourceId).as("v"), lit(0L).as("dist"))
      val (dist, rounds, distRdds) =
        fixpointLoop(seed, ssspRelax(edges, _), maxRounds, "sssp")
      distRdds.foreach(graft.ops.Caches.leaseRdd)
      (dist, rounds)
    } finally TextDedup.release(edgesRdds)
  }

  /** Weighted directed shortest paths — the capability the graph family
    * lacked (CC/LPA/k-core/BFS/pagerank are all unweighted, and BFS is
    * the only distance op). Runs the real [[ssspWithRounds]] relaxation
    * over [[ssspEdges]]' crafted topology and must reproduce the closed
    * form; the hub neighborhood is the teeth of the gate — its cheapest
    * paths (cost 10+(i−h)/2, up to 8 hops) must beat the 1-hop express
    * edge (cost 100), so a hop-count BFS, a premature-stop relaxation, or
    * a weight-dropping join all fail loudly.
    *
    * Skew note: vertex 0 has out-degree n/2 (every express edge), so the
    * relax join's src=0 key is the pathological fan-OUT — one distance
    * row meeting n/2 edge rows. The join output is narrow (dst, cand)
    * pairs and the min groupBy partial-aggregates map-side; the hot SIDE
    * is the checkpointed edge table, which never re-exchanges. One row
    * per document: odd ids are unreachable and surface as NULL via the
    * left join (never silently dropped). */
  val graphSssp = QuerySpec(
    "q_graph_sssp",
    """WITH n AS (SELECT GREATEST(18, 2 * (COUNT(*) // 4)) AS hub FROM documents)
       SELECT doc_id,
              CAST(CASE
                WHEN doc_id % 2 = 1 THEN NULL
                WHEN doc_id = 0 THEN 0
                WHEN doc_id <= 16 THEN doc_id // 2
                WHEN doc_id >= hub AND doc_id <= hub + 12 THEN 10 + (doc_id - hub) // 2
                ELSE 100 END AS BIGINT) AS dist
       FROM documents CROSS JOIN n""") {
    (s, d) =>
      val docs = graft.Tables.documents(s, d).select("doc_id")
      val (dist, _) = ssspWithRounds(ssspEdges(s, d), 0L)
      docs.join(dist.toDF("doc_id", "dist"), Seq("doc_id"), "left")
        .select(col("doc_id"), col("dist").cast("long").as("dist"))
  }

  /** The crafted DIRECTED topology for [[graphSccPivot]], derived from
    * the documents ids (the [[ssspEdges]] convention). Four families:
    *   - head cycle: 0 → 2 → … → 16 → 0 — the pivot's strongly
    *     connected component, closed by the single 16 → 0 back edge;
    *   - express: 0 → i for every even i ≥ 18 — forward-reachable from
    *     the pivot, NO path back (F \ B);
    *   - odd fan-in: i → 0 for every odd i — backward-reachable into
    *     the pivot, never reached forward (B \ F).
    * SCC(0) = F ∩ B = the evens ≤ 16 exactly; everything else exercises
    * one side only, so a direction mix-up (symmetrized edges, swapped
    * reverse) flips whole families and fails the closed form loudly. A
    * doc-id gap inside the head cycle would break the chain and shrink
    * the SCC — also a loud label divergence, never a silent row drop
    * (every doc appears in the one-row-per-document output). */
  private[graft] def sccEdges(s: SparkSession, d: String): DataFrame = {
    val ids = graft.Tables.documents(s, d).select("doc_id")
    val evens = ids.filter(col("doc_id") % 2 === 0)
    val headEv = evens.filter(col("doc_id") <= 16)
    val chain = headEv.toDF("src").join(headEv.toDF("dst"), expr("dst = src + 2"))
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    val back = ids.filter(col("doc_id") === 16)
      .select(col("doc_id").cast("long").as("src"), lit(0L).as("dst"))
    val express = evens.filter(col("doc_id") >= 18)
      .select(lit(0L).as("src"), col("doc_id").cast("long").as("dst"))
    val oddIn = ids.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").cast("long").as("src"), lit(0L).as("dst"))
    chain.unionByName(back).unionByName(express).unionByName(oddIn)
  }

  /** Pivot-SCC membership — the forward–backward building block of
    * distributed strongly-connected-components decomposition (Fleischer,
    * Hendrickson & Pınar's divide-and-conquer: pick a pivot, compute its
    * forward set F and backward set B with two reachability passes,
    * F ∩ B is the pivot's SCC, recurse on the three remainders): the
    * directed-graph question ("which docs are MUTUALLY linked with this
    * one?") that undirected CC over-answers by construction. Both passes
    * ride ONE [[bidiReach]] fixpoint loop — forward edges tagged dir=0,
    * reversed dir=1 — with the [[ssspWithRounds]] discipline (per-round
    * checkpoint/release, (count, sum) fixpoint detector); membership is
    * one equi-join of the two |reached|-row sets. Scale shape = the SSSP
    * shape at double edge width: edges checkpointed once partitioned on
    * the (src, dir) key, narrow relax output, map-side-combined MIN, and
    * HALF the per-round driver actions of two sequential passes. The
    * full recursive decomposition adds only driver-side control flow
    * around this exact kernel. */
  val graphSccPivot = QuerySpec(
    "q_graph_scc_pivot",
    """SELECT doc_id,
              CAST(CASE WHEN doc_id % 2 = 0 AND doc_id <= 16
                   THEN 1 ELSE 0 END AS BIGINT) AS in_scc
       FROM documents""") {
    (s, d) =>
      // materialize the edge build ONCE: the bidirectional pass (which
      // builds its own dir-tagged checkpoint from this) reads the
      // checkpointed table instead of re-running the three documents
      // scans + two self-joins; blocks release as soon as it returns —
      // F/B are themselves materialized checkpoints, so the remaining
      // plan never re-reads the edge lineage
      val (e, eRdds) = TextDedup.localCheckpointTracked(sccEdges(s, d))
      val (fwd, bwd, reachRdds) = bidiReach(e, 0L, maxRounds = 64)
      TextDedup.release(eRdds)
      reachRdds.foreach(graft.ops.Caches.leaseRdd)
      val scc = fwd.join(bwd, "v")
        .select(col("v").as("doc_id"), lit(1L).as("in_scc"))
      graft.Tables.documents(s, d).select("doc_id")
        .join(scc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("in_scc"), lit(0L)).cast("long").as("in_scc"))
  }

  /** ONE bidirectional reachability relaxation round over (v, dir, dist)
    * state (q_builder_bidi_round): FW-BW's forward and backward passes
    * ride ONE loop as direction-tagged label sets — the same
    * amortization [[landmarkRound]] applies to landmarks — so each round
    * costs one join + one map-side-combinable MIN instead of two, and
    * the loop runs max(rounds_F, rounds_B) rounds instead of their SUM
    * (re-relaxing the already-converged direction is MIN-idempotent). */
  private[graft] def bidiRelax(e: DataFrame, dist: DataFrame): DataFrame =
    dist.unionByName(
        e.join(dist.select(col("v").as("src"), col("dir"), col("dist")),
            Seq("src", "dir"))
          .select(col("dst").as("v"), col("dir"), (col("dist") + 1L).as("dist")))
      .groupBy("v", "dir").agg(min("dist").as("dist"))

  /** Direction-tag a (src, dst) edge table for [[bidiRelax]]: the
    * original orientation rides as dir=0, the reversal as dir=1 — so
    * ONE table serves forward reachability, backward reachability
    * (dir=1 rows), and the original-orientation consumers
    * (filter dir=0), and [[sccDecompose]] can checkpoint it ONCE
    * instead of re-tagging per pivot. */
  private[graft] def bidiTag(edges0: DataFrame): DataFrame =
    edges0.select(col("src"), col("dst"), lit(0).as("dir"))
      .unionByName(
        edges0.select(col("dst").as("src"), col("src").as("dst"), lit(1).as("dir")))

  /** Forward AND backward reachability from `pivot` in one fixpoint loop
    * over [[bidiRelax]], given an ALREADY-materialized dir-tagged edge
    * table ([[bidiTag]]); state uses the [[ssspWithRounds]] discipline
    * (per-round checkpoint + release, (count, sum) fixpoint detector,
    * loud maxRounds). Returns (F, B, rounds) — the (v) frames backed by
    * the final checkpoint, whose blocks are handed to the CALLER to
    * release or lease, plus the round count the amortization spec pins
    * (max(depth_F, depth_B) + 1 probe round, NOT their sum). */
  private[graft] def bidiReachTagged(e: DataFrame, pivot: Long, maxRounds: Int)
      : (DataFrame, DataFrame, Int, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val seed = e.sparkSession.range(2)
      .select(lit(pivot).as("v"), col("id").cast("int").as("dir"), lit(0L).as("dist"))
    val (dist, rounds, distRdds) =
      fixpointLoop(seed, bidiRelax(e, _), maxRounds, "bidirectional reachability")
    (dist.filter(col("dir") === 0).select("v"),
      dist.filter(col("dir") === 1).select("v"),
      rounds, distRdds)
  }

  /** [[bidiReachTagged]] over a raw (src, dst) table: tags, checkpoints
    * partitioned on src (which satisfies the (src, dir) join's
    * clustered distribution by the subset rule), runs, releases the
    * tagged table. For one-shot callers; loops tag once themselves. */
  private[graft] def bidiReach(edges0: DataFrame, pivot: Long, maxRounds: Int)
      : (DataFrame, DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val (e, eRdds) = TextDedup.localCheckpointTracked(
      bidiTag(edges0).repartition(col("src")))
    try {
      val (f, b, _, distRdds) = bidiReachTagged(e, pivot, maxRounds)
      (f, b, distRdds)
    } finally TextDedup.release(eRdds)
  }

  /** Tagged edges restricted to the active (v, g) partition: the src
    * endpoint contributes its subset id g, and the row survives only if
    * dst sits in the SAME subset — so every downstream join is confined
    * to its subset by the g key alone, and ALL active subsets restrict
    * in one plan. Output (src, dst, dir, g). The checkpointed edge table
    * arrives pre-partitioned on src, so the first join reuses that
    * exchange; active is unique on v (subsets partition the vertices),
    * so the g-attach join cannot fan out. */
  private[graft] def sccSubsetRestrict(e: DataFrame, active: DataFrame): DataFrame =
    e.join(active.select(col("v").as("src"), col("g")), "src")
      .join(active.select(col("v").as("dst"), col("g")), Seq("dst", "g"), "left_semi")

  /** ONE batched trim round of [[sccDecompose]]
    * (q_builder_scc_trim_round gates this COMPOSED with
    * [[sccSubsetRestrict]] — the shape production actually runs):
    * survivors are the vertices with ≥1 in-edge AND ≥1 out-edge inside
    * their own subset's restricted subgraph. A vertex failing either
    * test cannot sit on a cycle, so it is a singleton SCC — trimming it
    * costs two metadata-narrow distinct projections + two equi-joins
    * FOR EVERY ACTIVE SUBSET AT ONCE, against the alternative of a full
    * forward+backward reachability pass per singleton (the classic
    * FW-BW degeneracy on DAG-shaped remainders: n singletons would take
    * n pivot recursions without this peel). Vertex ids are globally
    * unique across subsets, so v alone keys the survivor joins; g rides
    * through from `active`. */
  private[graft] def sccTrimRound(eA: DataFrame, active: DataFrame): DataFrame =
    active.join(eA.select(col("src").as("v")).distinct(), "v")
      .join(eA.select(col("dst").as("v")).distinct(), "v")

  /** ONE batched bidirectional reachability round over (v, dir, g, dist)
    * state (q_builder_scc_reach_round): [[bidiRelax]] with the subset id
    * g riding both the join key and the MIN group — every active
    * subset's forward AND backward frontier advances in ONE join + ONE
    * map-side-combinable MIN per round. The g key confines each
    * expansion to its own subset (the restricted edges carry g), so no
    * cross-subset leakage is possible by construction. */
  private[graft] def sccReachRound(eA: DataFrame, dist: DataFrame): DataFrame =
    dist.unionByName(
        eA.join(dist.select(col("v").as("src"), col("dir"), col("g"), col("dist")),
            Seq("src", "dir", "g"))
          .select(col("dst").as("v"), col("dir"), col("g"), (col("dist") + 1L).as("dist")))
      .groupBy("v", "dir", "g").agg(min("dist").as("dist"))

  /** Instrumentation of one [[sccDecompose]] run — what the depth pins
    * in GraphProfilingSpec read. `pivots` counts pivoted subsets
    * (summed across super-rounds), `superRounds` the outer driver
    * iterations, `trimRounds`/`reachRounds` the total peel and
    * relaxation rounds — reachRounds is where batching shows:
    * independent subsets in the same super-round share one fixpoint, so
    * the total is Σ_superround max(subset depths), not Σ subsets. */
  final case class SccStats(
      pivots: Int, superRounds: Int, trimRounds: Int, reachRounds: Int)

  /** Full strongly-connected-components decomposition — the recursive
    * FW-BW divide-and-conquer (Fleischer, Hendrickson & Pınar), with
    * the recursion's independent subsets BATCHED: instead of a driver
    * worklist processing one vertex subset at a time (Σ per-subset
    * fixpoints of wall clock), the state is ONE (v, g) table — g = the
    * subset id, unique because subsets partition the vertices and g is
    * the fragment's minimum vertex — and every phase runs ALL active
    * subsets in one plan per round. Returns ((v, scc_id) for EVERY
    * input vertex — scc_id = the minimum id in the vertex's SCC — plus
    * the [[SccStats]] the depth pins read).
    *
    * Per super-round over the active table:
    *   1. TRIM to fixpoint: peel vertices with no in- or no out-edge
    *      inside their subset ([[sccSubsetRestrict]] + [[sccTrimRound]],
    *      all subsets at once). Each non-fixpoint round strictly shrinks
    *      the active count, so the loop provably terminates — no cap
    *      (ADVICE r11: a capped peel on a deep DAG remainder burned one
    *      pivot recursion per surviving vertex). Peeled vertices emit as
    *      singleton SCCs. This keeps recursion depth a property of the
    *      CONDENSATION, not the vertex count: DAG-shaped remainders (at
    *      web scale, the vast majority of a link graph) drain here in
    *      O(diameter) cheap rounds.
    *   2. PIVOT, all subsets at once: per-subset pivot = min(v),
    *      computed as one groupBy — subsets that trimmed down to one
    *      vertex (self-loop survivors) emit directly, costing no pivot.
    *      The seed table holds every pivoted subset's (pivot, dir∈{0,1})
    *      rows, and ONE (count, sum) fixpoint over [[sccReachRound]]
    *      advances every subset's F and B together — a subset that
    *      converged early relaxes idempotently while deeper ones finish,
    *      so the round count is max(subset depths), not their sum.
    *      SCC = F ∩ B per subset emits with scc_id = pivot (the subset
    *      minimum, hence its SCC's minimum — the closed-form min-id
    *      label). The three remainders F∖B, B∖F, V∖(F∪B) — none of
    *      which can hold an SCC spanning into another — re-key to their
    *      own minima (one groupBy) and become the next round's active
    *      table. No driver-side pivot VALUES ever collect: seeds, labels
    *      and re-keys all stay in-plan; the only driver actions are the
    *      per-round counts and the fixpoint probes.
    *
    * Memory discipline: every state table is localCheckpoint'ed and
    * released as soon as nothing reads it; emitted fragments' blocks are
    * leased to the consuming query (the [[ssspWithRounds]] convention);
    * ANY throw (fixpoint failure, job error) releases everything before
    * propagating (ADVICE r11 — the sequential form leaked on the
    * non-maxPivots throw paths). Fails loudly past `maxPivots` — a
    * silent cap would emit unlabeled vertices. */
  private[graft] def sccDecompose(
      edges0: DataFrame, vertices0: DataFrame, maxPivots: Int,
      reachRounds: Int = 64): (DataFrame, SccStats) = {
    import scala.collection.mutable
    type Tracked = (DataFrame, Seq[org.apache.spark.rdd.RDD[_]])
    // tagged ONCE: dir=0 original orientation (trim reads this half),
    // dir=1 reversed (the backward leg of every bidi pass) — re-tagging
    // per pivot was measured as the dominant fixed cost of the pre-r11
    // two-loop form. Partitioned on src ALONE: HashPartitioning(src)
    // satisfies the reach join's ClusteredDistribution(src, dir, g)
    // (subset rule) AND the restrict's src-keyed g-attach join — a
    // compound partitioning would satisfy only the former and force a
    // re-exchange per trim round
    val (edges, edgesRdds) = TextDedup.localCheckpointTracked(
      bidiTag(edges0.toDF("src", "dst")).repartition(col("src")))
    val pieces = mutable.ListBuffer.empty[Tracked]
    def emit(df: DataFrame): Unit =
      pieces += TextDedup.localCheckpointTracked(df.toDF("v", "scc_id"))
    // temp state blocks (sizes, reach state) the catch must free if a
    // throw lands between their creation and their normal-path release —
    // the pre-r12b form leaked exactly these on a mid-pivot throw
    var scratch: List[Seq[org.apache.spark.rdd.RDD[_]]] = Nil
    // initial state: every vertex in one subset (g constant; g is only a
    // GROUPING key — fragment re-keys assign real minima from round 2 on);
    // lazy — the n count below is the materializing action
    var (active, activeRdds) = TextDedup.localCheckpointLazyTracked(
      vertices0.toDF("v").select(col("v"), lit(0L).as("g")))
    var eA: DataFrame = null
    var eARdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    // installs the new (lazily-checkpointed) restricted edge table under
    // the outer catch's tracking and RETURNS the old one's blocks — the
    // caller releases them only after an action has materialized the
    // new table (which reads the old one; lazy-checkpoint ordering)
    def swapEa(t: Tracked): Seq[org.apache.spark.rdd.RDD[_]] = {
      val old = if (eA ne null) eARdds else Nil
      eA = t._1; eARdds = t._2
      old
    }
    var pivots = 0
    var superRounds = 0
    var trimRounds = 0
    var reachTotal = 0
    var n = active.count()
    // start-of-super-round active snapshot, held across the trim loop for
    // the once-per-round peel emit; released (and cleared) as soon as the
    // emit lands, and by the catch block if a round throws mid-trim
    var startRdds: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    try {
      while (n > 0) {
        superRounds += 1
        // ---- trim ALL subsets to their ≥1-in/≥1-out cores, to fixpoint ----
        // peeled vertices are emitted ONCE per super-round (start-of-round
        // active ∖ final core) — one checkpoint job instead of one per
        // peel round; the start snapshot's blocks are held until then
        val activeStart = active
        startRdds = activeRdds
        val nStart = n
        var atFixpoint = false
        while (n > 0 && !atFixpoint) {
          // rounds > 1 restrict the PREVIOUS restricted table (edges
          // within core ⊆ edges within active — same result, smaller
          // join input than re-restricting the full edge table). Both
          // checkpoints are LAZY and the core count materializes them
          // together — one driver job per trim round instead of three;
          // the old eA is swapped out (and released) only after that
          // count has landed, per the lazy-checkpoint ordering rule.
          val eaT = TextDedup.localCheckpointLazyTracked(
            sccSubsetRestrict(if (eA eq null) edges else eA.drop("g"), active))
          val oldEa = swapEa(eaT) // eA (new) now under the outer catch
          val (core, coreRdds) = TextDedup.localCheckpointLazyTracked(
            sccTrimRound(eA.filter(col("dir") === 0), active))
          val m =
            try core.count()
            catch { case t: Throwable =>
              TextDedup.release(coreRdds); TextDedup.release(oldEa); throw t
            }
          TextDedup.release(oldEa)
          trimRounds += 1
          if (m == n) { TextDedup.release(coreRdds); atFixpoint = true }
          else {
            if (active ne activeStart) TextDedup.release(activeRdds)
            active = core; activeRdds = coreRdds; n = m
          }
        }
        if (n < nStart)
          emit(activeStart.join(active, Seq("v"), "left_anti")
            .select(col("v"), col("v").as("scc_id")))
        if (active ne activeStart) TextDedup.release(startRdds)
        startRdds = Nil
        if (n > 0) {
          // ---- per-subset pivot metadata: one groupBy, no collect ----
          // (lazy checkpoint: the size-1 emit's eager job materializes
          // it; the blocks ride `scratch` until the normal-path release
          // so a throw anywhere in the pivot phase frees them)
          val (sizes, sizesRdds) = TextDedup.localCheckpointLazyTracked(
            active.groupBy("g")
              .agg(min("v").as("p"), count(lit(1)).as("cnt")))
          scratch ::= sizesRdds
          // size-1 survivors (self-loop singletons) are their own SCC —
          // emitted without costing a pivot, as the sequential form did
          emit(active.join(sizes.filter(col("cnt") === 1).select("g"),
              Seq("g"), "left_semi")
            .select(col("v"), col("v").as("scc_id")))
          val multi = sizes.filter(col("cnt") > 1)
          val nPiv = multi.count()
          pivots += nPiv.toInt
          if (pivots > maxPivots)
            throw new IllegalStateException(
              s"scc decomposition exceeded $maxPivots pivot recursions — " +
                "condensation larger than expected, or trim is not draining")
          if (nPiv == 0) {
            TextDedup.release(sizesRdds)
            scratch = scratch.filterNot(_ eq sizesRdds)
            n = 0
          } else {
            // ---- one batched bidi fixpoint over every pivoted subset ----
            val seed = multi.select(
              col("p").as("v"),
              explode(array(lit(0), lit(1))).as("dir"),
              col("g"), lit(0L).as("dist"))
            val (st, rr, stRdds) = fixpointLoop(
              seed, sccReachRound(eA, _), reachRounds,
              "scc batched bidirectional reachability")
            scratch ::= stRdds
            reachTotal += rr
            val f = st.filter(col("dir") === 0).select("v", "g")
            val b = st.filter(col("dir") === 1).select("v", "g")
            // v is globally unique across subsets, so v alone keys the
            // F/B set algebra; g rides through for the re-key groupBy
            emit(f.join(b.select("v"), Seq("v"), "left_semi")
              .join(sizes.select(col("g"), col("p")), "g")
              .select(col("v"), col("p").as("scc_id")))
            val rem = f.join(b.select("v"), Seq("v"), "left_anti")
              .withColumn("br", lit(1))
              .unionByName(b.join(f.select("v"), Seq("v"), "left_anti")
                .withColumn("br", lit(2)))
              .unionByName(active
                .join(multi.select("g"), Seq("g"), "left_semi")
                .join(st.select("v"), Seq("v"), "left_anti")
                .withColumn("br", lit(3)))
            // re-key each fragment to its own minimum vertex — globally
            // unique because the fragments partition the surviving set
            val next = rem
              .join(rem.groupBy("g", "br").agg(min("v").as("ng")), Seq("g", "br"))
              .select(col("v"), col("ng").as("g"))
            // lazy: the count materializes nextA, and only THEN may the
            // state tables it reads (st, sizes, the old active) release
            val (nextA, nextARdds) = TextDedup.localCheckpointLazyTracked(next)
            n = nextA.count()
            TextDedup.release(stRdds)
            TextDedup.release(sizesRdds)
            TextDedup.release(activeRdds)
            scratch = scratch.filterNot(r => (r eq stRdds) || (r eq sizesRdds))
            active = nextA; activeRdds = nextARdds
          }
        }
      }
    } catch {
      case t: Throwable =>
        TextDedup.release(activeRdds)
        if (startRdds.nonEmpty && (startRdds ne activeRdds))
          TextDedup.release(startRdds)
        if (eA ne null) TextDedup.release(eARdds)
        scratch.foreach(TextDedup.release)
        pieces.foreach(p => TextDedup.release(p._2))
        TextDedup.release(edgesRdds)
        throw t
    }
    TextDedup.release(activeRdds)
    if (eA ne null) TextDedup.release(eARdds)
    TextDedup.release(edgesRdds)
    val stats = SccStats(pivots, superRounds, trimRounds, reachTotal)
    if (pieces.isEmpty)
      (vertices0.toDF("v").select(col("v"), col("v").as("scc_id")), stats)
    else {
      val out = pieces.map(_._1).reduce(_.unionByName(_))
      pieces.foreach(_._2.foreach(graft.ops.Caches.leaseRdd))
      (out, stats)
    }
  }

  /** The crafted multi-SCC digraph for [[graphScc]] ([[sccEdges]]'
    * convention — everything derives from the documents ids). Families:
    *   - three disjoint directed cycles: evens 0–4, evens 8–12, evens
    *     16–20 (chain i → i+2 plus one back edge hi → lo each) — the
    *     ≥3 nontrivial SCCs. 3-vertex cycles keep every gate tooth of
    *     larger ones while halving the run-to-fixpoint reachability
    *     rounds (the decomposition's cost is round-count × fixed
    *     per-round cost — the longest forward path sets the floor);
    *   - two bridges 4 → 8 and 12 → 16 — the condensation is a chain,
    *     so min-pivot recursion must walk all three cycles (depth 3);
    *   - express 0 → e for every even e outside the cycles (6, 14,
    *     ≥22) — out-only singletons (F ∖ SCC fodder, trim-peeled);
    *   - odd fan-in i → 0 for every odd i — in-only singletons.
    * The bridge/back-edge targets are literals guarded by the id's
    * existence in the table: a doc-id gap breaks a cycle and fails the
    * closed form LOUDLY (labels diverge) instead of dropping rows. */
  private[graft] def sccFullEdges(s: SparkSession, d: String): DataFrame = {
    val ids = graft.Tables.documents(s, d).select("doc_id")
    val evens = ids.filter(col("doc_id") % 2 === 0)
    def cyc(lo: Int, hi: Int): DataFrame = {
      val ev = evens.filter(col("doc_id").between(lo, hi))
      val chain = ev.toDF("src").join(ev.toDF("dst"), expr("dst = src + 2"))
        .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      val back = ids.filter(col("doc_id") === hi)
        .select(col("doc_id").cast("long").as("src"), lit(lo.toLong).as("dst"))
      chain.unionByName(back)
    }
    def bridge(from: Int, to: Int): DataFrame =
      ids.filter(col("doc_id") === from)
        .select(col("doc_id").cast("long").as("src"), lit(to.toLong).as("dst"))
    val express = evens
      .filter(col("doc_id") === 6 || col("doc_id") === 14 || col("doc_id") >= 22)
      .select(lit(0L).as("src"), col("doc_id").cast("long").as("dst"))
    val oddIn = ids.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").cast("long").as("src"), lit(0L).as("dst"))
    cyc(0, 4).unionByName(cyc(8, 12)).unionByName(cyc(16, 20))
      .unionByName(bridge(4, 8)).unionByName(bridge(12, 16))
      .unionByName(express).unionByName(oddIn)
  }

  /** ALL strongly connected components — the complete decomposition a
    * user asking "which docs are mutually linked?" actually wants
    * (q_graph_scc_pivot answers it for ONE pivot; this labels every
    * vertex). Runs [[sccDecompose]] over [[sccFullEdges]]' three-cycle
    * chain condensation; the closed-form oracle is derivable because
    * the topology is a function of doc_id: min-id labels are 0 / 8 /
    * 16 for the cycle members and self for every singleton. The gate's
    * teeth: a direction mix-up merges cycle families through the
    * one-way bridges; a trim that over-peels drops cycle members to
    * self-labels; a recursion that stops after one pivot leaves cycles
    * B and C mislabeled — each a loud label divergence. Depth is pinned
    * by GraphProfilingSpec (3 pivots — the condensation chain — plus
    * trim rounds, NEVER one per singleton). */
  val graphScc = QuerySpec(
    "q_graph_scc",
    """SELECT doc_id,
              CAST(CASE
                WHEN doc_id % 2 = 0 AND doc_id <= 4 THEN 0
                WHEN doc_id % 2 = 0 AND doc_id BETWEEN 8 AND 12 THEN 8
                WHEN doc_id % 2 = 0 AND doc_id BETWEEN 16 AND 20 THEN 16
                ELSE doc_id END AS BIGINT) AS scc_id
       FROM documents""") {
    (s, d) =>
      sccLabelsShared(s, d)
        .select(col("v").as("doc_id"), col("scc_id").cast("long").as("scc_id"))
  }

  private val sccMemo = new graft.ops.SessionMemo[String, DataFrame]

  /** Session-shared (v, scc_id) labeling of [[sccFullEdges]] — BOTH
    * consumers ([[graphScc]], [[graphCondense]]) read the same
    * decomposition, so the multi-round driver loop runs once per pass,
    * not once per consumer (the [[landmarkDistances]] convention: memo
    * value backed by its own eager localCheckpoint, NEVER leased — the
    * decomposition's leased piece blocks drain at the harness boundary
    * while this snapshot lives with the session). */
  private[queries] def sccLabelsShared(s: SparkSession, d: String): DataFrame =
    sccMemo.getOrElseUpdate(s, d) {
      val verts = graft.Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("v"))
      sccDecompose(sccFullEdges(s, d), verts, maxPivots = 8)._1.localCheckpoint()
    }

  /** Condensation DAG of the SCC decomposition — the edges BETWEEN
    * components (distinct (scc(src), scc(dst)) pairs with the intra-
    * component self-pairs dropped): the "which clusters feed which"
    * rollup a link-graph pipeline asks right after labeling (topological
    * processing order, upstream-contamination tracing over component
    * granularity, cycle-free downstream scheduling — the condensation
    * is acyclic by construction, which is the whole point of computing
    * it). Runs over the REAL labels from the shared decomposition
    * snapshot; the oracle recomputes the condensation from the
    * closed-form labels over an independent SQL enumeration of the
    * crafted edge families, so a mislabeled cycle member, a dropped
    * bridge, or a direction flip each produce a loud pair diff.
    *
    * Scale shape: two vertex-keyed equi-joins of the edge list onto the
    * |V|-row label table, then a map-side-combinable distinct over the
    * (src_scc, dst_scc) pairs — output is condensation-sized (≤ inter-
    * component edge count), never vertex-sized. */
  val graphCondense = QuerySpec(
    "q_graph_condense",
    """WITH e AS (
          SELECT a.doc_id AS src, b.doc_id AS dst
          FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 2
          WHERE a.doc_id % 2 = 0
            AND (a.doc_id < 4 OR (a.doc_id >= 8 AND a.doc_id < 12)
                 OR (a.doc_id >= 16 AND a.doc_id < 20))
          UNION ALL
          SELECT a.doc_id, b.doc_id
          FROM (SELECT doc_id FROM documents WHERE doc_id IN (4, 12, 20)) a
          JOIN (SELECT doc_id FROM documents WHERE doc_id IN (0, 8, 16)) b
            ON b.doc_id = a.doc_id - 4
          UNION ALL
          SELECT a.doc_id, b.doc_id
          FROM (SELECT doc_id FROM documents WHERE doc_id IN (4, 12)) a
          JOIN (SELECT doc_id FROM documents WHERE doc_id IN (8, 16)) b
            ON b.doc_id = a.doc_id + 4
          UNION ALL
          SELECT z.doc_id, d.doc_id
          FROM (SELECT doc_id FROM documents WHERE doc_id = 0) z
          JOIN (SELECT doc_id FROM documents
                WHERE doc_id % 2 = 0
                  AND (doc_id = 6 OR doc_id = 14 OR doc_id >= 22)) d ON true
          UNION ALL
          SELECT d.doc_id, z.doc_id
          FROM (SELECT doc_id FROM documents WHERE doc_id = 0) z
          JOIN (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d ON true),
        -- labels INLINE as the closed-form CASE on each endpoint (every
        -- endpoint of e is selected from documents, so existence is
        -- already enforced by construction): a lab-table self-join here
        -- makes DuckDB 1.0.0 read `la.scc <> lb.scc` as an inequality
        -- JOIN predicate and reorder into a |V|^2 nested loop
        sel AS (SELECT
            CASE WHEN src % 2 = 0 AND src <= 4 THEN 0
                 WHEN src % 2 = 0 AND src BETWEEN 8 AND 12 THEN 8
                 WHEN src % 2 = 0 AND src BETWEEN 16 AND 20 THEN 16
                 ELSE src END AS src_scc,
            CASE WHEN dst % 2 = 0 AND dst <= 4 THEN 0
                 WHEN dst % 2 = 0 AND dst BETWEEN 8 AND 12 THEN 8
                 WHEN dst % 2 = 0 AND dst BETWEEN 16 AND 20 THEN 16
                 ELSE dst END AS dst_scc
          FROM e)
        SELECT DISTINCT CAST(src_scc AS BIGINT) AS src_scc,
                        CAST(dst_scc AS BIGINT) AS dst_scc
        FROM sel WHERE src_scc <> dst_scc""") {
    (s, d) =>
      val lab = sccLabelsShared(s, d)
      sccFullEdges(s, d)
        .join(lab.toDF("src", "src_scc"), "src")
        .join(lab.toDF("dst", "dst_scc"), "dst")
        .filter(col("src_scc") =!= col("dst_scc"))
        .select(col("src_scc").cast("long").as("src_scc"),
          col("dst_scc").cast("long").as("dst_scc"))
        .distinct()
  }

  // -------------------------------------------------------------------
  // Landmark distance labeling (k sources amortized in ONE loop)
  // -------------------------------------------------------------------

  /** Crafted doubling-tree digraph for [[graphLandmarks]]: i → 2i and
    * i → 2i+1 for every PAIR of ids present in documents (ids ≥ 1; the
    * dst-existence join means a doc-id gap prunes the subtree and fails
    * the closed-form gate loudly, the [[sccEdges]] convention). Every
    * vertex x ≥ 2 has the unique parent x >> 1, so the graph is a tree
    * rooted at 1 and dist(s → x) has a pure-bit-math closed form:
    * bitlen(x) − bitlen(s) iff s is a binary PREFIX of x
    * (x >> (bitlen x − bitlen s) = s), unreachable otherwise. */
  private[graft] def landmarkEdges(s: SparkSession, d: String): DataFrame = {
    val ids = graft.Tables.documents(s, d)
      .select(col("doc_id").cast("long").as("id"))
    val src = ids.filter(col("id") >= 1)
    src.select(col("id").as("src"), (col("id") * 2).as("dst"))
      .unionByName(src.select(col("id").as("src"), (col("id") * 2 + 1).as("dst")))
      .join(ids.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .select("src", "dst")
  }

  /** ONE landmark-BFS relaxation round over (v, lm, hop) state
    * (q_builder_landmark_round): expand every labeled vertex through its
    * out-edges PER LANDMARK, then MIN-merge with the carried state. The
    * state key is the (vertex, landmark) pair — that is the whole trick:
    * k landmarks ride one synchronous loop as k interleaved label sets,
    * one edge join + one map-side-combinable MIN per round, instead of k
    * separate traversals re-scanning the edge table k times. */
  private[graft] def landmarkRound(e: DataFrame, dist: DataFrame): DataFrame =
    dist.unionByName(
        e.join(dist.select(col("v").as("src"), col("lm"), col("hop")), "src")
          .select(col("dst").as("v"), col("lm"), (col("hop") + 1).as("hop")))
      .groupBy("v", "lm").agg(min("hop").as("hop"))

  /** Landmark distance labeling — the Eppstein–Wang / landmark-embedding
    * primitive (closeness and distance ESTIMATES for all n vertices from
    * k ≪ n exact single-source distance sets): exact hop distances from
    * the landmark set {1, 2, 3} to every reachable vertex of the crafted
    * doubling tree, all landmarks in ONE loop (see [[landmarkRound]]).
    * Output is one row per REACHED (vertex, landmark) pair — landmark 1
    * reaches everything; 2 and 3 reach their binary-prefix subtrees —
    * against the closed-form bit-math oracle.
    *
    * Round count is not probed but PROVEN: the tree's depth is
    * bitlen(maxId) − 1, computed from one metadata-sized max() collect,
    * so the loop runs exactly the rounds the longest path needs (the
    * fixpoint probes q_graph_sssp pays for are unnecessary when the
    * diameter is known — at web scale you know it from the landmark
    * construction). Per-round state is ≤ k·n narrow rows, checkpointed
    * with the block-release discipline of the other iterative loops.
    * Scale: state shuffles carry (v, lm, hop) longs only; the edge table
    * is checkpointed once pre-partitioned on src and never re-exchanges;
    * rounds grow with log(diameter-bounded id range), not data. */
  val graphLandmarks = QuerySpec(
    "q_graph_landmarks",
    """WITH lm AS (SELECT doc_id AS landmark FROM documents WHERE doc_id IN (1, 2, 3))
       SELECT x.doc_id, l.landmark,
              CAST(length(bin(x.doc_id)) - length(bin(l.landmark)) AS BIGINT) AS dist
       FROM (SELECT doc_id FROM documents WHERE doc_id >= 1) x
       JOIN lm l
         ON (x.doc_id >> (length(bin(x.doc_id)) - length(bin(l.landmark)))) = l.landmark""") {
    (s, d) => landmarkDistances(s, d)
  }

  private val lmMemo = new graft.ops.SessionMemo[String, DataFrame]

  /** The landmark-BFS loop body, session-memoized per sf dir — BOTH
    * consumers ([[graphLandmarks]], [[graphCloseness]]) read the same
    * (doc_id, landmark, dist) snapshot, so the 8–12-round loop runs
    * once per pass, not once per consumer. The memo value's checkpoint
    * blocks are NEVER leased (the harness' per-query Caches.drain would
    * strand a leased snapshot mid-memo — the SessionMemo hazard); they
    * die with the session or the memo's eviction. */
  private[queries] def landmarkDistances(s: SparkSession, d: String): DataFrame =
    lmMemo.getOrElseUpdate(s, d)(landmarkDistancesFresh(s, d))

  /** The un-memoized loop ([[landmarkDistances]] builds this once). */
  private[graft] def landmarkDistancesFresh(s: SparkSession, d: String): DataFrame = {
    val (e, edgeRdds) = TextDedup.localCheckpointTracked(
      landmarkEdges(s, d).repartition(col("src")))
    val ids = graft.Tables.documents(s, d)
      .select(col("doc_id").cast("long").as("v"))
    val maxId = ids.agg(coalesce(max("v"), lit(1L))).head().getLong(0)
    val rounds = math.max(63 - java.lang.Long.numberOfLeadingZeros(math.max(maxId, 1L)), 1)
    var (dist, distRdds) = TextDedup.localCheckpointTracked(
      ids.filter(col("v").isin(1L, 2L, 3L))
        .select(col("v"), col("v").as("lm"), lit(0L).as("hop")))
    // a round that throws must not strand the edge/state blocks for the
    // session (ADVICE r11) — release everything before propagating
    try {
      for (i <- 1 to rounds) {
        val (next, nextRdds) = TextDedup.localCheckpointTracked(landmarkRound(e, dist))
        TextDedup.release(distRdds)
        dist = next
        distRdds = nextRdds
      }
    } catch {
      case t: Throwable =>
        TextDedup.release(distRdds)
        TextDedup.release(edgeRdds)
        throw t
    }
    TextDedup.release(edgeRdds)
    dist.select(col("v").as("doc_id"), col("lm").as("landmark"),
      col("hop").cast("long").as("dist"))
  }

  /** Materializes the session-shared landmark and SCC-label snapshots
    * so the alphabetically-first consumers (q_graph_closeness,
    * q_graph_condense) are not billed for the multi-round loops — the
    * Bench prewarm convention. */
  def prewarmShared(s: SparkSession, d: String): Unit = {
    landmarkDistances(s, d).count()
    sccLabelsShared(s, d).count()
    ()
  }

  /** Closeness centrality of the landmarks — the estimate the labeling
    * exists to produce (Eppstein–Wang: k exact single-source distance
    * sets → centrality estimates): per landmark, reached-vertex count,
    * total distance, and integer-ppm closeness (n_reached − 1) · 10⁶ /
    * Σdist over the reached set (self excluded by its zero distance;
    * landmarks reaching nothing but themselves report 0, guarded
    * identically in both engines). One map-side-combinable rollup of
    * the ≤ k·n labeling — the whole query after the shared loop runs
    * on k rows. */
  val graphCloseness = QuerySpec(
    "q_graph_closeness",
    """WITH lm AS (SELECT doc_id AS landmark FROM documents WHERE doc_id IN (1, 2, 3)),
        dd AS (SELECT x.doc_id, l.landmark,
                      CAST(length(bin(x.doc_id)) - length(bin(l.landmark)) AS BIGINT) AS dist
               FROM (SELECT doc_id FROM documents WHERE doc_id >= 1) x
               JOIN lm l
                 ON (x.doc_id >> (length(bin(x.doc_id)) - length(bin(l.landmark)))) = l.landmark)
        SELECT landmark,
               CAST(count(*) AS BIGINT) AS n_reached,
               CAST(sum(dist) AS BIGINT) AS total_dist,
               CAST(CASE WHEN sum(dist) = 0 THEN 0
                         ELSE (count(*) - 1) * 1000000 // sum(dist) END AS BIGINT)
                 AS closeness_ppm
        FROM dd GROUP BY 1""") {
    (s, d) =>
      landmarkDistances(s, d)
        .groupBy("landmark")
        .agg(count(lit(1)).cast("long").as("n_reached"),
          sum("dist").cast("long").as("total_dist"))
        .select(col("landmark"), col("n_reached"), col("total_dist"),
          when(col("total_dist") === 0L, 0L)
            .otherwise(expr("(n_reached - 1) * 1000000 div total_dist"))
            .cast("long").as("closeness_ppm"))
  }

  /** Landmark eccentricity — the other estimate the Eppstein–Wang
    * labeling exists to produce (alongside [[graphCloseness]]): per
    * landmark, the FORWARD eccentricity over its reached set (max hop
    * distance) and how many vertices sit on that frontier; the max of
    * `ecc` over the landmark set is the standard landmark lower bound
    * on the graph's directed diameter. Third consumer of the
    * session-shared [[landmarkDistances]] snapshot, so the whole query
    * is one map-side-combinable MAX over the ≤ k·n labeling plus a
    * k-row broadcast argmax join back — nothing here re-runs the loop
    * or grows with data beyond the labeling itself. */
  val graphEccentricity = QuerySpec(
    "q_graph_eccentricity",
    """WITH lm AS (SELECT doc_id AS landmark FROM documents WHERE doc_id IN (1, 2, 3)),
        dd AS (SELECT x.doc_id, l.landmark,
                      CAST(length(bin(x.doc_id)) - length(bin(l.landmark)) AS BIGINT) AS dist
               FROM (SELECT doc_id FROM documents WHERE doc_id >= 1) x
               JOIN lm l
                 ON (x.doc_id >> (length(bin(x.doc_id)) - length(bin(l.landmark)))) = l.landmark),
        m AS (SELECT landmark, max(dist) AS ecc FROM dd GROUP BY 1)
        SELECT m.landmark, CAST(m.ecc AS BIGINT) AS ecc,
               CAST(count(*) AS BIGINT) AS n_at_ecc
        FROM dd JOIN m ON dd.landmark = m.landmark AND dd.dist = m.ecc
        GROUP BY 1, 2""") {
    (s, d) =>
      val dd = landmarkDistances(s, d)
      val m = dd.groupBy("landmark").agg(max("dist").as("ecc"))
      dd.join(broadcast(m), Seq("landmark"))
        .filter(col("dist") === col("ecc"))
        .groupBy("landmark", "ecc")
        .agg(count(lit(1)).cast("long").as("n_at_ecc"))
        .select(col("landmark"), col("ecc").cast("long").as("ecc"),
          col("n_at_ecc"))
  }

  // -------------------------------------------------------------------
  // Sampled-source stress centrality (Brandes two-phase, integer form)
  // -------------------------------------------------------------------

  /** Crafted "butterfly" DAG for [[graphStress]]: vertex set is the doc
    * ids in [1, 2^K) where K = bitlen(maxId + 1) − 1 (the largest FULL
    * level structure the table holds — a partial top level would give
    * the boundary vertices irregular successor sets and no closed
    * form), and every vertex c ≥ 2 has exactly the preds c>>1 and
    * (c>>1)⊕1 (the tree parent and its sibling; for c ∈ {2, 3} the
    * sibling would be 0, which is not a vertex). All edges run level
    * j → j+1 (level = bitlen), so every edge lies on a shortest path
    * from any source that reaches its src — the property that makes the
    * dependency phase a pure DAG accumulation with no tightness filter.
    * Src existence is enforced by semi-join against the ids table (the
    * [[ssspEdges]] convention): an id gap prunes real paths and fails
    * the closed-form gate loudly instead of silently shifting counts. */
  private[graft] def butterflyEdges(ids: DataFrame, twoK: Long): DataFrame = {
    val v = ids.select(col("id")).filter(col("id") >= 1 && col("id") < twoK)
    val dsts = v.filter(col("id") >= 2).select(col("id").as("dst"))
    dsts.select(expr("shiftright(dst, 1)").as("src"), col("dst"))
      .unionByName(
        dsts.filter(expr("(shiftright(dst, 1) ^ 1)") >= 1)
          .select(expr("(shiftright(dst, 1) ^ 1)").as("src"), col("dst")))
      .join(v.select(col("id").as("src")), Seq("src"), "left_semi")
  }

  /** Stress centrality of every vertex w.r.t. a sampled source set —
    * Brandes' two-phase algorithm (forward path counting + backward
    * dependency accumulation) in its STRESS variant (Shimbel's count of
    * shortest paths THROUGH a vertex, i.e. betweenness without the
    * 1/σ_st normalization), which keeps every intermediate an exact
    * integer so the DuckDB twin can gate it bit-for-bit — the same
    * reason the suite's closeness is landmark-based (Eppstein–Wang)
    * rather than exact-all-pairs.
    *
    * Phase 1 (forward): the k sources ride ONE (v, s)-keyed
    * level-synchronous loop (the [[landmarkRound]] amortization), each
    * round one edge equi-join on src plus one map-side-combinable SUM —
    * because the DAG is strictly leveled, each (v, s) pair is produced
    * by exactly one round, so the frontier IS the round's output and no
    * MIN-merge with carried state is needed. σ(v, s) = number of
    * shortest s→v paths.
    *
    * Phase 2 (backward): h(v, s) = number of DAG paths of length ≥ 1
    * starting at v within source s's shortest-path DAG, via the
    * recurrence h(v) = Σ_{(v,w)} (1 + h(w)) iterated depth times — the
    * integer-form dependency accumulation (Brandes' δ has a σ_v/σ_w
    * division; stress multiplies AFTER aggregation instead:
    * through-paths(v, s) = σ(v, s) · h(v, s)). The per-round join keys
    * the edge dst against the (v, s) state, and restricting to pairs
    * REACHED in phase 1 is exactly the per-source DAG restriction (all
    * edges are tight, so reachability is the only filter).
    *
    * Round count is PROVEN, not probed: both phases need exactly K − 1
    * rounds (K = bitlen from one metadata-sized max() — the
    * [[graphLandmarks]] convention). State is ≤ k·n narrow integer
    * rows; per-round shuffles carry (v, s, long) only; the edge table
    * is checkpointed once. Scale: rounds grow with graph DEPTH, state
    * with k·|V| — at web scale k is the sampling budget (Brandes–Pich
    * style source sampling) and the loop is the same plan at any |V|. */
  /** ONE forward σ round (q_builder_stress_sigma_round): expand the
    * level frontier through its out-edges per source and SUM the path
    * counts arriving at each (dst, s) — strictly-leveled DAGs need no
    * MIN-merge with carried state. */
  private[graft] def stressSigmaRound(e: DataFrame, frontier: DataFrame): DataFrame =
    e.join(frontier.select(col("v").as("src"), col("s"), col("sigma")), "src")
      .groupBy(col("dst"), col("s")).agg(sum("sigma").as("sigma"))
      .select(col("dst").as("v"), col("s"), col("sigma"))

  /** ONE backward dependency round (q_builder_stress_h_round):
    * h(v, s) = Σ_{(v,w)} (1 + h(w, s)) over successors reached from s,
    * re-anchored on the reached pair set so sink vertices keep their
    * zero row and unreached (v, s) pairs never enter the state. */
  private[graft] def stressHRound(e: DataFrame, pairs: DataFrame, h: DataFrame): DataFrame = {
    val contrib = e
      .join(h.select(col("v").as("dst"), col("s"), col("h")), "dst")
      .groupBy(col("src"), col("s")).agg(sum(col("h") + lit(1L)).as("hs"))
    pairs.join(contrib.select(col("src").as("v"), col("s"), col("hs")),
        Seq("v", "s"), "left")
      .select(col("v"), col("s"), coalesce(col("hs"), lit(0L)).as("h"))
  }

  private[graft] def stressOf(ids0: DataFrame, sources: Seq[Long]): DataFrame = {
    val ids = ids0.select(col("id").cast("long").as("id"))
    val maxId = ids.agg(coalesce(max("id"), lit(1L))).head().getLong(0)
    val k = math.max(63 - java.lang.Long.numberOfLeadingZeros(maxId + 1), 2)
    val twoK = 1L << k
    val tracked = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.rdd.RDD[_]]
    // LAZY checkpoints throughout (r12): the loop runs no actions and
    // releases nothing mid-flight (every round feeds the final join),
    // so the TERMINAL query action materializes all 2(K−1) rounds in
    // ONE driver job — the checkpoint still caps plan depth per round,
    // but no per-round materialization barrier exists at all
    def ckpt(df: DataFrame): DataFrame = {
      val (out, rdds) = TextDedup.localCheckpointLazyTracked(df)
      tracked ++= rdds
      out
    }
    try {
      val e = ckpt(butterflyEdges(ids, twoK).repartition(col("src")))
      // ---- phase 1: σ path counts, all sources in one keyed loop ----
      val seed = ckpt(
        ids.filter(col("id").isin(sources: _*) && col("id") < twoK)
          .select(col("id").as("v"), col("id").as("s"), lit(1L).as("sigma")))
      val levels = scala.collection.mutable.ArrayBuffer[DataFrame](seed)
      var frontier = seed
      for (_ <- 1 until k) {
        frontier = ckpt(stressSigmaRound(e, frontier))
        levels += frontier
      }
      val reached = levels.reduce(_ unionByName _)
      // ---- phase 2: h dependency accumulation over the reached DAG ----
      val pairs = reached.select("v", "s")
      var h = ckpt(pairs.withColumn("h", lit(0L)))
      for (_ <- 1 until k)
        h = ckpt(stressHRound(e, pairs, h))
      val out = reached.join(h, Seq("v", "s"))
        .filter(col("v") =!= col("s"))
        .groupBy("v").agg(sum(col("sigma") * col("h")).as("stress"))
        .select(col("v").cast("long").as("doc_id"),
          col("stress").cast("long").as("stress"))
      tracked.foreach(graft.ops.Caches.leaseRdd)
      out
    } catch {
      case t: Throwable =>
        TextDedup.release(tracked.toSeq)
        throw t
    }
  }

  /** Sampled-source stress centrality over the crafted butterfly DAG,
    * sources {1, 2, 3} (the [[graphLandmarks]] landmark set). Closed
    * form: every level-j vertex has σ = 2^{j−2} paths from source 1
    * (each level past 2 doubles the pred count) and 2^{j−3} from each
    * of sources 2 and 3 (one level less of doubling; {2, 3} themselves
    * are mutually unreachable), while h_j = (4^{K−j+1} − 4) / 3 (every
    * interior vertex has exactly 4 successors, h_j = 4(1 + h_{j+1}),
    * h_K = 0) is source-independent below level 2 — so
    * stress(v at level j) = h_2 for j = 2 and 2^{j−1} · h_j for j ≥ 3,
    * which the oracle evaluates in pure bit math. */
  val graphStress = QuerySpec(
    "q_graph_stress",
    """WITH m AS (SELECT length(bin(max(doc_id) + 1)) - 1 AS K FROM documents),
        v AS (SELECT doc_id AS x, length(bin(doc_id)) AS j, K
              FROM documents, m
              WHERE doc_id >= 2 AND doc_id < (1::BIGINT << K))
        SELECT CAST(x AS BIGINT) AS doc_id,
               CAST((CASE WHEN j = 2 THEN 1 ELSE 1::BIGINT << (j - 1) END)
                    * (((1::BIGINT << (2 * (K - j + 1))) - 4) // 3)
                 AS BIGINT) AS stress
        FROM v""") {
    (s, d) =>
      stressOf(
        graft.Tables.documents(s, d).select(col("doc_id").as("id")),
        Seq(1L, 2L, 3L))
  }

  val specs: Seq[QuerySpec] =
    Seq(kcore, bfsHops, linkPredict, graphAdversarial, graphSssp, pprSeed,
      graphSccPivot, graphScc, graphCondense, graphLandmarks, graphCloseness,
      graphEccentricity, graphStress)
}
