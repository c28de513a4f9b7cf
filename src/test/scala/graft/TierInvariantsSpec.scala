package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The invariant checkers behind `runMain graft.TierInvariants` — the
  * gate for the ten queries whose DuckDB oracles are intractable at the
  * 10× tier. Two properties per checker family:
  *   1. the REAL query outputs at sf0.001 produce zero violations
  *      (covered wholesale by the main's own run; spot-covered here via
  *      the crafted frames), and
  *   2. the checker is NON-VACUOUS: a planted corruption of the exact
  *      kind the invariant guards must surface as a violation row —
  *      a checker that can never fire is worse than none.
  */
class TierInvariantsSpec extends SparkSpec {
  import spark.implicits._

  // crafted candidate relation: triangle {1,2,3} plus pendant 3-4
  private def cand: DataFrame =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a_id", "b_id")
  private def edges: DataFrame = TierInvariants.symEdges(cand)

  test("bfs checker: clean labeling passes; planted range/parent/relax violations fire") {
    val seeds = Seq(1L).toDF("v")
    val good = Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L)).toDF("doc_id", "hops")
    assert(TierInvariants.bfsViolations(good, edges, seeds, 3).count() === 0)
    // hop 5 exceeds the depth budget AND has no parent at hop 4
    val range = good.unionByName(Seq((9L, 5L)).toDF("doc_id", "hops"))
    val v1 = TierInvariants.bfsViolations(range, edges, seeds, 3)
      .select("violation").as[String].collect().toSet
    assert(v1.contains("hops_out_of_range") && v1.contains("no_parent_at_hops_minus_1"))
    // vertex 4 labeled 3 while its neighbor 3 is labeled 1 → relaxation
    val relax = Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 3L)).toDF("doc_id", "hops")
    assert(TierInvariants.bfsViolations(relax, edges, seeds, 3)
      .filter($"violation" === "edge_relaxation").count() > 0)
    // seed mislabeled
    val seedBad = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L)).toDF("doc_id", "hops")
    assert(TierInvariants.bfsViolations(seedBad, edges, seeds, 3)
      .filter($"violation" === "seed_not_zero").count() === 1)
  }

  test("kcore checker: the twin peel equals kcoreOf output; a dropped row fires") {
    val out = graft.queries.GraphOps.kcoreOf(edges, 2, 3)
    assert(TierInvariants.kcoreViolations(out, edges, 2, 3).count() === 0)
    // the 2-core of triangle+pendant is exactly the triangle at degree 2
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      === Set((1L, 2L), (2L, 2L), (3L, 2L)))
    val dropped = out.filter($"doc_id" =!= 1L)
    assert(TierInvariants.kcoreViolations(dropped, edges, 2, 3)
      .filter($"violation" === "twin_row_missing_in_output").count() === 1)
    val inflated = out.withColumn("core_deg",
      when($"doc_id" === 1L, 7L).otherwise($"core_deg"))
    assert(TierInvariants.kcoreViolations(inflated, edges, 2, 3).count() >= 2)
  }

  test("pagerank checker: mass/floor/partition laws fire on planted corruption") {
    val S = TierInvariants.Scale
    val n = 4L
    val floor = (15L * (S / n)) / 100L
    val good = Seq((1L, S / n), (2L, S / n), (3L, S / n), (4L, floor))
      .toDF("doc_id", "pr")
    assert(TierInvariants.pagerankViolations(good, edges, None).count() === 0)
    val overMass = good.withColumn("pr", $"pr" * 2)
    assert(TierInvariants.pagerankViolations(overMass, edges, None)
      .filter($"violation" === "mass_exceeds_budget").count() === 1)
    val underFloor = good.withColumn("pr",
      when($"doc_id" === 2L, floor - 1).otherwise($"pr"))
    assert(TierInvariants.pagerankViolations(underFloor, edges, None)
      .filter($"violation" === "below_teleport_floor").count() === 1)
    val missing = good.filter($"doc_id" =!= 3L)
    assert(TierInvariants.pagerankViolations(missing, edges, None)
      .filter($"violation" === "vertex_missing").count() === 1)
    // ppr: vertex 9 isolated non-seed (self-edge only graph) must be 0
    val loneEdges = Seq((9L, 9L)).toDF("src", "dst")
    val ppr = Seq((9L, 5L)).toDF("doc_id", "pr")
    // 9 has an in-edge (its self-loop) so the isolated check passes...
    assert(TierInvariants.pprIsolatedViolations(ppr, loneEdges,
      lit(false)).count() === 0)
    // ...but with no in-edges at all it fires
    val noIn = Seq((9L, 10L)).toDF("src", "dst")
    assert(TierInvariants.pprIsolatedViolations(
      Seq((9L, 5L)).toDF("doc_id", "pr"), noIn, lit(false))
      .filter($"violation" === "isolated_nonseed_nonzero").count() === 1)
  }

  test("lpa checker: partition + component-refinement + completeness laws fire") {
    val cc = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (9L, 9L))
      .toDF("doc_id", "cluster_id")
    val good = Seq((1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (9L, 9L, 1L)).toDF("doc_id", "community", "n_members")
    assert(TierInvariants.lpaViolations(good, cc).count() === 0)
    val badSize = good.withColumn("n_members",
      when($"doc_id" === 2L, 9L).otherwise($"n_members"))
    assert(TierInvariants.lpaViolations(badSize, cc)
      .filter($"violation" === "n_members_mismatch").count() === 1)
    // community 1 annexes vertex 9 from ANOTHER component
    val spans = Seq((1L, 1L, 5L), (2L, 1L, 5L), (3L, 1L, 5L), (4L, 1L, 5L),
      (9L, 1L, 5L)).toDF("doc_id", "community", "n_members")
    assert(TierInvariants.lpaViolations(spans, cc)
      .filter($"violation" === "community_spans_components").count() === 1)
    // an output that silently DROPS a graph vertex fires (ADVICE r12)
    assert(TierInvariants.lpaViolations(good.filter($"doc_id" =!= 9L), cc)
      .filter($"violation" === "vertex_missing").count() === 1)
    // ...and one that invents a vertex fires the mirror law
    val invented = good.unionByName(
      Seq((42L, 42L, 1L)).toDF("doc_id", "community", "n_members"))
    assert(TierInvariants.lpaViolations(invented, cc)
      .filter($"violation" === "row_not_a_vertex").count() === 1)
  }

  test("triangle checker: census twin agrees; off-by-one fires") {
    // crafted: triangle+pendant has 1 triangle; wedges = Σ dg(dg−1)/2 =
    // 1+1+3+0 = 5; coeff = 3/5
    val out = Seq((1L, 5L, 0.6)).toDF("n_triangles", "n_wedges", "clustering_coeff")
    assert(TierInvariants.triangleViolations(out, cand).count() === 0)
    val off = Seq((2L, 5L, 1.2)).toDF("n_triangles", "n_wedges", "clustering_coeff")
    assert(TierInvariants.triangleViolations(off, cand).count() === 1)
  }

  test("link-predict checker: formula/order/is_new laws fire") {
    // wedge pairs of triangle+pendant: (1,2) cn=1 via 3 ... compute a
    // couple by hand: N(1)={2,3}, N(2)={1,3}, N(3)={1,2,4}, N(4)={3}
    // distance-2 pairs via middle m: (1,2) m=3, (1,3) m=2, (2,3) m=1,
    // (1,4) m=3, (2,4) m=3
    // degrees: 1→2, 2→2, 3→3, 4→1; (1,2): cn=|{3}|=1, jac=1e6/(2+2−1);
    // (1,4): cn=|{3}|=1, jac=1e6/(2+1−1)
    val good = Seq(
      (1L, 2L, 1L, (1L * 1000000L) / (2L + 2L - 1L), 0L),
      (1L, 4L, 1L, (1L * 1000000L) / (2L + 1L - 1L), 1L))
      .toDF("a_id", "b_id", "n_common", "jaccard_ppm", "is_new")
    assert(TierInvariants.linkPredictViolations(good, cand).count() === 0)
    val wrongNew = good.withColumn("is_new", lit(1L) - $"is_new")
    assert(TierInvariants.linkPredictViolations(wrongNew, cand).count() === 2)
    val wrongJac = good.withColumn("jaccard_ppm", $"jaccard_ppm" + 1)
    assert(TierInvariants.linkPredictViolations(wrongJac, cand).count() === 2)
    val excess = good.withColumn("n_common", lit(99L))
    assert(TierInvariants.linkPredictViolations(excess, cand).count() === 2)
    // a fabricated pair referencing an id absent from the graph must
    // FLAG, not vanish through an inner degree join (ADVICE r12)
    val alien = good.unionByName(Seq((1L, 99L, 1L, 500000L, 1L))
      .toDF("a_id", "b_id", "n_common", "jaccard_ppm", "is_new"))
    assert(TierInvariants.linkPredictViolations(alien, cand)
      .filter($"violation" === "endpoint_not_a_vertex").count() === 1)
  }

  test("edit1 checker: full-levenshtein soundness re-verification fires") {
    val names = Seq("abc", "abd", "xyz").toDF("t")
    val good = Seq(("abc", "abd")).toDF("a_name", "b_name")
    assert(TierInvariants.edit1Violations(good, names).count() === 0)
    val far = Seq(("abc", "xyz")).toDF("a_name", "b_name")
    assert(TierInvariants.edit1Violations(far, names)
      .filter($"violation" === "pair_invalid").count() === 1)
    val unordered = Seq(("abd", "abc")).toDF("a_name", "b_name")
    assert(TierInvariants.edit1Violations(unordered, names)
      .filter($"violation" === "pair_invalid").count() === 1)
    val alien = Seq(("abc", "abe")).toDF("a_name", "b_name")
    assert(TierInvariants.edit1Violations(alien, names)
      .filter($"violation" === "name_not_in_vocab").count() === 1)
  }

  test("multimodal checkers: payload-recomputed distances fire on corruption") {
    // the checkers also enforce the query's ≤10% near-dup emission gate
    // (20·l1 ≤ na+nb), so the crafted pair is 21 shared chars + 1 diff:
    // inter=21, l1=2, 20·2 ≤ 44
    val docs = Seq((1L, "aaaaabbbbbcccccdddddx"), (2L, "aaaaabbbbbcccccdddddy"),
      (3L, "zzzz")).toDF("doc_id", "text")
    val good = Seq((1L, 2L, 21L, 21L, 20L, 2L))
      .toDF("a_id", "b_id", "na", "nb", "n_inter", "l1_dist")
    assert(TierInvariants.histdupViolations(good, docs).count() === 0)
    val wrongInter = good.withColumn("n_inter", lit(21L))
    assert(TierInvariants.histdupViolations(wrongInter, docs).count() === 1)
    val wrongLen = good.withColumn("na", lit(5L))
    assert(TierInvariants.histdupViolations(wrongLen, docs).count() === 1)
    // blockhash: same docs; the diff char sits in the last 4-way block
    // on both sides, so block intersection is also 20 → block_l1 = 2
    val goodB = Seq((1L, 2L, 21L, 21L, 2L))
      .toDF("a_id", "b_id", "na", "nb", "block_l1")
    assert(TierInvariants.blockhashViolations(goodB, docs).count() === 0)
    val offB = goodB.withColumn("block_l1", lit(0L))
    assert(TierInvariants.blockhashViolations(offB, docs).count() === 1)
    // a pair referencing a doc id absent from the corpus must FLAG, not
    // vanish through an inner length join (ADVICE r12)
    val alienPair = Seq((1L, 99L, 21L, 4L, 0L, 25L))
      .toDF("a_id", "b_id", "na", "nb", "n_inter", "l1_dist")
    assert(TierInvariants.histdupViolations(alienPair, docs).count() === 1)
    val alienB = Seq((1L, 99L, 21L, 4L, 25L))
      .toDF("a_id", "b_id", "na", "nb", "block_l1")
    assert(TierInvariants.blockhashViolations(alienB, docs).count() === 1)
  }
}
