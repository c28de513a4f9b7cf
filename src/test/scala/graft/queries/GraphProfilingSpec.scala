package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants of the graph-structural and profiling operators on
  * crafted inputs (the oracle queries exercise them only on the synthetic
  * corpus' shallow graphs and uniform streams). */
class GraphProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def sym(es: Seq[(Long, Long)]) =
    (es ++ es.map(_.swap)).toDF("src", "dst")

  test("kcoreOf: triangle with a pendant tail — tail peels, triangle survives at deg 2") {
    // 1-2-3 triangle, tail 3-4-5; the tail is a tree, so iterated
    // 2-core peeling must remove it entirely (5 first, then 4) while the
    // cycle keeps every vertex at within-core degree exactly 2
    val g = sym(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)))
    val out = GraphOps.kcoreOf(g, 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kcoreOf: a pure path has empty 2-core") {
    val g = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(GraphOps.kcoreOf(g, 2, 3).count() === 0L)
  }

  test("adversarial star/chain hybrid: CC exact under degree skew, rounds stay logarithmic") {
    // the q_graph_adversarial topology on the sf0.001 documents table:
    // hub 0 at degree n/2 (worst-case key skew for the dst join) plus a
    // maximum-diameter odd chain (worst case for round count). CC must
    // hit the closed form AND converge in O(log diameter) rounds — a
    // propagate-only loop would need ~n/2 rounds and blow the budget.
    val sf = "/root/testdata/sf0.001"
    val edges = GraphOps.adversarialEdges(spark, sf)
    val n = graft.Tables.documents(spark, sf).count() // 500 ⇒ chain of 250 odds
    val (labels, rounds) = TextDedup.connectedComponentsWithRounds(edges)
    val bad = labels
      .withColumn("expect", when(col("id") % 2 === 0, 0L).otherwise(1L))
      .filter(col("label") =!= col("expect")).count()
    assert(bad === 0L, "CC must reproduce the closed-form components")
    assert(labels.count() === n, "every doc must be labeled")
    val diameter = n / 2 - 1
    val logBound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(diameter)) + 4
    assert(rounds <= logBound,
      s"pointer jumping must stay logarithmic: $rounds rounds for diameter $diameter")
    graft.ops.Caches.drain()
  }

  test("minHops: chain distances are exact and depth-bounded") {
    val g = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val seeds = Seq(0L).toDF("v")
    val out = GraphOps.minHops(g, seeds, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // nodes beyond 3 hops must be ABSENT, not present with a wrong bound
    assert(out === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("minHops: multi-source takes the minimum over seeds") {
    val g = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    val seeds = Seq(0L, 5L).toDF("v")
    val out = GraphOps.minHops(g, seeds, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(0L -> 0L, 1L -> 1L, 2L -> 2L,
      3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("ssspWithRounds: cheapest path beats fewest hops, directedness respected") {
    // 0→3 direct costs 10; 0→1→2→3 costs 3 over 3 hops — the weighted
    // answer (3) differs from what a hop-count BFS would settle on (the
    // 1-hop edge). 4→0 is the ONLY edge into 0's component from 4, and
    // it points TOWARD 0 — so 4 must stay unreachable from source 0
    // (an accidental symmetrization would label it).
    val e = Seq(
      (0L, 3L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (4L, 0L, 1L)
    ).toDF("src", "dst", "w")
    val (dist, rounds) = GraphOps.ssspWithRounds(e, 0L, maxRounds = 10)
    val out = dist.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(rounds <= 4, s"3-hop optimum must fixpoint in ≤4 rounds, got $rounds")
    graft.ops.Caches.drain()
  }

  test("ssspWithRounds: crafted documents topology hits the closed form, rounds bounded") {
    // the q_graph_sssp gate graph on sf0.001: longest cheapest path is
    // the 8-hop head chain to id 16, so the fixpoint must be OBSERVED by
    // round 9 — and the hub neighborhood must take the 10+(i−h)/2 multi-
    // hop path over its 1-hop weight-100 express edge.
    val sf = "/root/testdata/sf0.001"
    val (dist, rounds) = GraphOps.ssspWithRounds(GraphOps.ssspEdges(spark, sf), 0L)
    val n = graft.Tables.documents(spark, sf).count()
    val hub = math.max(18L, 2 * (n / 4))
    val out = dist.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size === (n + 1) / 2, "every even id reachable, no odd id present")
    assert(out(0L) === 0L)
    assert(out(16L) === 8L, "head chain must beat the express edge")
    assert(out(hub) === 10L && out(hub + 12) === 16L,
      "hub paths must beat their 1-hop express edges")
    assert(out(hub - 2) === 100L && out(hub + 14) === 100L,
      "just outside the hub chain the express edge is optimal")
    assert(rounds <= 9, s"8-hop optimum must fixpoint in ≤9 rounds, got $rounds")
    graft.ops.Caches.drain()
  }

  test("scc pivot machinery: F ∩ B keeps only mutual reachability on a crafted digraph") {
    // cycle 0→1→2→0 is the pivot's SCC; 0→3 is forward-only and 4→0
    // backward-only — each must survive exactly ONE pass, so a
    // symmetrized edge table or a botched reversal flips the answer
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 3L), (4L, 0L))
      .toDF("src", "dst").withColumn("w", lit(1L))
    val rev = e.select(col("dst").as("src"), col("src").as("dst"), col("w"))
    val (fwd, _) = GraphOps.ssspWithRounds(e, 0L, maxRounds = 10)
    val (bwd, _) = GraphOps.ssspWithRounds(rev, 0L, maxRounds = 10)
    val f = fwd.collect().map(_.getLong(0)).toSet
    val b = bwd.collect().map(_.getLong(0)).toSet
    assert(f === Set(0L, 1L, 2L, 3L))
    assert(b === Set(0L, 1L, 2L, 4L))
    assert((f intersect b) === Set(0L, 1L, 2L), "SCC(0) is exactly the cycle")
    graft.ops.Caches.drain()
  }

  test("sccDecompose: full decomposition labels every vertex with its SCC's min id") {
    // two cycles joined by a one-way bridge, a DAG tail feeding in, an
    // isolated vertex, and a self-loop — every structural case at once
    val e = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), // cycle A
      (5L, 6L), (6L, 5L),           // cycle B
      (3L, 5L),                     // bridge A→B (one-way)
      (8L, 9L), (9L, 1L),           // DAG tail into A
      (11L, 11L))                   // self-loop singleton
      .toDF("src", "dst")
    val v = Seq(1L, 2L, 3L, 5L, 6L, 8L, 9L, 10L, 11L).toDF("v")
    val (out, stats) = GraphOps.sccDecompose(e, v, maxPivots = 5)
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L,
      8L -> 8L, 9L -> 9L, 10L -> 10L, 11L -> 11L))
    // trim peels the tail + isolate; the self-loop survives trim but is
    // emitted as a size-1 subset without a reachability pass — so only
    // the two cycles cost pivots
    assert(stats.pivots === 2, s"expected 2 pivot recursions, got ${stats.pivots}")
    graft.ops.Caches.drain()
  }

  test("sccDecompose: a pure DAG drains entirely in trim — zero pivot recursions") {
    // the FW-BW degeneracy the trim step exists for: without it, n
    // singletons cost n forward+backward reachability recursions
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    val v = Seq(1L, 2L, 3L, 4L).toDF("v")
    val (out, stats) = GraphOps.sccDecompose(e, v, maxPivots = 1)
    assert(out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    assert(stats.pivots === 0, s"a DAG must never pivot, got ${stats.pivots}")
    graft.ops.Caches.drain()
  }

  test("sccDecompose: recursion depth on the crafted documents topology is the condensation chain") {
    // three cycles bridged into a chain condensation → exactly 3 pivots,
    // regardless of how many express/fan-in singletons surround them
    val d = "/root/testdata/sf0.001"
    val verts = graft.Tables.documents(spark, d)
      .select(col("doc_id").cast("long").as("v"))
    val (out, stats) = GraphOps.sccDecompose(
      GraphOps.sccFullEdges(spark, d), verts, maxPivots = 8)
    assert(stats.pivots === 3,
      s"condensation chain of 3 cycles must pivot 3×, got ${stats.pivots}")
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 500, "every document labeled exactly once")
    (0 to 499).foreach { i =>
      val want =
        if (i % 2 == 0 && i <= 4) 0L
        else if (i % 2 == 0 && i >= 8 && i <= 12) 8L
        else if (i % 2 == 0 && i >= 16 && i <= 20) 16L
        else i.toLong
      assert(labels(i.toLong) === want, s"doc $i")
    }
    graft.ops.Caches.drain()
  }

  test("sccDecompose: independent subsets batch into one fixpoint — max(depths) rounds, not the sum") {
    // a central 2-cycle P={1,2} fed by a 6-cycle B={20..25} (in-bridge
    // 25→1) and feeding a 2-cycle C={40,41} (out-bridge 2→40): pivot 1
    // removes P and leaves TWO independent remainders in the SAME
    // super-round (F∖B = C, B∖F = B). The batched worklist must relax
    // both in ONE keyed fixpoint: super-round 2 costs max(6, 2) = 6
    // reachability rounds, where the r11 sequential worklist paid their
    // sum 6 + 2 = 8. Exact round accounting: super-round 1 converges in
    // 7 (backward depth 6 through the B-cycle chain + 1 probe),
    // super-round 2 in 6 (5 relax rounds around the 6-cycle + 1 probe;
    // C converged by round 1 and relaxes idempotently) — total 13 vs
    // the sequential form's 15
    val e = Seq(
      (20L, 21L), (21L, 22L), (22L, 23L), (23L, 24L), (24L, 25L), (25L, 20L),
      (25L, 1L), (1L, 2L), (2L, 1L), (2L, 40L), (40L, 41L), (41L, 40L))
      .toDF("src", "dst")
    val v = Seq(1L, 2L, 20L, 21L, 22L, 23L, 24L, 25L, 40L, 41L).toDF("v")
    val (out, stats) = GraphOps.sccDecompose(e, v, maxPivots = 3)
    val labels = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 20L -> 20L, 21L -> 20L, 22L -> 20L,
      23L -> 20L, 24L -> 20L, 25L -> 20L, 40L -> 40L, 41L -> 40L))
    assert(stats.pivots === 3, s"three cycles pivot 3×, got ${stats.pivots}")
    assert(stats.superRounds === 2,
      s"B and C must share super-round 2, got ${stats.superRounds}")
    assert(stats.reachRounds === 13,
      s"batched fixpoints must pay 7 + max(6, 2) = 13 rounds, got ${stats.reachRounds}")
    graft.ops.Caches.drain()
  }

  test("pagerankRounds: an empty seed set fails loudly, not with silent null ranks") {
    // `scale div n` at n=0 is NULL on Spark but a div-by-zero ERROR in
    // DuckDB — asymmetric failure modes for the same degenerate input;
    // the guard makes both engines fail the same way, at construction
    val e = sym(Seq((1L, 2L), (2L, 3L)))
    assertThrows[IllegalArgumentException] {
      TextDedup.pagerankRounds(e, Some(lit(false)))
    }
    // a NON-empty seed set still constructs fine through the same path
    assert(TextDedup.pagerankRounds(e, Some(col("doc_id") === 1L)).count() === 3L)
    graft.ops.Caches.drain()
  }

  test("ssspWithRounds: fails loudly when maxRounds cuts relaxation short") {
    val e = Seq((0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    assertThrows[IllegalStateException] {
      GraphOps.ssspWithRounds(e, 0L, maxRounds = 2)
    }
  }

  test("linkageFs: pair count, frequency-derived weights, and decision partition") {
    val sf = "/root/testdata/sf0.001"
    val out = Profiling.linkageFs.fn(spark, sf).cache()
    val cust = graft.Tables.customer(spark, sf)
    val n = cust.count()
    // sorted-neighborhood candidates at offsets {1,2} over N ranked rows:
    // (N−1) + (N−2) pairs, no more, no fewer
    assert(out.count() === 2 * n - 3)
    // recompute the frequency-derived integer log2 weights independently
    def fieldWeight(f: String): Long = {
      val s = cust.groupBy(f).count()
        .agg(sum(expr("count * (count - 1)"))).head().getLong(0)
      val odds = n * (n - 1) / s
      64L - java.lang.Long.numberOfLeadingZeros(odds) // == length(bin(odds))
    }
    val (wNat, wSeg) = (fieldWeight("c_nationkey"), fieldWeight("c_mktsegment"))
    val expected = col("agree_name") * 12 + (lit(1) - col("agree_name")) * -2 +
      col("agree_nation") * wNat + (lit(1) - col("agree_nation")) * -2 +
      col("agree_segment") * wSeg + (lit(1) - col("agree_segment")) * -2 +
      col("agree_balance") * 4 + (lit(1) - col("agree_balance")) * -2
    assert(out.filter(col("score") =!= expected).count() === 0L,
      "score must equal the weighted field-agreement sum")
    val wrongDecision = out.filter(
      col("decision") =!= when(col("score") >= 14, "match")
        .when(col("score") >= 4, "review").otherwise("nonmatch")).count()
    assert(wrongDecision === 0L)
    // the gate is only meaningful if the thresholds actually partition the
    // data into all three classes on the synthetic names
    assert(out.select("decision").distinct().count() === 3L)
    out.unpersist()
    graft.ops.Caches.drain()
  }

  test("pprSeed: mass stays within the 3-hop seed neighborhood, seeds keep their teleport floor") {
    val sf = "/root/testdata/sf0.001"
    val out = GraphOps.pprSeed.fn(spark, sf).cache()
    val scale = 1000000000000L
    val cand = TextDedup.minhashCandShared(spark, sf)
    val e = cand.select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(cand.select(col("b_id").as("src"), col("a_id").as("dst")))
    val seeds = e.select(col("src").as("v")).distinct()
      .filter(col("v") % 17 === 0)
    val ns = seeds.count()
    assert(ns > 0, "seed set must be non-vacuous on the candidate graph")
    // positive rank implies 3-hop reachability from a seed (mass can
    // floor to zero on long chains — the converse does not hold)
    val reach = GraphOps.minHops(e, seeds, 3).select(col("doc_id"))
    assert(out.filter(col("pr") > 0)
      .join(reach, Seq("doc_id"), "left_anti").count() === 0L)
    // every seed keeps at least its final-round teleport share
    val floor = (15L * (scale / ns)) / 100L
    assert(out.join(seeds.toDF("doc_id"), "doc_id")
      .filter(col("pr") < floor).count() === 0L)
    // total mass never exceeds the initial seed mass (teleport + damping
    // only shrink it under integer floors)
    assert(out.agg(sum("pr")).head().getLong(0) <= scale)
    out.unpersist()
    graft.ops.Caches.drain()
  }

  test("erGolden: entities partition the customers, survivorship is consistent") {
    val sf = "/root/testdata/sf0.001"
    val out = Profiling.erGolden.fn(spark, sf).cache()
    val cust = graft.Tables.customer(spark, sf)
    val n = cust.count()
    // entities PARTITION the customer set: member counts sum to N and
    // every entity id is a real custkey (the component minimum)
    assert(out.agg(sum("n_members")).head().getLong(0) === n)
    assert(out.join(cust, out("entity_id") === cust("c_custkey"), "left_anti")
      .count() === 0L, "entity_id must be a member custkey")
    // singleton survivorship is the identity: canonical name and balance
    // are the member's own
    val singles = out.filter(col("n_members") === 1)
      .join(cust, out("entity_id") === cust("c_custkey"))
    assert(singles.filter(col("canon_name") =!= col("c_name")).count() === 0L)
    assert(singles.filter(col("best_cents") =!=
      expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")).count() === 0L)
    assert(singles.filter(col("canon_segment") =!= col("c_mktsegment")).count() === 0L)
    // the match pairs must be non-vacuous and fully absorbed: every
    // matched record sits in a multi-member entity
    val matched = Profiling.linkageFs.fn(spark, sf)
      .filter(col("decision") === "match")
    assert(matched.count() > 0, "gate is vacuous without any match pair")
    val multi = out.filter(col("n_members") >= 2)
    assert(multi.count() > 0)
    out.unpersist()
    graft.ops.Caches.drain()
  }

  test("kanonLdiversity: a crafted homogeneous class is flagged, a diverse one passes") {
    // the synthetic orders table is diverse in every class (the flag is
    // vacuously 1 there — checked below), so the homogeneity-attack
    // detection needs a crafted table: class (1-URGENT, 1995) has ONE
    // status for all 5 members (l=1, top share 100%), class (2-HIGH,
    // 1995) has three statuses over 6 rows
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ldiv").toString
    val ts = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    val rows =
      (1L to 5L).map(i => (i, i, "F", 10.0, ts, "1-URGENT")) ++
        Seq((6L, 6L, "F", 1.0, ts, "2-HIGH"), (7L, 7L, "F", 1.0, ts, "2-HIGH"),
          (8L, 8L, "O", 1.0, ts, "2-HIGH"), (9L, 9L, "O", 1.0, ts, "2-HIGH"),
          (10L, 10L, "O", 1.0, ts, "2-HIGH"), (11L, 11L, "P", 1.0, ts, "2-HIGH"))
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = Profiling.kanonLdiversity.fn(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out("1-URGENT") === ((5L, 1L, 1000000L, 0L)),
      "homogeneous class: l=1, disclosure share 100%, flagged")
    assert(out("2-HIGH") === ((6L, 3L, 500000L, 1L)),
      "diverse class: l=3, top share 3/6, passes")
    // and the real synthetic table must be non-degenerate for the oracle
    val real = Profiling.kanonLdiversity.fn(spark, "/root/testdata/sf0.001")
    assert(real.filter(col("l_distinct") < 2).count() === 0L)
    graft.ops.Caches.drain()
  }

  test("cusumOf: a rate step puts the changepoint exactly at the kink") {
    // 10/day for days 1..10, then 20/day for 11..20: D_i = 20*pfx - i*300
    // is -100i on the left (min -1000 at i=10) and 100i-2000 on the right
    // (|D| <= 900), so the argmax of |D| is day 10 with 1000
    val base = java.sql.Date.valueOf("2024-01-01")
    def day(i: Int) = new java.sql.Date(base.getTime + (i - 1) * 86400000L)
    val dc = ((1 to 10).map(i => ("a", day(i), 10L)) ++
      (11 to 20).map(i => ("a", day(i), 20L))).toDF("event_type", "d", "c")
    val r = Profiling.cusumOf(dc).collect()
    assert(r.length === 1)
    assert(r(0).getAs[java.sql.Date]("cp_day") === day(10))
    assert(r(0).getAs[Long]("max_dev") === 1000L)
    assert(r(0).getAs[Long]("n_days") === 20L)
    assert(r(0).getAs[Long]("total") === 300L)
  }

  test("cusumOf: a uniform series deviates zero and ties break to the earliest day") {
    val base = java.sql.Date.valueOf("2024-03-01")
    def day(i: Int) = new java.sql.Date(base.getTime + (i - 1) * 86400000L)
    val dc = (1 to 5).map(i => ("b", day(i), 7L)).toDF("event_type", "d", "c")
    val r = Profiling.cusumOf(dc).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("max_dev") === 0L)
    assert(r(0).getAs[java.sql.Date]("cp_day") === day(1))
  }

  test("kmvTrailingOf: below sketch capacity the estimate IS the exact count") {
    // 3 days x 5 users each (disjoint) => every trailing window holds
    // <= 15 < k=16 distinct hashes, so the sketch is lossless
    val base = java.sql.Date.valueOf("2024-06-01")
    def day(i: Int) = new java.sql.Date(base.getTime + (i - 1) * 86400000L)
    val du = (for { d <- 1 to 3; u <- 1 to 5 }
      yield (day(d), (d * 100 + u).toLong)).toDF("day", "user_id")
    val out = Profiling.kmvTrailingOf(du, 16).collect()
      .map(r => (r.getAs[java.sql.Date]("day"),
        r.getAs[Long]("est_distinct"), r.getAs[Long]("true_distinct")))
    assert(out.length === 3)
    out.foreach { case (d, est, exact) =>
      assert(est === exact, s"day $d: est $est != exact $exact below capacity")
    }
    // and the windows genuinely accumulate: day3 sees all 15
    assert(out.find(_._1 == day(3)).get._2 === 15L)
  }

  test("kmvTrailingOf: above capacity the estimate is bounded-error, never wild") {
    // one day with 400 distinct users: k=16 KMV has relative stddev
    // ~1/sqrt(k-1) ~ 26%; assert within a generous 3-sigma band
    val base = java.sql.Date.valueOf("2024-07-01")
    val du = (1 to 400).map(u => (base, u.toLong)).toDF("day", "user_id")
    val r = Profiling.kmvTrailingOf(du, 16).collect()
    assert(r.length === 1)
    val est = r(0).getAs[Long]("est_distinct")
    assert(r(0).getAs[Long]("true_distinct") === 400L)
    assert(est > 100 && est < 1600, s"estimate $est implausible for 400 distinct")
  }

  test("edit1Of: recall 1 vs brute force on a crafted vocabulary") {
    // covers substitution (abc/abd), deletion (abc/ab), insertion
    // (abc/abcd), identical-length non-pairs (abc/xyz), and the
    // distance-2 collision the neighborhood admits but verify rejects
    // (abc/acb share variants "ab"/"ac" yet lev=2)
    val vocab = Seq("abc", "abd", "ab", "abcd", "acb", "xyz", "xy")
    val v = vocab.toDF("t")
    val got = Profiling.edit1Of(v).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      a <- vocab; b <- vocab if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got === want)
    assert(!got.contains(("abc", "acb")), "distance-2 collision must be filtered")
    assert(got.contains(("ab", "abc")) && got.contains(("abc", "abd")))
  }

  test("snmPairs == brute-force sorted-window scan on crafted names") {
    // sorted-neighborhood blocking: distinct names under the total order,
    // each against its next w=2 neighbors, kept at edit distance <= 2 —
    // the driver-side reference is the literal definition
    val dir = java.nio.file.Files.createTempDirectory("graft-snm").toString
    val names = Seq("acct-001", "acct-002", "acct-003", "acct-0021",
      "bravo-x", "bravo-y", "charlie", "charliee", "delta-99", "zulu",
      "acct-001" /* duplicate row must not pair with itself */)
    import spark.implicits._
    names.toDF("c_name").write.parquet(dir + "/customer.parquet")
    val got = Profiling.snmPairs.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1)((i, j) => i.max(j))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val sorted = names.distinct.sorted
    val exp = (for {
      i <- sorted.indices; o <- 1 to 2 if i + o < sorted.size
      d = lev(sorted(i), sorted(i + o)) if d <= 2
    } yield (sorted(i), sorted(i + o), d.toLong)).toSet
    assert(exp.size >= 3, s"crafted names must produce matches, got ${exp.size}")
    assert(got === exp)
  }

  test("streaksOf: islands split exactly at calendar gaps") {
    // user 1: days 10-12 + 14 (streaks 3 and 1); user 2: one day;
    // user 3: two singletons across a 2-day gap
    val days = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 14L),
      (2L, 100L), (3L, 5L), (3L, 8L)).toDF("user_id", "ed")
    val out = Profiling.streaksOf(days).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out === Map(
      1L -> ((3L, 4L, 2L)), // best 3, 4 active days, 2 streaks
      2L -> ((1L, 1L, 1L)),
      3L -> ((1L, 2L, 2L))))
  }

  test("bitmapDistinctOf: bucket boundaries and duplicates, exact at word edges") {
    // ids straddle the 63-bit word boundary (62 | 63) and repeat; the
    // popcount total must be the exact distinct count and the word count
    // the number of touched buckets
    val ev = Seq("a" -> 0L, "a" -> 62L, "a" -> 62L, "a" -> 63L, "a" -> 126L,
      "b" -> 125L).map { case (t, u) => (t, u) }.toDF("event_type", "user_id")
    val out = Profiling.bitmapDistinctOf(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "a" -> ((4L, 3L)), // distinct {0,62,63,126} over buckets {0,1,2}
      "b" -> ((1L, 1L))))
  }

  test("theilSenOf: one outlier day cannot move the median slope") {
    // a perfect +2/day line over 11 days, except day 5 spikes to 1000;
    // OLS would chase the spike — the pairwise-slope MEDIAN stays 2
    val dc = (0L to 10L).map(d => ("t", d, if (d == 5) 1000L else 2 * d))
      .toDF("event_type", "ed", "c")
    val out = Profiling.theilSenOf(dc).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 55L) // 11 choose 2 pairs
    assert(out.head.getDouble(2) === 2.0d)
  }

  test("z2Significant agrees with the floating-point pooled z² on a grid") {
    // brute-force the double arithmetic over a grid of (xa, xb) at
    // na=nb=100 and demand the integer cross-multiplied predicate gives
    // the identical verdict everywhere, degenerate pools included
    val rows = for (xa <- 0L to 100L by 5; xb <- 0L to 100L by 5)
      yield (xa, xb, 100L, 100L)
    val got = rows.toDF("xa", "xb", "na", "nb")
      .select(col("xa"), col("xb"),
        Profiling.z2Significant(col("xa"), col("xb"), col("na"), col("nb"))
          .as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (((xa, xb), sig) <- got) {
      val (na, nb) = (100d, 100d)
      val x = xa + xb
      val exp =
        if (x == 0 || x == 200) 0L
        else {
          val (p1, p2, p) = (xa / na, xb / nb, x / (na + nb))
          val z2 = math.pow(p1 - p2, 2) / (p * (1 - p) * (1 / na + 1 / nb))
          if (z2 >= 3.8416) 1L else 0L
        }
      assert(sig === exp, s"xa=$xa xb=$xb")
    }
  }

  test("erIncrementalOf: frozen corpus weights, deterministic argmax, candidate-less records routed 'new'") {
    // corpus: 3 records, nations {1:2, 2:1} → s_nat = 2, odds = 6/2 = 3
    // → w_nat = bitlen(3) = 2; one segment → odds 1 → w_seg = 1. All
    // FOUR arrivals carry nation 1, so a model retrained on the union
    // would read w_nat = bitlen(42/30) = 1 and a7's score would drop
    // 19 → 18 — the frozen-weights contract is what the exact-score
    // asserts below pin.
    val corpus = Seq(
      (1L, "Customer#1", 1L, "A", 1000L, "B1"),
      (2L, "Customer#2", 1L, "A", 1500L, "B1"),
      (3L, "Customer#3", 2L, "A", 50000L, "B1"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "cents", "blk")
    val arrivals = Seq(
      // lev 1 to BOTH k1 and k2, everything else agreeing with both:
      // 12 + 2 + 1 + 4 = 19 twice — the tie must break to cand_key 1
      (7L, "Customer#7", 1L, "A", 1200L, "B1"),
      // best candidate k3 (cents band): -2 - 2 + 1 + 4 = 1 < 4 →
      // routed 'new' DESPITE having a best match recorded
      (14L, "Xustomer#9", 1L, "A", 49000L, "B1"),
      // an empty block: no candidates at all → 'new', nulls, 0
      (21L, "Customer#1", 1L, "A", 100L, "B7"),
      // name-only agreement vs k1: 12 - 2 - 2 - 2 = 6 → 'review'
      (28L, "Customer#1x", 5L, "Q", 999999L, "B1"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "cents", "blk")
    val out = Profiling.erIncrementalOf(corpus, arrivals)
      .collect().map { r =>
        (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) Long.MinValue else r.getLong(2),
          r.getLong(3), r.getString(4))
      }.sortBy(_._1)
    assert(out.toSeq === Seq(
      (7L, 1L, 19L, 3L, "attach"),
      (14L, 3L, 1L, 3L, "new"),
      (21L, -1L, Long.MinValue, 0L, "new"),
      (28L, 1L, 6L, 3L, "review")))
  }

  test("erIncrementalOf: property — equals the brute-force in-block argmax on seeded random data") {
    // guard for future refactors: on 120 random records the query's
    // (match_key, score, n_cands, decision) must equal a straight
    // Scala reimplementation of frozen-corpus weights + exhaustive
    // same-block scoring + (score desc, key asc) argmax
    val rnd = new scala.util.Random(20260815L)
    val names = Vector("Customer#1", "Customer#2", "Customer#1x", "Xustomer#9", "Patron#77")
    val all = (0L until 120L).map { k =>
      (k, names(rnd.nextInt(names.size)), rnd.nextInt(4).toLong,
        Vector("A", "B", "Q")(rnd.nextInt(3)), rnd.nextInt(30000).toLong,
        Vector("B1", "B2", "B3")(rnd.nextInt(3)))
    }
    val (arrRows, corpRows) = all.partition(_._1 % 5 == 0)
    def df(rows: Seq[(Long, String, Long, String, Long, String)]) =
      rows.toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "cents", "blk")
    val got = Profiling.erIncrementalOf(df(corpRows), df(arrRows))
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue else r.getLong(2),
        r.getLong(3), r.getString(4)))).toMap
    // brute force, frozen on the corpus only
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def uOdds(f: ((Long, String, Long, String, Long, String)) => Any): Long = {
      val n = corpRows.size.toLong
      val s = corpRows.groupBy(f).values.map(g => g.size.toLong * (g.size - 1)).sum
      n * (n - 1) / s
    }
    val wNat = java.lang.Long.toBinaryString(uOdds(_._3)).length.toLong
    val wSeg = java.lang.Long.toBinaryString(uOdds(_._4)).length.toLong
    arrRows.foreach { a =>
      val cands = corpRows.filter(_._6 == a._6).map { b =>
        val score = (if (lev(a._2, b._2) <= 1) 12L else -2L) +
          (if (a._3 == b._3) wNat else -2L) +
          (if (a._4 == b._4) wSeg else -2L) +
          (if (math.abs(a._5 - b._5) <= 10000) 4L else -2L)
        (b._1, score)
      }
      val exp =
        if (cands.isEmpty) (-1L, Long.MinValue, 0L, "new")
        else {
          val (k, s) = cands.minBy { case (k, s) => (-s, k) }
          (k, s, cands.size.toLong,
            if (s >= 14) "attach" else if (s >= 4) "review" else "new")
        }
      assert(got(a._1) === exp, s"arrival ${a._1}")
    }
  }

  test("bidiReachTagged: F and B amortized in one loop — rounds = max(depth) + 1, not the sum") {
    // forward chain of depth 10 from the pivot, backward depth 1: the
    // direction-tagged loop must converge in max(10, 1) + 1 probe
    // rounds; two sequential passes would pay (10 + 1) + (1 + 1)
    val fwd = (0L until 10L).map(i => (i, i + 1))
    val edges = (fwd :+ ((100L, 0L))).toDF("src", "dst")
    val tagged = GraphOps.bidiTag(edges)
      .repartition(col("src"), col("dir")).localCheckpoint()
    val (f, b, rounds, rdds) =
      GraphOps.bidiReachTagged(tagged, 0L, maxRounds = 20)
    assert(f.as[Long].collect().toSet === (0L to 10L).toSet,
      "forward set must be the whole chain")
    assert(b.as[Long].collect().toSet === Set(0L, 100L),
      "backward set must be the pivot and its one in-neighbor")
    assert(rounds === 11,
      s"one amortized loop must run max(10,1)+1 rounds, got $rounds")
    TextDedup.release(rdds)
    graft.ops.Caches.drain()
  }

  test("graphLandmarks: independent closed form, and the proven round count IS the fixpoint") {
    val sf = "/root/testdata/sf0.001"
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    // independent recompute of the doubling-tree distances (same bit math
    // as the oracle, but in Scala — a shared SQL bug can't hide here)
    val expected = (for {
      x <- 1L to 499L; s <- Seq(1L, 2L, 3L)
      if bitlen(x) >= bitlen(s) && (x >> (bitlen(x) - bitlen(s))) == s
    } yield (x, s, (bitlen(x) - bitlen(s)).toLong)).toSet
    val out = GraphOps.graphLandmarks.fn(spark, sf)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // landmark 1 reaches every vertex; 2 and 3 partition the rest
    assert(got.count(_._2 == 1L) === 499)
    assert(got.count(_._2 == 2L) + got.count(_._2 == 3L) === 498)
    // the loop runs exactly bitlen(maxId)−1 rounds WITHOUT fixpoint
    // probes — prove the claim: one EXTRA relaxation round must change
    // nothing (min-merge idempotent at the fixpoint)
    val e = GraphOps.landmarkEdges(spark, sf)
    val state = out.select(col("doc_id").as("v"), col("landmark").as("lm"),
      col("dist").as("hop"))
    val extra = GraphOps.landmarkRound(e, state)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(extra === got, "the proven round count must already be the fixpoint")
    graft.ops.Caches.drain()
  }

  test("graphEccentricity: independent closed form — per-landmark max depth and frontier size") {
    val sf = "/root/testdata/sf0.001"
    def bitlen(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)
    // independent recompute: ecc(s) = max over s-prefixed x of
    // bitlen(x) − bitlen(s); n_at_ecc = |argmax| (same universe as the
    // landmark test — ids 1..499 of the doubling tree)
    val dists = (for {
      x <- 1L to 499L; s <- Seq(1L, 2L, 3L)
      if bitlen(x) >= bitlen(s) && (x >> (bitlen(x) - bitlen(s))) == s
    } yield (s, (bitlen(x) - bitlen(s)).toLong))
    val expected = dists.groupBy(_._1).map { case (s, ds) =>
      val ecc = ds.map(_._2).max
      (s, ecc, ds.count(_._2 == ecc).toLong)
    }.toSet
    val got = GraphOps.graphEccentricity.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    // doubling tree sanity: landmark 1's ecc is the tree depth
    // bitlen(499) − 1 = 8, strictly deeper than its children's subtrees
    assert(got.find(_._1 == 1L).get._2 === 8L)
    assert(got.filter(_._1 != 1L).forall(_._2 < 8L))
    graft.ops.Caches.drain()
  }

  test("stressOf: equals brute-force shortest-path interior counts on the K=4 butterfly") {
    // ids 0..15 ⇒ K = bitlen(16) − 1 = 4, vertices 1..15. The brute
    // force enumerates EVERY shortest s→t path by DFS over the level
    // DAG and counts interior occurrences — fully independent of both
    // the engine's two-phase kernel and the oracle's closed form.
    val ids = (0L to 15L).toDF("id")
    val edges = (2L to 15L).flatMap { c =>
      val p = c >> 1
      Seq(p -> c) ++ (if ((p ^ 1) >= 1) Seq((p ^ 1) -> c) else Nil)
    }
    val succ = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    def walk(path: List[Long]): Unit = {
      val v = path.head
      // every root-extension of a source is a shortest path to its head
      // (the DAG is strictly leveled), so count interiors at each prefix
      if (path.length >= 3) path.tail.dropRight(1).foreach(i => brute(i) += 1L)
      succ.getOrElse(v, Nil).foreach(w => walk(w :: path))
    }
    Seq(1L, 2L, 3L).foreach(s => walk(List(s)))
    val got = GraphOps.stressOf(ids.select(col("id")), Seq(1L, 2L, 3L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = (2L to 15L).map(v => v -> brute(v)).toMap
    assert(got === expect, "two-phase stress must equal enumerated interior counts")
    // and the closed form the oracle gates: h_j = (4^{K-j+1}-4)/3
    assert(got(2L) === 20L && got(3L) === 20L)
    (4L to 7L).foreach(v => assert(got(v) === 16L))
    (8L to 15L).foreach(v => assert(got(v) === 0L))
    graft.ops.Caches.drain()
  }
}
