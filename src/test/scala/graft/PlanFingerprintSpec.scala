package graft

/** Plan-shape regression gate: every oracle query's physical-plan
  * fingerprint (shuffle exchanges, join strategies, sorts, windows) is
  * compared against the committed baseline
  * (`src/test/resources/plan_fingerprints.json`). A change that adds a
  * shuffle, introduces a Cartesian product, or grows a nested-loop join
  * fails HERE — at review time — instead of surfacing as a bench
  * regression at 100× the data. Non-regressive drift (fewer exchanges, a
  * strategy swap at equal cost) passes but is reported, so intentional
  * plan changes get locked in by regenerating the baseline
  * (`runMain graft.PlanFingerprints`) and reviewing the diff like code.
  */
class PlanFingerprintSpec extends SparkSpec {

  test("no query's plan gained shuffles, nested loops, or cartesians vs the baseline") {
    // Environment preconditions FIRST: the committed baseline was
    // generated under local[4] over single-row-group sf0.001 parquet, and
    // Scale.fanOutScan's identity/fan-out branch depends on exactly that
    // (defaultParallelism vs data-bearing splits). If either drifts, ~13
    // fingerprints flip at once — fail with a message that points at the
    // environment instead of a confusing 13-query diff.
    assert(spark.sparkContext.defaultParallelism === 4,
      "baseline requires defaultParallelism 4 (local[4]) — regenerate " +
        "plan_fingerprints.json for this environment or fix the session master")
    val docsFiles = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").inputFiles
    assert(docsFiles.length === 1,
      "baseline requires the driver's single-file sf0.001 testdata — " +
        "regenerated multi-file testdata changes fanOutScan's branch; " +
        "regenerate plan_fingerprints.json")
    val res = getClass.getResourceAsStream("/plan_fingerprints.json")
    assert(res != null, "baseline missing — run: runMain graft.PlanFingerprints")
    val baseline = PlanFingerprints.parse(new String(res.readAllBytes(), "UTF-8"))
    assert(baseline.size === SparkEntry.queries.size + PlanFingerprints.builders.size,
      "query count changed — regenerate the baseline (runMain graft.PlanFingerprints)")
    // fresh-JVM conditions inside a shared JVM: (a) a new session, so the
    // session-keyed memos rebuild in the same alphabetical order the
    // generator saw; (b) an EMPTY cache manager — CacheManager is shared
    // across sessions, so other suites' still-cached plans would
    // structurally match subtrees here and swap them to InMemoryTableScan,
    // changing exchange counts run-to-run. Cost of clearing: earlier
    // suites' memo ENTRIES are gone for good (getOrElseUpdate won't
    // re-cache), so any later consumer recomputes uncached — a test-JVM
    // slowdown, never a correctness change (lineage is intact; nothing in
    // the suite checkpoints through the cache manager).
    spark.sharedState.cacheManager.clearCache()
    val current = PlanFingerprints.collectAll(spark.newSession(), "/root/testdata/sf0.001")
    graft.ops.Caches.drain()
    // and clear OUR leavings too: the throwaway session's memo caches are
    // registered in the shared CacheManager by canonicalized plan, and a
    // later plan-shape suite would otherwise see ITS structurally-equal
    // subtrees swapped to InMemoryTableScan — the same interference this
    // spec defends against, pointed the other way
    spark.sharedState.cacheManager.clearCache()
    assert(current.keySet === baseline.keySet,
      "query set changed — regenerate the baseline (runMain graft.PlanFingerprints)")
    val regressions = current.toSeq.sortBy(_._1).flatMap { case (q, c) =>
      val b = baseline(q)
      Seq(
        (c.exchanges > b.exchanges) -> s"$q: shuffle exchanges ${b.exchanges} → ${c.exchanges}",
        (c.cartesian > b.cartesian) -> s"$q: cartesian products ${b.cartesian} → ${c.cartesian}",
        (c.bnlj > b.bnlj) -> s"$q: broadcast nested loops ${b.bnlj} → ${c.bnlj}")
        .collect { case (true, msg) => msg }
    }
    assert(regressions.isEmpty,
      regressions.mkString("\n", "\n", "\n") +
        "If the plan change is intentional: runMain graft.PlanFingerprints " +
        "and review the baseline diff like code")
    val drift = current.toSeq.sortBy(_._1)
      .filter { case (q, c) => c != baseline(q) }.map(_._1)
    if (drift.nonEmpty)
      info(s"non-regressive plan drift (regenerate baseline to lock in): ${drift.mkString(", ")}")
  }
}
