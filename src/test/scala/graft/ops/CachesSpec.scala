package graft.ops

import graft.{SparkEntry, SparkSpec}

/** Regression guard for the r4 sketch-family slowdown: query-local caches
  * accumulating across a long single-session run (the driver bench runs
  * 156 queries in one JVM). Every query that leases scratch must leave
  * nothing behind once the harness drains — storage memory at steady
  * state holds only the deliberately session-shared memos.
  */
class CachesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sketch/curation family routes scratch through leases; drain releases every one") {
    // the family that regressed in r4, plus the heaviest scratch users.
    // (A raw getPersistentRDDs count is racy here — suites share one
    // session and run in parallel — so the guard is the lease mechanics:
    // scratch-using queries MUST produce leases, drain MUST empty the
    // queue, and the companion test proves a drained lease is unpersisted.
    // Bench/Verify call drain() after every query, so together these pin
    // the no-accumulation property the r4 regression violated.)
    val leaseUsers = Seq("q_sketch_bloom", "q_tfidf_topk", "q_kmv_jaccard",
      "q_curation_ingest")
    val nonLeaseUsers = Seq("q_sketch_countmin", "q_sketch_hll", "q_sketch_kmv")
    Caches.drain() // start clean
    leaseUsers.foreach { q =>
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      assert(Caches.drain() >= 1, s"$q should lease its scratch cache")
      assert(Caches.outstanding === 0, s"$q: drain must clear the lease queue")
    }
    nonLeaseUsers.foreach { q =>
      // these share the memoized 3-gram universe — no per-query scratch
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      Caches.drain()
    }
    assert(Caches.outstanding === 0)
  }

  test("lease caches and drain unpersists, idempotently") {
    import spark.implicits._
    val df = (1 to 10).toDF("x")
    Caches.lease(df)
    assert(df.storageLevel.useMemory, "lease must cache")
    Caches.drain()
    assert(!df.storageLevel.useMemory, "drain must unpersist")
    Caches.drain() // second drain on an empty queue is a no-op
    assert(Caches.outstanding === 0)
  }
}
