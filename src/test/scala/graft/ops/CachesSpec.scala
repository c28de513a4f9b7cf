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

  test("sketch/curation family back-to-back leaves no query-local caches after drain") {
    // the family that regressed in r4, plus the heaviest lease users
    val family = Seq("q_sketch_bloom", "q_sketch_countmin", "q_sketch_hll",
      "q_sketch_kmv", "q_tfidf_topk", "q_source_overlap", "q_curation_ingest")
    Caches.drain() // start clean (other suites share the session)
    val before = spark.sparkContext.getPersistentRDDs.size
    family.foreach { q =>
      SparkEntry.queries(q)(spark, sf).write.format("noop").mode("overwrite").save()
      Caches.drain()
    }
    assert(Caches.outstanding === 0, "drain must clear the lease queue")
    val after = spark.sparkContext.getPersistentRDDs.size
    // the only growth allowed is the session-shared 3-gram universe the
    // HLL/KMV sketches memoize (one cached table); every query-local
    // lease (bloom corpus, tf table, token universe, ingest corpus) must
    // be gone — pre-fix this grew by one-plus cache PER QUERY, and the
    // accumulated storage slowed late-alphabet queries up to 7x
    assert(after - before <= 1,
      s"query-local caches leaked: $before -> $after persistent RDDs")
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
