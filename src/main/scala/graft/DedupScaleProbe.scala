package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-tier-up scaling probe for the DEDUP family — the heart of the
  * 100 TB story — mirroring [[ErScaleProbe]]'s derived-tier method: the
  * standard [[ScaleProbe]] tops out at sf0.1 (5k docs, ~50 MB of text),
  * so this main derives a 10× "sf1" documents tier from the driver's own
  * sf0.1 parquet.
  *
  * Derivation ([[TierGen]]): ten copies keyed `doc_id + i·(max+1)`, with
  * EVERY TOKEN of copy i prefixed `c<i>_`. Disjoint per-copy
  * vocabularies mean no shingle,
  * minhash band, gram, or fingerprint ever collides ACROSS copies, so
  * each copy carries exactly the original corpus' internal near-dup
  * structure — the derived tier is "ten independent crawl shards", which
  * is what a 10× bigger crawl looks like (new content, same internal dup
  * rate): total docs, vocabulary, shingle stream, and true-pair count
  * all scale 10× while no artificial cross-copy near-dups distort the
  * workload (naive copies WOULD: ten byte-identical copies per doc is
  * the adversarial-flood gate's pathology, not a bigger crawl).
  *
  * Prints one PROBE line per (query, tier) with the warm sf0.1 → sf1
  * factor and per-row µs (the linearity tell — see [[ErScaleProbe]]).
  * The probed set stacks every shuffle-bearing dedup primitive: exact
  * fingerprint, banded MinHash-LSH, df-capped gram pair join, PPJoin
  * prefix filter, and the log-round CC clustering.
  *
  * The tier is the PERSISTED [[TierGen]] output (VERDICT r11 #3):
  * generated once, identical bytes for every later probe run, shared
  * with [[ErScaleProbe]] and the stretch oracle runs.
  *
  * Usage: runMain graft.DedupScaleProbe [tierDir [tier100Dir]]
  * (default derived/sf1; pass a second dir — conventionally
  * derived/sf10 at 100 copies — to probe TWO decades: 5k → 50k → 500k
  * docs, ~50 MB → ~500 MB → ~5 GB of text)
  */
object DedupScaleProbe {
  // documents-only queries (q_entity_cluster's blocked-entity form reads
  // the part table, which the derived tier does not carry); the CC
  // clustering path is covered by q_dedup_components
  private val queries = Seq(
    "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_jaccard",
    "q_dedup_ppjoin", "q_dedup_components")
  private val base = "/root/testdata/sf0.1"

  def main(args: Array[String]): Unit = {
    val tier = args.headOption.getOrElse(TierGen.defaultTier)
    val tier100 = if (args.length > 1) Some(args(1)) else None
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TierGen.ensureAll(spark, tier)
    tier100.foreach(TierGen.ensureAll(spark, _, 100))
    // session-shared memos (LSH candidates etc.) are keyed per sf dir, so
    // each tier builds its own under run 1 and run 2 measures the warm
    // plan — both columns printed: `run1` carries the build, `warm` is
    // the factor basis, so the memo-build scaling is visible too
    queries.foreach { name =>
      var prev = Option.empty[Double]
      (Seq(base, tier) ++ tier100).foreach { d =>
        val rows = spark.read.parquet(s"$d/documents.parquet").count()
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, d)
            .write.format("noop").mode("overwrite").save()
          graft.ops.Caches.drain()
          (System.nanoTime() - t0) / 1e9
        }
        val t = ts.last
        val factor = prev.map(p => f"${t / p}%5.1fx").getOrElse("     ")
        println(f"PROBE $name%-20s ${d.split('/').last}%-16s " +
          f"run1 ${ts.head}%7.2f s  warm $t%7.2f s  ${t * 1e6 / rows}%7.1f us/row  $factor")
        prev = Some(t)
      }
    }
    spark.stop()
  }
}
