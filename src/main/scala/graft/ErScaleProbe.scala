package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-tier-up scaling probe for the entity-resolution chain (VERDICT
  * r10 #6): q_snm_pairs → q_linkage_fs → q_er_golden stack
  * distributedRank + connected components — the two primitives whose
  * constants matter most at 10⁸ rows — and the standard [[ScaleProbe]]
  * tops out at sf0.1 (15k customers). The tier is the PERSISTED
  * [[TierGen]] output (ten copies at stride max(c_custkey)+1, names
  * re-rendered in the table's own `Customer#%09d` scheme, every
  * frequency distribution — the Fellegi–Sunter u-probability inputs —
  * preserved verbatim): generated once, identical bytes for every
  * later probe run, shared with [[DedupScaleProbe]].
  *
  * Prints one PROBE line per (query, tier) with the warm growth factor
  * per step; the gate recorded in NOTES is per-row µs non-increasing
  * across each 10× step.
  *
  * Usage: runMain graft.ErScaleProbe [tierDir [tier100Dir]]
  * (default derived/sf1; pass a second dir — conventionally
  * derived/sf10, generated at 100 copies — to probe TWO decades:
  * sf0.1 → sf1 → sf10, 15k → 150k → 1.5M customers)
  */
object ErScaleProbe {
  private val queries =
    Seq("q_snm_pairs", "q_linkage_fs", "q_er_golden", "q_er_incremental")
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
    queries.foreach { name =>
      var prev = Option.empty[Double]
      (Seq(base, tier) ++ tier100).foreach { d =>
        val rows = spark.read.parquet(s"$d/customer.parquet").count()
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, d)
            .write.format("noop").mode("overwrite").save()
          graft.ops.Caches.drain()
          (System.nanoTime() - t0) / 1e9
        }.min
        val factor = prev.map(p => f"${t / p}%5.1fx").getOrElse("     ")
        // per-row µs is the linearity tell at fixed parallelism: the raw
        // factor conflates the (amortizing) fixed overhead with the
        // (linear) per-row work, so a NON-INCREASING µs/row across a 10×
        // step is the gate that generalizes to the cluster story
        println(f"PROBE $name%-16s ${d.split('/').last}%-14s $t%7.2f s  " +
          f"${t * 1e6 / rows}%7.1f us/row  $factor")
        prev = Some(t)
      }
    }
    spark.stop()
  }
}
