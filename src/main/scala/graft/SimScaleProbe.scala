package graft

import org.apache.spark.sql.SparkSession

/** Scaling probe for the SIMILARITY / ANN family, the
  * [[DedupScaleProbe]] method over the persisted [[TierGen]] tier's
  * derived `embeddings` table: N signed-permutation copies — copy i
  * applies a per-copy seeded signed permutation of the 64 dims, an
  * orthogonal transform, so every WITHIN-copy cosine/dot/norm is
  * preserved (copy 0 is byte-identical to sf0.1) while cross-copy
  * vectors are mutually near-random. The tier reads as "N independent
  * embedding shards": N× vectors, N× true-neighbor pairs, no
  * duplicate-vector tie pathology — and since the signed-permutation
  * group is 64!·2⁶⁴ strong (r13, replacing the rotation scheme whose
  * frame repeated past 32 copies), the probe reads TWO decades when
  * given the 100× tier.
  *
  * The probed set stacks the family's distinct physical shapes: the
  * brute-force top-k baseline (the honest quadratic — its factor SHOULD
  * read ~superlinear; it exists as the recall oracle, not the scale
  * path), the IVF / PQ / IVF-PQ trained paths (kmeans memo build under
  * run 1, warm assignment+probe under `warm`), the sign-LSH bucket
  * join, embedding near-dup, and SemDeDup's cluster-then-intra-cosine.
  *
  * Usage: runMain graft.SimScaleProbe [tierDir [tier100Dir]]
  * (default derived/sf1; pass derived/sf10 for the second decade)
  */
object SimScaleProbe {
  private val queries = Seq(
    "q_sim_topk", "q_sim_lsh_bucketed", "q_sim_ivf", "q_sim_pq",
    "q_sim_ivfpq", "q_sim_maxsim", "q_dedup_embed_cosine", "q_semdedup")
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
        val rows = spark.read.parquet(s"$d/embeddings.parquet").count()
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, d)
            .write.format("noop").mode("overwrite").save()
          graft.ops.Caches.drain()
          (System.nanoTime() - t0) / 1e9
        }
        val t = ts.last
        val factor = prev.map(p => f"${t / p}%5.1fx").getOrElse("     ")
        println(f"PROBE $name%-22s ${d.split('/').last}%-16s " +
          f"run1 ${ts.head}%7.2f s  warm $t%7.2f s  ${t * 1e6 / rows}%7.1f us/row  $factor")
        prev = Some(t)
      }
    }
    spark.stop()
  }
}
