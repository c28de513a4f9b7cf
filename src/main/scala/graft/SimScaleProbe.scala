package graft

import org.apache.spark.sql.SparkSession

/** One-tier-up scaling probe for the SIMILARITY / ANN family, the
  * [[DedupScaleProbe]] method over the persisted [[TierGen]] tier's
  * derived `embeddings` table (r12): ten rotated-frame copies — copy i
  * rotates each 64-dim vector left by 6·i positions, an orthogonal
  * transform, so every WITHIN-copy cosine/dot/norm is preserved verbatim
  * (copy 0 is byte-identical to sf0.1) while cross-copy vectors sit in
  * ten mutually-rotated frames and are near-orthogonal on average. The
  * tier reads as "ten independent embedding shards": 10× vectors, 10×
  * true-neighbor pairs, no duplicate-vector tie pathology.
  *
  * The probed set stacks the family's distinct physical shapes: the
  * brute-force top-k baseline (the honest quadratic — its factor SHOULD
  * read ~superlinear; it exists as the recall oracle, not the scale
  * path), the IVF / PQ / IVF-PQ trained paths (kmeans memo build under
  * run 1, warm assignment+probe under `warm`), the sign-LSH bucket
  * join, embedding near-dup, and SemDeDup's cluster-then-intra-cosine.
  *
  * Usage: runMain graft.SimScaleProbe [tierDir] (default derived/sf1)
  */
object SimScaleProbe {
  private val queries = Seq(
    "q_sim_topk", "q_sim_lsh_bucketed", "q_sim_ivf", "q_sim_pq",
    "q_sim_ivfpq", "q_sim_maxsim", "q_dedup_embed_cosine", "q_semdedup")
  private val base = "/root/testdata/sf0.1"

  def main(args: Array[String]): Unit = {
    val tier = args.headOption.getOrElse(TierGen.defaultTier)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TierGen.ensureAll(spark, tier)
    queries.foreach { name =>
      var prev = Option.empty[Double]
      Seq(base, tier).foreach { d =>
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
