package graft

import org.apache.spark.sql.SparkSession

/** Scaling probe: run headline queries WARM at each sf tier and print
  * one line per (query, sf) — time, rows, and the growth factor vs the
  * previous tier. The interesting signal is the exponent: a well-shaped
  * operator grows ~linearly with the data (factor ≈ 10 per tier);
  * quadratic pair blow-ups or single-task bottlenecks show up as
  * super-linear factors long before they OOM a cluster.
  *
  * Usage: runMain graft.ScaleProbe [queryName...] (default: headline set)
  */
object ScaleProbe {
  private val defaultSet = Seq(
    "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_jaccard",
    "q_dedup_adversarial_bucket", "q_sim_adversarial_bucket",
    "q_graph_adversarial", "q_importance_hashgram", "q_sessionize_skew",
    "q_dedup_keep_best", "q_dedup_weighted_jaccard",
    "q_graph_sssp", "q_linkage_fs", "q_sim_maxsim",
    "q_er_golden", "q_er_incremental", "q_retrieval_mrr", "q_retrieval_mrr_fixed", "q_ppr_seed",
    "q_graph_scc_pivot", "q_graph_scc",
    "q_classify_nb", "q_sketch_hdr_quantile", "q_graph_landmarks",
    "q_sim_lsh_bucketed", "q_pack_chunks", "q_curation_ingest",
    "q_decontaminate", "q_rank_quartile", "q_text_ngram_profile",
    "q_sketch_bloom", "q_histogram_equidepth", "q_tfidf_topk",
    "q_scalar_subquery")

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else defaultSet
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10).count()
    names.foreach { name =>
      var prev = Option.empty[Double]
      sfs.foreach { sf =>
        // warm = best of 2: the second run reuses compiled plans/JIT, so
        // the number tracks execution, not one-time codegen
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(name)(spark, sf)
          df.write.format("noop").mode("overwrite").save()
          graft.ops.Caches.drain() // same per-query hygiene as Bench/Verify
          (System.nanoTime() - t0) / 1e9
        }
        val t = times.min
        val factor = prev.map(p => f"${t / p}%5.1fx").getOrElse("     ")
        println(f"PROBE $name%-28s ${sf.split('/').last}%-8s ${t}%7.2f s  $factor")
        prev = Some(t)
      }
    }
    spark.stop()
  }
}
