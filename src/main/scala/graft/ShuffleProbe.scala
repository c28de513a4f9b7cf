package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.LongAdder

/** Shuffle/IO meter: run each query against real task metrics and print
  * bytes SHUFFLED (write + read sides) and bytes SPILLED — the measured
  * counterpart to NOTES.md's sizing estimates. A plan can look right and
  * still move too much data; this is the number the plan shape is FOR.
  * (Storage-read bytes are deliberately omitted: the local-fs vectorized
  * reader under-reports them; shuffle and spill metrics come from the
  * shuffle managers and are exact.)
  *
  * Usage: runMain graft.ShuffleProbe [sfDir] [queryName...]
  */
object ShuffleProbe {
  private val defaultSet = Seq(
    "q_dedup_exact", "q_dedup_incremental", "q_dedup_minhash_lsh",
    "q_dedup_jaccard", "q_curation_ingest", "q_decontaminate",
    "q_pack_chunks", "q_rank_quartile", "q_pricing_summary",
    "q_sketch_bloom", "q_histogram_equidepth", "q_sim_lsh_bucketed")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else defaultSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleW = new LongAdder
    val shuffleR = new LongAdder; val spill = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleW.add(m.shuffleWriteMetrics.bytesWritten)
          shuffleR.add(m.shuffleReadMetrics.totalBytesRead)
          spill.add(m.diskBytesSpilled + m.memoryBytesSpilled)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def mb(l: LongAdder): String = f"${l.sum() / 1048576.0}%8.1f"

    println(f"${"query"}%-28s ${"shufW MB"}%8s ${"shufR MB"}%8s ${"spill MB"}%8s")
    names.foreach { name =>
      shuffleW.reset(); shuffleR.reset(); spill.reset()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      graft.ops.Caches.drain() // same per-query hygiene as Bench/Verify
      // listener events drain asynchronously; settle before reading
      Thread.sleep(1500)
      println(f"PROBE $name%-28s ${mb(shuffleW)} ${mb(shuffleR)} ${mb(spill)}")
    }
    spark.stop()
  }
}
