package graft
import org.apache.spark.sql.SparkSession
/** Times one query N times in one session (cold vs warm split). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // absorb session warmup on an unrelated trivial job
    spark.range(10).count()
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      // same noop sink as Bench — count() would let Catalyst prune the
      // output projection, under-measuring projection-heavy queries
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      graft.ops.Caches.drain() // same per-query hygiene as Bench/Verify
      println(f"RUN$i%d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
