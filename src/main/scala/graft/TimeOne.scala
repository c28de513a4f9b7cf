package graft
import org.apache.spark.sql.SparkSession
/** Times one query N times in one session (cold vs warm split). Each run
  * also reports the driver-job / stage / task counts and the summed task
  * CPU the run submitted — the attribution a wall number alone can't
  * give (a 2 s warm row that is 40 driver jobs × 50 ms is a round-trip
  * floor, not a data cost; see OPTIMIZATION_r13.md). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_TIMEONE_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_TIMEONE_PARTS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
      }
    })
    // absorb session warmup on an unrelated trivial job
    spark.range(10).count()
    (1 to n).foreach { i =>
      Thread.sleep(150) // let trailing listener events from the previous run land
      val (j0, s0, t0c, c0) = (jobs.get, stages.get, tasks.get, cpuNs.get)
      val t0 = System.nanoTime()
      // same noop sink as Bench — count() would let Catalyst prune the
      // final projection, under-measuring projection-heavy queries
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      graft.ops.Caches.drain() // same per-query hygiene as Bench/Verify
      println(f"RUN$i%d ${(System.nanoTime() - t0) / 1e9}%.2f s  " +
        f"jobs=${jobs.get - j0}%d stages=${stages.get - s0}%d " +
        f"tasks=${tasks.get - t0c}%d cpu=${(cpuNs.get - c0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
