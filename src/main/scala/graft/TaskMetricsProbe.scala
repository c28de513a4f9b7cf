package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-metrics attribution probe (VERDICT r12 finding #1): runs ONE
  * query with a listener totalling the executor-side meters Spark keeps
  * per task, so a wall-clock rise observed at a probe tier can be
  * ATTRIBUTED — CPU vs GC vs blocked time (disk/network I/O) vs spill
  * volume — instead of explained by plausibility. The r12 case: the
  * q_dedup_ppjoin second-decade per-row rise was CLAIMED to be
  * single-disk spill ("the environment wall a cluster distributes") on
  * the strength of spill counters alone; this probe closes or refutes
  * that kind of claim with the actual time split.
  *
  * The split: `executorRunTime` (wall per task) decomposes as
  * `executorCpuTime` (on-CPU ns) + `jvmGCTime` + BLOCKED (everything
  * else — dominated by disk reads/writes and shuffle fetch waits in
  * local mode). `shuffleWriteTime` (ns, part of blocked) and
  * `fetchWaitTime` (ms) are reported separately, and
  * memory/diskBytesSpilled give the spill VOLUME the blocked time is
  * buying. All meters are per-task sums over `cpus` concurrent tasks,
  * so seconds here are CPU-seconds-equivalent, comparable across runs
  * at the same parallelism (defaults match [[DedupScaleProbe]]'s
  * local[8] so the attribution row sits beside the probe rows).
  *
  * Usage: runMain graft.TaskMetricsProbe <query> [sfDir] [cpus]
  */
object TaskMetricsProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2) else "8"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val tasks = new LongAdder
    val runMs = new LongAdder      // executorRunTime (ms)
    val cpuNs = new LongAdder      // executorCpuTime (ns)
    val gcMs = new LongAdder       // jvmGCTime (ms)
    val shufWriteNs = new LongAdder // shuffle writeTime (ns; inside blocked)
    val fetchWaitMs = new LongAdder // shuffle fetchWaitTime (ms; inside blocked)
    val shufReadB = new LongAdder
    val shufWriteB = new LongAdder
    val memSpillB = new LongAdder
    val diskSpillB = new LongAdder
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          tasks.increment()
          runMs.add(m.executorRunTime)
          cpuNs.add(m.executorCpuTime)
          gcMs.add(m.jvmGCTime)
          shufWriteNs.add(m.shuffleWriteMetrics.writeTime)
          shufWriteB.add(m.shuffleWriteMetrics.bytesWritten)
          fetchWaitMs.add(m.shuffleReadMetrics.fetchWaitTime)
          shufReadB.add(m.shuffleReadMetrics.totalBytesRead)
          memSpillB.add(m.memoryBytesSpilled)
          diskSpillB.add(m.diskBytesSpilled)
        }
      }
    })

    // session warmup on an unrelated job, then zero every meter so the
    // report covers exactly the probed query
    spark.range(1000).selectExpr("sum(id)").collect()
    Thread.sleep(500)
    Seq(tasks, runMs, cpuNs, gcMs, shufWriteNs, fetchWaitMs,
      shufReadB, shufWriteB, memSpillB, diskSpillB).foreach(_.reset())

    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    graft.ops.Caches.drain()
    Thread.sleep(2000) // let the listener bus drain the final task events

    val run = runMs.sum / 1e3
    val cpu = cpuNs.sum / 1e9
    val gc = gcMs.sum / 1e3
    val blocked = math.max(0.0, run - cpu - gc)
    def gb(b: LongAdder) = b.sum / 1e9
    println(f"METRICS $name $sfDir cpus=$cpus")
    println(f"  wall            ${wall}%9.1f s   (driver-observed)")
    println(f"  tasks           ${tasks.sum}%9d")
    println(f"  executorRun     ${run}%9.1f s   (task-summed wall; /$cpus concurrent)")
    println(f"  executorCpu     ${cpu}%9.1f s   (${100 * cpu / run}%5.1f%% of run)")
    println(f"  jvmGc           ${gc}%9.1f s   (${100 * gc / run}%5.1f%% of run)")
    println(f"  blocked         ${blocked}%9.1f s   (${100 * blocked / run}%5.1f%% of run — I/O + waits)")
    println(f"  shufWriteTime   ${shufWriteNs.sum / 1e9}%9.1f s   (inside blocked)")
    println(f"  fetchWait       ${fetchWaitMs.sum / 1e3}%9.1f s   (inside blocked)")
    println(f"  shuffleRead     ${gb(shufReadB)}%9.2f GB")
    println(f"  shuffleWrite    ${gb(shufWriteB)}%9.2f GB")
    println(f"  memSpill        ${gb(memSpillB)}%9.2f GB")
    println(f"  diskSpill       ${gb(diskSpillB)}%9.2f GB")
    spark.stop()
  }
}
