package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("overwriteTable: atomic staged overwrite + single-valued _TIMESTAMP default (S7/S10)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/t"
    Sink.overwriteTable(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir)
    val first = spark.read.parquet(dir)
    assert(first.count() === 2)
    // whole batch carries ONE stamp (current_timestamp constant-folds per query)
    assert(first.select("_TIMESTAMP").distinct().count() === 1)
    // truncate-replace semantics: second load fully replaces the first
    Sink.overwriteTable(Seq((9, "z")).toDF("k", "v"), dir)
    val second = spark.read.parquet(dir)
    assert(second.select("k").as[Int].collect().toSeq === Seq(9))
  }

  test("compact rewrites many small files into the target count, data intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    (1 to 500).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(40).write.parquet(dir)  // 40 small files
    def parquetFiles = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles >= 30)
    Sink.compact(spark, dir, targetFiles = 2)
    assert(parquetFiles === 2)
    val back = spark.read.parquet(dir)
    assert(back.count() === 500)
    assert(back.agg(sum("k")).head().getLong(0) === 500L * 501 / 2)
  }

  test("Manifest: atomic pointer swap, previous generation retained, older retired") {
    val base = java.nio.file.Files.createTempDirectory("graft-manifest").toString + "/t"
    Sink.Manifest.overwrite(spark, base, (1 to 100).map(i => (i, s"v$i")).toDF("k", "v"))
    assert(Sink.Manifest.read(spark, base).count() === 100)
    // a reader that resolved gen-0 BEFORE this overwrite must still work after it
    val preSwap = spark.read.parquet(s"$base/gen-0")
    Sink.Manifest.overwrite(spark, base, Seq((9, "z")).toDF("k", "v"))
    assert(Sink.Manifest.read(spark, base).select("k").as[Int].collect().toSeq === Seq(9))
    assert(preSwap.count() === 100, "in-flight reader of the previous generation broke")
    // third overwrite retires gen-0, keeps gen-1
    Sink.Manifest.overwrite(spark, base, Seq((7, "y")).toDF("k", "v"))
    assert(!new java.io.File(s"$base/gen-0").exists, "gen-0 should be retired")
    assert(new java.io.File(s"$base/gen-1").exists, "previous generation must be retained")
    // compaction rewrites files without any reader-visible gap
    Sink.Manifest.overwrite(spark, base,
      (1 to 500).map(i => (i, s"v$i")).toDF("k", "v").repartition(40))
    Sink.Manifest.compact(spark, base, targetFiles = 2)
    val live = Sink.Manifest.read(spark, base)
    assert(live.count() === 500)
    assert(live.inputFiles.length === 2)
  }

  test("Manifest time travel: readAt pins a generation, retention bounds it, retired reads fail loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft-tt").toString + "/t"
    (0 to 3).foreach { v =>
      Sink.Manifest.overwrite(spark, base,
        Seq((v, s"gen$v")).toDF("k", "v"), keepGenerations = 3)
    }
    assert(Sink.Manifest.generations(spark, base) === Seq(1L, 2L, 3L))
    // AS OF semantics: each retained generation reads back its own data
    (1 to 3).foreach { g =>
      assert(Sink.Manifest.readAt(spark, base, g).select("v").head.getString(0) === s"gen$g")
    }
    assert(Sink.Manifest.read(spark, base).select("v").head.getString(0) === "gen3")
    // a retired generation must error, never silently fall back to live
    val e = intercept[RuntimeException](Sink.Manifest.readAt(spark, base, 0))
    assert(e.getMessage.contains("retired"))
  }

  test("overwritePartitioned: directory-per-value layout, pruned scans, dynamic overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/t"
    val df = Seq(("click", 1L), ("click", 2L), ("view", 3L)).toDF("event_type", "v")
    Sink.overwritePartitioned(df, dir, Seq("event_type"))
    // layout: one directory per partition value
    assert(new java.io.File(s"$dir/event_type=click").isDirectory)
    assert(new java.io.File(s"$dir/event_type=view").isDirectory)
    // partition filter prunes before IO
    val q = spark.read.parquet(dir).filter($"event_type" === "click")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(q.count() === 2)
    // dynamic overwrite replaces only the partitions present in the batch
    Sink.overwritePartitioned(Seq(("click", 9L)).toDF("event_type", "v"), dir, Seq("event_type"))
    val after = spark.read.parquet(dir)
    assert(after.filter($"event_type" === "view").count() === 1)   // untouched
    assert(after.filter($"event_type" === "click").select("v").as[Long].collect().toSeq === Seq(9L))
  }

  test("overwriteBucketed: same-bucketed tables join with no shuffle exchange") {
    val left = (1 to 500).map(i => (i.toLong, s"l$i")).toDF("k", "lv")
    val right = (1 to 500).map(i => (i.toLong, i * 2.0)).toDF("k", "rv")
    Sink.overwriteBucketed(left, "bkt_left", "k", 4)
    Sink.overwriteBucketed(right, "bkt_right", "k", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      assert(joined.count() === 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
