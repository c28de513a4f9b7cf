package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin matches the plain join result on a skewed key distribution") {
    // 0 is the hot key: 900 of 1000 left rows
    val left = (1 to 1000).map(i => (if (i <= 900) 0L else i.toLong, i)).toDF("k", "v")
    val right = (0 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).select("k", "v", "name")
    val salted = Scale.saltedJoin(left, right, "k", parts = 8).select("k", "v", "name")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
  }

  test("saltedJoin left-outer keeps unmatched left rows exactly once") {
    val left = Seq((1L, "a"), (2L, "b"), (99L, "nomatch")).toDF("k", "v")
    val right = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val out = Scale.saltedJoin(left, right, "k", parts = 4, joinType = "left")
    assert(out.count() === 3)
    assert(out.filter($"k" === 99L && $"w".isNull).count() === 1)
  }

  test("topKPerGroup returns k rows per group in order") {
    val df = (1 to 100).map(i => (i % 5, i)).toDF("g", "v")
    val out = Scale.topKPerGroup(df, Seq("g"), col("v").desc, 3)
    assert(out.count() === 15)
    assert(out.filter($"g" === 0).select("v").as[Int].collect().toSet === Set(100, 95, 90))
  }

  test("prefixSum matches the single-window running sum exactly") {
    import org.apache.spark.sql.expressions.Window
    // 2 groups, sparse non-contiguous ids, values with sign changes
    val df = (1 to 1000).map(i => (s"g${i % 2}", i.toLong * 3, (i % 7 - 3).toLong))
      .toDF("grp", "ord", "v")
    val naive = df.withColumn("cum",
      sum("v").over(Window.partitionBy("grp").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, 0)))
    val scanned = Scale.prefixSum(df, Seq("grp"), "ord", "v",
      bucket = expr("ord div 100"), outCol = "cum")
    assert(scanned.count() === naive.count())
    assert(scanned.except(naive).count() === 0)
    assert(naive.except(scanned).count() === 0)
  }

  test("prefixSum == single window on random groups/gaps/buckets (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.expressions.Window
    val rowGen = for {
      g <- Gen.choose(0, 3)
      ord <- Gen.choose(0L, 5000L)
      v <- Gen.choose(-50L, 50L)
    } yield (s"g$g", ord, v)
    (0 until 5).foreach { i =>
      val rows = Gen.nonEmptyListOf(rowGen)
        .apply(Gen.Parameters.default.withSize(80), Seed(7L + i)).get
        // orderCol must be unique within each group
        .groupBy(r => (r._1, r._2)).values.map(_.head).toSeq
      val bucketWidth = Seq(1, 7, 64, 10000)(i % 4) // incl. degenerate 1-per and all-in-one
      val df = rows.toDF("grp", "ord", "v")
      val naive = df.withColumn("cum",
        sum("v").over(Window.partitionBy("grp").orderBy("ord")
          .rowsBetween(Window.unboundedPreceding, 0)))
      val scanned = Scale.prefixSum(df, Seq("grp"), "ord", "v",
        bucket = expr(s"ord div $bucketWidth"), outCol = "cum")
      assert(scanned.except(naive).count() === 0 && naive.except(scanned).count() === 0,
        s"prefixSum diverged at seed ${7 + i}, bucketWidth $bucketWidth")
    }
  }

  private val descKeys = Seq(Scale.SortKey("n", desc = true), Scale.SortKey("token"))

  test("distributedRank matches the single-task row_number exactly") {
    import org.apache.spark.sql.expressions.Window
    // Zipf-ish head: many rows share the top counts, tiebroken by token —
    // the exact shape where equal keys must split across range buckets
    val df = (1 to 500).map(i => (s"t${i % 37}_$i", (i % 13).toLong)).toDF("token", "n")
    val naive = df.withColumn("rnk",
      row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
    val dist = Scale.distributedRank(df, descKeys, parts = 7, outCol = "rnk")
    assert(dist.count() === naive.count())
    assert(dist.except(naive).count() === 0 && naive.except(dist).count() === 0)
  }

  test("distributedRank == single window on random unique orders (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.sql.expressions.Window
    val rowGen = for {
      n <- Gen.choose(0L, 20L)
      t <- Gen.identifier.map(_.take(8))
    } yield (t, n)
    (0 until 3).foreach { i =>
      val rows = Gen.nonEmptyListOf(rowGen)
        .apply(Gen.Parameters.default.withSize(120), Seed(11L + i)).get
        .distinctBy(_._1) // token must be unique for a total order
      val parts = Seq(1, 5, 64)(i) // incl. degenerate single-part and parts >> rows
      val df = rows.toDF("token", "n")
      val naive = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
      val dist = Scale.distributedRank(df, descKeys, parts = parts, outCol = "rnk")
      assert(dist.except(naive).count() === 0 && naive.except(dist).count() === 0,
        s"distributedRank diverged at seed ${11 + i}, parts $parts")
    }
  }

  test("distributedRank under crafted skew: one dominant key spreads across range buckets") {
    import org.apache.spark.sql.expressions.Window
    // 90% of rows share ONE head value (the Zipf-head worst case for a
    // rank bucketed on the value alone) — the tiebreaker rides in the
    // boundary keys, so the sampled boundaries split the hot run instead
    // of piling it into one bucket
    val df = (1 to 10000).map { i =>
      val n = if (i <= 9000) 999L else (i % 100).toLong
      (f"tok$i%05d", n)
    }.toDF("token", "n")
    val parts = 8
    // exactness is unaffected by the skew
    val naive = df.withColumn("rnk",
      row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
    val dist = Scale.distributedRank(df, descKeys, parts, "rnk")
    assert(dist.except(naive).count() === 0 && naive.except(dist).count() === 0)
    // the skew pin itself: no range bucket carries the whole 9000-row
    // hot run, and the input still spreads across most buckets
    val sizes = df.withColumn("b", Scale.rangeBucket(df, descKeys, parts))
      .groupBy("b").count().collect().map(_.getLong(1))
    assert(sizes.max < 9000L,
      s"hot key must split across buckets, got ${sizes.sorted.reverse.toSeq}")
    assert(sizes.count(_ > 0) >= parts / 2,
      s"skewed input should still use most buckets: ${sizes.sorted.reverse.toSeq}")
  }

  test("distributedRank's rank window partitions by the range bucket, never globally") {
    val df = (1 to 200).map(i => (i.toLong, s"tok$i")).toDF("n", "token")
    val out = Scale.distributedRank(df, descKeys, parts = 8, outCol = "rnk")
    val plan = out.queryExecution.optimizedPlan.toString
    val rn = plan.linesIterator.filter(_.contains("row_number")).toSeq
    assert(rn.nonEmpty && rn.forall(_.contains("_drb")),
      s"row_number window must be keyed on _drb (per-range-bucket), got:\n$plan")
  }

  test("distributedRank is replan-safe: a pure-function bucket, no spark_partition_id") {
    // The r9 hazard class: the bucket frame is consumed by TWO plan
    // branches (local ranks, bucket counts). With exchange reuse OFF and
    // AQE OFF each branch plans and EVALUATES its lineage independently —
    // under the old repartitionByRange + spark_partition_id() form the two
    // evaluations could assign different partition ids (range boundaries
    // resample per evaluation, and upstream shuffle-read order is
    // nondeterministic), silently desyncing ranks from offsets. The bucket
    // is now a pure function of row values, so independent re-evaluation
    // must still bit-match the single-window rank.
    import org.apache.spark.sql.expressions.Window
    val reuse = spark.conf.get("spark.sql.exchange.reuse", "true")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // upstream SHUFFLE (groupBy) so each branch's recompute reads its
      // input in whatever order the shuffle fetch delivers — the exact
      // precondition under which the old form's sampling diverged
      val df = (1 to 4000).map(i => (s"t${i % 613}", 1L)).toDF("token", "one")
        .groupBy("token").agg(sum("one").as("n"))
      val naive = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
      val dist = Scale.distributedRank(df, descKeys, parts = 8, outCol = "rnk")
      assert(dist.except(naive).count() === 0 && naive.except(dist).count() === 0)
      // and the hazard pattern itself is gone from the plan
      val plan = dist.queryExecution.optimizedPlan.toString.toLowerCase
      assert(!plan.contains("spark_partition_id"),
        s"distributedRank must not depend on spark_partition_id:\n$plan")
    } finally {
      spark.conf.set("spark.sql.exchange.reuse", reuse)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  test("rangeBucket binary search == the r10 literal chain (nulls, desc, boundary-equal rows)") {
    // The evaluation-strategy swap must not move a single row: the chain
    // (retained as rangeBucketChain, the executable spec of the bucket
    // order) and the binary-search expression run over the SAME frozen
    // boundaries on data with null keys, both directions, and rows equal
    // to boundary tuples (every boundary IS a data row here).
    val rnd = new scala.util.Random(17)
    val rows = (1 to 400).map { i =>
      val n: Option[Long] = if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(40).toLong)
      (n, s"tok${rnd.nextInt(90)}_$i", rnd.nextInt(1000))
    }
    val df = rows.toDF("n", "token", "m")
    val keySets = Seq(
      Seq(Scale.SortKey("n", desc = true), Scale.SortKey("token")),
      Seq(Scale.SortKey("n"), Scale.SortKey("token", desc = true)),
      Seq(Scale.SortKey("m"), Scale.SortKey("token"))) // int key — cast path
    for (keys <- keySets; parts <- Seq(2, 16, 64)) {
      val boundaries = Scale.sampleBoundaries(df, keys, parts)
      assert(boundaries.nonEmpty, s"fixture must yield boundaries at parts=$parts")
      val both = df
        .withColumn("bs", Scale.rangeBucketSearchCol(df, keys, boundaries))
        .withColumn("bc", Scale.rangeBucketChain(boundaries, keys))
      val diff = both.filter(col("bs") =!= col("bc")).count()
      assert(diff === 0,
        s"search/chain diverged on $diff rows at keys=$keys parts=$parts")
    }
  }

  test("distributedRank at parts=2048: exact, codegen'd, constant-size expression") {
    // The r10 cliff this guards: the when-chain form at parts ~10³ was
    // thousands of comparison terms per row and a generated method large
    // enough to abandon whole-stage codegen. The search expression must
    // (a) still bit-match the single-window rank, (b) carry the boundary
    // table OUTSIDE the expression tree (O(1) nodes however large parts
    // is), and (c) stay inside WholeStageCodegen with fallback disabled
    // so a compile failure is loud.
    import org.apache.spark.sql.expressions.Window
    // spark.range, not a local Seq: ConvertToLocalRelation would fold the
    // projection over a LocalRelation eagerly (interpreted, no physical
    // plan to observe) and the codegen assertion would be vacuous
    val df = spark.range(1, 6001).selectExpr(
      "concat('t', id % 211, '_', id) AS token", "id % 97 AS n")
    val fallback = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val naive = df.withColumn("rnk",
        row_number().over(Window.orderBy(col("n").desc, col("token"))).cast("long"))
      val dist = Scale.distributedRank(df, descKeys, parts = 2048, outCol = "rnk")
      assert(dist.except(naive).count() === 0 && naive.except(dist).count() === 0)
      // (b): the analyzed expression holds ~2k boundaries yet is 3 nodes
      val bucketed = df.withColumn("b", Scale.rangeBucket(df, descKeys, 2048))
      val rbs = bucketed.queryExecution.analyzed.expressions
        .flatMap(_.collect { case r: graft.functions.RangeBucketSearch => r })
      assert(rbs.nonEmpty, "rangeBucket must resolve to RangeBucketSearch")
      assert(rbs.head.boundaries.length > 1000,
        s"fixture must exercise a large boundary table, got ${rbs.head.boundaries.length}")
      val nodes = rbs.head.collect { case e => e }.size
      assert(nodes <= 8,
        s"expression tree must be O(1) in parts, got $nodes nodes")
      // (c): the bucket projection runs inside WholeStageCodegen
      import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
      val wsc = bucketed.queryExecution.executedPlan.collect {
        case w: WholeStageCodegenExec => w
      }
      val covered = wsc.exists(_.collect { case p: ProjectExec => p }.exists(
        _.projectList.exists(
          _.collect { case _: graft.functions.RangeBucketSearch => () }.nonEmpty)))
      assert(covered,
        s"bucket projection must be codegen'd:\n${bucketed.queryExecution.executedPlan}")
      assert(bucketed.groupBy("b").count().count() > 1500,
        "large-parts bucketing must actually spread the data")
    } finally spark.conf.set("spark.sql.codegen.fallback", fallback)
  }

  test("prefixSum in-bucket windows partition by (group, bucket), not group alone") {
    // the point of the two-phase scan: the big window's partitioning must
    // include the bucket, so parallelism is #(group, bucket) not #group
    val df = (1 to 100).map(i => ("only_group", i.toLong, 1L)).toDF("grp", "ord", "v")
    val out = Scale.prefixSum(df, Seq("grp"), "ord", "v",
      bucket = expr("ord div 10"), outCol = "cum")
    val plan = out.queryExecution.optimizedPlan.toString
    val windowSpecs = plan.linesIterator.filter(_.contains("specifiedwindowframe")).toSeq
    // the full-data running-sum window must key on _psb as well as grp
    assert(windowSpecs.exists(l => l.contains("_psb") && l.contains("ord")),
      s"expected an in-bucket window keyed on _psb:\n$plan")
    // and the result is still the plain 1..100 running sum
    assert(out.orderBy("ord").select("cum").as[Long].collect().toSeq === (1L to 100L))
  }

  // ---- fanOutScan: both guard branches, on real parquet files ----
  // The guard counts ROW GROUPS, not byte-range splits: a single-row-group
  // file plans multiple splits of which only one carries rows (measured:
  // sf0.1 lineitem -> splits (0, 600000, 0)), so an rdd-partition guard
  // self-disables in exactly the pathology fanOutScan exists to fix.

  private def withTempParquet(write: String => Unit)(body: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("fanout").toString
    try { write(dir); body(dir) }
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("fanOutScan amplifies a single-row-group scan to the session's parallelism") {
    withTempParquet { dir =>
      spark.range(10000).selectExpr("id", "id * 2 AS v")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    } { dir =>
      val df = spark.read.parquet(dir)
      assert(Scale.dataBearingSplits(df) === 1)
      val out = Scale.fanOutScan(df, col("id"))
      val target = spark.sparkContext.defaultParallelism
      assert(out.rdd.getNumPartitions === target, "fan-out must widen to defaultParallelism")
      // semantics preserved: same rows, exactly once
      assert(out.count() === 10000)
      assert(out.agg(sum("v")).as[Long].head() === (0L until 10000L).map(_ * 2).sum)
      // and every output partition actually carries rows (hash on unique id)
      val sizes = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
      assert(sizes.count(_ > 0) === target)
    }
  }

  test("fanOutScan is the identity when the source already provides enough row groups") {
    withTempParquet { dir =>
      // 8 files x 1 row group each >= 2*defaultParallelism under local[4]
      spark.range(8000).selectExpr("id", "id * 3 AS v")
        .repartition(8, col("id")).write.mode("overwrite").parquet(dir)
    } { dir =>
      val df = spark.read.parquet(dir)
      // data-bearing = min(planned splits, row groups): 8 one-row-group
      // files may bin-pack into fewer planned splits, but enough remain
      // to meet the local[4] target
      val splits = Scale.dataBearingSplits(df)
      assert(splits * 2 >= spark.sparkContext.defaultParallelism)
      val out = Scale.fanOutScan(df, col("id"))
      assert(out.queryExecution.analyzed eq df.queryExecution.analyzed,
        "enough splits -> identity, no exchange may enter the plan")
    }
  }

  test("guard short-circuits on file count alone — no footer sweep above the threshold") {
    // The production cold-start path: a many-file table must decide
    // "identity" from the driver-side listing (min(planned, files) already
    // meets the target), never by serially opening O(files) parquet
    // footers. The cumulative sweep counter is the proof — it must not
    // move for the many-file scan, and must move for a split-poor one.
    withTempParquet { dir =>
      spark.range(8000).selectExpr("id", "id * 3 AS v")
        .repartition(8, col("id")).write.mode("overwrite").parquet(dir)
    } { dir =>
      // force one planned split per file so the floor is the file count
      // (tiny files otherwise bin-pack into one partition and the guard
      // rightly falls through to the sweep)
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1048576")
      spark.conf.set("spark.sql.files.openCostInBytes", (4 * 1024 * 1024).toString)
      try {
        val df = spark.read.parquet(dir)
        assert(df.inputFiles.length === 8)
        assert(df.rdd.getNumPartitions >= 2, "fixture must plan multiple splits")
        val before = Scale.footerSweeps.get()
        val splits = Scale.dataBearingSplits(df)
        assert(splits * 2 >= spark.sparkContext.defaultParallelism)
        assert(Scale.footerSweeps.get() === before,
          "file-count floor met the target — the footer sweep must not run")
        // and fanOutScan stays the identity without any sweep either
        val out = Scale.fanOutScan(df, col("id"))
        assert(out.queryExecution.analyzed eq df.queryExecution.analyzed)
        assert(Scale.footerSweeps.get() === before)
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
        spark.conf.unset("spark.sql.files.openCostInBytes")
      }
      // control: a split-poor single-file scan DOES sweep (fresh file set,
      // so the memo can't satisfy it)
      withTempParquet { d2 =>
        spark.range(100).coalesce(1).write.mode("overwrite").parquet(d2)
      } { d2 =>
        val before = Scale.footerSweeps.get()
        assert(Scale.dataBearingSplits(spark.read.parquet(d2)) === 1)
        assert(Scale.footerSweeps.get() === before + 1,
          "split-poor scan must still probe footers")
      }
    }
  }
}
