package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedAgg: tumbling 1h windows with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.windowedAgg(events)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 00:50:00"), 1L, "click", 2.0),
        (3L, ts("2024-01-01 01:10:00"), 2L, "view", 5.0))
      q.processAllAvailable()
      val out = spark.table("win_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(out === Set(
        ("2024-01-01 00:00:00.0", "click", 2L, 3.0),
        ("2024-01-01 01:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowedAgg → foreachBatch → Sink.overwriteTable: streaming feeds the batch sink") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-sink").toString + "/agg"
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.windowedAgg(events)
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.etl.Sink.overwriteTable(batch, dir)
      }
      .start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0),
        (2L, ts("2024-01-01 00:20:00"), 1L, "click", 2.0))
      q.processAllAvailable()
      val out = spark.read.parquet(dir)
      assert(out.count() === 1)
      val r = out.head()
      assert(r.getAs[Long]("n_events") === 2L)
      assert(r.getAs[Double]("total_value") === 3.0)
      assert(out.columns.contains("_TIMESTAMP")) // sink stamped the batch
    } finally q.stop()
  }

  test("publishSnapshots: each micro-batch lands as an atomic manifest generation") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-snap").toString + "/agg"
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.publishSnapshots(StreamOps.windowedAgg(events), base)
    try {
      input.addData((1L, ts("2024-01-01 00:10:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      val snap1 = graft.etl.Sink.Manifest.read(spark, base)
      assert(snap1.agg(org.apache.spark.sql.functions.sum("n_events")).head.getLong(0) === 1L)
      // a reader holding the first generation survives the next publication
      val firstGenFiles = snap1.inputFiles
      input.addData((2L, ts("2024-01-01 00:20:00"), 1L, "click", 2.0),
        (3L, ts("2024-01-01 01:20:00"), 1L, "view", 5.0))
      q.processAllAvailable()
      val snap2 = graft.etl.Sink.Manifest.read(spark, base)
      assert(snap2.agg(org.apache.spark.sql.functions.sum("n_events")).head.getLong(0) === 3L)
      assert(firstGenFiles.forall(f => new java.io.File(new java.net.URI(f)).exists),
        "previous generation must survive one more publication for in-flight readers")
    } finally q.stop()
  }

  test("nearDupCandidates: stream-static LSH candidates == the batch band join") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "completely unrelated text about spark execution plans")).toDF("doc_id", "text")
    val corpusBands = graft.queries.TextDedup.minhashCorpusBands(corpus).cache()
    // stream side: doc 100 duplicates corpus doc 1 (identical shingles →
    // identical signature → guaranteed band hit); 101 shares nothing
    val streamDocs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog", new java.sql.Timestamp(1700000000000L)),
      (101L, "nothing here overlaps with any corpus document at all", new java.sql.Timestamp(1700000001000L)))
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    streamDocs.toDF("doc_id", "text", "ts").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, ts TIMESTAMP").parquet(dir)
    val q = StreamOps.nearDupCandidates(stream, corpusBands)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("neardup_stream_out")
        .select("doc_id", "corpus_doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch twin: the same scalar band projection joined batch-side
      val batch = graft.queries.TextDedup
        .minhashBandsFor(streamDocs.toDF("doc_id", "text", "ts"))
        .join(corpusBands, Seq("band_id", "band_val"))
        .select("doc_id", "corpus_doc_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch, "stream and batch candidate sets diverged")
      assert(streamed.contains((100L, 1L)), "the crafted duplicate must be flagged")
      assert(!streamed.exists(_._1 == 101L), "the unrelated doc must not match")
    } finally { q.stop(); corpusBands.unpersist(); () }
  }

  test("file-stream over real testdata events == batch q_stream_window grouping") {
    // the streaming file source wants a directory: stage the events file
    val dir = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = StreamOps.windowedAgg(StreamOps.readEvents(spark, dir.toString))
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_stream_out")
        .select("window_start", "event_type", "n_events")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = graft.queries.EventsMultimodal.streamWindow
        .fn(spark, "/root/testdata/sf0.001")
        .select("window_start", "event_type", "n_events")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("slidingAgg: file stream == batch q_stream_sliding, every event in 2 windows") {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-sliding")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val q = StreamOps.slidingAgg(StreamOps.readEvents(spark, dir.toString))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sliding_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sliding_stream_out")
        .select("window_start", "event_type", "n_events", "total_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = graft.queries.EventsMultimodal.streamSliding
        .fn(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // hopping invariant: summed per-window counts == 2 × event count
      val total = streamed.toSeq.map(_._3).sum
      val nEvents = spark.read.parquet(dir.resolve("events.parquet").toString).count()
      assert(total === 2 * nEvents, "every event must land in exactly duration/slide windows")
    } finally q.stop()
  }

  test("END-TO-END: real-file stream → windowedAgg → foreachBatch sink == batch on the final table") {
    // the full production shape in one test: a file-stream over the real
    // testdata events, windowed aggregation, foreachBatch into the batch
    // sink, equality asserted on the PERSISTED table — not on an in-memory
    // intermediate
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    val sink = java.nio.file.Files.createTempDirectory("graft-e2e-sink").toString + "/agg"
    val q = StreamOps.windowedAgg(StreamOps.readEvents(spark, dir.toString))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.etl.Sink.overwriteTable(batch, sink)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("window_start", "event_type", "n_events", "total_value")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val streamed = keyed(spark.read.parquet(sink))
    val batch = keyed(graft.queries.EventsMultimodal.streamWindow
      .fn(spark, "/root/testdata/sf0.001"))
    assert(streamed.keySet === batch.keySet)
    assert(streamed.nonEmpty)
    streamed.foreach { case (k, (n, total)) =>
      assert(n === batch(k)._1, s"n_events diverged at $k")
      // both sides use the quantized Exact sum → bitwise equal, regardless
      // of micro-batch boundaries
      assert(java.lang.Double.doubleToLongBits(total) ===
        java.lang.Double.doubleToLongBits(batch(k)._2), s"total_value diverged at $k")
    }
  }

  test("joinWithinInterval: clicks pair with same-user views in the 10-min lookback only") {
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val viewsIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val joined = StreamOps.joinWithinInterval(
      clicksIn.toDF().toDF(cols: _*), viewsIn.toDF().toDF(cols: _*))
    val q = joined.writeStream.format("memory").queryName("interval_join")
      .outputMode("append").start()
    try {
      viewsIn.addData(
        (10L, ts("2024-01-01 00:05:00"), 1L, "view", 0.0),  // 3 min before → pairs
        (11L, ts("2024-01-01 00:07:30"), 1L, "view", 0.0),  // 30s before → pairs
        (12L, ts("2024-01-01 00:09:00"), 1L, "view", 0.0),  // AFTER the click → no
        (13L, ts("2023-12-31 23:00:00"), 1L, "view", 0.0),  // 68 min before → no
        (14L, ts("2024-01-01 00:06:00"), 2L, "view", 0.0))  // other user → no
      clicksIn.addData((1L, ts("2024-01-01 00:08:00"), 1L, "click", 1.0))
      q.processAllAvailable()
      val got = spark.sql("SELECT view_id FROM interval_join ORDER BY view_id")
        .as[Long].collect().toSeq
      assert(got === Seq(10L, 11L))
    } finally q.stop()
  }

  test("joinWithinInterval left_outer: an unattributed click emits NULLs once its window closes") {
    implicit val sqlCtx = spark.sqlContext
    val clicksIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val viewsIn = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val joined = StreamOps.joinWithinInterval(
      clicksIn.toDF().toDF(cols: _*), viewsIn.toDF().toDF(cols: _*), "left_outer")
    val q = joined.writeStream.format("memory").queryName("interval_outer")
      .outputMode("append").start()
    try {
      // user 1's click has a view in-window; user 3's click has none
      viewsIn.addData((10L, ts("2024-01-01 00:05:00"), 1L, "view", 0.0))
      clicksIn.addData(
        (1L, ts("2024-01-01 00:08:00"), 1L, "click", 1.0),
        (3L, ts("2024-01-01 00:08:00"), 3L, "click", 1.0))
      q.processAllAvailable()
      // push BOTH watermarks far past click_ts + interval so the engine can
      // prove no view will ever arrive for user 3 — only then may the outer
      // row (with NULL view columns) be emitted
      viewsIn.addData((99L, ts("2024-01-01 02:00:00"), 9L, "view", 0.0))
      clicksIn.addData((98L, ts("2024-01-01 02:00:00"), 9L, "click", 0.0))
      q.processAllAvailable()
      // one more batch: outer rows flush on the watermark AFTER the advance
      viewsIn.addData((97L, ts("2024-01-01 02:30:00"), 9L, "view", 0.0))
      clicksIn.addData((96L, ts("2024-01-01 02:30:00"), 9L, "click", 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
          "SELECT click_id, view_id FROM interval_outer WHERE click_id IN (1, 3)")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      assert(rows === Set((1L, Some(10L)), (3L, None)),
        "matched click pairs; unmatched click emits exactly one NULL-view row")
    } finally q.stop()
  }

  test("dedupeStream drops re-delivered event ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamOps.dedupeStream(events)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      input.addData(
        (1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0),
        (1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0), // same-batch dup
        (2L, ts("2024-01-01 00:01:00"), 1L, "view", 2.0))
      q.processAllAvailable()
      input.addData(
        (1L, ts("2024-01-01 00:00:00"), 1L, "click", 1.0)) // cross-batch redelivery
      q.processAllAvailable()
      val out = spark.table("dedup_out")
      assert(out.count() === 2)
      assert(out.select("event_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    } finally q.stop()
  }

  test("dedupeAgainstCorpus: stream-static anti-join drops already-ingested fingerprints") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq("fp_a", "fp_b").toDF("fingerprint")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "fingerprint")
    val q = StreamOps.dedupeAgainstCorpus(stream, corpus)
      .writeStream.outputMode("append")
      .format("memory").queryName("corpus_dedup_out").start()
    try {
      input.addData((1L, "fp_a"), (2L, "fp_new"), (3L, "fp_b"), (4L, "fp_other"))
      q.processAllAvailable()
      val out = spark.table("corpus_dedup_out")
        .select("doc_id").as[Long].collect().toSet
      assert(out === Set(2L, 4L), "corpus fingerprints must be dropped, new ones kept")
    } finally q.stop()
  }

  test("sessionize: 30-min gap closes a session (flatMapGroupsWithState)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionize(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      input.addData(
        StreamOps.Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        StreamOps.Event(2, ts("2024-01-01 00:10:00"), 7, "click", 2.0),
        // >30 min gap → first session closes when this arrives
        StreamOps.Event(3, ts("2024-01-01 01:00:00"), 7, "view", 4.0))
      q.processAllAvailable()
      val out = spark.table("sess_out").as[StreamOps.SessionOut].collect()
      assert(out.length === 1) // second session still open (no timeout fired)
      assert(out.head.n_events === 2L)
      assert(out.head.total_value === 3.0)
      assert(out.head.session_start === ts("2024-01-01 00:00:00"))
      assert(out.head.session_end === ts("2024-01-01 00:10:00"))
    } finally q.stop()
  }
}
