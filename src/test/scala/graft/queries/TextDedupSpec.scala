package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the dedup building blocks that have no SQL oracle surface
  * of their own (the oracle queries exercise them only on the synthetic
  * corpus' shallow graphs). */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedupKeepBest: exactly one keeper per cluster, and it is the longest member") {
    val sf = "/root/testdata/sf0.001"
    val out = TextDedup.dedupKeepBest.fn(spark, sf).cache()
    try {
      assert(out.count() > 0, "near-dup clusters must exist or the property is vacuous")
      val perCluster = out.groupBy("cluster_id").agg(
        sum(when(col("keep"), 1).otherwise(0)).as("keepers"),
        max("n_chars").as("max_chars"),
        max(when(col("keep"), col("n_chars"))).as("kept_chars"))
      assert(perCluster.filter(col("keepers") =!= 1).count() === 0,
        "each cluster must keep exactly one doc")
      assert(perCluster.filter(col("kept_chars") =!= col("max_chars")).count() === 0,
        "the kept doc must have the cluster-max length")
      // and the membership agrees with the canonical-minimum keep's
      // clusters — BOTH directions, so silently dropped rows (e.g. an
      // inner-join refactor losing comp members) fail here too
      val keepRows = graft.queries.TextDedup.dedupKeep.fn(spark, sf)
        .select("doc_id", "cluster_id")
      val mine = out.select("doc_id", "cluster_id")
      assert(mine.except(keepRows).count() === 0 && keepRows.except(mine).count() === 0,
        "keep-best must decide over exactly the same clusters as canonical keep")
    } finally { out.unpersist(); graft.ops.Caches.drain() }
  }

  test("connectedComponents: 40-node chain (diameter 39) converges with bounded lineage") {
    // a path graph is the worst case for plain min-label propagation (one
    // hop per round = 39 rounds); pointer jumping doubles reach per round,
    // so the DEFAULT maxRounds=30 must comfortably cover it (~6 rounds)
    val chain = (0L until 39L).map(i => (i, i + 1))
    val edges = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val labels = TextDedup.connectedComponents(edges)
    val out = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.size === 40)
    assert(out.values.forall(_ == 0L), "every node must reach the component minimum")
    // the returned frame is checkpoint-backed: its plan is a scan, not the
    // 40-round join tower (bounded depth is the point of the checkpoint)
    val planDepth = labels.queryExecution.optimizedPlan.collect { case p => p }.size
    assert(planDepth <= 3, s"expected a checkpoint-backed scan, got depth $planDepth")
  }

  test("connectedComponentsWithRounds: path-graph round count is O(log diameter)") {
    // the scale pin: plain propagation needs diameter rounds (39 here);
    // pointer jumping doubles reach per round, so fixpoint lands by
    // ~⌈log2(39)⌉+1 = 7 and the fused per-round probe (r13: the sum
    // probe IS the round's materializing action) detects it exactly
    // there
    val chain = (0L until 39L).map(i => (i, i + 1))
    val edges = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val (labels, rounds) = TextDedup.connectedComponentsWithRounds(edges)
    assert(labels.collect().map(_.getLong(1)).forall(_ == 0L))
    assert(rounds <= 8, s"pointer jumping must converge in O(log d) rounds, took $rounds")
    graft.ops.Caches.drain()
  }

  test("CC checkpoint release never de-caches a memo that materializes mid-action") {
    // the mis-capture regression: q_entity_cluster's edge list derives
    // from the session-shared DL-scored pair memo, whose cache blocks
    // first persist DURING the CC edges-checkpoint action — a
    // getPersistentRDDs-diff tracker captured them as "the checkpoint's
    // RDDs" and released them, silently de-caching the memo for every
    // later consumer. The tracker now extracts the checkpoint's own
    // LogicalRDD instead; the memo must remain cached afterwards.
    val s2 = spark.newSession()
    val sf = "/root/testdata/sf0.001"
    Relational.entityCluster.fn(s2, sf).count()
    graft.ops.Caches.drain()
    // fuzzyDamerau.fn returns the memoized instance — its storage level
    // tells us whether the shared cache survived the CC run
    val memoized = Relational.fuzzyDamerau.fn(s2, sf)
    assert(memoized.storageLevel.useMemory,
      "shared fuzzy-pair memo was de-cached by the checkpoint tracker")
  }

  test("connectedComponents releases intermediate checkpoints; drain frees the rest") {
    val sc = spark.sparkContext
    graft.ops.Caches.drain()
    val before = sc.getPersistentRDDs.keySet
    val chain = (0L until 20L).map(i => (i, i + 1))
    val edges = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    TextDedup.connectedComponents(edges).count()
    // every replaced round's blocks and the edges checkpoint are released
    // inside the loop; only the final labels snapshot may remain
    val outstanding = sc.getPersistentRDDs.keySet -- before
    assert(outstanding.size <= 2,
      s"intermediate rounds must be freed when replaced; ${outstanding.size} RDDs linger")
    graft.ops.Caches.drain()
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "drain must release the final labels snapshot (leaseRdd)")
  }

  test("per-row scalar band table == aggregate MinHash bands (min distributivity)") {
    // minhashBandsFor must produce EXACTLY the band keys the batch LSH
    // family derives via explode+groupBy-min, or stream-vs-corpus buckets
    // would silently miss: array_min over the doc's shingle-hash array is
    // the same min as the aggregate over its exploded rows. Real docs
    // (sf0.001), uncapped on both sides.
    val sf = "/root/testdata/sf0.001"
    val docsDf = graft.Tables.documents(spark, sf).select("doc_id", "text")
    val scalar = TextDedup.minhashBandsFor(docsDf)
      .select("doc_id", "band_id", "band_val")
    val aggregate = TextDedup.minhashBands(
      TextDedup.minhashSig(TextDedup.shingledRaw(spark, sf, 3)))
    assert(scalar.except(aggregate).count() === 0 &&
      aggregate.except(scalar).count() === 0,
      "scalar and aggregate band derivations diverged")
    assert(scalar.count() > 0)
  }

  test("scalar band table == aggregate bands on random docs incl. edge lengths (property)") {
    // random word soups over a tiny alphabet maximize shingle collisions;
    // lengths 0..6 words cover the below-k, exactly-k, and above-k edges
    // (docs with <3 words drop from BOTH derivations)
    val rnd = new scala.util.Random(1234)
    val words = Seq("a", "bb", "ccc", "d", "ee")
    val docsList = (0L until 60L).map { i =>
      val n = rnd.nextInt(7)
      (i, Seq.fill(n)(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val df = docsList.toDF("doc_id", "text")
    val scalar = TextDedup.minhashBandsFor(df).select("doc_id", "band_id", "band_val")
    val viaAgg = TextDedup.minhashBands(TextDedup.minhashSig(
      df.withColumn("ws", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(ws) >= 3
             THEN array_distinct(transform(sequence(1, size(ws) - 2),
                                           i -> concat_ws(' ', slice(ws, i, 3))))
             ELSE array() END""")).as("shingle"))))
    assert(scalar.except(viaAgg).count() === 0 && viaAgg.except(scalar).count() === 0)
    // only docs with ≥3 words band (4 bands each)
    val expectedDocs = docsList.count(_._2.split(" ").count(_.nonEmpty) >= 3)
    assert(scalar.select("doc_id").distinct().count() === expectedDocs)
  }

  test("connectedComponents: two separate components keep distinct minima") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val out = TextDedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents == driver-side union-find on random graphs (property)") {
    // the strongest guard on the pointer-jumping step: against a trusted
    // sequential union-find on arbitrary random topologies
    def unionFind(n: Int, es: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map((0L until n.toLong).map(i => i -> i): _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0L until n.toLong).map(i => i -> find(i)).toMap
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(10)
      val es = (1 to (n + rnd.nextInt(n))).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }.distinct
      if (es.nonEmpty) {
        val edges = (es ++ es.map(_.swap)).toDF("src", "dst")
        val got = TextDedup.connectedComponents(edges)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val exp = unionFind(n, es)
        // connectedComponents only labels nodes that appear in an edge
        got.foreach { case (id, label) =>
          assert(label === exp(id), s"trial $trial node $id: got $label expected ${exp(id)}")
        }
      }
    }
  }

  test("lpaLabels: a single bridge between two triangles splits where CC merges") {
    // the motivating case for LPA-on-top-of-CC: LSH band chains weld
    // genuine duplicate cliques together through one spurious candidate
    // pair; min-label CC collapses everything, majority-support LPA
    // does not cross the bridge
    val tri1 = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val tri2 = Seq((4L, 5L), (5L, 6L), (4L, 6L))
    val bridge = Seq((3L, 4L))
    val all = tri1 ++ tri2 ++ bridge
    val edges = (all ++ all.map(_.swap)).toDF("src", "dst")
    val cc = TextDedup.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc.values.toSet.size === 1, "CC must weld the barbell into one component")
    val lpa = TextDedup.lpaLabels(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val left = Set(1L, 2L, 3L).map(lpa)
    val right = Set(4L, 5L, 6L).map(lpa)
    assert(left.size === 1 && right.size === 1,
      s"each triangle must converge to one label, got $lpa")
    assert(left != right, s"the bridge must not merge the triangles, got $lpa")
  }

  test("lpaLabels communities always refine CC components (property)") {
    // a label travels only along edges, so it can never leave the
    // component it originated in — any shared final label implies a
    // shared component, on arbitrary random topologies
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val n = 6 + rnd.nextInt(12)
      val es = (1 to (n + rnd.nextInt(n))).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }.distinct
      if (es.nonEmpty) {
        val edges = (es ++ es.map(_.swap)).toDF("src", "dst")
        val cc = TextDedup.connectedComponents(edges)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val lpa = TextDedup.lpaLabels(edges)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(lpa.keySet === cc.keySet, s"trial $trial: same node universe")
        lpa.groupBy(_._2).values.foreach { members =>
          val comps = members.keys.map(cc).toSet
          assert(comps.size === 1,
            s"trial $trial: LPA community ${members.keys.toSeq.sorted} spans CC components $comps")
        }
      }
    }
  }

  test("connectedComponents fails loudly when maxRounds is under the diameter") {
    // r13: a round is now propagate + CcJumpsPerRound pointer-doubling
    // jumps, so per round the reachable chase depth multiplies by at most
    // (d+1)·2^3 — after 2 rounds that is < 200, so a 200-link chain
    // cannot converge in 2 rounds and the guard must throw
    val chain = (0L until 200L).map(i => (i, i + 1))
    val edges = (chain ++ chain.map(_.swap)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      TextDedup.connectedComponents(edges, maxRounds = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dedupSubstring: non-vacuous, counts consistent, clean text tiles the kept tokens") {
    val sf = "/root/testdata/sf0.001"
    val out = TextDedup.dedupSubstring.fn(spark, sf).cache()
    // the corpus must exercise every regime: untouched docs, partially
    // stripped docs, and fully-duplicated docs (measured present at sf0.001)
    assert(out.filter(col("n_dup_tokens") === 0).count() > 0, "no untouched docs — k too small")
    assert(out.filter(col("n_dup_tokens") > 0 && col("n_dup_tokens") < col("n_tokens")).count() > 0,
      "no partially-stripped docs")
    assert(out.filter(col("n_dup_tokens") === col("n_tokens")).count() > 0,
      "no fully-duplicated docs — the near-dup corpus should contain some")
    // clean_text's token count must equal the kept-token count exactly
    val bad = out.filter(col("n_dup_tokens") < col("n_tokens"))
      .filter(size(split(col("clean_text"), " ")).cast("long")
        =!= col("n_tokens") - col("n_dup_tokens"))
    assert(bad.count() === 0, "clean_text must contain exactly the non-duplicated tokens")
    // a duplicated span needs >= 2 docs by definition
    assert(out.filter(col("n_dup_tokens") > 0).count() >= 2)
  }

  test("pagerank: rank mass is conserved up to truncation and spreads non-degenerately") {
    val sf = "/root/testdata/sf0.001"
    val out = TextDedup.pagerank.fn(spark, sf).cache()
    val scale = 1000000000000L
    val total = out.agg(sum("pr")).head.getLong(0)
    // integral division only ever drops mass: the total must stay within
    // a few percent below the fixed-point unit and never exceed it
    assert(total <= scale, s"rank mass exceeded the fixed-point unit: $total")
    assert(total >= (scale * 0.90).toLong, s"too much mass lost to truncation: $total")
    // a connected candidate graph must differentiate ranks
    val (mx, mn) = (out.agg(max("pr")).head.getLong(0), out.agg(min("pr")).head.getLong(0))
    assert(mx > mn, "all ranks equal — the iteration did nothing")
    // every rank holds at least the damping floor
    val n = out.count()
    assert(out.filter(col("pr") < (15L * (scale / n)) / 100L).count() === 0)
  }

  test("samplePriority: exact size, est_weight = max(w, tau) >= w, priorities >= tau") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextDedup.samplePriority.fn(spark, sf).collect()
    assert(rows.length === 20)
    val minPriority = rows.map(_.getAs[Long]("priority")).min
    rows.foreach { r =>
      val (w, est) = (r.getAs[Long]("w"), r.getAs[Long]("est_weight"))
      assert(est >= w, "estimation weight can never shrink a kept item")
      // tau is the (k+1)-th priority, so every KEPT priority exceeds it
      // and est = max(w, tau) is bounded by max(w, min kept priority)
      assert(est <= math.max(w, minPriority))
    }
    // estimation weights are >= raw weights, so the Horvitz-Thompson sum
    // dominates the sample's own mass (sanity, not unbiasedness-in-mean)
    assert(rows.map(_.getAs[Long]("est_weight")).sum >= rows.map(_.getAs[Long]("w")).sum)
  }

  test("dedupPpjoin == brute-force all-pairs on a crafted corpus (completeness)") {
    // the production claim is EXACT J >= 0.5 output from a prefix-filtered
    // equi-join; here the quadratic reference runs driver-side over a
    // corpus crafted to have qualifying pairs (appending one word to an
    // n-gram set of size g adds exactly one gram, so J = g/(g+1) > 1/2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ppjoin").toString
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val rnd = new scala.util.Random(7)
    val base = (1L to 30L).map { id =>
      id -> Vector.fill(8 + rnd.nextInt(5))(words(rnd.nextInt(words.size)))
        .mkString(" ")
    }
    val dups = base.take(6).map { case (id, t) => (id + 100L) -> (t + " omega") }
    val docs = base ++ dups
    docs.toDF("doc_id", "text").write
      .parquet(dir + "/documents.parquet")
    val got = TextDedup.dedupPpjoin.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    graft.ops.Caches.drain()
    def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val sets = docs.map { case (id, t) => id -> grams(t) }.toMap
    val ids = docs.map(_._1)
    val exp = (for {
      a <- ids; b <- ids if a < b
      inter = (sets(a) & sets(b)).size
      if 3 * inter >= sets(a).size + sets(b).size
    } yield (a, b, inter.toLong)).toSet
    assert(exp.size >= 6, s"crafted corpus must contain qualifying pairs, got ${exp.size}")
    assert(got === exp)
  }

  test("dedupPrefix == brute-force prefix scan; fingerprint precondition holds") {
    // completeness of the first-10-word blocking requires every doc to
    // carry >= 10 words — pin the corpus precondition the scaladoc claims
    val floor = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(min(size(split(col("text"), " ")))).head().getInt(0)
    assert(floor >= 10, s"corpus min words $floor < fingerprint width 10")
    // crafted corpus: truncations at word boundaries, an exact dup, a
    // same-head NON-prefix pair (shared 10-word head, divergent tail,
    // must be filtered by the verify), and an unrelated doc
    val head10 = (1 to 10).map("w" + _).mkString(" ")
    val docs = Seq(
      1L -> (head10 + " tail one two three"),
      2L -> head10,                       // strict prefix of 1 (and 3, 4)
      3L -> (head10 + " tail one two three"), // exact dup of 1
      4L -> (head10 + " different continuation"), // same head, not a prefix of 1/3
      5L -> (1 to 10).map("x" + _).mkString(" ")) // unrelated
    val dir = java.nio.file.Files.createTempDirectory("graft-prefix").toString
    docs.toDF("doc_id", "text").write.parquet(dir + "/documents.parquet")
    val got = TextDedup.dedupPrefix.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val exp = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      (s, l) = if (ta.length <= tb.length) (ta, tb) else (tb, ta)
      if l.startsWith(s)
    } yield (a, b, if (ta.length == tb.length) 1L else 0L)).toSet
    assert(exp === Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 0L), (2L, 4L, 0L)))
    assert(got === exp)
  }

  test("dedupSubstring: marking is linear — no pair join anywhere in the plan") {
    val plan = TextDedup.dedupSubstring.fn(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the only joins are gram-hash semi/inner joins and the final per-doc
    // left join — none of them key two document sides on the same derived
    // value, so no O(df²) key exists (unlike the capped Jaccard family)
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("langIdConfusion: hand-checkable crafted corpus and conservation laws") {
    // 3 en docs predicted en; 1 de doc full of English markers (predicted
    // en → en fp, de fn); 2 fr docs predicted fr; 1 fr doc with German
    // markers (predicted de → de fp, fr fn)
    val crafted = Seq(
      (0L, "en", "the cat and the hat"),
      (1L, "en", "a tale of two cities"),
      (2L, "en", "to be or not to be"),
      (3L, "de", "the the the"),
      (4L, "fr", "le chat et la chatte"),
      (5L, "fr", "les enfants est que"),
      (6L, "fr", "der die das und")).toDF("doc_id", "lang", "text")
    val m = TextDedup.langIdConfusion(TextDedup.langIdScoredOf(crafted))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    // (support, tp, fp, fn, precision_ppm, recall_ppm, f1_ppm)
    assert(m("en") === ((3L, 3L, 1L, 0L, 750000L, 1000000L, 857142L)))
    assert(m("de") === ((1L, 0L, 1L, 1L, 0L, 0L, 0L)))
    assert(m("fr") === ((3L, 2L, 0L, 1L, 1000000L, 666666L, 800000L)))
    // conservation on the real corpus: Σtp+Σfn = N (every true label
    // accounted), Σfp = Σfn (every miss is some other label's false hit
    // when the predictor's range ⊆ the truth label set, as here)
    val real = TextDedup.langIdEval.fn(spark, "/root/testdata/sf0.001")
      .agg(sum("tp"), sum("fn"), sum("fp"), sum("support"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(real._1 + real._2 === real._4, "tp + fn must equal total support")
    assert(real._3 === real._2, "fp and fn totals must balance")
    assert(real._4 === 500L, "sf0.001 documents table is 500 docs")
  }
}
