package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("asMediaItems wraps content as binary payload; extractFeatures runs per-partition") {
    val df = Seq((1L, "hello world"), (2L, "spark media payload")).toDF("id", "content")
    val items = Multimodal.asMediaItems(df, "id", "content", "image")
    assert(items.head().payload sameElements "hello world".getBytes("UTF-8"))
    val feats = Multimodal.extractFeatures(items).collect().sortBy(_.item_id)
    assert(feats.map(_.n_bytes).toSeq === Seq(11L, 19L))
    assert(feats.forall(f => f.width >= 1 && f.height >= 1 && f.embedding.length === 8))
    // deterministic: same payload → same features
    val again = Multimodal.extractFeatures(items).collect().sortBy(_.item_id)
    assert(feats.map(_.embedding.toSeq).toSeq === again.map(_.embedding.toSeq).toSeq)
  }

  test("resize rewrites dimensions and rescales features deterministically") {
    val df = Seq((1L, "some payload")).toDF("id", "content")
    val feats = Multimodal.extractFeatures(Multimodal.asMediaItems(df, "id", "content", "image"))
    val orig = feats.head()
    val resized = Multimodal.resize(feats, 32, 32).head()
    assert(resized.width === 32 && resized.height === 32)
    val ratio = (32f * 32) / (orig.width.toFloat * orig.height)
    assert(resized.embedding.toSeq === orig.embedding.map(_ * ratio).toSeq)
  }

  test("sampleFrames fans out every k-th frame index per item") {
    val df = Seq((1L, "clip-a"), (2L, "clip-b")).toDF("id", "content")
    val feats = Multimodal.extractFeatures(Multimodal.asMediaItems(df, "id", "content", "video"))
    val frames = Multimodal.sampleFrames(feats, everyK = 4)
    val perItem = frames.groupBy("item_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = feats.collect().map(f => f.item_id -> ((f.n_frames + 3) / 4).toLong).toMap
    assert(perItem === expected)
    assert(frames.filter($"frame_idx" % 4 =!= 0).count() === 0)
  }

  test("video kind gets multi-frame decode; others single frame") {
    val df = Seq((1L, "clip-bytes")).toDF("id", "content")
    val vid = Multimodal.extractFeatures(Multimodal.asMediaItems(df, "id", "content", "video")).head()
    val img = Multimodal.extractFeatures(Multimodal.asMediaItems(df, "id", "content", "image")).head()
    assert(vid.n_frames >= 1)
    assert(img.n_frames === 1)
  }

  test("multimodalAudio: amplitude mass, clipping, and quiet runs match a direct scan") {
    // crafted payloads (doc_id ≡ 1 mod 3 selects the audio slice):
    // id 1 has a 3-space quiet run and two 'z'-rail bytes; id 4 has no
    // quiet byte at all (max_quiet_run must be 0, via the left join);
    // id 2 is NOT audio and must not appear
    val docs = Seq(
      (1L, "az   bzz a"), (4L, "abcdef"), (2L, "   ")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-audio").toString
    docs.write.parquet(dir + "/documents.parquet")
    val got = graft.queries.EventsMultimodal.multimodalAudio.fn(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    graft.ops.Caches.drain()
    def brute(t: String) = {
      val bs = t.map(_.toInt)
      val quietRuns = t.map(c => if (c.toInt <= 40) 'q' else '.')
        .mkString.split("\\.").map(_.length)
      (bs.size.toLong, bs.map(v => math.abs(v - 128)).sum.toLong,
        bs.count(_ >= 120).toLong,
        if (quietRuns.isEmpty) 0L else quietRuns.max.toLong)
    }
    assert(got === Map(1L -> brute("az   bzz a"), 4L -> brute("abcdef")))
    assert(got(1L)._4 === 3L && got(4L)._4 === 0L && got(1L)._3 === 3L)
  }

  test("mapPartitions decoder pipeline reconciles with q_multimodal_quality's struct source") {
    // q_multimodal_quality documents that "a real deployment swaps the
    // struct's source for the mapPartitions decoder, the aggregation is
    // unchanged". Prove it: run the REAL per-partition decode path
    // (asMediaItems → extractFeatures with a Decoder producing the same
    // deterministic features the SQL fake derives) over the binary
    // payloads, aggregate identically, and require equality with the
    // query's struct-sourced output on the same corpus. The corpus is
    // ASCII, so payload byte length == length(text) on both sides.
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)

    // the oracle's modality tag, attached before wrapping (asMediaItems
    // tags a constant kind, so wrap per modality slice and union)
    val tagged = docs.withColumn("kind",
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video"))
    val items = Seq("image", "audio", "video").map { k =>
      Multimodal.asMediaItems(tagged.filter(col("kind") === k), "doc_id", "text", k)
    }.reduce(_ unionByName _)

    // the SQL fake, expressed as a Decoder over the raw payload bytes:
    // width/height from byte length, duration riding n_frames (1 fps;
    // image = 0 frames) — exactly the features the struct source computes
    val sqlFakeDecoder = new Multimodal.Decoder {
      def decode(it: Multimodal.MediaItem): Multimodal.MediaFeatures = {
        val n = it.payload.length
        Multimodal.MediaFeatures(it.item_id, it.kind, n.toLong,
          width = n % 64 + 1, height = n % 37 + 1,
          n_frames = if (it.kind == "image") 0 else n % 120 + 1,
          embedding = Array.empty)
      }
    }
    val decoded = Multimodal.extractFeatures(items, sqlFakeDecoder).toDF()
      .groupBy("kind")
      .agg(
        count(lit(1)).cast("long").as("n_items"),
        sum("n_bytes").as("total_bytes"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_bytes)")
          .cast("long").as("p50_bytes"),
        min(col("width").cast("long")).as("min_width"),
        max(col("width").cast("long")).as("max_width"),
        min(col("height").cast("long")).as("min_height"),
        max(col("height").cast("long")).as("max_height"),
        sum(col("n_frames").cast("long")).as("total_duration_s"),
        sum(when(col("width").cast("long") * col("height") >= 1024, 1L).otherwise(0L))
          .cast("long").as("n_large"))

    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val fromQuery = key(graft.queries.EventsMultimodal.multimodalQuality.fn(spark, sf))
    val fromDecoder = key(decoded)
    graft.ops.Caches.drain()
    assert(fromDecoder === fromQuery,
      "decoder-path aggregates must equal the struct-source query exactly")
    assert(fromQuery.keySet === Set("image", "audio", "video"))
  }

  test("blockhash pairs are a subset of global-histogram pairs, non-vacuously") {
    // Σ_blocks L1_block ≥ L1_global: splitting a histogram positionally
    // can only EXPOSE differences the global marginal hides, so at the
    // same relative threshold the layout-aware pair set can only shrink
    val sf = "/root/testdata/sf0.001"
    val pairKey = (df: org.apache.spark.sql.DataFrame) =>
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val global = pairKey(graft.queries.EventsMultimodal.multimodalHistDup.fn(spark, sf))
    val block = pairKey(graft.queries.EventsMultimodal.multimodalBlockhash.fn(spark, sf))
    graft.ops.Caches.drain()
    assert(block.subsetOf(global), s"blockhash found pairs histdup missed: ${block -- global}")
    // non-vacuous on this corpus: real near-dups survive the block split
    assert(block.nonEmpty, "no blockhash pairs — subset check is vacuous")
    assert(global.nonEmpty)
  }
}
