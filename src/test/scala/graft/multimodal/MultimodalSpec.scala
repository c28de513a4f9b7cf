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

  test("video kind gets multi-frame decode; others single frame") {
    val df = Seq((1L, "clip-bytes")).toDF("id", "content")
    val vid = Multimodal.extractFeatures(Multimodal.asMediaItems(df, "id", "content", "video")).head()
    val img = Multimodal.extractFeatures(Multimodal.asMediaItems(df, "id", "content", "image")).head()
    assert(vid.n_frames >= 1)
    assert(img.n_frames === 1)
  }
}
