package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column support: media content travels as an opaque `binary`
  * column beside typed metadata; decode / feature-extraction runs
  * per-partition so a real implementation amortizes codec/model setup once
  * per task, not once per row (the Scala analogue of a Pandas-UDF
  * `mapInPandas` batch loop).
  *
  * The decode step itself is a STUB — media libraries don't ship in this
  * environment — behind [[FakeDecoder]], a deterministic stand-in keyed on
  * the payload hash. Everything Spark-side (schema, partitioning, typed
  * batch iteration, output shape) is real and tested.
  */
object Multimodal {

  /** A media row: payload + metadata. */
  case class MediaItem(item_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features; `width`/`height`/`n_frames` are decode outputs. */
  case class MediaFeatures(item_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, embedding: Array[Float])

  /** Decoder interface a production deployment implements per modality. */
  trait Decoder extends Serializable {
    def decode(item: MediaItem): MediaFeatures
  }

  /** Deterministic fake decode — stands in for image/audio decoding, which
    * would require codec libraries not present in this environment. Derives
    * stable pseudo-features from payload bytes so tests are reproducible. */
  object FakeDecoder extends Decoder {
    def decode(item: MediaItem): MediaFeatures = {
      val n = item.payload.length
      val h = java.util.Arrays.hashCode(item.payload)
      val emb = Array.tabulate(8)(i => ((h >>> (i * 4)) & 0xf).toFloat / 16f)
      MediaFeatures(item.item_id, item.kind, n.toLong,
        width = (h & 0x3f) + 1, height = ((h >> 6) & 0x3f) + 1,
        n_frames = if (item.kind == "video") ((h >> 12) & 0xff) + 1 else 1,
        embedding = emb)
    }
  }

  /** Wrap a text/content DataFrame as media items (binary payload column) —
    * the ingestion shape for any blob source. */
  def asMediaItems(df: DataFrame, idCol: String, contentCol: String, kind: String): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("item_id"),
      lit(kind).as("kind"),
      col(contentCol).cast("binary").as("payload")).as[MediaItem]
  }

  /** Per-partition decode: one decoder instantiation per task (the
    * expensive-setup amortization point), row-wise decode inside. */
  def extractFeatures(items: Dataset[MediaItem], decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // real impl: initialize codec / model HERE, once per partition
      it.map(decoder.decode)
    }
  }

  /** Resize stub: deterministic stand-in for an image-resize pass (the
    * real implementation calls into a codec inside the same per-partition
    * map). Target dimensions replace decode dimensions; the fake embedding
    * rescales by the area ratio so tests can assert the data actually
    * flowed through. */
  def resize(features: Dataset[MediaFeatures], width: Int, height: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.mapPartitions { it =>
      it.map { f =>
        val ratio = (width.toFloat * height) / (f.width.toFloat * f.height)
        f.copy(width = width, height = height,
          embedding = f.embedding.map(_ * ratio))
      }
    }
  }

  /** Frame sampling: every `everyK`-th frame index per item, as rows —
    * the per-frame fan-out a video pipeline feeds to the decoder. Pure
    * relational (sequence + explode), so Catalyst plans the fan-out and the
    * downstream decode parallelizes over (item, frame). */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int): DataFrame = {
    require(everyK > 0)
    features.toDF()
      .select(col("item_id"), col("n_frames"),
        explode(expr(s"sequence(0, n_frames - 1, $everyK)")).as("frame_idx"))
  }
}
