package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Broadcastable bloom filter over md5-hex fingerprints — the membership
  * pre-screen that lets an incremental-ingest anti-join touch only rows
  * that MIGHT be in the corpus. The three hash functions are disjoint
  * 16-bit slices of the fingerprint itself (already an md5), so no extra
  * hashing; words are 32-bit so every mask is a positive int64 (no
  * sign-bit hazards in either engine). m = 65536 bits (2048 words) — at
  * larger corpora scale m, shard the filter by fingerprint prefix, or
  * keep per-shard blooms; the query shape is unchanged.
  *
  * The guarantee that makes pre-screening TRANSPARENT: no false
  * negatives, ever — dropping bloom-negative rows from an exact
  * membership check cannot change its result, only shrink its input
  * (proven end-to-end by q_curation_ingest hash-matching a plain
  * anti-join oracle).
  */
object Bloom {
  val Bits = 65536
  val K = 3

  private def hashes(fpCol: String) = array((0 until K).map(i =>
    conv(substring(col(fpCol), i * 4 + 1, 4), 16, 10).cast("long")): _*)

  /** Aggregate distinct fingerprints into ≤2048 (word, bits) rows. */
  def build(fps: DataFrame, fpCol: String = "fp"): DataFrame =
    fps.select(explode(hashes(fpCol)).as("h"))
      .groupBy(expr("h div 32").as("word"))
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(h % 32 as int)))").as("bits"))

  /** Per-row membership candidacy: `keyCols` + `bloom_candidate` (1 =
    * possibly in the filter's set, 0 = definitely not). The bloom side
    * broadcasts; the probe side pays one explode(K) + one groupBy on its
    * own key — never a shuffle of the filtered corpus. */
  def candidacy(
      probes: DataFrame, bloom: DataFrame, keyCols: Seq[String],
      fpCol: String = "fp"): DataFrame =
    probes.select(keyCols.map(col) :+ explode(hashes(fpCol)).as("h"): _*)
      .withColumn("word", expr("h div 32"))
      .join(broadcast(bloom), Seq("word"), "left")
      .select(keyCols.map(col) :+
        when(col("bits").isNotNull &&
          expr("(bits & shiftleft(cast(1 as bigint), cast(h % 32 as int))) <> 0"), 1L)
          .otherwise(0L).as("hit"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(min("hit").cast("long").as("bloom_candidate"))
}
