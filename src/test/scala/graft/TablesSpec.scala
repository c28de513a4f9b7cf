package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Pins ALL testdata generations of the events.ts adapter (the driver
  * regenerated /root/testdata mid-round-6 from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS), silently breaking the then-hard-coded nanos path
  * for a quarter of the suite — NOTES.md playbook #6). Real data for the
  * legacy generation no longer exists, so each branch is pinned on a
  * crafted table: the same instant must come out of every physical
  * encoding, as session-TZ TimestampType, batch and streaming alike. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one pinned instant: 2024-03-05 06:07:08.123456 UTC
  private val micros = 1709618828123456L

  private def base(tsCol: org.apache.spark.sql.Column) = {
    Seq((1L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Writes one events.parquet in the given physical encoding, returns dir. */
  private def write(tag: String, tsCol: org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"events-$tag").toString
    base(tsCol).write.parquet(s"$dir/events.parquet")
    dir
  }

  // the legacy generation read ts as raw int64 nanos (nanosAsLong mode);
  // a plain long column reproduces exactly what that reader saw
  private lazy val generations: Seq[(String, String)] = Seq(
    "nanos-as-long" -> write("nanos", lit(micros * 1000L + 789L)),
    "micros-utc" -> write("utc", timestamp_micros(lit(micros))),
    "micros-ntz" -> write("ntz", timestamp_micros(lit(micros)).cast("timestamp_ntz")))

  test("events adapter: every physical ts generation yields the same instant") {
    generations.foreach { case (tag, dir) =>
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType === TimestampType, s"$tag: wrong output type")
      val t = df.select(unix_micros(col("ts"))).head().getLong(0)
      assert(t === micros, s"$tag: expected $micros, got $t")
      assert(df.select("event_id", "user_id", "event_type").head().toSeq ===
        Seq(1L, 7L, "click"), s"$tag: non-ts columns must flow through untouched")
    }
  }

  test("streaming events reader branches per generation like the batch reader") {
    generations.foreach { case (tag, dir) =>
      val stream = graft.streaming.StreamOps.readEvents(spark, s"$dir/events.parquet")
      assert(stream.isStreaming)
      assert(stream.schema("ts").dataType === TimestampType, s"$tag: wrong stream type")
      val name = s"ts_gen_${tag.replace('-', '_')}"
      val q = stream.select(unix_micros(col("ts")).as("us"))
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table(name).head().getLong(0)
      assert(got === micros, s"$tag: streaming adapter diverged")
    }
  }

  test("streaming reader starts on an EMPTY directory (writer-starts-later topology)") {
    val dir = java.nio.file.Files.createTempDirectory("events-empty").toString
    val stream = graft.streaming.StreamOps.readEvents(spark, dir)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType === TimestampType,
      "empty dir must fall back to the declared micros schema")
    val q = stream.writeStream.format("memory").queryName("empty_dir_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("empty_dir_stream").count() === 0)
  }

  test("legacy branch refuses to run without the session nanos conf (fails loudly)") {
    // library code checks, entry points decide: if the conf is absent the
    // long-typed generation must raise the actionable message, not read
    // nanos as if they were something else
    val bare = spark.newSession()
    bare.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    val ex = intercept[IllegalArgumentException] {
      Tables.requireNanosAsLong(bare)
    }
    assert(ex.getMessage.contains("nanosAsLong"))
  }
}
