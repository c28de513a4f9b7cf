package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (one JSON object per line) interchange — the de-facto wire format
  * for training-data shards. Writing routes every row through `to_json`
  * into the text datasource (one file per partition, splittable by line on
  * read); reading parses with an EXPLICIT schema via `from_json` — never
  * schema inference, which at 100 TB costs a full pre-scan and can widen
  * types differently per shard. Round trips are lossless for the types the
  * engine uses (longs, strings, doubles via shortest-repr print → exact
  * re-parse — the property q_json_roundtrip keeps under the oracle gate).
  *
  * Corrupt lines surface as nulls from from_json (PERMISSIVE); [[read]]
  * exposes them via the `_corrupt` flag so a load can count-and-quarantine
  * instead of silently dropping (the Metrics.audited pattern pairs well).
  */
object Jsonl {

  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite").text(path)

  /** Read JSONL with a declared schema; rows that fail to parse keep
    * `_corrupt = true` and null fields rather than vanishing. (PERMISSIVE
    * from_json yields null FIELDS, not a null struct, so corruption is
    * detected the canonical way: a corrupt-record column in the parse
    * schema that stays null exactly when the line parsed.) */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val crCol = "_corrupt_record"
    val full = schema.add(crCol, org.apache.spark.sql.types.StringType)
    spark.read.text(path)
      .select(from_json(col("value"), full,
        Map("columnNameOfCorruptRecord" -> crCol)).as("r"))
      .select(col("r.*"))
      .withColumn("_corrupt", col(crCol).isNotNull)
      .drop(crCol)
  }
}
