package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated star-schema testdata (TESTDATA.md).
  * One parquet file per table; columnar scan with pushdown/pruning left to
  * Catalyst — callers express filters/projections declaratively.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as raw nanos (legacy long mode) and truncate to
    * microseconds — exactly what DuckDB does on read, so oracle values
    * match.
    *
    * The nanos-as-long conf must come from the SESSION BUILDER (Verify/
    * Bench/EntrySmoke/SparkSpec all set it): it is consulted again at plan
    * and execution time, so a set-and-restore around this call would break
    * the later action, and a plain set here would leak a session-wide
    * reading change to every other TIMESTAMP(NANOS) parquet — library code
    * checks, entry points decide. */
  def events(s: SparkSession, d: String): DataFrame = {
    requireNanosAsLong(s)
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  private[graft] def requireNanosAsLong(s: SparkSession): Unit =
    require(
      s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet carries TIMESTAMP(NANOS): start the session with " +
        ".config(\"spark.sql.legacy.parquet.nanosAsLong\", \"true\")")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
