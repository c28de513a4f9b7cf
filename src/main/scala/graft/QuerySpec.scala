package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** One verifiable query: a Spark DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB on the same parquet tables.
  * Column names of `fn`'s result and the oracle's result must match exactly
  * (the driver sorts columns by name before hashing values).
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  def apply(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QuerySpec =
    QuerySpec(name, fn, None)
}

/** Cross-engine determinism helpers.
  *
  * Double SUMs are order-dependent, and Spark's partial/final aggregation
  * order differs from DuckDB's sequential scan. Routing each addend through
  * an exact decimal makes the sum associative, so both engines produce the
  * identical value; the final cast back to double is then also identical.
  * The per-row double arithmetic BEFORE the cast (e.g. price*(1-discount))
  * is plain IEEE754 and bitwise-deterministic in both engines.
  */
object Exact {
  // The addend is first quantized to the 1/256 grid with pure IEEE double
  // ops (×256 is an exponent shift — exact; floor(+0.5) is exact; /256
  // exact), which both engines compute bit-identically. A k/256 double has
  // an EXACT decimal representation at scale 8 (1/256 = 0.00390625), so the
  // decimal cast is exact in both engines too — this sidesteps the real
  // divergence that Spark casts double→decimal via the shortest string
  // representation while DuckDB uses the exact binary expansion, which can
  // round differently at the 8th decimal digit.

  // The sum K/256 returns to double through the exact integer K (sum×256,
  // < 2^53 so exact as BIGINT in both engines) followed by /256.0 — an
  // exponent shift, exact again. A direct decimal→double cast is NOT safe:
  // DuckDB converts via the scaled int128 (sum×10^8), which exceeds 2^53
  // for large sums and rounds differently than Spark's BigDecimal path.

  /** Order-independent, cross-engine-deterministic sum of a double
    * expression (quantized to 1/256); result double. DuckDB twin: sumSql. */
  def sumD(c: Column): Column =
    (sum((floor(c * 256d + 0.5d) / 256d).cast(DecimalType(30, 8))) * 256)
      .cast(LongType).cast(DoubleType) / lit(256d)

  /** Deterministic average. DuckDB twin: sumSql(x) / COUNT(x). */
  def avgD(c: Column): Column = sumD(c) / count(c)

  /** SQL fragment for the DuckDB side of [[sumD]]. */
  def sumSql(x: String): String =
    s"CAST(CAST(SUM(CAST(floor(($x) * 256 + 0.5) / 256 AS DECIMAL(30,8))) * 256 AS BIGINT) AS DOUBLE) / 256.0"
}
