package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

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
  /** Exact order-independent sum of a double expression; result double.
    * DuckDB twin: CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE). */
  def sumD(c: Column): Column = sum(c.cast(DecimalType(30, 8))).cast(DoubleType)

  /** Exact average. DuckDB twin:
    * CAST(SUM(CAST(x AS DECIMAL(30,8))) AS DOUBLE) / COUNT(x). */
  def avgD(c: Column): Column = sumD(c) / count(c)

  /** SQL fragment for the DuckDB side of [[sumD]]. */
  def sumSql(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(30,8))) AS DOUBLE)"
}
