package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering so file/row-group
  * min-max statistics prune on EVERY clustered dimension, not just the
  * leading sort key.
  *
  * A linear sort on (a, b) localizes predicates on `a` but scatters `b`
  * across every file; interleaving the bits of both (the Z-order / Morton
  * curve) keeps each file's bounding box small in BOTH dimensions, so a
  * selective predicate on either column (or a box on both) touches only
  * the files whose box intersects it. This is the clustering scheme lake
  * formats expose as `OPTIMIZE ... ZORDER BY`; here it is a plain column
  * expression plus a range-partitioned write, nothing engine-private.
  */
object Layout {

  /** Morton (Z-order) interleave of `cols`, `bits` low bits each —
    * a pure integer expression (codegen'd, no UDF). Columns must already
    * be non-negative integers; scale/clamp-encode first if not (see
    * [[clampEncode]]). Bit j of column i lands at output bit
    * `j * n_cols + i`, so output width = bits × n_cols ≤ 63. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits * cols.size <= 63,
      s"z-value would need ${bits * cols.size} bits; max 63")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield {
      // ((c >> j) & 1) << (j*n + i)   — spread bit j of column i
      val bit = shiftright(c.cast("long"), j) % 2
      shiftleft(bit.cast("long"), j * n + i)
    }
    terms.reduce(_ + _) // disjoint bit positions: + == | and stays codegen
  }

  /** Clamp-and-shift a possibly-negative / wide-range long column into
    * `bits` non-negative bits by subtracting `lo` and saturating at the
    * top — the cheap static encode when the value range is known. */
  def clampEncode(c: Column, lo: Long, bits: Int): Column =
    least(greatest(c.cast("long") - lo, lit(0L)), lit((1L << bits) - 1))

  /** Write `df` Z-clustered on `zCols`: range-partition by the z-value
    * (so files own disjoint z ranges — each file a small box in the
    * clustered space) and sort within partitions (so parquet ROW GROUPS
    * inside each file get tight min-max stats too). The z column itself
    * is dropped before writing; it exists only to drive placement. */
  def writeZOrdered(
      df: DataFrame, path: String, zCols: Seq[Column], bits: Int, files: Int): Unit =
    df.withColumn("_z", zValue(zCols, bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
