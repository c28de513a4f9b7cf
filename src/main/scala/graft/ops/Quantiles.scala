package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT quantile selection (PERCENTILE_DISC semantics) by
  * histogram refinement — the shape that survives 100 TB, unlike either a
  * global sort/window (one task holds the table) or N parallel
  * `percentile_disc` aggregates (each buffers every value per group; N
  * object-hash buffers of the full column).
  *
  * Algorithm (3 fully-parallel scans + metadata-sized driver state):
  *   1. min/max/count — locate the value range and the target ranks
  *      k_q = ceil(q·n) (PERCENTILE_DISC(q) IS the k_q-th smallest element:
  *      cum_dist(v) ≥ q ⟺ #{≤v} ≥ q·n, and the smallest such v is that
  *      order statistic — ties included).
  *   2. equi-width bin counts (≤ `bins` rows to the driver — metadata, not
  *      data; same legitimacy class as a convergence check).
  *   3. rank-in-bin selection: only rows in the ≤|qs| bins that contain a
  *      target rank are window-ranked, PARTITIONED BY BIN — parallel, and
  *      each bin holds ~n/bins rows, not n.
  *
  * One refinement level suffices for any distribution where no single bin
  * holds a memory-breaking row count; raise `bins` (cheap — the histogram
  * is the only driver transfer) rather than nesting levels.
  */
object Quantiles {

  /** Exact PERCENTILE_DISC(qs) of `valueCol` (numeric, non-null rows).
    * Returns the selected elements in `qs` order. */
  def exactQuantiles(
      df: DataFrame, valueCol: String, qs: Seq[Double], bins: Int = 8192): Seq[Double] = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    val v = col(valueCol).cast("double")
    val base = df.select(v.as("v")).filter(col("v").isNotNull)
    val Array(row) = base.agg(
      min("v").as("lo"), max("v").as("hi"), count(lit(1)).as("n")).collect()
    val (lo, hi, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    require(n > 0, "exactQuantiles on an empty input")
    val targets = qs.map(q => math.ceil(q * n).toLong.max(1L))

    if (lo == hi) return qs.map(_ => lo)

    val width = (hi - lo) / bins
    // bin is CLAMPED into [0, bins-1]: fp rounding at the edges must not
    // create a bin outside the histogram
    def binOf = least(greatest(floor((col("v") - lo) / width), lit(0.0)), lit(bins - 1.0))
      .cast("int")
    val hist = base.groupBy(binOf.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)

    // driver-side exclusive cumsum over ≤bins entries → (bin, rank-in-bin)
    val cumBefore = hist.scanLeft(0L)(_ + _._2)
    val located = targets.map { k =>
      val idx = hist.indices.find(i => cumBefore(i + 1) >= k).get
      (hist(idx)._1, k - cumBefore(idx)) // local 1-based rank within bin
    }
    val wantBins = located.map(_._1).distinct

    import org.apache.spark.sql.expressions.Window
    val ranked = base.withColumn("b", binOf)
      .filter(col("b").isin(wantBins: _*))
      .withColumn("rn", row_number().over(Window.partitionBy("b").orderBy("v")))
      .filter(col("rn").isin(located.map(_._2).distinct: _*))
      .select("b", "rn", "v")
      .collect().map(r => (r.getInt(0), r.getInt(1).toLong) -> r.getDouble(2)).toMap
    located.map(ranked(_))
  }
}
