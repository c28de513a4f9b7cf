package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed EXACT quantile selection (PERCENTILE_DISC semantics) by
  * recursive histogram refinement — the shape that survives 100 TB, unlike
  * either a global sort/window (one task holds the table) or N parallel
  * `percentile_disc` aggregates (each buffers every value per group; N
  * object-hash buffers of the full column).
  *
  * Per refinement level (fully-parallel scans + metadata-sized driver
  * state):
  *   1. min/max — locate the value range (the target ranks k_q = ceil(q·n)
  *      are fixed up front: PERCENTILE_DISC(q) IS the k_q-th smallest
  *      element, ties included — cum_dist(v) ≥ q ⟺ #{≤v} ≥ q·n, and the
  *      smallest such v is that order statistic).
  *   2. equi-width bin counts (≤ `bins` rows to the driver — metadata, not
  *      data; same legitimacy class as a convergence check).
  *   3. target bins with ≤ `maxBinRows` rows: rank-in-bin selection,
  *      window-ranked PARTITIONED BY BIN — parallel, each bin ~n/bins rows.
  *      Oversized target bins (a heavy-tailed distribution where one
  *      outlier stretches the range until almost everything lands in one
  *      bin): RECURSE into the bin with a fresh min/max — each level
  *      shrinks the candidate set before any window touches it, so no
  *      single task ever holds more than `maxBinRows` rows.
  */
object Quantiles {

  /** Exact PERCENTILE_DISC(qs) of `valueCol` (numeric, non-null rows).
    * Returns the selected elements in `qs` order. */
  def exactQuantiles(
      df: DataFrame, valueCol: String, qs: Seq[Double], bins: Int = 8192,
      maxBinRows: Long = 4000000L): Seq[Double] = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0))
    require(bins >= 2 && maxBinRows > 0)
    val base = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val n = base.count()
    require(n > 0, "exactQuantiles on an empty input")
    val targets = qs.map(q => math.ceil(q * n).toLong.max(1L))
    val sel = selectRanks(base, targets.distinct, bins, maxBinRows, maxDepth = 6)
    targets.map(sel)
  }

  /** Select the k-th smallest element of `base.v` for each k in `ks`
    * (1-based global ranks within `base`). */
  private def selectRanks(
      base: DataFrame, ks: Seq[Long], bins: Int, maxBinRows: Long,
      maxDepth: Int): Map[Long, Double] = {
    val Array(row) = base.agg(min("v").as("lo"), max("v").as("hi")).collect()
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    if (lo == hi) return ks.map(_ -> lo).toMap

    val width = (hi - lo) / bins
    // width can underflow to 0 (sub-ulp range near 0) or overflow to Inf
    // (range spanning ±huge) — either would re-bin everything into one
    // bucket forever; a direct window is the only correct move left
    if (width == 0.0 || width.isInfinity) return windowSelect(base, ks)
    // bin is CLAMPED into [0, bins-1]: fp rounding at the edges must not
    // create a bin outside the histogram
    def binOf = least(greatest(floor((col("v") - lo) / width), lit(0.0)), lit(bins - 1.0))
      .cast("int")
    val hist = base.groupBy(binOf.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)

    // driver-side exclusive cumsum over ≤bins entries → (k, bin, rank-in-bin)
    val cumBefore = hist.scanLeft(0L)(_ + _._2)
    val located = ks.map { k =>
      val idx = hist.indices.find(i => cumBefore(i + 1) >= k).get
      (k, hist(idx)._1, k - cumBefore(idx), hist(idx)._2)
    }
    val (big, small) = located.partition(_._4 > maxBinRows)

    val smallSel: Map[Long, Double] = if (small.isEmpty) Map.empty else {
      import org.apache.spark.sql.expressions.Window
      val wantBins = small.map(_._2).distinct
      val picked = base.withColumn("b", binOf)
        .filter(col("b").isin(wantBins: _*))
        .withColumn("rn", row_number().over(Window.partitionBy("b").orderBy("v")))
        .filter(col("rn").isin(small.map(_._3).distinct: _*))
        .select("b", "rn", "v")
        .collect().map(r => (r.getInt(0), r.getInt(1).toLong) -> r.getDouble(2)).toMap
      small.map(t => t._1 -> picked((t._2, t._3))).toMap
    }

    val bigSel: Map[Long, Double] = big.groupBy(_._2).flatMap { case (b, ts) =>
      val sub = base.withColumn("b", binOf).filter(col("b") === b).select("v")
      val subSel =
        if (maxDepth <= 0)
          // depth exhausted (pathological near-equal doubles): window it —
          // correct, just no longer bounded by maxBinRows
          windowSelect(sub, ts.map(_._3).distinct)
        else selectRanks(sub, ts.map(_._3).distinct, bins, maxBinRows, maxDepth - 1)
      ts.map(t => t._1 -> subSel(t._3))
    }

    smallSel ++ bigSel
  }

  /** Last-resort direct selection: one global window. Correct always;
    * bounded-memory only when the caller has already shrunk the set. */
  private def windowSelect(base: DataFrame, ks: Seq[Long]): Map[Long, Double] = {
    import org.apache.spark.sql.expressions.Window
    base.withColumn("rn", row_number().over(Window.orderBy("v")))
      .filter(col("rn").isin(ks: _*))
      .select("rn", "v")
      .collect().map(r => r.getInt(0).toLong -> r.getDouble(1)).toMap
  }
}
