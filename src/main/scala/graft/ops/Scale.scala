package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities for the shapes AQE cannot always save: skewed-key joins
  * and co-located (bucketed) joins.
  */
object Scale {

  /** Salted equi-join for a skew-heavy LEFT side: the left's join key is
    * augmented with a random salt in [0, parts); the (smaller) right side is
    * replicated `parts` times with every salt value, and the join runs on
    * (key, salt) — splitting each hot key's rows across `parts` reducers.
    *
    * Use when a handful of keys dominate (the classic power-law document/
    * user distribution) and the right side is too big to broadcast but
    * cheap to replicate ×parts. For moderate skew prefer AQE's
    * skewJoin (spark.sql.adaptive.skewJoin.enabled) — this helper is for
    * the pathological keys AQE's split threshold misses.
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      key: String, parts: Int,
      joinType: String = "inner"): DataFrame = {
    require(parts > 0)
    // right/full outer would emit every unmatched right row once PER SALT
    val supported = Set("inner", "cross", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(supported.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left-ish joins, not $joinType (right rows are replicated)")
    val salted = left.withColumn("_salt", (rand(seed = 42) * parts).cast("int"))
    val replicated = right.withColumn("_salt", explode(array((0 until parts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Top-k per group without a global sort: per-partition rank + filter.
    * Catalyst already lowers orderBy+limit to TakeOrderedAndProject for the
    * global case; this is the grouped analogue (one shuffle on the group
    * key, sort only within groups). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("_rn",
        row_number().over(Window.partitionBy(groupCols.map(col): _*).orderBy(orderCol)))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
