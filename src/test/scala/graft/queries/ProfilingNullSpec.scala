package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins q_heavy_hitters' documented NULL semantics (heavy hitters are
  * defined over NON-NULL values on both the Spark and oracle sides) on a
  * crafted null-heavy events table — the synthetic testdata has no NULL
  * event_type, so without this pin the two sides could silently diverge
  * the day nulls appear: SQL's GROUP BY keeps a NULL group, while the MG
  * sketch skips nulls and a semi-join key never matches NULL. */
class ProfilingNullSpec extends SparkSpec {
  import spark.implicits._

  test("q_heavy_hitters ignores NULL event_type and thresholds over non-null n") {
    // 16 nulls (enough to flip the threshold if they were counted in n),
    // 10 "click", 1 "view": over the 11 non-null rows, cnt*8 > n keeps
    // "click" (80 > 11) and drops "view" (8 > 11 fails); were nulls a
    // group, they would out-count everything
    val rows =
      Seq.fill(16)(null.asInstanceOf[String]) ++ Seq.fill(10)("click") ++ Seq("view")
    val dir = java.nio.file.Files.createTempDirectory("hh-null").toString
    rows.zipWithIndex.map { case (et, i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i), i.toLong % 3, et, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(3) // nulls spread across partitions, as at scale
      .write.parquet(s"$dir/events.parquet")

    val out = Profiling.heavyHitters.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("click", 10L, 11L)),
      "only the non-null heavy hitter survives; n_total counts non-null rows")
    assert(!out.exists(_._1 == null), "NULL must never appear as a heavy hitter")
  }
}
