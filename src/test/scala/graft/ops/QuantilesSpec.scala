package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val qs = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

  private def discOracle(df: org.apache.spark.sql.DataFrame, c: String): Seq[Double] =
    df.agg(
      expr(s"percentile_disc(${qs.head}) WITHIN GROUP (ORDER BY $c)").as("q0"),
      qs.tail.zipWithIndex.map { case (q, i) =>
        expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY $c)").as(s"q${i + 1}")
      }: _*).head().toSeq.map(_.asInstanceOf[Double])

  test("exactQuantiles matches percentile_disc on ties, skew, and negatives") {
    // heavy ties (60% of rows share one value) + skewed tail + negatives
    val vals = Seq.fill(600)(42.0) ++ (1 to 300).map(i => i * 7.001) ++
      (1 to 100).map(i => -i * 0.5)
    val df = vals.toDF("v")
    assert(Quantiles.exactQuantiles(df, "v", qs, bins = 64) === discOracle(df, "v"))
  }

  test("exactQuantiles matches percentile_disc when all values are equal") {
    val df = Seq.fill(50)(3.14).toDF("v")
    assert(Quantiles.exactQuantiles(df, "v", qs) === qs.map(_ => 3.14))
  }

  test("exactQuantiles handles more quantiles than bins and a 2-row input") {
    val df = Seq(1.0, 2.0).toDF("v")
    assert(Quantiles.exactQuantiles(df, "v", Seq(0.5, 1.0), bins = 2) === Seq(1.0, 2.0))
    assert(Quantiles.exactQuantiles(df, "v", Seq(0.01)) === Seq(1.0))
  }

  test("exactQuantiles recurses when an outlier crams the mass into one bin") {
    // one 1e12 outlier stretches the range so ALL other values share bin 0;
    // tiny maxBinRows forces the recursive refinement path
    val vals = (1 to 2000).map(_ * 0.001) :+ 1e12
    val df = vals.toDF("v")
    val got = Quantiles.exactQuantiles(df, "v", qs, bins = 4, maxBinRows = 100)
    assert(got === discOracle(df, "v"))
  }

  test("exactQuantiles survives sub-ulp ranges and mixed ±huge values") {
    // width underflows to 0: {0, minSubnormal}
    val tiny = Seq(0.0, java.lang.Double.MIN_VALUE, java.lang.Double.MIN_VALUE).toDF("v")
    assert(Quantiles.exactQuantiles(tiny, "v", Seq(0.33, 1.0))
      === Seq(0.0, java.lang.Double.MIN_VALUE))
    // width overflows to Inf: ±MaxValue
    val huge = Seq(-java.lang.Double.MAX_VALUE, 0.0, java.lang.Double.MAX_VALUE).toDF("v")
    assert(Quantiles.exactQuantiles(huge, "v", Seq(0.5))
      === Seq(0.0))
  }
}
