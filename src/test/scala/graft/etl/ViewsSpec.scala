package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reporting-view semantics on hand-built modelling tables. */
class ViewsSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal ADULT_4 frame: one cohort, 5 Cancer Alliances + England +
    * London, age-standardised net survival. */
  private def adult4(withNcl: Boolean) = {
    val cas = Seq(
      ("Cancer Alliance", "E56000027", "NCL", true, 80.0),
      ("Cancer Alliance", "E56000014", "WY", false, 90.0),
      ("Cancer Alliance", "E56000015", "HNY", false, 85.0),
      ("Cancer Alliance", "E56000016", "EM", false, 70.0),
      ("Cancer Alliance", "E56000017", "WM", false, 60.0))
      .filter { case (_, code, _, _, _) => withNcl || code != "E56000027" }
    val areas = cas ++ Seq(
      ("Country", "E92000001", "England", true, 75.0),
      ("Region", "E40000003", "London", true, 78.0))
    areas.map { case (t, code, name, core, surv) =>
      (t, code, name, core, "Breast", "Persons", "Age-standardised",
        "5 age groups", 1L, 100L, "Net Survival", surv, "2017-2021", "December 2023")
    }.toDF(
      "AREA_TYPE", "AREA_CODE", "AREA_NAME", "IS_AREA_CORE", "CANCER_SITE",
      "GENDER", "STANDARDISATION_TYPE", "STANDARDISATION_TYPE_SUBCATEGORY",
      "YEARS_SINCE_DIAGNOSIS", "PATIENT_NUMBERS", "SURVIVAL_METRIC",
      "SURVIVAL_PERCENT", "DATE_DIAGNOSIS_WINDOW", "DATE_SNAPSHOT")
  }

  test("benchmarkingRank: NCL rank 3 of 5 → 3rd quartile-bucket boundary math") {
    val out = Views.benchmarkingRank(adult4(withNcl = true))
    val row = out.head()
    assert(row.getAs[Long]("RANK_CA") === 3L)   // 90, 85, 80 → rank 3
    assert(row.getAs[Long]("RANK_BASE") === 5L)
    assert(row.getAs[String]("NCL_QUARTILE") === "3rd") // 3/5 = 0.6 → < 0.75
  }

  test("benchmarkingRank: missing NCL → LEFT JOIN keeps the key, quartile NULL (J1 ON-clause semantics)") {
    val out = Views.benchmarkingRank(adult4(withNcl = false))
    assert(out.count() === 1)
    val row = out.head()
    assert(row.isNullAt(row.fieldIndex("RANK_CA")))
    assert(row.isNullAt(row.fieldIndex("NCL_QUARTILE")))
    assert(row.getAs[Long]("RANK_BASE") === 4L)
  }

  test("benchmarkingRank: small cohort (<4) → '-'") {
    val small = adult4(withNcl = true).filter(
      $"AREA_CODE".isin("E56000027", "E56000014", "E56000015"))
    val row = Views.benchmarkingRank(small).head()
    assert(row.getAs[String]("NCL_QUARTILE") === "-")
  }

  test("benchmarkingStandards: pivoted England/London/Best/Worst/quartiles") {
    val row = Views.benchmarkingStandards(adult4(withNcl = true)).head()
    assert(row.getAs[Double]("ENGLAND") === 75.0)
    assert(row.getAs[Double]("LONDON") === 78.0)
    assert(row.getAs[Double]("BEST") === 90.0)
    assert(row.getAs[Double]("WORST") === 60.0)
    // percentile_disc over {60,70,80,85,90}: cume_dist 0.2,0.4,0.6,0.8,1.0
    assert(row.getAs[Double]("Q1") === 70.0)
    assert(row.getAs[Double]("Q2") === 80.0)
    assert(row.getAs[Double]("Q3") === 85.0)
  }

  test("processedAdult4: NCL keeps everything, others only age-standardised net survival") {
    val base = adult4(withNcl = true)
    val extra = base.limit(2)
      .withColumn("STANDARDISATION_TYPE", lit("Non-standardised"))
    val out = Views.processedAdult4(base.unionByName(extra))
    // extras: row0 = NCL (kept via AREA_CODE branch), row1 = WY (dropped: non-core)
    assert(out.filter($"STANDARDISATION_TYPE" === "Non-standardised").count() === 1)
    // JOIN_KEY renders the integer without decimal point (F11)
    assert(out.select("JOIN_KEY").head().getString(0) === "BreastPersons12017-2021")
  }

  test("indexBestCa: GROUP BY ALL over non-core with literal area and null fillers") {
    val index = Seq(
      ("E56000014", "WY", false, "Breast", "Persons", "All ages", "Age-standardised", 2018L, 1L, 10L, 80.0),
      ("E56000015", "HNY", false, "Breast", "Persons", "All ages", "Age-standardised", 2018L, 1L, 20L, 85.0),
      ("E56000027", "NCL", true, "Breast", "Persons", "All ages", "Age-standardised", 2018L, 1L, 30L, 70.0))
      .toDF("AREA_CODE", "AREA_NAME", "IS_AREA_CORE", "CANCER_SITE", "GENDER",
        "AGE_AT_DIAGNOSIS", "STANDARDISATION_TYPE", "YEAR_OF_DIAGNOSIS",
        "YEARS_SINCE_DIAGNOSIS", "PATIENT_NUMBERS", "SURVIVAL_PERCENT")
      .withColumn("LOWER_CI", lit(null).cast("double"))
      .withColumn("UPPER_CI", lit(null).cast("double"))
      .withColumn("PRECISION", lit(null).cast("double"))
      .withColumn("STANDARD_ERROR", lit(null).cast("double"))
      .withColumn("IS_DATA_SUBTITUTED", lit(false))
    val best = Views.indexBestCa(index)
    assert(best.count() === 1)
    val row = best.head()
    assert(row.getAs[String]("AREA_CODE") === "X")
    assert(row.getAs[String]("AREA_NAME") === "Best Non-NCL Cancer Alliance")
    assert(row.getAs[Double]("SURVIVAL_PERCENT") === 85.0)
    assert(row.isNullAt(row.fieldIndex("PATIENT_NUMBERS")))
    val rep = Views.reportingIndex(index)
    assert(rep.count() === 2) // NCL core row + best-CA row
    assert(rep.filter($"SORT_SITE" === 2 && $"SORT_GENDER" === 1 && $"SORT_AGE" === 1).count() === 2)
  }
}
