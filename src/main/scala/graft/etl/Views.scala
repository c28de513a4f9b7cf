package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The six Snowflake reporting views (reference docs/reporting_*.sql)
  * re-expressed as composable DataFrame functions. Each takes the modelling
  * table(s) and returns the view frame; register with
  * `createOrReplaceTempView` for a SQL entry point. View-on-view layering is
  * inlined by construction, so Catalyst optimizes across layers — filters
  * in outer views push into inner aggregations where legal.
  */
object Views {

  /** JOIN_KEY = CONCAT(site, gender, years, window) with Snowflake's
    * integer rendering (no decimal point) — reference
    * docs/reporting_adult4.sql:8. */
  private def joinKey: Column = concat(
    col("CANCER_SITE"), col("GENDER"),
    col("YEARS_SINCE_DIAGNOSIS").cast("string"), col("DATE_DIAGNOSIS_WINDOW"))

  /** REPORTING.INDEX_BEST_CA (reference docs/reporting_index_best_ca.sql):
    * best non-core Cancer-Alliance survival per dimension combination —
    * GROUP BY ALL with constant literals in scope, NULL-typed filler
    * columns matching the INDEX schema. */
  def indexBestCa(index: DataFrame): DataFrame =
    index.filter(col("IS_AREA_CORE") === false)
      .groupBy(
        col("IS_AREA_CORE"), col("CANCER_SITE"), col("GENDER"),
        col("AGE_AT_DIAGNOSIS"), col("STANDARDISATION_TYPE"),
        col("YEAR_OF_DIAGNOSIS"), col("YEARS_SINCE_DIAGNOSIS"))
      .agg(max("SURVIVAL_PERCENT").as("SURVIVAL_PERCENT"))
      .select(
        lit("X").as("AREA_CODE"),
        lit("Best Non-NCL Cancer Alliance").as("AREA_NAME"),
        col("IS_AREA_CORE"), col("CANCER_SITE"), col("GENDER"),
        col("AGE_AT_DIAGNOSIS"), col("STANDARDISATION_TYPE"),
        col("YEAR_OF_DIAGNOSIS"), col("YEARS_SINCE_DIAGNOSIS"),
        lit(null).cast("long").as("PATIENT_NUMBERS"),
        col("SURVIVAL_PERCENT"),
        lit(null).cast("double").as("LOWER_CI"),
        lit(null).cast("double").as("UPPER_CI"),
        lit(null).cast("double").as("PRECISION"),
        lit(null).cast("double").as("STANDARD_ERROR"),
        lit(null).cast("boolean").as("IS_DATA_SUBTITUTED"))

  /** REPORTING.INDEX (reference docs/reporting_index.sql): core rows ⊎
    * best-CA rows, plus the three CASE sort keys. `_TIMESTAMP` never enters
    * (the sink appends it at write; views build on the pre-stamp frame —
    * same observable surface as `SELECT * EXCLUDE _TIMESTAMP`). */
  def reportingIndex(index: DataFrame): DataFrame = {
    val core = index.filter(col("IS_AREA_CORE") === true)
    core.unionByName(indexBestCa(index).select(core.columns.map(col): _*))
      .withColumn("SORT_SITE",
        when(col("CANCER_SITE") === "Overall", 1).otherwise(2).cast("long"))
      .withColumn("SORT_GENDER",
        when(col("GENDER") === "Persons", 1).otherwise(2).cast("long"))
      .withColumn("SORT_AGE",
        when(col("AGE_AT_DIAGNOSIS") === "All ages", 1).otherwise(2).cast("long"))
  }

  /** REPORTING.PROCESSED_ADULT_4 (reference docs/reporting_adult4.sql:1-19):
    * core areas, age-standardised+net-survival for non-NCL, everything for
    * NCL; JOIN_KEY + gender sort key. The reference's `IS_AREA_CORE = 1`
    * leans on Snowflake bool↔number coercion — expressed here as the
    * boolean itself. */
  def processedAdult4(adult4: DataFrame): DataFrame =
    adult4
      .filter(col("IS_AREA_CORE") === true)
      .filter(
        (col("STANDARDISATION_TYPE") === "Age-standardised" &&
          col("SURVIVAL_METRIC") === "Net Survival") ||
          col("AREA_CODE") === "E56000027")
      .withColumn("JOIN_KEY", joinKey)
      .withColumn("SORT_GENDER", when(col("GENDER") === "Persons", 1).otherwise(2).cast("long"))

  /** PUBLISHED.PROCESSED_ADULT_4 (reference docs/reporting_adult4.sql:21-43):
    * dashboard-facing column renames. */
  def publishedAdult4(adult4: DataFrame): DataFrame =
    Ops.renameSelect(processedAdult4(adult4), Seq(
      "AREA_TYPE" -> "Area_Type", "AREA_CODE" -> "Area_Code",
      "AREA_NAME" -> "Area_Name", "IS_AREA_CORE" -> "Area_Core",
      "CANCER_SITE" -> "Cancer_Site", "GENDER" -> "Gender",
      "STANDARDISATION_TYPE" -> "Standardisation_Type",
      "STANDARDISATION_TYPE_SUBCATEGORY" -> "Standardisation_Subcategory",
      "YEARS_SINCE_DIAGNOSIS" -> "Years_Since_Diagnosis",
      "PATIENT_NUMBERS" -> "Patient_Numbers",
      "SURVIVAL_METRIC" -> "Survival_Metric",
      "SURVIVAL_PERCENT" -> "Survival_Per",
      "DATE_DIAGNOSIS_WINDOW" -> "Date_Diagnosis_Window",
      "DATE_SNAPSHOT" -> "Date_Snapshot",
      "JOIN_KEY" -> "JOIN_KEY", "SORT_GENDER" -> "Sort_Gender"))

  /** REPORTING.CANCER_ALLIANCE_COMPARISON (reference
    * docs/reporting_cancer_alliance_reporting.sql:1-32): all Cancer
    * Alliances, age-standardised net survival only. */
  def cancerAllianceComparison(adult4: DataFrame): DataFrame =
    adult4
      .filter(
        col("AREA_TYPE") === "Cancer Alliance" &&
          col("STANDARDISATION_TYPE") === "Age-standardised" &&
          col("SURVIVAL_METRIC") === "Net Survival")
      .withColumn("JOIN_KEY", joinKey)
      .withColumn("SORT_GENDER", when(col("GENDER") === "Persons", 1).otherwise(2).cast("long"))

  /** The shared CA base: age-standardised net-survival Cancer-Alliance rows
    * (reference docs/reporting_rank.sql:11-15). */
  private def caRows(adult4: DataFrame): DataFrame =
    adult4.filter(
      col("STANDARDISATION_TYPE") === "Age-standardised" &&
        col("SURVIVAL_METRIC") === "Net Survival" &&
        col("AREA_TYPE") === "Cancer Alliance")

  /** REPORTING.BENCHMARKING_RANK (reference docs/reporting_rank.sql:1-51):
    * rank CAs per join key, count the denominator, left-join NCL's rank
    * with the constant predicate in the ON clause, quartile-bucket.
    * The rank side of the join is one row per (join_key) after the
    * AREA_CODE filter — Catalyst broadcasts it. */
  def benchmarkingRank(adult4: DataFrame, targetArea: String = "E56000027"): DataFrame = {
    val base = caRows(adult4).filter(col("SURVIVAL_PERCENT").isNotNull)
    val caRank = base.select(
      col("AREA_CODE"), joinKey.as("JOIN_KEY"), col("SURVIVAL_PERCENT"),
      rank().over(Window.partitionBy(joinKey).orderBy(col("SURVIVAL_PERCENT").desc))
        .cast("long").as("RANK_CA"))
    val caBase = base
      .groupBy(
        col("CANCER_SITE"), col("GENDER"),
        col("YEARS_SINCE_DIAGNOSIS"), col("DATE_DIAGNOSIS_WINDOW"))
      .agg(count(lit(1)).as("RANK_BASE"))
      .select(col("CANCER_SITE"), joinKey.as("JOIN_KEY"), col("RANK_BASE"))
    caBase.as("b")
      .join(
        caRank.as("r"),
        col("r.JOIN_KEY") === col("b.JOIN_KEY") && col("r.AREA_CODE") === targetArea,
        "left")
      .select(
        col("b.JOIN_KEY").as("JOIN_KEY"),
        col("b.CANCER_SITE").as("CANCER_SITE"),
        col("r.SURVIVAL_PERCENT").as("SURVIVAL_PERCENT"),
        col("r.RANK_CA").as("RANK_CA"),
        col("b.RANK_BASE").as("RANK_BASE"),
        when(col("r.RANK_CA").isNull, lit(null).cast("string"))
          .when(col("b.RANK_BASE") < 4, "-")
          .when(col("r.RANK_CA") / col("b.RANK_BASE") < 0.25, "1st")
          .when(col("r.RANK_CA") / col("b.RANK_BASE") < 0.5, "2nd")
          .when(col("r.RANK_CA") / col("b.RANK_BASE") < 0.75, "3rd")
          .otherwise("4th")
          .as("NCL_QUARTILE"))
  }

  /** PUBLISHED.BENCHMARKING_RANK (reference docs/reporting_rank.sql:53-65). */
  def publishedBenchmarkingRank(adult4: DataFrame): DataFrame =
    Ops.renameSelect(benchmarkingRank(adult4), Seq(
      "JOIN_KEY" -> "JOIN_KEY", "CANCER_SITE" -> "Cancer_Site",
      "SURVIVAL_PERCENT" -> "Survival_Per", "RANK_CA" -> "Rank_CA",
      "RANK_BASE" -> "Rank_Denominator", "NCL_QUARTILE" -> "Quartile"))

  /** REPORTING.BENCHMARKING_STANDARDS (reference
    * docs/reporting_benchmarking_standard.sql:1-97): England/London/Best/
    * Worst/Q1/Q2/Q3 stacked then pivoted wide. Literal 7-way UNION ALL for
    * oracle parity with the reference's view text; Spark's pivot lowers to
    * a single aggregate so the pivot step itself adds no extra shuffle. */
  def benchmarkingStandards(adult4: DataFrame): DataFrame = {
    val a4base = adult4
      .filter(
        col("STANDARDISATION_TYPE") === "Age-standardised" &&
          col("SURVIVAL_METRIC") === "Net Survival")
      .select(
        col("AREA_CODE"), col("AREA_NAME"), col("AREA_TYPE"),
        joinKey.as("JOIN_KEY"), col("SURVIVAL_PERCENT"))
    val ca = a4base.filter(col("AREA_TYPE") === "Cancer Alliance")
    def fixedArea(code: String) =
      a4base.filter(col("AREA_CODE") === code)
        .select(col("JOIN_KEY"), col("AREA_NAME").as("STANDARD"), col("SURVIVAL_PERCENT"))
    def agged(c: Column, name: String) =
      ca.groupBy("JOIN_KEY").agg(c.as("SURVIVAL_PERCENT"))
        .select(col("JOIN_KEY"), lit(name).as("STANDARD"), col("SURVIVAL_PERCENT"))
    val stack = Seq(
      fixedArea("E92000001"), // England
      fixedArea("E40000003"), // London
      agged(max("SURVIVAL_PERCENT"), "Best"),
      agged(min("SURVIVAL_PERCENT"), "Worst"),
      agged(expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY SURVIVAL_PERCENT)"), "Q1"),
      agged(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY SURVIVAL_PERCENT)"), "Q2"),
      agged(expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY SURVIVAL_PERCENT)"), "Q3")
    ).reduce(_ unionByName _)
    stack
      .groupBy("JOIN_KEY")
      .pivot("STANDARD", Seq("England", "London", "Best", "Worst", "Q1", "Q2", "Q3"))
      .agg(sum("SURVIVAL_PERCENT"))
      .withColumnsRenamed(Map(
        "England" -> "ENGLAND", "London" -> "LONDON",
        "Best" -> "BEST", "Worst" -> "WORST"))
  }
}
