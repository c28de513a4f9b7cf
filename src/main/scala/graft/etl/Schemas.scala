package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the NHS cancer-survival data model.
  *
  * Raw sheet schemas mirror what the reference's `pd.read_excel` infers
  * after its header offset (reference src/main.py:112-113 Table 5 skip 10;
  * :226-227 Table 4 skip 9); target-table schemas are transcribed from the
  * Snowflake DDL (reference docs/create_index.sql:2-20,
  * docs/create_adult4.sql:2-18). Schemas are declared, never inferred —
  * at 100 TB a schema-inference pass over the input is a full extra scan.
  */
object Schemas {

  private def s(n: String) = StructField(n, StringType, nullable = true)
  private def l(n: String) = StructField(n, LongType, nullable = true)
  private def d(n: String) = StructField(n, DoubleType, nullable = true)
  private def b(n: String) = StructField(n, BooleanType, nullable = true)

  /** Raw "Table 5" Cancer Survival Index sheet (FIXTURES.md A1). */
  val rawIndexSheet: StructType = StructType(Seq(
    s("Geography type"), s("Geography name"), s("Geography code"),
    s("Cancer site"), s("Gender"), s("Age at diagnosis"),
    s("Standardisation type"), l("Diagnosis year"), l("Years since diagnosis"),
    l("Patient numbers"), d("Survival (%)"), d("Lower CI"), d("Upper CI"),
    d("Precision"), d("Standard error"), s("Substituted by Other Geography")))

  /** Raw "Table 4" Adult Cancer Survival sheet (FIXTURES.md A2). */
  val rawAdultSheet: StructType = StructType(Seq(
    s("Geography type"), s("Geography name"), s("Geography code"),
    s("Cancer site"), s("Gender"), s("Standardisation type"),
    l("Years since diagnosis"), l("Patients"),
    d("Net survival (%)"), d("Overall survival (%)")))

  /** Modelling INDEX table (reference docs/create_index.sql:2-20), minus the
    * `_TIMESTAMP` default column which Sink appends at write. */
  val indexTable: StructType = StructType(Seq(
    s("AREA_CODE"), s("AREA_NAME"), b("IS_AREA_CORE"), s("CANCER_SITE"),
    s("GENDER"), s("AGE_AT_DIAGNOSIS"), s("STANDARDISATION_TYPE"),
    l("YEAR_OF_DIAGNOSIS"), l("YEARS_SINCE_DIAGNOSIS"), l("PATIENT_NUMBERS"),
    d("SURVIVAL_PERCENT"), d("LOWER_CI"), d("UPPER_CI"), d("PRECISION"),
    d("STANDARD_ERROR"), b("IS_DATA_SUBTITUTED")))

  /** Modelling ADULT_4 table (reference docs/create_adult4.sql:2-18), minus
    * `_TIMESTAMP`. The [sic] typo IS_DATA_SUBTITUTED exists only on INDEX. */
  val adult4Table: StructType = StructType(Seq(
    s("AREA_TYPE"), s("AREA_CODE"), s("AREA_NAME"), b("IS_AREA_CORE"),
    s("CANCER_SITE"), s("GENDER"), s("STANDARDISATION_TYPE"),
    s("STANDARDISATION_TYPE_SUBCATEGORY"), l("YEARS_SINCE_DIAGNOSIS"),
    l("PATIENT_NUMBERS"), s("SURVIVAL_METRIC"), d("SURVIVAL_PERCENT"),
    s("DATE_DIAGNOSIS_WINDOW"), s("DATE_SNAPSHOT")))

  /** The three core geographies: NCL, London, England
    * (reference src/main.py:397). */
  val defaultTargetGeographies: Seq[String] =
    Seq("E56000027", "E40000003", "E92000001")
}
