package graft.etl

import graft.SparkSpec
import java.nio.file.Files

class StagingSpec extends SparkSpec {
  import spark.implicits._

  test("readSheet skips the preamble and parses header + declared schema (S1)") {
    val f = Files.createTempFile("sheet", ".csv")
    Files.writeString(f,
      """Cancer Survival in England
        |Publication preamble line 2
        |,,,
        |Geography type,Geography name,Geography code,Cancer site,Gender,Age at diagnosis,Standardisation type,Diagnosis year,Years since diagnosis,Patient numbers,Survival (%),Lower CI,Upper CI,Precision,Standard error,Substituted by Other Geography
        |Cancer Alliance,NCL,E56000027,Breast,Female,All ages,Age-standardised,2018,1,100,71.5,70.0,73.0,1.0,0.5,
        |Country,England,E92000001,Lung,Persons,All ages,Age-standardised,2018,1,999,60.0,59.0,61.0,1.0,0.5,E11111111
        |""".stripMargin)
    val df = Staging.readSheet(spark, f.toString, Schemas.rawIndexSheet, skipRows = 3)
    assert(df.count() === 2)
    assert(df.schema === Schemas.rawIndexSheet)
    val ncl = df.filter($"Geography code" === "E56000027").head()
    assert(ncl.getAs[Double]("Survival (%)") === 71.5)
    assert(ncl.isNullAt(ncl.fieldIndex("Substituted by Other Geography"))) // empty → null
    // staged sheet feeds the real pipeline end-to-end
    val out = IndexPipeline(df, Schemas.defaultTargetGeographies)
    assert(out.count() === 2)
    assert(out.filter($"CANCER_SITE" === "Breast" && $"GENDER" === "Persons").count() === 1)
  }

  test("staged adult sheet (skiprows=9) → Adult4Pipeline → benchmarkingRank chain") {
    val f = Files.createTempFile("adult", ".csv")
    val preamble = (1 to 9).map(i => s"preamble $i").mkString("\n")
    Files.writeString(f,
      s"""$preamble
         |Geography type,Geography name,Geography code,Cancer site,Gender,Standardisation type,Years since diagnosis,Patients,Net survival (%),Overall survival (%)
         |Cancer Alliance,NCL,E56000027,Breast,Female,Age-standardised (5 age groups),1,100,71.0,72.0
         |Cancer Alliance,WY,E56000014,Breast,Female,Age-standardised (5 age groups),1,90,81.0,82.0
         |Cancer Alliance,HNY,E56000015,Breast,Female,Age-standardised (5 age groups),1,80,61.0,
         |Country,England,E92000001,Breast,Female,Age-standardised (5 age groups),1,999,75.0,76.0
         |""".stripMargin)
    val raw = Staging.readSheet(spark, f.toString, Schemas.rawAdultSheet, skipRows = 9)
    assert(raw.count() === 4)
    val a4 = Adult4Pipeline(raw, Schemas.defaultTargetGeographies, "2017-2021", Some("December 2023"))
    // 4 rows + England Breast/Female dup = 5, ×2 metrics = 10
    assert(a4.count() === 10)
    val rank = Views.benchmarkingRank(a4)
    val row = rank.head()
    assert(row.getAs[Long]("RANK_BASE") === 3L)
    assert(row.getAs[Long]("RANK_CA") === 2L) // 81 > 71 > 61
    assert(row.getAs[String]("NCL_QUARTILE") === "-") // cohort < 4
  }
}
