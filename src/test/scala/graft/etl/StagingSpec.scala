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
}
