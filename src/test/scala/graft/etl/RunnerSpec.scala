package graft.etl

import graft.SparkSpec
import java.nio.file.Files

/** Full orchestration: staged workbooks in, modelling tables out
  * (reference src/main.py:378-422 end-to-end). */
class RunnerSpec extends SparkSpec {
  import spark.implicits._

  test("run: dispatches by prefix, loads both tables, skips unknown files") {
    val staging = Files.createTempDirectory("graft-staging")
    val out = Files.createTempDirectory("graft-tables").toString

    val indexHeader = Schemas.rawIndexSheet.fieldNames.mkString(",")
    Files.writeString(staging.resolve("Index_2018.csv"),
      (1 to 10).map(i => s"preamble $i").mkString("\n") + "\n" +
        indexHeader + "\n" +
        "Cancer Alliance,NCL,E56000027,Breast,Female,All ages,Age-standardised,2018,1,100,71.5,70.0,73.0,1.0,0.5,\n" +
        "Cancer Alliance,WY,E56000014,Lung,Persons,All ages,Age-standardised,2018,1,50,55.0,54.0,56.0,1.0,0.5,\n")

    val adultHeader = Schemas.rawAdultSheet.fieldNames.mkString(",")
    Files.writeString(staging.resolve("adult_survival_2017_2021.csv"),
      (1 to 9).map(i => s"preamble $i").mkString("\n") + "\n" +
        adultHeader + "\n" +
        "Cancer Alliance,NCL,E56000027,Breast,Female,Age-standardised (5 age groups),1,100,71.0,72.0\n" +
        "Country,England,E92000001,Breast,Female,Age-standardised (5 age groups),1,999,75.0,76.0\n")

    Files.writeString(staging.resolve("readme.txt"), "not a workbook")

    val results = Runner.run(spark, staging.toString, out)
    assert(results.map(_.kind).sorted === Seq("adult4", "index"))

    val index = spark.read.parquet(s"$out/INDEX")
    assert(index.columns.contains("_TIMESTAMP"))
    assert(index.count() === 2)
    assert(index.filter($"GENDER" === "Persons" && $"CANCER_SITE" === "Breast").count() === 1)

    val adult = spark.read.parquet(s"$out/ADULT_4")
    // 2 rows + England breast dup = 3, ×2 metrics = 6
    assert(adult.count() === 6)
    assert(adult.select("DATE_DIAGNOSIS_WINDOW").distinct().as[String].collect().toSeq === Seq("2017-2021"))
    // CSV path has no Notes sheet → snapshot NULL (reference's warning path)
    assert(adult.filter($"DATE_SNAPSHOT".isNotNull).count() === 0)

    // reporting views run straight off the loaded tables
    assert(Views.reportingIndex(index.drop("_TIMESTAMP")).count() > 0)
    assert(Views.benchmarkingStandards(adult.drop("_TIMESTAMP")).count() > 0)
  }
}
