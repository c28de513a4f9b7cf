package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("overwriteTable: atomic staged overwrite + single-valued _TIMESTAMP default (S7/S10)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/t"
    Sink.overwriteTable(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir)
    val first = spark.read.parquet(dir)
    assert(first.count() === 2)
    // whole batch carries ONE stamp (current_timestamp constant-folds per query)
    assert(first.select("_TIMESTAMP").distinct().count() === 1)
    // truncate-replace semantics: second load fully replaces the first
    Sink.overwriteTable(Seq((9, "z")).toDF("k", "v"), dir)
    val second = spark.read.parquet(dir)
    assert(second.select("k").as[Int].collect().toSeq === Seq(9))
  }
}
