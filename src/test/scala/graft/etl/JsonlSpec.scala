package graft.etl

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL write→read must round-trip the documents table losslessly
  * (doubles included), and corrupt lines must surface, not vanish. */
class JsonlSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("write→read round-trips the documents table exactly") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/docs"
    val docs = Tables.documents(spark, sf)
    Jsonl.write(docs, dir)
    val back = Jsonl.read(spark, dir, docs.schema)
    assert(back.filter(col("_corrupt")).count() === 0)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.drop("_corrupt").orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("double values survive the round trip bitwise") {
    val dir = Files.createTempDirectory("graft-jsonl").toString + "/ev"
    val ev = Tables.events(spark, sf).select("event_id", "value")
    Jsonl.write(ev, dir)
    val back = Jsonl.read(spark, dir, StructType.fromDDL("event_id BIGINT, value DOUBLE"))
    val joined = ev.join(back.drop("_corrupt").withColumnRenamed("value", "v2"), "event_id")
    assert(joined.filter(col("value") =!= col("v2")).count() === 0)
    assert(back.count() === ev.count())
  }

  test("corrupt lines are flagged, never silently dropped") {
    val dir = Files.createTempDirectory("graft-jsonl").resolve("bad")
    Files.createDirectory(dir)
    Files.write(dir.resolve("part-0.txt"),
      java.util.Arrays.asList("""{"doc_id": 1, "text": "ok"}""", "not json at all"))
    val back = Jsonl.read(spark, dir.toString,
      StructType.fromDDL("doc_id BIGINT, text STRING"))
    assert(back.count() === 2)
    assert(back.filter(col("_corrupt")).count() === 1)
    assert(back.filter(!col("_corrupt")).select("text").head().getString(0) === "ok")
  }
}
