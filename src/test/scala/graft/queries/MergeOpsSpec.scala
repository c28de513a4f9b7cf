package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Merge-operator invariants the row-hash oracle doesn't state explicitly:
  * key uniqueness after upsert, and the one-current-version-per-key /
  * closed-interval laws of SCD2.
  */
class MergeOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("mergeUpsert: keys stay unique and op counts reconcile with the batch") {
    val out = MergeOps.mergeUpsert.fn(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    val nUpd = Tables.documents(spark, sf).filter(col("doc_id") % 10 === 3).count()
    val nIns = Tables.documents(spark, sf).filter(col("doc_id") % 10 === 7).count()
    assert(out.count() === n + nIns, "upsert grows the table by exactly the insert count")
    assert(out.select("doc_id").distinct().count() === out.count(), "doc_id must stay unique")
    val ops = out.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops("update") === nUpd)
    assert(ops("insert") === nIns)
    assert(ops("keep") === n - nUpd)
    // batch wins on conflict: every updated row carries the new source
    assert(out.filter(col("op") === "update" && col("source") =!= "patched").count() === 0)
  }

  test("mergeScd2: exactly one current version per key, closed intervals abut") {
    val out = MergeOps.mergeScd2.fn(spark, sf).cache()
    val current = out.filter(col("is_current"))
    assert(current.groupBy("doc_id").count().filter(col("count") =!= 1).count() === 0,
      "every key must have exactly one current version")
    assert(out.filter(col("is_current") && col("valid_to").isNotNull).count() === 0,
      "current versions must have an open interval")
    // every closed version's valid_to equals the succeeding version's valid_from
    val closed = out.filter(!col("is_current"))
      .select(col("doc_id"), col("valid_to"))
    val succ = out.filter(col("is_current"))
      .select(col("doc_id"), col("valid_from"))
    val dangling = closed.join(succ, "doc_id")
      .filter(col("valid_to") =!= col("valid_from"))
    assert(dangling.count() === 0, "closed intervals must abut the succeeding version")
    // updated keys carry exactly two versions, everything else one
    val versions = out.groupBy("doc_id").count()
    assert(versions.filter(col("count") > 2).count() === 0)
    assert(versions.filter(col("count") === 2).count() ===
      Tables.documents(spark, sf).filter(col("doc_id") % 10 === 3).count())
  }

  test("tableChecksum: invariant under repartitioning, sensitive to any row change") {
    import org.apache.spark.sql.DataFrame
    def sig(df: DataFrame): Long = df
      .select(conv(substring(md5(concat_ws("|", col("doc_id"), col("source"))), 1, 14), 16, 10)
        .cast("long").as("h"))
      .agg(expr("bit_xor(h)")).head.getLong(0)
    val d = Tables.documents(spark, sf).select("doc_id", "source")
    val base = sig(d)
    // XOR-fold must not care how rows are distributed or ordered
    assert(sig(d.repartition(13)) === base)
    assert(sig(d.orderBy(col("doc_id").desc)) === base)
    // ...but must catch a single changed row
    val tampered = d.withColumn("source",
      when(col("doc_id") === 0, lit("tampered")).otherwise(col("source")))
    assert(sig(tampered) !== base)
    // and a dropped row
    assert(sig(d.filter(col("doc_id") =!= 1)) !== base)
  }
}
