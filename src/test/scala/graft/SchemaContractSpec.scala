package graft

import org.apache.spark.sql.types._

/** The engine's contract with the driver-generated testdata, as ONE
  * named test per table — when the driver regenerates /root/testdata
  * with a changed physical schema (it did mid-round-6: events.ts went
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS) and silently killed 52 queries),
  * the break should surface here as "<table> schema contract", not as
  * dozens of cryptic AnalysisExceptions deep inside query plans.
  *
  * Assertions are at the level the queries actually depend on: column
  * names and the Spark-read types after the Tables adapter. events.ts is
  * adaptive by design (TablesSpec pins all generations), so here it only
  * must come OUT as TimestampType. */
class SchemaContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def check(name: String, df: org.apache.spark.sql.DataFrame,
      expected: Seq[(String, DataType)]): Unit = {
    val got = df.schema.map(f => f.name -> f.dataType)
    assert(got === expected,
      s"$name schema contract changed — if the driver regenerated testdata, " +
        s"adapt Tables/queries deliberately (see NOTES.md playbook #6). Got: $got")
  }

  test("events schema contract (post-adapter)") {
    check("events", Tables.events(spark, sf), Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("documents schema contract") {
    check("documents", Tables.documents(spark, sf), Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
  }

  test("embeddings schema contract") {
    check("embeddings", Tables.embeddings(spark, sf), Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))
  }

  test("relational tables schema contract") {
    check("region", Tables.region(spark, sf), Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    check("nation", Tables.nation(spark, sf), Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    check("customer", Tables.customer(spark, sf), Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    check("supplier", Tables.supplier(spark, sf), Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    check("part", Tables.part(spark, sf), Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType))
    val orders = Tables.orders(spark, sf)
    assert(orders.schema.map(_.name) ===
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"))
    assert(Seq(TimestampType, TimestampNTZType)
      .contains(orders.schema("o_orderdate").dataType),
      "o_orderdate must read as a timestamp type")
    val li = Tables.lineitem(spark, sf)
    assert(li.schema.map(_.name) === Seq(
      "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"))
    assert(Seq(TimestampType, TimestampNTZType)
      .contains(li.schema("l_shipdate").dataType),
      "l_shipdate must read as a timestamp type")
  }
}
