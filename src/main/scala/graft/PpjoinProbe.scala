package graft
import org.apache.spark.sql.functions._
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").appName("probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val r = Seq(("abc"), ("a"), ("")).toDF("t")
      .select(col("t"), split(col("t"), "").as("cs"))
      .withColumn("codes", expr("transform(cs, c -> ascii(c))"))
      .collect()
    r.foreach(x => println("SPLIT " + x.getSeq[String](1).mkString("[", ",", "]") +
      " CODES " + x.getSeq[Int](2).mkString("[", ",", "]")))
    val d = "/root/testdata/sf0.1"
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime; val r = f
      println(f"PROBE $label ${(System.nanoTime - s) / 1e9}%.2f s"); r
    }
    val dd = Tables.documents(spark, d).select(
      col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
    t("warmup")(dd.count())
    val oldWay = dd.select(col("doc_id"), explode(expr(
      """CASE WHEN n >= 1
         THEN transform(sequence(1, cast(n AS int)), i -> ascii(substring(text, i, 1)))
         ELSE array() END""")).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    t("substring-hist")(oldWay.count())
    val newWay = dd.select(col("doc_id"),
        explode(expr("transform(split(text, ''), c -> ascii(c))")).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    t("split-hist")(newWay.count())
    println("PROBE equal " + (oldWay.count() == newWay.count()))
    spark.stop()
  }
}
