package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Custom AGGREGATE functions — the §2.11 tier between built-in aggregates
  * and mapPartitions: a `TypedImperativeAggregate` participates in Spark's
  * partial/final aggregation exactly like a built-in (map-side combine,
  * ObjectHashAggregate, codegen'd surroundings), so a sketch built with it
  * ships k values per partition per group instead of the raw stream.
  *
  * [[KmvSketchAgg]] is the KMV (bottom-k distinct hashes) sketch as ONE
  * aggregate: `kmv_sketch(hash_col, k)` → the k smallest DISTINCT hash
  * values, ascending. The merge is set-union-then-truncate — commutative,
  * associative, and idempotent per value — so the result is IDENTICAL under
  * any partitioning or merge order: the property that makes it
  * oracle-verifiable where probabilistic accumulators are not, and the
  * reason a 1000-executor rollup can combine per-shard sketches without a
  * second scan. The window-based form (ops.Scale.topKPerGroup, used by
  * q_sketch_kmv/q_kmv_jaccard) computes the same thing via shuffle+rank;
  * this form keeps the bound INSIDE the aggregation buffer — at 100 TB the
  * shuffle carries k longs per (partition × group) instead of the full
  * per-group hash stream ahead of the rank.
  */
object SketchAggregates {

  /** Bottom-k distinct LongType values as a sorted array. */
  case class KmvSketchAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

    require(k >= 1, s"kmv_sketch k must be >= 1, got $k")

    override def prettyName: String = "kmv_sketch"
    override def children: Seq[Expression] = child :: Nil
    // analysis-time typing: integral children are accepted (INT/SHORT/BYTE
    // widen losslessly in update()); anything else is a readable analysis
    // error — not a ClassCastException mid-execution
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires an integral hash column, got ${other.simpleString}")
    }
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v match {
        case l: java.lang.Long => l.longValue()
        case n: java.lang.Number => n.longValue() // int/short/byte widen
      })
      buf
    }

    override def merge(
        buf: java.util.TreeSet[java.lang.Long],
        other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = other.iterator()
      while (it.hasNext) add(buf, it.next())
      buf
    }

    private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
      if (buf.size < k) { buf.add(v); () }
      else if (v < buf.last) {
        if (buf.add(v)) buf.remove(buf.last)
      }
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val arr = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      new GenericArrayData(arr)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buf.size)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(child = newChildren.head)
  }

  /** SQL builder: second argument must be a foldable integer literal. */
  private[functions] def build(es: Seq[Expression]): Expression = {
    require(es.size == 2, "kmv_sketch(hash_col, k) takes exactly 2 arguments")
    require(es(1).foldable, "kmv_sketch k must be a literal")
    val kv = es(1).eval()
    kv match {
      case n: Number => KmvSketchAgg(es.head, n.intValue())
      case other => throw new IllegalArgumentException(
        s"kmv_sketch k must be a non-null integer literal, got " +
          (if (other == null) "NULL" else s"$other (${es(1).dataType.simpleString})"))
    }
  }

  /** Install in the session's FunctionRegistry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("kmv_sketch", build, "built-in")

  /** Column entry point (requires register(spark) or GraftExtensions). */
  def kmv_sketch(c: Column, k: Int): Column = call_function("kmv_sketch", c, lit(k))
}
