package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Keyed-measure map aggregates — the engine family's
  * `sumMap` / `minMap` / `maxMap` (ClickHouse aggregates a pair of
  * key/value arrays per row into one map, summing or min/max-ing
  * values per key; its metric tables lean on sumMap for sparse
  * counter vectors). Both input shapes are accepted:
  *
  *  - scalar: `sum_map(key STRING, val BIGINT)` — one pair per row;
  *  - array:  `sum_map(keys ARRAY<STRING>, vals ARRAY<BIGINT>)` —
  *    the reference's native shape, pairs zipped positionally
  *    (shorter side wins, null cells skipped).
  *
  * State is one (key → long) hash map per group — bounded by the
  * group's DISTINCT key count, not its row count; partials combine
  * map-side so only maps cross the shuffle. The result is
  * `array<struct<key string, val bigint>>` sorted by key —
  * deterministic, so the suite can oracle it against a plain
  * exploded GROUP BY.
  */
object MapAggregates {
  val SUM = 0
  val MIN = 1
  val MAX = 2

  def modeName(m: Int): String = m match {
    case SUM => "sum_map"
    case MIN => "min_map"
    case _ => "max_map"
  }
}

case class MapAggregate(
    mode: Int,
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  import MapAggregates._

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType), StructField("val", LongType))))
  override def prettyName: String = modeName(mode)

  private def isArrayForm = key.dataType.isInstanceOf[ArrayType]

  override def checkInputDataTypes(): TypeCheckResult =
    (key.dataType, value.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (k, v) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName: expects (STRING, BIGINT) or " +
          s"(ARRAY<STRING>, ARRAY<BIGINT>), got ($k, $v)")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  private def put(buf: mutable.HashMap[UTF8String, Long],
      k: UTF8String, v: Long): Unit =
    buf.get(k) match {
      case None => buf.update(k.clone(), v)
      case Some(prev) =>
        val next = mode match {
          case SUM => prev + v
          case MIN => math.min(prev, v)
          case _ => math.max(prev, v)
        }
        buf.update(k, next)
    }

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val k = key.eval(input)
    val v = value.eval(input)
    if (k != null && v != null) {
      if (isArrayForm) {
        val ks = k.asInstanceOf[ArrayData]
        val vs = v.asInstanceOf[ArrayData]
        val n = math.min(ks.numElements(), vs.numElements())
        var i = 0
        while (i < n) {
          if (!ks.isNullAt(i) && !vs.isNullAt(i))
            put(buf, ks.getUTF8String(i), vs.getLong(i))
          i += 1
        }
      } else put(buf, k.asInstanceOf[UTF8String], v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long])
    : mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (k, v) => put(b1, k, v) }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith((a, b) => a._1.compareTo(b._1) < 0)
    new GenericArrayData(sorted.map { case (k, v) =>
      InternalRow(k, v)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long])
    : Array[Byte] = {
    val entries = buf.toArray
    val size = 4 + entries.map(e => 4 + e._1.numBytes() + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (k, v) =>
      val bytes = k.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
    : mutable.HashMap[UTF8String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      out.update(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MapAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MapAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MapAggregate =
    copy(key = newChildren(0), value = newChildren(1))
}
