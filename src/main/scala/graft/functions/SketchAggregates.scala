package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-state cardinality/frequency sketches — the engine family's
  * `topK(k)` and `uniqUpTo(N)` aggregate shapes (reference stack's
  * ClickHouse exposes both; its example dashboards lean on exact
  * GROUP BY because its corpus fits one node — at 100 TB the sketch
  * IS the operator, because its state is O(k), not O(distinct)).
  *
  * Both are TypedImperativeAggregates: partial states combine
  * map-side, merge preserves the sketch guarantee, and the shuffle
  * carries at most k (resp. N+1) entries per group regardless of
  * input size.
  */
object SketchAggregates

/** `top_k_sketch(k, expr)` — heavy hitters via the Misra-Gries
  * summary (Misra & Gries 1982, the SpaceSaving-family algorithm the
  * engine family's `topK` builds on; mergeability per Agarwal et al.
  * 2012, "Mergeable Summaries"). State is ≤ k (item, count) counters:
  *
  *  - update: resident item +1; free slot → insert at 1; else
  *    decrement ALL counters by 1 and drop zeros.
  *  - merge: sum counters pairwise; if > k survive, subtract the
  *    (k+1)-th largest count from all and drop ≤ 0.
  *
  * Guarantees (any merge order): a stored count underestimates the
  * true count by at most N/(k+1) for N rows aggregated, and every
  * item with true count > N/(k+1) is present in the summary. When the
  * group has ≤ k distinct items the summary is EXACT — that regime is
  * what the oracled suite query pins; the adversarial-order and
  * guarantee properties are spec-pinned (SketchAggregatesSpec).
  *
  * Returns array<struct<item string, est bigint>> sorted by
  * (est desc, item asc) — deterministic in the exact regime.
  */
case class TopKSketch(
    k: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0 && k <= 65536, s"top_k_sketch: k must be in [1, 65536], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))))
  override def prettyName: String = "top_k_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: expr must be STRING, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String]
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1)
        case None if buf.size < k =>
          // clone: the input UTF8String may wrap a reused row buffer
          buf.update(item.clone(), 1L)
        case None =>
          // decrement-all; zeros vacate their slots
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (i, c) => if (c <= 0) dead += i }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[UTF8String, Long],
      b2: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    b2.foreach { case (i, c) =>
      b1.update(i, b1.getOrElse(i, 0L) + c)
    }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count, drop what hits zero
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      b1.mapValuesInPlace((_, c) => c - cut)
      b1.foreach { case (i, c) => if (c <= 0) dead += i }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else i1.compareTo(i2) < 0
    }
    new GenericArrayData(sorted.map { case (i, c) =>
      InternalRow(i, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long])
      : Array[Byte] = {
    val entries = buf.toArray
    val size = 4 + entries.map(e => 4 + e._1.numBytes() + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (i, c) =>
      val bytes = i.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
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

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(child = newChildren.head)
}

/** `uniq_up_to(n, expr)` — exact distinct count saturating at n+1
  * (the family's `uniqUpTo(N)`: "how many distinct, unless more than
  * N, which is all I need to know"). The canonical guard query —
  * "does this key have more than N variants?" — without paying
  * full-distinct state: the buffer holds at most n+1 values, so a
  * column with a billion distincts costs the same as one with n+2.
  * Returns least(exact_distinct, n+1) as BIGINT — exact in both
  * regimes, so the DuckDB oracle replays it as
  * `least(count(DISTINCT x), n+1)`. Accepts integral or string
  * inputs (integrals normalize to long). */
case class UniqUpTo(
    n: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Any]] {

  require(n > 0 && n <= (1 << 22),
    s"uniq_up_to: n must be in [1, ${1 << 22}], got $n")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "uniq_up_to"

  private def isIntegral = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isIntegral || child.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: expr must be integral or STRING, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty

  override def update(buf: mutable.HashSet[Any], input: InternalRow)
      : mutable.HashSet[Any] = {
    if (buf.size <= n) { // saturated at n+1: stop looking
      val v = child.eval(input)
      if (v != null) {
        val norm: Any = v match {
          case s: UTF8String => if (buf.contains(s)) s else s.clone()
          case b: Byte => b.toLong
          case sh: Short => sh.toLong
          case i: Int => i.toLong
          case l: Long => l
        }
        buf.add(norm)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashSet[Any], b2: mutable.HashSet[Any])
      : mutable.HashSet[Any] = {
    val it = b2.iterator
    while (b1.size <= n && it.hasNext) b1.add(it.next())
    b1
  }

  override def eval(buf: mutable.HashSet[Any]): Any =
    math.min(buf.size, n + 1).toLong

  override def serialize(buf: mutable.HashSet[Any]): Array[Byte] = {
    if (isIntegral) {
      val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 8)
      bb.putInt(buf.size)
      buf.foreach(v => bb.putLong(v.asInstanceOf[Long]))
      bb.array()
    } else {
      val entries = buf.toArray.map(_.asInstanceOf[UTF8String])
      val bb = java.nio.ByteBuffer.allocate(
        4 + entries.map(4 + _.numBytes()).sum)
      bb.putInt(entries.length)
      entries.foreach { s =>
        val b = s.getBytes; bb.putInt(b.length); bb.put(b)
      }
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val cnt = bb.getInt
    val out = mutable.HashSet.empty[Any]
    var i = 0
    while (i < cnt) {
      if (isIntegral) out.add(bb.getLong)
      else {
        val len = bb.getInt
        val b = new Array[Byte](len)
        bb.get(b)
        out.add(UTF8String.fromBytes(b))
      }
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpTo =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpTo =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): UniqUpTo =
    copy(child = newChildren.head)
}
