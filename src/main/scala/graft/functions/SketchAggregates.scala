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
  * The decrement-all is implemented with the classic DEBT offset so
  * it is O(1), not O(k), per row: counters store `true + debt`, a
  * group-wide decrement is one `debt += 1`, and entries whose stored
  * value falls to `debt` are purged only when the running
  * `nextDeath` watermark (the minimum stored value, refreshed free
  * of charge during each purge) says something can actually die —
  * the purge cost amortizes against the insertions that built the
  * map. The "all live entries exceed debt" invariant is restored
  * before any further debt increment, so the error analysis of the
  * textbook algorithm applies unchanged.
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
/** Mutable Misra-Gries state: `m` stores `true_count + debt`; the
  * invariant "every stored value > debt" holds between updates.
  * `nextDeath` = the smallest stored value (a stale LOWER bound is
  * fine — it only delays a purge check, never an actual death). */
final class TopKBuf(
    var debt: Long,
    val m: mutable.HashMap[UTF8String, Long],
    var nextDeath: Long)

case class TopKSketch(
    k: Int,
    child: Expression,
    weight: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  require(k > 0 && k <= 65536, s"top_k_sketch: k must be in [1, 65536], got $k")

  override def children: Seq[Expression] = child +: weight.toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est", LongType))))
  override def prettyName: String =
    if (weight.isDefined) "top_k_weighted" else "top_k_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName: expr must be STRING, got ${child.dataType}")
    else if (weight.exists(_.dataType != LongType)) TypeCheckResult
      .TypeCheckFailure(s"$prettyName: weight must be BIGINT, got " +
        weight.get.dataType)
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuf =
    new TopKBuf(0L, mutable.HashMap.empty, Long.MaxValue)

  /** Drop entries whose stored value fell to `debt`, refresh the
    * death watermark. O(k), amortized against the inserts that
    * built the map. */
  private def purge(buf: TopKBuf): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    var min = Long.MaxValue
    buf.m.foreach { case (i, c) =>
      if (c <= buf.debt) dead += i
      else if (c < min) min = c
    }
    dead.foreach(buf.m.remove)
    buf.nextDeath = min
  }

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val v = child.eval(input)
    if (v != null) {
      // weighted mode = the family's topKWeighted: an occurrence
      // carries w units of mass (rows with null/non-positive weight
      // contribute nothing); the MG bound scales to W/(k+1) over the
      // total weight
      val w = weight match {
        case None => 1L
        case Some(we) => we.eval(input) match {
          case null => 0L
          case x => x.asInstanceOf[Long]
        }
      }
      if (w > 0L) {
        val item = v.asInstanceOf[UTF8String]
        buf.m.get(item) match {
          case Some(c) => buf.m.update(item, c + w)
          case None if buf.m.size < k =>
            // clone: the input UTF8String may wrap a reused row buffer
            buf.m.update(item.clone(), buf.debt + w)
            if (buf.debt + w < buf.nextDeath) buf.nextDeath = buf.debt + w
          case None =>
            // group-wide decrement in O(1); purge only when the
            // watermark says a counter can actually hit zero
            buf.debt += w
            if (buf.debt >= buf.nextDeath) purge(buf)
        }
      }
    }
    buf
  }

  override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
    // fold absolute counts (stored − debt) from b2 into b1's frame
    b2.m.foreach { case (i, c) =>
      val abs = c - b2.debt
      b1.m.update(i, b1.m.getOrElse(i, b1.debt) + abs)
    }
    if (b1.m.size > k) {
      // subtract the (k+1)-th largest absolute count via the debt
      val counts = b1.m.values.toArray
      java.util.Arrays.sort(counts)
      b1.debt = counts(counts.length - k - 1)
      purge(b1)
    } else purge(b1) // refresh nextDeath for the merged values
    b1
  }

  override def eval(buf: TopKBuf): Any = {
    val sorted = buf.m.toArray.sortWith { case ((i1, c1), (i2, c2)) =>
      if (c1 != c2) c1 > c2 else i1.compareTo(i2) < 0
    }
    new GenericArrayData(sorted.map { case (i, c) =>
      InternalRow(i, c - buf.debt)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    // ship absolute counts; the receiver starts debt-free
    val entries = buf.m.toArray
    val size = 4 + entries.map(e => 4 + e._1.numBytes() + 8).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (i, c) =>
      val bytes = i.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c - buf.debt)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = mutable.HashMap.empty[UTF8String, Long]
    var min = Long.MaxValue
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      val c = bb.getLong
      if (c < min) min = c
      out.update(UTF8String.fromBytes(b), c)
      i += 1
    }
    new TopKBuf(0L, out, min)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKSketch =
    copy(child = newChildren.head,
      weight = if (newChildren.length > 1) Some(newChildren(1)) else None)
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
