package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** EXACT membership-set ("bitmap") algebra — the reference engine
  * family's `groupBitmap` / `bitmapAnd` / `bitmapOr` / `bitmapAndnot`
  * audience-analysis surface (segment sizes, overlap matrices,
  * exclusion audiences), the exact counterpart of the HLL sketch
  * family in [[Hll]]: where the sketch answers "roughly how many",
  * these answer "exactly who", and the AND/OR/ANDNOT cardinalities
  * are exact rather than inclusion-exclusion estimates.
  *
  * Representation: a bitmap is an ASCENDING-sorted distinct
  * `array<bigint>` — the same layout [[SortedIntersectSize]] and the
  * posting-list operators already consume, so every set-op below is
  * an allocation-light two-pointer merge and the states compose with
  * the rest of the engine (a bitmap IS a posting list). The engine
  * family compresses its bitmaps (roaring); the sorted-array layout
  * trades that constant factor for zero-copy interop with Spark's
  * columnar arrays and codegen-friendly merges.
  *
  * Scale shape (100 TB): a bitmap state is bounded by the DISTINCT
  * ids in its group — the same bound the reference family documents
  * (it tells users to shard wide audiences by id range; the same
  * sharding works here: group by (segment, id >> 20), bitmap per
  * shard, [[BitmapOrAgg]] to recombine — set algebra distributes over
  * the shards). Partial aggregation combines map-side, so the shuffle
  * carries one partial state per (group, mapper), never raw rows.
  */
object BitmapAggregates

/** `bitmap_agg(id)` — build the group's sorted-distinct id set (the
  * family's `groupBitmapState`). Buffer is an append-only long
  * buffer; sort+dedup happens once per partial state at serialize /
  * eval time, so update stays O(1) per row. */
case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitmap_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral id column, got $other")
  }

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  override def update(buf: ArrayBuffer[Long], input: InternalRow)
      : ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null) buf += (v match {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
    })
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long])
      : ArrayBuffer[Long] = { b1 ++= b2; b1 }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(BitmapOps.sortedDistinct(buf.toArray))

  // partial states cross the shuffle sorted-distinct (duplicates from
  // one mapper never travel twice)
  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] =
    BitmapOps.packLongs(BitmapOps.sortedDistinct(buf.toArray))

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val arr = BitmapOps.unpackLongs(bytes)
    val out = new ArrayBuffer[Long](arr.length)
    out ++= arr
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapAgg =
    copy(child = newChildren.head)
}

/** `bitmap_or_agg(state)` — union of STORED bitmap states (the
  * family's `groupBitmapOrState` merge): re-aggregate persisted
  * per-shard / per-day bitmaps without touching raw rows. Same
  * append-and-dedupe-late buffer as [[BitmapAgg]]. */
case class BitmapOrAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitmap_or_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> bitmap states, got $other")
  }

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  override def update(buf: ArrayBuffer[Long], input: InternalRow)
      : ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      var i = 0
      val n = a.numElements()
      while (i < n) { buf += a.getLong(i); i += 1 }
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long])
      : ArrayBuffer[Long] = { b1 ++= b2; b1 }

  override def eval(buf: ArrayBuffer[Long]): Any =
    new GenericArrayData(BitmapOps.sortedDistinct(buf.toArray))

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] =
    BitmapOps.packLongs(BitmapOps.sortedDistinct(buf.toArray))

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val arr = BitmapOps.unpackLongs(bytes)
    val out = new ArrayBuffer[Long](arr.length)
    out ++= arr
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapOrAgg =
    copy(child = newChildren.head)
}

/** `bitmap_and_agg(state)` — intersection of STORED bitmap states
  * (the family's `groupBitmapAndState`): "users present EVERY day of
  * the window". Buffer is the running intersection (null = no state
  * seen yet, the identity); each update/merge is one two-pointer
  * pass, so the buffer only ever SHRINKS — the opposite failure mode
  * of the union aggregates. */
case class BitmapAndAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapAndAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitmap_and_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> bitmap states, got $other")
  }

  override def createAggregationBuffer(): BitmapAndAgg.Buf =
    new BitmapAndAgg.Buf(null)

  override def update(buf: BitmapAndAgg.Buf, input: InternalRow)
      : BitmapAndAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      val incoming = new Array[Long](a.numElements())
      var i = 0
      while (i < incoming.length) { incoming(i) = a.getLong(i); i += 1 }
      val sorted = BitmapOps.sortedDistinct(incoming)
      buf.set = if (buf.set == null) sorted
                else BitmapOps.intersect(buf.set, sorted)
    }
    buf
  }

  override def merge(b1: BitmapAndAgg.Buf, b2: BitmapAndAgg.Buf)
      : BitmapAndAgg.Buf = {
    if (b2.set != null)
      b1.set = if (b1.set == null) b2.set
               else BitmapOps.intersect(b1.set, b2.set)
    b1
  }

  override def eval(buf: BitmapAndAgg.Buf): Any =
    new GenericArrayData(
      if (buf.set == null) Array.emptyLongArray else buf.set)

  override def serialize(buf: BitmapAndAgg.Buf): Array[Byte] =
    if (buf.set == null) Array.emptyByteArray
    else {
      // a one-byte marker distinguishes "no state yet" (identity) from
      // a genuinely empty intersection
      val packed = BitmapOps.packLongs(buf.set)
      val out = new Array[Byte](packed.length + 1)
      out(0) = 1
      System.arraycopy(packed, 0, out, 1, packed.length)
      out
    }

  override def deserialize(bytes: Array[Byte]): BitmapAndAgg.Buf =
    if (bytes.isEmpty) new BitmapAndAgg.Buf(null)
    else new BitmapAndAgg.Buf(
      BitmapOps.unpackLongs(java.util.Arrays.copyOfRange(bytes, 1, bytes.length)))

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAndAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAndAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapAndAgg =
    copy(child = newChildren.head)
}

object BitmapAndAgg {
  final class Buf(var set: Array[Long])
}

/** Static kernels shared by the interpreted AND generated code paths
  * of the bitmap set-ops (the generated body is one static call, so
  * the expressions stay inside whole-stage codegen without
  * duplicating merge loops into every compiled plan). */
object BitmapOps {

  def sortedDistinct(arr: Array[Long]): Array[Long] = {
    if (arr.length <= 1) return arr
    java.util.Arrays.sort(arr)
    var w = 1
    var i = 1
    while (i < arr.length) {
      if (arr(i) != arr(w - 1)) { arr(w) = arr(i); w += 1 }
      i += 1
    }
    if (w == arr.length) arr else java.util.Arrays.copyOf(arr, w)
  }

  def toLongArray(a: ArrayData): Array[Long] = {
    val out = new Array[Long](a.numElements())
    var i = 0
    while (i < out.length) { out(i) = a.getLong(i); i += 1 }
    out
  }

  def intersect(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length, b.length))
    var i = 0; var j = 0; var w = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { out(w) = a(i); w += 1; i += 1; j += 1 }
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var w = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) { out(w) = a(i); i += 1 }
      else if (a(i) > b(j)) { out(w) = b(j); j += 1 }
      else { out(w) = a(i); i += 1; j += 1 }
      w += 1
    }
    while (i < a.length) { out(w) = a(i); i += 1; w += 1 }
    while (j < b.length) { out(w) = b(j); j += 1; w += 1 }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  def andnot(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length)
    var i = 0; var j = 0; var w = 0
    while (i < a.length) {
      while (j < b.length && b(j) < a(i)) j += 1
      if (j >= b.length || b(j) != a(i)) { out(w) = a(i); w += 1 }
      i += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  def xor(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var w = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) { out(w) = a(i); i += 1; w += 1 }
      else if (a(i) > b(j)) { out(w) = b(j); j += 1; w += 1 }
      else { i += 1; j += 1 }
    }
    while (i < a.length) { out(w) = a(i); i += 1; w += 1 }
    while (j < b.length) { out(w) = b(j); j += 1; w += 1 }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  // entry points for generated code: ArrayData in, ArrayData out
  def andData(a: ArrayData, b: ArrayData): ArrayData =
    new GenericArrayData(intersect(toLongArray(a), toLongArray(b)))
  def orData(a: ArrayData, b: ArrayData): ArrayData =
    new GenericArrayData(union(toLongArray(a), toLongArray(b)))
  def andnotData(a: ArrayData, b: ArrayData): ArrayData =
    new GenericArrayData(andnot(toLongArray(a), toLongArray(b)))
  def xorData(a: ArrayData, b: ArrayData): ArrayData =
    new GenericArrayData(xor(toLongArray(a), toLongArray(b)))

  def contains(a: ArrayData, x: Long): Boolean = {
    var lo = 0
    var hi = a.numElements() - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val v = a.getLong(mid)
      if (v < x) lo = mid + 1
      else if (v > x) hi = mid - 1
      else return true
    }
    false
  }

  def hasAny(a: ArrayData, b: ArrayData): Boolean = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else return true
    }
    false
  }

  /** every element of b present in a */
  def hasAll(a: ArrayData, b: ArrayData): Boolean = {
    val na = a.numElements(); val nb = b.numElements()
    if (nb > na) return false
    var i = 0; var j = 0
    while (j < nb) {
      if (i >= na) return false
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) return false
      else { i += 1; j += 1 }
    }
    true
  }

  def packLongs(arr: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(arr.length * 8)
    arr.foreach(bb.putLong)
    bb.array()
  }

  def unpackLongs(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }
}

/** Binary set-ops over two sorted-distinct bitmaps. `op` selects the
  * kernel; each generated body is one static [[BitmapOps]] call so
  * the expression participates in whole-stage codegen. */
case class BitmapSetOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression {

  require(BitmapSetOp.Ops.contains(op),
    s"bitmap set-op must be one of ${BitmapSetOp.Ops.keys.mkString("/")}, got $op")

  override def prettyName: String = s"bitmap_$op"
  override def dataType: DataType =
    if (op == "has_any" || op == "has_all") BooleanType
    else ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> bitmaps, got $l / $r")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapSetOp.Ops(op)(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitmapOps.${BitmapSetOp.Methods(op)}($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapSetOp =
    copy(left = newLeft, right = newRight)
}

object BitmapSetOp {
  private[functions] val Ops: Map[String, (ArrayData, ArrayData) => Any] = Map(
    "and" -> BitmapOps.andData,
    "or" -> BitmapOps.orData,
    "andnot" -> BitmapOps.andnotData,
    "xor" -> BitmapOps.xorData,
    "has_any" -> BitmapOps.hasAny,
    "has_all" -> BitmapOps.hasAll)
  private[functions] val Methods: Map[String, String] = Map(
    "and" -> "andData", "or" -> "orData", "andnot" -> "andnotData",
    "xor" -> "xorData", "has_any" -> "hasAny", "has_all" -> "hasAll")
}

/** `bitmap_contains(bitmap, id)` — binary-search membership probe. */
case class BitmapContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bitmap_contains"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, integral id), got $l / $r")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.contains(a.asInstanceOf[ArrayData], b match {
      case i: Int => i.toLong
      case l: Long => l
    })

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitmapOps.contains($a, (long) $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapContains =
    copy(left = newLeft, right = newRight)
}
