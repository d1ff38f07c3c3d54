package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count STATES as first-class values — the
  * AggregatingMergeTree pattern of the reference's engine family
  * (uniqState / uniqMerge): a micro-batch or partition stores its
  * fixed-width sketch (4 KiB at p=12, regardless of input size), any
  * union of stores merges by per-register max, and the estimate reads
  * out at query time. That turns "distinct users per key per month
  * over 100 TB" from a full re-shuffle of raw ids into a merge of
  * per-day 4 KiB states — the same economics [[graft.operators
  * .Summing]] gives additive counters.
  *
  * Flajolet et al. 2007 HyperLogLog with the standard small-range
  * (linear counting) correction; 64-bit xxHash input (Spark's own
  * XxHash64, seed 42) so no large-range correction is needed and the
  * sketch is fully DETERMINISTIC: same multiset in → byte-identical
  * registers in any partitioning/merge order, so states are safe to
  * store, dedupe, and diff.
  */
object Hll {
  /** registers = 2^P; P=12 → relative error ~1.04/√4096 ≈ 1.6 % */
  val P = 12
  val M: Int = 1 << P
  private val Alpha = 0.7213 / (1.0 + 1.079 / M)

  def emptyRegisters(): Array[Byte] = new Array[Byte](M)

  /** Fold one hashed value into the registers. */
  def add(regs: Array[Byte], hash: Long): Unit = {
    val idx = (hash >>> (64 - P)).toInt
    // rank of the remaining 64-P bits: leading zeros + 1, capped
    val w = hash << P
    val rank = (if (w == 0L) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  def mergeInto(into: Array[Byte], from: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (from(i) > into(i)) into(i) = from(i)
      i += 1
    }
    into
  }

  def estimate(regs: Array[Byte]): Long = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      val r = regs(i) & 0xff
      sum += java.lang.Math.scalb(1.0, -r) // 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * M * M / sum
    val e =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(e)
  }
}

/** `hll_sketch(expr)` — aggregate raw values into HLL registers
  * (BINARY, fixed 4 KiB). Accepts any hashable atomic type. */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | StringType | BinaryType | BooleanType |
         DateType | TimestampType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: expr must be an atomic type, got $other")
  }

  override def createAggregationBuffer(): Array[Byte] = Hll.emptyRegisters()

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null)
      Hll.add(buf, XxHash64Function.hash(v, child.dataType, 42L))
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    Hll.mergeInto(b1, b2)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

/** `hll_merge(sketch)` — aggregate stored sketches by per-register
  * max; the read-side fold of the state-store pattern. */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: expects a BINARY sketch, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = Hll.emptyRegisters()

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      require(bytes.length == Hll.M,
        s"hll_merge: sketch must be ${Hll.M} bytes, got ${bytes.length}")
      Hll.mergeInto(buf, bytes)
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
    Hll.mergeInto(b1, b2)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = newChildren.head)
}

/** `hll_estimate(sketch)` — scalar readout of a sketch's cardinality
  * estimate. Runs on one row per group (post-aggregation), so the
  * interpreted eval is never in a hot loop. */
case class HllEstimate(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = LongType
  override def prettyName: String = "hll_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName: expects a BINARY sketch, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    require(bytes.length == Hll.M,
      s"hll_estimate: sketch must be ${Hll.M} bytes, got ${bytes.length}")
    Hll.estimate(bytes)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Hll.estimate((byte[]) $c)")

  override protected def withNewChildInternal(
      newChild: Expression): HllEstimate = copy(child = newChild)
}
