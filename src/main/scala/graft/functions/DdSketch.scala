package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** DDSketch (Masson, Rim, Lee — VLDB'19 "DDSketch: A Fast and
  * Fully-Mergeable Quantile Sketch with Relative-Error Guarantees"):
  * log-bucketed counts with a RELATIVE accuracy bound — the quantile
  * estimate q̂ satisfies |q̂ − q| ≤ α·q for every quantile at once,
  * which is the guarantee latency percentiles actually need (a GK /
  * t-digest rank bound lets the p999 of a heavy tail wander; a
  * relative bound cannot). The state is a sparse (bucket → count)
  * map; MERGE IS EXACT (bucket-wise count addition — two sketches
  * merge to precisely the sketch of the union), so partial states
  * compose across partitions, days, and engines with no accuracy
  * loss, unlike quantile digests whose merge degrades.
  *
  * Positive LONG inputs only (the suite's fixed-point cents/micros
  * convention); zero and negative values are counted in a dedicated
  * zero bucket the way the paper's positive-value variant prescribes.
  * Bucket index = ⌈ln(v)/ln(γ)⌉ with γ = (1+α)/(1−α); the estimate
  * returned for a bucket is 2γ^i/(γ+1), the bucket's midpoint in
  * log-space. Bucket math runs in doubles but the STATE is integer
  * counts — the only cross-engine caveat is a value within one ulp of
  * a bucket boundary landing one bucket over, which moves the
  * estimate by at most one γ step and therefore stays inside the
  * relative bound; the suite oracles the GUARANTEE (estimate within
  * α·q of the exact quantile), not the estimate.
  *
  * 100 TB shape: the map holds one entry per occupied bucket —
  * ln(maxValue/minValue)/ln(γ) entries (a 1-cent-to-10M-cent range at
  * α = 0.01 is ~800 buckets) regardless of row count. */
object DdSketch {

  def gamma(alpha: Double): Double = (1.0 + alpha) / (1.0 - alpha)

  def bucketOf(v: Long, gammaLn: Double): Int =
    if (v <= 0L) Int.MinValue // zero bucket sentinel
    else math.ceil(math.log(v.toDouble) / gammaLn).toInt

  /** Bucket midpoint estimate 2γ^i/(γ+1). */
  def estimateOf(bucket: Int, g: Double): Double =
    2.0 * math.pow(g, bucket) / (g + 1.0)

  /** Read quantile `q` (0 < q ≤ 1) off a (bucket → count) state:
    * the value whose rank is ⌈q·n⌉ in bucket order, zero bucket
    * first. Returns 0.0 when the rank falls in the zero bucket. */
  def quantile(counts: mutable.LongMap[Long], zeroCount: Long,
      total: Long, q: Double, g: Double): Double = {
    val rank = math.max(1L, math.ceil(q * total).toLong)
    if (rank <= zeroCount) return 0.0
    var seen = zeroCount
    val buckets = counts.keys.toArray.sorted
    var i = 0
    while (i < buckets.length) {
      seen += counts(buckets(i))
      if (seen >= rank) return estimateOf(buckets(i).toInt, g)
      i += 1
    }
    if (buckets.nonEmpty) estimateOf(buckets.last.toInt, g) else 0.0
  }

  // generated-code entry points (one static call per evaluation)
  def countsTotal(buf: DdSketchAgg.Buf): Long = buf.counts.values.sum
  def quantileOf(buf: DdSketchAgg.Buf, total: Long, q: Double,
      g: Double): Double = quantile(buf.counts, buf.zero, total, q, g)
}

/** `dd_sketch(alpha, value)` — build the sketch state. Serialized as
  * (zeroCount, n_buckets, [bucket, count]*): engine-neutral, exact
  * bucket-wise merge. Output is BINARY for storage/re-aggregation
  * with [[DdMergeAgg]] and [[DdQuantile]]. */
case class DdSketchAgg(
    alpha: Double,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketchAgg.Buf] {

  require(alpha > 0.0 && alpha < 0.5,
    s"dd_sketch: alpha must be in (0, 0.5), got $alpha")

  private val gammaLn = math.log(DdSketch.gamma(alpha))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "dd_sketch"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral value column, got $other")
  }

  override def createAggregationBuffer(): DdSketchAgg.Buf =
    new DdSketchAgg.Buf(mutable.LongMap.empty, 0L)

  override def update(buf: DdSketchAgg.Buf, input: InternalRow)
      : DdSketchAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val x = v match { case i: Int => i.toLong; case l: Long => l }
      if (x <= 0L) buf.zero += 1
      else {
        val b = DdSketch.bucketOf(x, gammaLn).toLong
        buf.counts(b) = buf.counts.getOrElse(b, 0L) + 1L
      }
    }
    buf
  }

  override def merge(b1: DdSketchAgg.Buf, b2: DdSketchAgg.Buf)
      : DdSketchAgg.Buf = {
    b1.zero += b2.zero
    b2.counts.foreach { case (k, c) =>
      b1.counts(k) = b1.counts.getOrElse(k, 0L) + c
    }
    b1
  }

  override def eval(buf: DdSketchAgg.Buf): Any = serialize(buf)

  override def serialize(buf: DdSketchAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + buf.counts.size * 16)
    bb.putLong(buf.zero)
    bb.putLong(buf.counts.size.toLong)
    buf.counts.toSeq.sortBy(_._1).foreach { case (k, c) =>
      bb.putLong(k); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DdSketchAgg.Buf =
    DdSketchAgg.read(bytes)

  override def withNewMutableAggBufferOffset(n: Int): DdSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): DdSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): DdSketchAgg = copy(child = c.head)
}

object DdSketchAgg {
  final class Buf(val counts: mutable.LongMap[Long], var zero: Long)

  def read(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val zero = bb.getLong
    val n = bb.getLong.toInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { val k = bb.getLong; val c = bb.getLong; m(k) = c; i += 1 }
    new Buf(m, zero)
  }
}

/** `dd_merge(state)` — exact bucket-wise re-aggregation of stored
  * sketch states (the -Merge combinator; unlike digest merges this
  * loses NOTHING: merge(sketch(A), sketch(B)) == sketch(A ∪ B)). */
case class DdMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdSketchAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "dd_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY sketch states, got $other")
  }

  override def createAggregationBuffer(): DdSketchAgg.Buf =
    new DdSketchAgg.Buf(mutable.LongMap.empty, 0L)

  override def update(buf: DdSketchAgg.Buf, input: InternalRow)
      : DdSketchAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val other = DdSketchAgg.read(v.asInstanceOf[Array[Byte]])
      buf.zero += other.zero
      other.counts.foreach { case (k, c) =>
        buf.counts(k) = buf.counts.getOrElse(k, 0L) + c
      }
    }
    buf
  }

  override def merge(b1: DdSketchAgg.Buf, b2: DdSketchAgg.Buf)
      : DdSketchAgg.Buf = {
    b1.zero += b2.zero
    b2.counts.foreach { case (k, c) =>
      b1.counts(k) = b1.counts.getOrElse(k, 0L) + c
    }
    b1
  }

  override def eval(buf: DdSketchAgg.Buf): Any = serialize(buf)

  override def serialize(buf: DdSketchAgg.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + buf.counts.size * 16)
    bb.putLong(buf.zero)
    bb.putLong(buf.counts.size.toLong)
    buf.counts.toSeq.sortBy(_._1).foreach { case (k, c) =>
      bb.putLong(k); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): DdSketchAgg.Buf =
    DdSketchAgg.read(bytes)

  override def withNewMutableAggBufferOffset(n: Int): DdMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): DdMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): DdMergeAgg = copy(child = c.head)
}

/** `dd_quantile(state, q, alpha)` — read quantile q off a stored
  * state (alpha must match the build alpha — it determines γ). */
case class DdQuantile(left: Expression, right: Expression, alpha: Double)
    extends BinaryExpression {

  require(alpha > 0.0 && alpha < 0.5,
    s"dd_quantile: alpha must be in (0, 0.5), got $alpha")

  override def prettyName: String = "dd_quantile"
  override def dataType: DataType = DoubleType
  // an EMPTY state reads as null regardless of input nullability, so
  // the generated code must own a real isNull variable — default
  // nullSafeCodeGen hands out a `false` CONSTANT when both inputs are
  // non-nullable and the assignment fails Janino compilation (a
  // silent interpreted fallback, the exact trap CodegenCompileSpec
  // exists to catch)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary state, double q), got $l / $r")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val state = left.eval(input)
    val q = right.eval(input)
    if (state == null || q == null) null
    else {
      val buf = DdSketchAgg.read(state.asInstanceOf[Array[Byte]])
      val total = buf.zero + buf.counts.values.sum
      if (total == 0L) null
      else DdSketch.quantile(buf.counts, buf.zero, total,
        q.asInstanceOf[Double], DdSketch.gamma(alpha))
    }
  }

  // the walk is a scalar kernel call — one static invocation keeps the
  // expression inside whole-stage codegen; hand-rolled null handling
  // because the result can be null on NON-null inputs (empty state)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val buf = ctx.freshName("ddbuf")
    val tot = ctx.freshName("ddtot")
    val resultCode =
      code"""
         |${leftGen.code}
         |${rightGen.code}
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${leftGen.isNull} && !${rightGen.isNull}) {
         |  graft.functions.DdSketchAgg.Buf $buf =
         |    graft.functions.DdSketchAgg.read(${leftGen.value});
         |  long $tot = $buf.zero() +
         |    graft.functions.DdSketch.countsTotal($buf);
         |  if ($tot != 0L) {
         |    ${ev.isNull} = false;
         |    ${ev.value} = graft.functions.DdSketch.quantileOf(
         |      $buf, $tot, ${rightGen.value}, ${DdSketch.gamma(alpha)});
         |  }
         |}
       """.stripMargin
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DdQuantile =
    copy(left = newLeft, right = newRight)
}
