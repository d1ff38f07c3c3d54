package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `window_funnel(window_sec, ts, cond1, …, condK)` — the funnel as a
  * true AGGREGATE function, matching the shape the reference's engine
  * family exposes to its SQL users (an aggregate over the group's
  * events, not a pre-built per-key table). Semantics are identical to
  * [[graft.operators.Funnel.windowFunnel]]: the earliest step-1 second
  * anchors, each later step takes the earliest qualifying event
  * strictly after the previous match and within `window_sec` of the
  * anchor; returns the reached level (0 when step 1 never fires).
  * An event satisfying several step predicates counts for each, like
  * the operator's independent per-step filters.
  *
  * State is the group's matched (step, second) pairs packed into one
  * long each (step in the top 16 bits, second in the low 48 — valid
  * until year ~8.9 M): partial aggregation combines map-side, merge is
  * buffer concat, and only matched events enter the buffer at all —
  * the same per-group footprint the reference's implementation keeps.
  * The chain is resolved once, in `eval`.
  */
case class WindowFunnel(
    windowSec: Long,
    ts: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  require(conds.nonEmpty, "window_funnel needs at least one step predicate")
  require(conds.size <= 0xffff, "window_funnel: too many steps")

  override def children: Seq[Expression] = ts +: conds
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String = "window_funnel"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (ts.dataType != TimestampType)
      TypeCheckFailure(s"$prettyName: ts must be TIMESTAMP, got ${ts.dataType}")
    else conds.find(_.dataType != BooleanType) match {
      case Some(c) => TypeCheckFailure(
        s"$prettyName: step predicates must be BOOLEAN, got ${c.dataType}")
      case None => TypeCheckSuccess
    }
  }

  private val SecMask = (1L << 48) - 1

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  override def update(buf: ArrayBuffer[Long], input: InternalRow)
      : ArrayBuffer[Long] = {
    val t = ts.eval(input)
    if (t != null) {
      val sec = t.asInstanceOf[Long] / 1000000L // TimestampType micros
      var i = 0
      while (i < conds.length) {
        val c = conds(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean])
          buf += (((i + 1).toLong << 48) | (sec & SecMask))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long])
      : ArrayBuffer[Long] = { b1 ++= b2; b1 }

  override def eval(buf: ArrayBuffer[Long]): Any = {
    // anchor: earliest step-1 second
    var t1 = Long.MaxValue
    var j = 0
    while (j < buf.length) {
      val e = buf(j)
      if ((e >>> 48) == 1L && (e & SecMask) < t1) t1 = e & SecMask
      j += 1
    }
    if (t1 == Long.MaxValue) return 0
    val hi = t1 + windowSec
    var level = 1
    var prev = t1
    var stalled = false
    var step = 2
    while (step <= conds.length && !stalled) {
      var best = Long.MaxValue
      var k = 0
      while (k < buf.length) {
        val e = buf(k)
        val sec = e & SecMask
        if ((e >>> 48) == step.toLong && sec > prev && sec <= hi &&
          sec < best) best = sec
        k += 1
      }
      if (best == Long.MaxValue) stalled = true
      else { level += 1; prev = best }
      step += 1
    }
    level
  }

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getLong
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WindowFunnel =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WindowFunnel =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WindowFunnel =
    copy(ts = newChildren.head, conds = newChildren.tail)
}
