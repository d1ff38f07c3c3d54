package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Shared JVM kernel for the Bloom-sketch membership expression below.
  * Standalone object so Scala emits a static forwarder — generated Java
  * calls `graft.functions.BloomOps.anyMightContain(arr, bf)` directly
  * and the probe stays inside whole-stage codegen (same discipline as
  * [[SigOps]]). */
object BloomOps {

  /** True iff ANY element of the long array might be in the filter.
    * Null elements are skipped (arbitrary SQL input; the shingle
    * producers never emit them). Short-circuits on the first hit. */
  def anyMightContain(arr: ArrayData, bf: BloomFilter): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && bf.mightContainLong(arr.getLong(i))) return true
      i += 1
    }
    false
  }
}

/** `array<long> → boolean`: does any element possibly belong to the
  * given Bloom sketch? The filter is carried as its serialized bytes
  * (so the expression tree stays serializable executor-side) and
  * deserialized once per task via a codegen reference object — the
  * per-row work is just k hash probes per array element, no join, no
  * shuffle. This is the map-side prefilter of
  * [[graft.operators.Dedup.bloomDecontaminate]]: a `false` here is a
  * PROOF of non-membership (Bloom filters have no false negatives), so
  * rows it clears never reach the exact-confirm join. */
case class BloomMightContainAny(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def prettyName: String = "bloom_might_contain_any"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got $t")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(a: Any): Any =
    BloomOps.anyMightContain(a.asInstanceOf[ArrayData], bloom)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BloomOps.anyMightContain($c, $bfRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainAny = copy(child = newChild)
}
