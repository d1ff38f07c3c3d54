package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Shared JVM kernels for the signature expressions below. Standalone
  * object (no companion class) so Scala emits static forwarders —
  * generated Java calls `graft.functions.SigOps.simhash64(arr)`
  * directly, keeping the whole stage inside codegen (the previous UDF
  * formulation broke whole-stage codegen and paid Row↔Scala
  * serialization per row; see CodegenCompileSpec for why the helper
  * must not be named `eval`). */
object SigOps {

  /** 64-bit SimHash over tokenized words: two seeded 32-bit murmurs
    * form the 64 bits, one pass per row. Bit-identical to the
    * historical UDF (same seeds, same accumulate/threshold) on
    * null-free input; null elements are skipped (the SQL surface
    * accepts arbitrary array<string>, where the tokenizer's
    * no-null guarantee doesn't hold). */
  def simhash64(toks: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val s = toks.getUTF8String(t).toString
        val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
        val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b)
        val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  /** Random-hyperplane signature: bit b set iff planes(b)·v ≥ 0.
    * Truncates to min(plane dim, |v|); null elements contribute 0
    * (arbitrary SQL input — dense embeddings never carry them). */
  def hyperplaneSig(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var sig = 0L
    val nv = v.numElements()
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(p.length, nv)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) s += p(i) * v.getFloat(i)
        i += 1
      }
      if (s >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** 64-bit SimHash of an array<string> token column — native codegen
  * expression; the per-row kernel is [[SigOps.simhash64]]. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    SigOps.simhash64(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigOps.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Random-hyperplane LSH bit signature of an array<float> embedding,
  * packed into a long (cosine-preserving). Planes are derived
  * deterministically from (dim, bits, seed) — identical across
  * executors and runs — and shipped to generated code as a reference
  * object, so the bucket assignment stays in whole-stage codegen. */
case class HyperplaneSig(child: Expression, dim: Int, bits: Int, seed: Long)
    extends UnaryExpression {

  require(bits <= 63, "signature must fit in a long")

  override def prettyName: String = "hyperplane_sig"
  override def dataType: DataType = LongType

  @transient private lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    SigOps.hyperplaneSig(a.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SigOps.hyperplaneSig($c, $planesRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}
