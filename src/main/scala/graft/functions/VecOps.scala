package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector algebra over embedding columns (`array<float>` /
  * `array<double>`), the hot loop of the similarity-search and
  * embedding-dedup operators.
  *
  * The builtin formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is codegen'd but materializes the element-wise product as a fresh
  * ArrayData per row per pair — at ANN scale (corpus × probes rows)
  * the allocation dominates. These expressions run the fused loop
  * directly on the two input arrays: zero allocation, three
  * accumulators in registers for cosine (dot, |a|², |b|² in ONE pass
  * instead of three separate aggregate trees).
  *
  * Element nulls are treated as 0 (embeddings are dense by
  * construction; parquet float arrays are non-null). Mismatched
  * lengths zero-pad the shorter side, matching `zip_with` semantics
  * for the dot product.
  */
private[functions] trait VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemOf(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _ => NullType
  }

  protected def isFloat: Boolean = elemOf(left) == FloatType

  /** "getFloat" / "getDouble" — ArrayData accessor for the element type. */
  protected def getter: String = if (isFloat) "getFloat" else "getDouble"

  override def checkInputDataTypes(): TypeCheckResult =
    (elemOf(left), elemOf(right)) match {
      case (FloatType, FloatType) | (DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> or two array<double> " +
          s"arguments, got $l / $r")
    }

  protected def elemAt(a: ArrayData, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** Σ aᵢ·bᵢ (zero-padded to the longer array). */
case class VecDot(left: Expression, right: Expression)
    extends VecBinaryExpression {

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += elemAt(x, i) * elemAt(y, i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getter($i)) * ((double) $b.$getter($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ aᵢ·bᵢ over two int arrays, accumulated in LONG — the scoring
  * kernel of the scalar-quantized ANN path
  * ([[graft.operators.Similarity.int8TopK]]). Quantized codes are
  * small integers (|q| ≤ 127), so the per-element product fits an int
  * and the long accumulator is exact for any realistic dimension —
  * unlike the double-accumulating [[VecDot]], integer scores compare
  * with no rounding at all. Same fused zero-allocation loop; lengths
  * zero-pad to the shorter side (zip_with semantics). */
case class VecDotInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "vec_dot_int"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<int> arguments, got $l / $r")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getInt(i).toLong * y.getInt(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getInt($i)) * $b.getInt($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotInt =
    copy(left = newLeft, right = newRight)
}

/** |A ∩ B| for two ASCENDING-sorted long arrays via a two-pointer
  * merge — the verification hot loop of the similarity joins. The
  * builtin `size(array_intersect(a, b))` builds a hash set per
  * invocation; at candidate-pair scale (each document participates in
  * many pairs) the per-pair allocation dominates. The merge is
  * allocation-free and branch-predictable. Inputs MUST be sorted
  * (produce them with `array_sort`); duplicates are counted once per
  * distinct value, matching set semantics on distinct inputs. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "sorted_intersect_size"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> arguments, got $l / $r")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else {
        c += 1; i += 1; j += 1
        // skip duplicates so multiset inputs still count distinct values
        while (i < nx && x.getLong(i) == xv) i += 1
        while (j < ny && y.getLong(j) == yv) j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else {
         |    $c++; $i++; $j++;
         |    while ($i < $nx && $a.getLong($i) == $xv) { $i++; }
         |    while ($j < $ny && $b.getLong($j) == $yv) { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity Σaᵢbᵢ / (‖a‖·‖b‖) in one fused pass; null when
  * either norm is zero (matching SQL divide-by-zero semantics). */
case class VecCosine(left: Expression, right: Expression)
    extends VecBinaryExpression {

  override def prettyName: String = "vec_cosine"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.max(nx, ny)
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (i < nx) elemAt(x, i) else 0.0
      val yv = if (i < ny) elemAt(y, i) else 0.0
      dab += xv * yv; daa += xv * xv; dbb += yv * yv
      i += 1
    }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    if (denom == 0.0) null else dab / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val dab = ctx.freshName("dab")
      val daa = ctx.freshName("daa")
      val dbb = ctx.freshName("dbb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = java.lang.Math.max($na, $nb);
         |double $dab = 0.0; double $daa = 0.0; double $dbb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $i < $na ? (double) $a.$getter($i) : 0.0;
         |  double $yv = $i < $nb ? (double) $b.$getter($i) : 0.0;
         |  $dab += $xv * $yv; $daa += $xv * $xv; $dbb += $yv * $yv;
         |}
         |double $denom = java.lang.Math.sqrt($daa) * java.lang.Math.sqrt($dbb);
         |if ($denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dab / $denom;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}
