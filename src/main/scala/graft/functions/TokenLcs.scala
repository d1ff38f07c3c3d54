package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Token-level longest-common-subsequence length between two string
  * arrays — the kernel of ROUGE-L (Lin 2004, "ROUGE: A Package for
  * Automatic Evaluation of Summaries" §3): the summarization/
  * paraphrase-eval metric that complements the n-gram-precision view
  * of BLEU (l99) and the char-n-gram view of chrF (l101) with
  * order-preserving recall.
  *
  * Classic two-row DP, O(|a|·|b|) time and O(|b|) space, fused into
  * one codegen'd loop — integer-exact, so the score replays in any
  * engine. Null elements never match (SQL equality semantics); cap
  * the token arrays with `slice` upstream to bound the per-row cost,
  * the same discipline as the 300-char levenshtein prefix (l100).
  */
case class TokenLcs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "token_lcs"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> arguments, got $l / $r")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var prev = new Array[Int](nb + 1)
    var curr = new Array[Int](nb + 1)
    var i = 0
    while (i < na) {
      val wa: UTF8String = if (x.isNullAt(i)) null else x.getUTF8String(i)
      var j = 0
      while (j < nb) {
        val wb: UTF8String = if (y.isNullAt(j)) null else y.getUTF8String(j)
        curr(j + 1) =
          if (wa != null && wa.equals(wb)) prev(j) + 1
          else math.max(prev(j + 1), curr(j))
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    prev(nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val prev = ctx.freshName("prev")
      val curr = ctx.freshName("curr")
      val tmp = ctx.freshName("tmp")
      val wa = ctx.freshName("wa")
      val wb = ctx.freshName("wb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int[] $prev = new int[$nb + 1];
         |int[] $curr = new int[$nb + 1];
         |for (int $i = 0; $i < $na; $i++) {
         |  UTF8String $wa = $a.isNullAt($i) ? null : $a.getUTF8String($i);
         |  for (int $j = 0; $j < $nb; $j++) {
         |    UTF8String $wb = $b.isNullAt($j) ? null : $b.getUTF8String($j);
         |    if ($wa != null && $wa.equals($wb)) {
         |      $curr[$j + 1] = $prev[$j] + 1;
         |    } else {
         |      $curr[$j + 1] = java.lang.Math.max($prev[$j + 1], $curr[$j]);
         |    }
         |  }
         |  int[] $tmp = $prev; $prev = $curr; $curr = $tmp;
         |}
         |${ev.value} = $prev[$nb];
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenLcs =
    copy(left = newLeft, right = newRight)
}
