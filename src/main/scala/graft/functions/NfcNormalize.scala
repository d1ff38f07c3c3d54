package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonicalization step that belongs BEFORE any exact/near dedup or
  * hashing pass: the same visible text arrives from the web as
  * precomposed codepoints (é) or base + combining mark (e ‌+ U+0301),
  * and every hash-keyed operator in this engine (exact dedup, shingles,
  * minhash, fingerprints) would treat those as different documents.
  * Spark ships no normalization builtin; a UDF here would break
  * whole-stage codegen in the one place that runs on every row of a
  * 100 TB corpus.
  *
  * Fast path: `java.text.Normalizer.isNormalized` is a cheap scan that
  * avoids allocating for the overwhelmingly-common already-NFC input;
  * only denormalized rows pay the recomposition. Engine-portable:
  * NFC is a Unicode-defined transform, so any engine's implementation
  * (e.g. DuckDB's `nfc_normalize`) replays it byte-for-byte. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfcUtf8(input.asInstanceOf[UTF8String])

  // static helper deliberately not named `eval` — see NormalizeIp
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.NfcNormalize.nfcUtf8($c);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static entry point shared by interpreted eval and generated code. */
  def nfcUtf8(s: UTF8String): UTF8String = {
    if (s == null) return null
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
