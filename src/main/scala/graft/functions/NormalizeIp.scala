package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for IP canonicalization — the codegen'd
  * replacement for the [[IpNorm]] UDF in the ingest hot path (A3 runs it
  * 4–6× per zeek/suricata row). A UDF forces serialization out of
  * Tungsten rows and breaks whole-stage codegen; this expression stays
  * inside the generated code as a static call.
  *
  * Semantics identical to [[IpNorm.normalize]] (ClickHouse
  * `toIPv6OrNull` + RFC-5952 rendering): IPv4 and v4-mapped v6 →
  * `::ffff:a.b.c.d`, other v6 → canonical compressed form, junk → null.
  */
case class NormalizeIp(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  
  override def nullable: Boolean = true
  override def prettyName: String = "normalize_ip"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeIp.normalizeUtf8(input.asInstanceOf[UTF8String])

  // NB the static helper must NOT be named `eval`: the class inherits
  // eval(InternalRow) from Expression, which suppresses the companion's
  // static forwarder — Janino then can't resolve the call and the whole
  // projection silently falls back to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.NormalizeIp.normalizeUtf8($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeIp =
    copy(child = newChild)
}

object NormalizeIp {
  /** Static entry point shared by interpreted eval and generated code. */
  def normalizeUtf8(s: UTF8String): UTF8String = {
    if (s == null) return null
    val out = IpNorm.normalize(s.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}
