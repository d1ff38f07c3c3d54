package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** IPv6 (or IPv4, mapped) literal → its 128-bit value as a
  * struct<hi: long, lo: long> — the numeric form every range/CIDR
  * operation wants (ClickHouse's `IPv6` columns are exactly a 16-byte
  * value; `isIPAddressInRange` compares them numerically). Callers
  * XOR each long with Long.MinValue to get SIGNED comparisons that
  * agree with unsigned 128-bit order (see `Siem.ipv6Key`).
  *
  * Parsing rides [[IpNorm]]'s strictly-literal path (syntactic
  * pre-check, no DNS); junk → null. Native codegen'd expression —
  * one static call inside whole-stage codegen. */
case class Ipv6Pair(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  override def nullable: Boolean = true
  override def prettyName: String = "ipv6_pair"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName: expects STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Ipv6Pair.pairUtf8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.Ipv6Pair.pairUtf8($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Ipv6Pair =
    copy(child = newChild)
}

object Ipv6Pair {
  /** Static entry point shared by interpreted eval and generated code. */
  def pairUtf8(s: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    if (s == null) return null
    val bytes = toBytes(s.toString)
    if (bytes == null) return null
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (bytes(i) & 0xffL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (bytes(i) & 0xffL); i += 1 }
    new GenericInternalRow(Array[Any](hi, lo))
  }

  /** 16-byte form of a literal v4/v6 address (v4 → v4-mapped), or
    * null. Same syntactic guards as [[IpNorm.normalize]]. */
  def toBytes(raw: String): Array[Byte] = {
    if (raw == null) return null
    val t = raw.trim
    if (t.isEmpty) return null
    val looksV4 = t.matches("""^\d{1,3}(\.\d{1,3}){3}$""")
    val looksV6 = !looksV4 && t.contains(':') &&
      t.matches("""^[0-9a-fA-F:]{2,45}(\.\d{1,3}(\.\d{1,3}){2})?$""")
    if (!looksV4 && !looksV6) return null
    try {
      java.net.InetAddress.getByName(t) match {
        case v4: java.net.Inet4Address =>
          val b = new Array[Byte](16)
          b(10) = -1; b(11) = -1
          System.arraycopy(v4.getAddress, 0, b, 12, 4)
          b
        case v6: java.net.Inet6Address => v6.getAddress
        case _ => null
      }
    } catch { case _: Exception => null }
  }
}
