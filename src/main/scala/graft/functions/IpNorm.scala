package graft.functions

import java.net.{Inet4Address, Inet6Address, InetAddress}

import org.apache.spark.sql.Column

/** IP normalization — the Spark stand-in for ClickHouse `toIPv6OrNull` /
  * `IPv6` columns (/root/reference/clickhouse/init/01_bronze_tables.sql:8-9,
  * 02_kafka_ingest.sql.tmpl:42-43,117-119).
  *
  * ClickHouse stores every address as IPv6, mapping IPv4 into
  * `::ffff:a.b.c.d`, so `"192.168.1.2"` arriving from suricata and
  * `"::ffff:192.168.1.2"` arriving from zeek compare equal. We keep the
  * column as a canonical STRING with the same equality behavior:
  * IPv4 and IPv4-mapped-IPv6 both normalize to `::ffff:a.b.c.d`;
  * other IPv6 normalizes to RFC-5952 (lowercase, zero-compressed);
  * anything unparseable → null (the `OrNull` contract).
  *
  * Parsing is strictly literal: a syntactic pre-check rejects hostnames
  * before `InetAddress.getByName` could ever issue a DNS lookup.
  */
object IpNorm {

  private val ipv4 = """^\d{1,3}(\.\d{1,3}){3}$""".r
  // hex groups / '::' compression / optional embedded dotted-quad tail
  private val ipv6 = """^[0-9a-fA-F:]{2,45}(\.\d{1,3}(\.\d{1,3}){2})?$""".r

  /** Canonical string form, or null. Static + deterministic → safe in a UDF. */
  def normalize(s: String): String = {
    if (s == null) return null
    val t = s.trim
    if (t.isEmpty) return null
    val looksV4 = ipv4.matches(t)
    val looksV6 = !looksV4 && t.contains(':') && ipv6.matches(t)
    if (!looksV4 && !looksV6) return null
    try {
      InetAddress.getByName(t) match {
        case v4: Inet4Address =>
          "::ffff:" + v4.getHostAddress
        case v6: Inet6Address =>
          val b = v6.getAddress
          if (isV4Mapped(b))
            "::ffff:" + (b(12) & 0xff) + "." + (b(13) & 0xff) + "." +
              (b(14) & 0xff) + "." + (b(15) & 0xff)
          else rfc5952(b)
        case _ => null
      }
    } catch { case _: Exception => null }
  }

  private def isV4Mapped(b: Array[Byte]): Boolean =
    b.length == 16 && b.take(10).forall(_ == 0) &&
      b(10) == -1.toByte && b(11) == -1.toByte

  /** RFC 5952: lowercase hex, longest zero-run (len>1) compressed, leftmost wins. */
  private def rfc5952(b: Array[Byte]): String = {
    val groups = Array.tabulate(8)(i => ((b(2 * i) & 0xff) << 8) | (b(2 * i + 1) & 0xff))
    var bestStart, bestLen, curStart, curLen = 0
    var i = 0
    while (i < 8) {
      if (groups(i) == 0) {
        if (curLen == 0) curStart = i
        curLen += 1
        if (curLen > bestLen) { bestLen = curLen; bestStart = curStart }
      } else curLen = 0
      i += 1
    }
    if (bestLen < 2) groups.map(Integer.toHexString).mkString(":")
    else {
      val pre = groups.take(bestStart).map(Integer.toHexString).mkString(":")
      val post = groups.drop(bestStart + bestLen).map(Integer.toHexString).mkString(":")
      s"$pre::$post"
    }
  }

  /** Column form: `normalizeIp($"src_ip")` — backed by the native
    * codegen'd [[NormalizeIp]] expression (keeps the ingest projection
    * inside whole-stage codegen; the old UDF forced a Tungsten exit). */
  def normalizeIp(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      NormalizeIp(org.apache.spark.sql.GraftColumnBridge.expression(c)))
}
