package graft.operators

import graft.SparkSpec

/** LPM vs an independent brute force on random nested prefix tables:
  * the per-length masked-key equi-join + argmax must equal "scan every
  * prefix, keep the longest whose range contains the address" for
  * random IPs against random prefixes of random lengths (including
  * /0, /32 host routes, and heavy nesting). */
class LpmPropertySpec extends SparkSpec {
  import spark.implicits._

  private def ipOf(n: Long): String =
    s"${(n >> 24) & 0xff}.${(n >> 16) & 0xff}.${(n >> 8) & 0xff}.${n & 0xff}"

  test("lpmMatch equals brute-force longest containing prefix on 2000 random IPs") {
    val rnd = new scala.util.Random(20260815L)
    // prefixes biased into a narrow space so nesting actually happens
    val prefixes: Seq[(Long, Int)] = (0 until 120).map { _ =>
      val plen = rnd.nextInt(33) // 0..32
      val base = (rnd.nextLong().abs % (1L << 32)) &
        (if (plen == 0) 0L else ((1L << plen) - 1) << (32 - plen))
      // half the table lands under 10.0.0.0/8 to force deep nesting
      if (rnd.nextBoolean() && plen >= 8)
        ((10L << 24) | (base & ((1L << 24) - 1)), plen)
      else (base, plen)
    }.distinct
    val cidrs = prefixes.map { case (b, l) => s"${ipOf(b)}/$l" }
    val ips: Seq[(Long, Long)] = (0L until 2000L).map { i =>
      // half the probes inside 10/8 too
      val n = if (rnd.nextBoolean()) (10L << 24) | rnd.nextInt(1 << 24).toLong
        else rnd.nextLong().abs % (1L << 32)
      (i, n)
    }

    def contains(base: Long, plen: Int, ip: Long): Boolean =
      plen == 0 || ((base >>> (32 - plen)) == (ip >>> (32 - plen)))
    val expect: Map[Long, (String, Int)] = ips.flatMap { case (id, ip) =>
      val m = prefixes.filter { case (b, l) => contains(b, l, ip) }
      if (m.isEmpty) None
      else {
        val (b, l) = m.maxBy { case (b2, l2) => (l2, s"${ipOf(b2)}/$l2") }
        Some(id -> (s"${ipOf(b)}/$l", l))
      }
    }.toMap

    val got = Siem.lpmMatch(
        ips.map { case (id, n) => (id, ipOf(n)) }.toDF("id", "ip"),
        "ip", cidrs.toDF("cidr"), Seq("id"))
      .as[(Long, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // plen ties between DISTINCT prefixes are impossible (same length
    // + both containing => same masked key => same base), so only the
    // winner set needs comparing
    assert(got.keySet == expect.keySet,
      s"match sets differ: only-got=${(got.keySet -- expect.keySet).take(5)} " +
        s"only-expect=${(expect.keySet -- got.keySet).take(5)}")
    val bad = expect.collect {
      case (id, e) if got(id)._2 != e._2 => (id, got(id), e)
    }
    assert(bad.isEmpty, s"winner length mismatches: ${bad.take(5)}")
  }
}
