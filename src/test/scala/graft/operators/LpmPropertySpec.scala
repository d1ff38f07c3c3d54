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

  test("lpmEnrich equals brute force with sloppy and exact duplicates planted") {
    val rnd = new scala.util.Random(20260817L)
    // canonical prefixes, then ~1/3 get a SLOPPY duplicate (host bits
    // set, different payload) and a few get an EXACT duplicate cidr
    // string with a second payload — the two duplicate classes the
    // dedupe rules must resolve deterministically
    val canon: Seq[(Long, Int)] = (0 until 80).map { _ =>
      val plen = rnd.nextInt(33)
      val base = (rnd.nextLong().abs % (1L << 32)) &
        (if (plen == 0) 0L else ((1L << plen) - 1) << (32 - plen))
      if (rnd.nextBoolean() && plen >= 8)
        ((10L << 24) | (base & ((1L << 24) - 1)), plen)
      else (base, plen)
    }.distinct
    case class P(cidr: String, base: Long, plen: Int, pay: String)
    var rows = scala.collection.mutable.ArrayBuffer[P]()
    canon.zipWithIndex.foreach { case ((b, l), i) =>
      rows += P(s"${ipOf(b)}/$l", b, l, s"pay$i")
      if (i % 3 == 0 && l > 0 && l < 32) {
        // sloppy literal: same prefix, host bits set
        val sloppy = b | (rnd.nextLong().abs % (1L << (32 - l)))
        rows += P(s"${ipOf(sloppy)}/$l", sloppy, l, s"sloppy$i")
      }
      if (i % 7 == 0) // exact duplicate cidr, second payload
        rows += P(s"${ipOf(b)}/$l", b, l, s"dup$i")
    }
    val ips: Seq[(Long, Long)] = (0L until 1000L).map { i =>
      val n = if (rnd.nextBoolean()) (10L << 24) | rnd.nextInt(1 << 24).toLong
        else rnd.nextLong().abs % (1L << 32)
      (i, n)
    }

    def keyOf(p: P): Long = if (p.plen == 0) 0L else p.base >>> (32 - p.plen)
    val groups = rows.toSeq.groupBy(p => (p.plen, keyOf(p)))
    // brute-force replica of the documented dedupe: canonical row =
    // min (base, cidr) of the group; payload = min payload among rows
    // sharing the kept cidr STRING
    val kept: Map[(Int, Long), (String, String)] = groups.map {
      case (k, g) =>
        val c = g.minBy(p => (p.base, p.cidr))
        val pay = rows.filter(_.cidr == c.cidr).map(_.pay).min
        k -> ((c.cidr, pay))
    }
    def contains(plen: Int, key: Long, ip: Long): Boolean =
      plen == 0 || key == (ip >>> (32 - plen))
    val expect: Map[Long, (String, Int, String)] = ips.flatMap {
      case (id, ip) =>
        val ks = groups.keys.filter { case (l, k) => contains(l, k, ip) }
        if (ks.isEmpty) None
        else {
          val (l, k) = ks.maxBy(_._1)
          val (cidr, pay) = kept((l, k))
          Some(id -> ((cidr, l, pay)))
        }
    }.toMap

    val got = Siem.lpmEnrich(
        ips.map { case (id, n) => (id, ipOf(n)) }.toDF("id", "ip"),
        "ip", rows.toSeq.map(p => (p.cidr, p.pay)).toDF("cidr", "pay"),
        Seq("id"), Seq("pay"))
      .as[(Long, String, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == expect.keySet,
      s"match sets differ: only-got=${(got.keySet -- expect.keySet).take(5)} " +
        s"only-expect=${(expect.keySet -- got.keySet).take(5)}")
    val bad = expect.collect {
      case (id, e) if got(id) != e => (id, got(id), e)
    }
    assert(bad.isEmpty, s"winner/payload mismatches: ${bad.take(5)}")
  }

  test("lpm6Match equals brute force across the 64-bit boundary on 1500 random IPs") {
    val rnd = new scala.util.Random(20260816L)
    def hex(n: Long): String = java.lang.Long.toHexString(n)
    // addresses 2001:db8:A:B::C:D — four random 16-bit groups, so
    // prefixes of length 32..128 all discriminate
    def addrOf(a: Int, b: Int, c: Int, dd: Int): String =
      s"2001:db8:${hex(a)}:${hex(b)}::${hex(c)}:${hex(dd)}"
    // raw (hi, lo) of that address
    def bitsOf(a: Int, b: Int, c: Int, dd: Int): (Long, Long) = (
      (0x2001L << 48) | (0x0db8L << 32) | (a.toLong << 16) | b.toLong,
      (c.toLong << 16) | dd.toLong)
    def containsBits(pHi: Long, pLo: Long, plen: Int,
        hi: Long, lo: Long): Boolean =
      if (plen == 0) true
      else if (plen <= 64) (pHi >>> (64 - plen)) == (hi >>> (64 - plen))
      else pHi == hi && (if (plen == 128) pLo == lo
        else (pLo >>> (128 - plen)) == (lo >>> (128 - plen)))

    // prefixes: random plen in {0, 32..128}, base from a random address
    // in the same families so nesting is dense
    val prefixes: Seq[(String, (Long, Long), Int)] = (0 until 90).map { _ =>
      val plen = if (rnd.nextInt(10) == 0) 0 else 32 + rnd.nextInt(97)
      val (a, b, c, dd) = (rnd.nextInt(8), rnd.nextInt(8),
        rnd.nextInt(8), rnd.nextInt(8))
      (s"${addrOf(a, b, c, dd)}/$plen", bitsOf(a, b, c, dd), plen)
    }.distinctBy(_._1)
    val probes: Seq[(Long, (Int, Int, Int, Int))] = (0L until 1500L).map {
      i => (i, (rnd.nextInt(8), rnd.nextInt(8), rnd.nextInt(8),
        rnd.nextInt(8)))
    }
    val expect: Map[Long, Int] = probes.flatMap { case (id, (a, b, c, dd)) =>
      val (hi, lo) = bitsOf(a, b, c, dd)
      val m = prefixes.filter { case (_, (ph, pl), plen) =>
        containsBits(ph, pl, plen, hi, lo) }
      if (m.isEmpty) None else Some(id -> m.map(_._3).max)
    }.toMap

    val got = Siem.lpm6Match(
        probes.map { case (id, (a, b, c, dd)) => (id, addrOf(a, b, c, dd)) }
          .toDF("id", "ip"),
        "ip", prefixes.map(_._1).toDF("cidr"), Seq("id"))
      .as[(Long, String, Int)].collect().map(r => r._1 -> r._3).toMap
    assert(got.keySet == expect.keySet,
      s"match sets differ: only-got=${(got.keySet -- expect.keySet).take(5)} " +
        s"only-expect=${(expect.keySet -- got.keySet).take(5)}")
    val bad = expect.collect {
      case (id, l) if got(id) != l => (id, got(id), l)
    }
    assert(bad.isEmpty, s"winner length mismatches: ${bad.take(5)}")
  }
}
