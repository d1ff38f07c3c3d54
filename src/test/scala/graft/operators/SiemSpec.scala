package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral detections over the event stream: beaconing regularity
  * and volume spikes, both exact-integer formulations. */
class SiemSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, Long)]) =
    rows.zipWithIndex.map { case ((u, t, es), i) =>
      (i.toLong, u, t, new java.sql.Timestamp(es * 1000L)) }
      .toDF("event_id", "user_id", "event_type", "ts")

  test("beaconing: a perfect heartbeat flags, bursty traffic does not") {
    val base = 1700000000L
    val beacon = (0 until 20).map(i => (1L, "dns", base + i * 60L))
    // bursty: clustered pairs separated by long silences
    val bursty = Seq(0L, 5L, 3600L, 3610L, 7200L, 7212L, 10800L, 10807L,
      14400L, 14420L, 18000L, 18003L).map(o => (2L, "dns", base + o))
    val got = Siem.beaconCandidates(ev(beacon ++ bursty),
        Seq("user_id", "event_type"), "ts", "event_id",
        minGaps = 5, maxCv2 = 0.2)
      .select("user_id", "n_gaps", "mean_gap_s", "cv2")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L), s"only the beacon flags: ${got.toSeq}")
    assert(got.head._2 == 19L)
    assert(got.head._3 == 60.0)
    assert(got.head._4 == 0.0, "perfect regularity is exactly zero")
  }

  test("beaconing: exact cv2 against a hand computation") {
    val base = 1700000000L
    // gaps 10, 20, 10, 20 -> n=4, sg=60, sg2=1000
    // cv2 = (4*1000 - 3600)/3600 = 400/3600 = 1/9
    val rows = Seq(0L, 10L, 30L, 40L, 60L).map(o => (7L, "x", base + o))
    val got = Siem.beaconCandidates(ev(rows), Seq("user_id", "event_type"),
        "ts", "event_id", minGaps = 3, maxCv2 = 1.0)
      .select("n_gaps", "cv2").as[(Long, Double)].collect().head
    assert(got._1 == 4L)
    assert(math.abs(got._2 - 400.0 / 3600.0) < 1e-15)
  }

  test("cardinality spike: distinct blow-up flags where volume stays flat") {
    val base = 1700000000L
    // 8 steady hourly buckets: 6 events but only 2 DISTINCT types;
    // burst bucket: the same 6 events hit 6 distinct types — volume
    // identical, cardinality 3x
    val steady = for {
      b <- 0 until 8; i <- 0 until 6
    } yield (1L, s"t${i % 2}", base + b * 3600L + i * 10L)
    val burst = (0 until 6).map(i => (1L, s"t$i", base + 8 * 3600L + i.toLong))
    val all = ev(steady ++ burst)
    val card = Siem.cardinalitySpikes(all, "user_id", "event_type", "ts",
        bucketSec = 3600L, factorMicro = 2000000L)
      .select("bucket", "n_distinct").as[(Long, Long)].collect().toSeq
    assert(card == Seq((base / 3600 * 3600 + 8 * 3600, 6L)),
      s"only the distinct burst flags: $card")
    // total-volume alerting is blind to this burst at the same factor
    val vol = Siem.volumeSpikes(all, "user_id", "ts",
        bucketSec = 3600L, factorMicro = 2000000L)
      .select("bucket").as[Long].collect().toSeq
    assert(vol.isEmpty, s"volume path must stay silent: $vol")
  }

  test("firstSeen: only never-before pairs flag, with first ts and count") {
    val base = 1700000000L
    val cut = base + 1000L
    val rows = Seq(
      (1L, "ssh", base + 10L),          // history
      (1L, "ssh", cut + 50L),           // re-occurrence: NOT novel
      (1L, "rdp", cut + 20L),           // novel for user 1
      (1L, "rdp", cut + 90L),
      (2L, "ssh", cut + 30L),           // user 2 never seen ssh: novel
      (2L, "ssh", cut + 5000L))         // beyond window end: excluded
    val got = Siem.firstSeen(ev(rows), "user_id", "event_type", "ts",
        lit(new java.sql.Timestamp(cut * 1000L)),
        lit(new java.sql.Timestamp((cut + 1000L) * 1000L)))
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("first_ts")), col("n_events"))
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got == Set((1L, "rdp", cut + 20L, 2L), (2L, "ssh", cut + 30L, 1L)))
  }

  test("volume spikes: burst over steady baseline flags; cold start silent") {
    val base = 1700000000L
    // 8 steady hourly buckets of 4 events, then one 20-event burst
    val steady = for {
      b <- 0 until 8; i <- 0 until 4
    } yield (1L, "login", base + b * 3600L + i * 10L)
    val burst = (0 until 20).map(i => (1L, "login", base + 8 * 3600L + i.toLong))
    val got = Siem.volumeSpikes(ev(steady ++ burst), "event_type", "ts",
        bucketSec = 3600L, factorMicro = 2000000L)
      .select("bucket", "n").as[(Long, Long)].collect().toSeq
    assert(got == Seq((base / 3600 * 3600 + 8 * 3600, 20L)),
      s"only the burst bucket flags: $got")
    // first buckets (cold start, < minPrev predecessors) never alert
    assert(!got.exists(_._1 < base / 3600 * 3600 + 3 * 3600))
  }

  test("cidr blocklist: range bounds inclusive, malformed IPs never match") {
    val ev = Seq(
      (1L, "10.5.0.0"),      // lo boundary of /16
      (2L, "10.5.255.255"),  // hi boundary of /16
      (3L, "10.6.0.0"),      // one past: out
      (4L, "192.168.7.9"),   // /24 interior
      (5L, "192.168.8.0"),   // out
      (6L, "not-an-ip"),     // malformed: dropped, not crashed
      (7L, "10.5.1"),        // short quad: dropped
      (8L, "10.5.3.999"),    // octet > 255: would alias to 10.5.6.231
      (9L, "10.5.x.1"),      // non-numeric octet: dropped
      (10L, "10.5.-1.7"))    // negative octet: dropped
      .toDF("id", "ip")
    val blocks = Seq("10.5.0.0/16", "192.168.7.0/24").toDF("cidr")
    val got = Siem.cidrMatches(ev, "ip", blocks)
      .select("id", "cidr").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "10.5.0.0/16"), (2L, "10.5.0.0/16"),
      (4L, "192.168.7.0/24")))
    // the blocklist side broadcasts; events never shuffle
    val plan = Siem.cidrMatches(ev, "ip", blocks)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }

  test("cidr6: v6 ranges, bias order, v4-mapped cross-family, /0") {
    val ev = Seq(
      (1L, "2001:db8::ff"),                     // inside /32
      (2L, "2001:db9::1"),                      // outside /32
      (3L, "2001:db8:0:0:ffff:ffff:ffff:ffff"), // exact hi bound of /64
      (4L, "2001:db8:0:1::"),                   // one past /64
      (5L, "ffff::1"),           // raw hi long NEGATIVE: bias must hold
      (6L, "10.1.2.3"),          // v4 literal -> v4-mapped space
      (7L, "::ffff:10.1.9.9"),   // mapped spelling of the same family
      (8L, "10.2.0.1"),          // outside the mapped /112
      (9L, "junk"))              // dropped, not crashed
      .toDF("id", "ip")
    val blocks = Seq("2001:db8::/32", "2001:db8::/64", "ffff::/16",
      "::ffff:10.1.0.0/112").toDF("cidr")
    val got = Siem.cidr6Matches(ev, "ip", blocks)
      .select("id", "cidr").as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "2001:db8::/32"), (1L, "2001:db8::/64"),
      (3L, "2001:db8::/32"), (3L, "2001:db8::/64"),
      (4L, "2001:db8::/32"),                    // in /32, out of /64
      (5L, "ffff::/16"),
      (6L, "::ffff:10.1.0.0/112"), (7L, "::ffff:10.1.0.0/112")), got.toString)
    // ::/0 matches every parseable address, either family
    val all = Siem.cidr6Matches(ev, "ip", Seq("::/0").toDF("cidr"))
      .select("id").as[Long].collect().toSet
    assert(all == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L), all.toString)
    // the blocklist side broadcasts; events never shuffle
    val plan = Siem.cidr6Matches(ev, "ip", blocks)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), plan)
  }

  test("char entropy: hand values exact in micro-bits; DGA separates") {
    val got = Seq("aabb", "abcd", "aaaa", "a", "",
        "app7", "f3a9c27e51b0")
      .zipWithIndex.map { case (s0, i) => (i, s0) }
      .toDF("i", "s")
      .select(col("i"), Siem.charEntropyMicroBits(col("s")))
      .as[(Int, Long)].collect().toMap
    assert(got(0) == 1000000L, s"aabb is exactly 1 bit: ${got(0)}")
    assert(got(1) == 2000000L, s"abcd is exactly 2 bits: ${got(1)}")
    assert(got(2) == 0L && got(3) == 0L && got(4) == 0L,
      "uniform / single / empty strings carry no entropy")
    // the detection premise: human-ish label under the threshold,
    // hex-generated label over it
    assert(got(5) < 2500000L && got(6) > 2500000L,
      s"app7=${got(5)} vs hex=${got(6)}")
  }

  test("seasonal spikes: weekly rhythm is baseline, not alert") {
    val week = 604800L
    val base = 1700000000L / week * week // align to a slot boundary
    // 10 events every Monday-ish slot for 4 weeks, 1 event in every
    // other daily slot: a flat trailing baseline would flag each weekly
    // peak; the same-slot baseline must not
    val rhythmic = for {
      wk <- 0 until 5; slot <- 0 until 7
      n = if (slot == 2) 10 else 1; i <- 0 until n
    } yield (1L, "login", base + wk * week + slot * 86400L + i * 10L)
    // week 5's peak slot triples its own seasonal baseline -> flags
    val anomaly = (0 until 30).map(i =>
      (1L, "login", base + 5L * week + 2 * 86400L + i * 10L))
    val got = Siem.seasonalSpikes(ev(rhythmic ++ anomaly), "event_type",
        "ts", bucketSec = 86400L, factorMicro = 2000000L,
        lookback = 4, minPrev = 2)
      .select("bucket", "n").as[(Long, Long)].collect().toSeq
    assert(got == Seq((base + 5 * week + 2 * 86400L, 30L)),
      s"only the true anomaly flags, not the weekly rhythm: $got")
  }

  test("lpmMatch: most-specific prefix wins, default route catches the rest") {
    val ev = Seq(
      (1L, "10.64.3.9"),    // in /8, /10 and /17 -> /17 wins
      (2L, "10.64.200.1"),  // in /8 and /10, ABOVE the /17 half -> /10
      (3L, "10.5.0.1"),     // /8 only
      (4L, "192.168.1.1"),  // default route only
      (5L, "not-an-ip"))    // dropped, no row
      .toDF("id", "ip")
    val routes = Seq("0.0.0.0/0", "10.0.0.0/8", "10.64.0.0/10",
      // sloppy base: host bits set, the shift must mask them away
      "10.64.99.7/17").toDF("cidr")
    val got = Siem.lpmMatch(ev, "ip", routes, Seq("id"))
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "10.64.99.7/17", 17),
      (2L, "10.64.0.0/10", 10),
      (3L, "10.0.0.0/8", 8),
      (4L, "0.0.0.0/0", 0)), got.toString)
  }

  test("lpm6Match: nesting across the 64-bit boundary, host route, v4-mapped, default") {
    val ev = Seq(
      (1L, "2001:db8:5::ff42"),  // /32 /48 /120 all match -> /120
      (2L, "2001:db8:5::1"),     // /32 /48 -> /48
      (3L, "2001:db8:9::1"),     // /32 only
      (4L, "2001:db8:5::ffff"),  // exact host route /128 beats /120
      (5L, "10.1.2.3"),          // v4-mapped /112
      (6L, "fe80::1"))           // default route only
      .toDF("id", "ip")
    val routes = Seq("::/0", "2001:db8::/32", "2001:db8:5::/48",
      "2001:db8:5::ff00/120", "2001:db8:5::ffff/128", "::ffff:a01:0/112")
      .toDF("cidr")
    val got = Siem.lpm6Match(ev, "ip", routes, Seq("id"))
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "2001:db8:5::ff00/120", 120),
      (2L, "2001:db8:5::/48", 48),
      (3L, "2001:db8::/32", 32),
      (4L, "2001:db8:5::ffff/128", 128),
      (5L, "::ffff:a01:0/112", 112),
      (6L, "::/0", 0)), got.toString)
  }

  test("lpmMatch: duplicate literals of one prefix dedupe to the canonical row") {
    // '10.0.0.0/8' and a sloppy '10.1.2.3/8' normalize to the SAME
    // (plen, key) — pre-dedupe these tied on plen and max(struct)
    // could surface the sloppy literal, breaking payload join-backs
    val ev = Seq((1L, "10.200.0.1")).toDF("id", "ip")
    val routes = Seq("10.1.2.3/8", "10.0.0.0/8").toDF("cidr")
    val got = Siem.lpmMatch(ev, "ip", routes, Seq("id"))
      .as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "10.0.0.0/8", 8)),
      s"canonical (zero-host) literal must win: $got")
    // v6 twin, incl. an unsigned-order trap: the sloppy literal's hi
    // long is NEGATIVE (sign bit set) — a signed min would pick it
    val ev6 = Seq((1L, "2001:db8::1")).toDF("id", "ip")
    val routes6 = Seq("ffff::123/0", "::/0").toDF("cidr")
    val got6 = Siem.lpm6Match(ev6, "ip", routes6, Seq("id"))
      .as[(Long, String, Int)].collect().toSeq
    assert(got6 == Seq((1L, "::/0", 0)), got6.toString)
  }

  test("lpmEnrich resolves payload columns; lpm6Enrich twin") {
    val ev = Seq((1L, "10.64.3.9"), (2L, "10.5.0.1"), (3L, "8.8.8.8"))
      .toDF("id", "ip")
    val routes = Seq(
      ("10.0.0.0/8", "corp", 64500L),
      ("10.64.0.0/10", "dc-west", 64501L)).toDF("cidr", "region", "asn")
    val got = Siem.lpmEnrich(ev, "ip", routes, Seq("id"),
        Seq("region", "asn"))
      .as[(Long, String, Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "10.64.0.0/10", 10, "dc-west", 64501L),
      (2L, "10.0.0.0/8", 8, "corp", 64500L)),
      s"no-match events absent, payloads resolved: $got")

    val ev6 = Seq((1L, "2001:db8:5::1"), (2L, "10.1.2.3")).toDF("id", "ip")
    val routes6 = Seq(
      ("2001:db8::/32", "v6-agg", 1L),
      ("::ffff:a01:0/112", "v4-mapped", 2L)).toDF("cidr", "region", "asn")
    val got6 = Siem.lpm6Enrich(ev6, "ip", routes6, Seq("id"),
        Seq("region", "asn"))
      .as[(Long, String, Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(got6 == Seq(
      (1L, "2001:db8::/32", 32, "v6-agg", 1L),
      (2L, "::ffff:a01:0/112", 112, "v4-mapped", 2L)), got6.toString)
  }

  test("lpmEnrich: a duplicated canonical cidr with diverging payloads stays one row") {
    val ev = Seq((1L, "10.0.0.1")).toDF("id", "ip")
    val routes = Seq(
      ("10.0.0.0/8", "b-payload", 2L),
      ("10.0.0.0/8", "a-payload", 1L)).toDF("cidr", "region", "asn")
    val got = Siem.lpmEnrich(ev, "ip", routes, Seq("id"),
        Seq("region", "asn"))
      .as[(Long, String, Int, String, Long)].collect().toSeq
    assert(got == Seq((1L, "10.0.0.0/8", 8, "a-payload", 1L)),
      s"deterministic min-payload pick, no fan-out: $got")
  }

  test("lpmMatch: invalid cidr rows are ignored; all-invalid table refuses") {
    val ev = Seq((1L, "10.0.0.1")).toDF("id", "ip")
    val routes = Seq("10.0.0.0/8", "10.0.0.0/33", "junk/abc")
      .toDF("cidr")
    val got = Siem.lpmMatch(ev, "ip", routes, Seq("id"))
      .as[(Long, String, Int)].collect().toSeq
    assert(got == Seq((1L, "10.0.0.0/8", 8)))
    val bad = Seq("nope/99").toDF("cidr")
    assertThrows[IllegalArgumentException](
      Siem.lpmMatch(ev, "ip", bad, Seq("id")))
  }
}
