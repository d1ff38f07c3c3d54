package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Detection analytics over the event stream — the layer a SIEM user
  * runs ON TOP of the reference's star schema (its example queries
  * stop at counts/top-k; these are the two standard behavioral
  * detections, kept engine-exact so alerts replay in any engine).
  *
  * Both are EXACT-integer formulations: second-granularity gaps and
  * counts accumulate as longs, and each score is one final division —
  * no float summation order anywhere (an alert that flips between
  * runs on FP noise is an on-call incident, not a detection).
  */
object Siem {

  /** Shannon entropy of a string's characters, in MICRO-BITS as a
    * long — the DGA-domain signal (algorithmically generated domains
    * read as near-random character streams, ~3.5+ bits/char on hex;
    * human-named hosts sit under ~3): per distinct character c with
    * count k over length L, the k/L·log₂(L/k) contribution is rounded
    * to micro-bits BEFORE the sum (the engine's fixed-point
    * convention — the score replays to the digit in any engine, so an
    * alert threshold never flips on float order).
    *
    * Map-only column algebra: one let-bound char split, one distinct
    * pass, an O(|alphabet|·L) count fold per row — a domain label is
    * tens of chars, so this is scan-speed at any corpus size. */
  def charEntropyMicroBits(s: Column): Column = {
    def letBind(value: Column)(body: Column => Column): Column =
      element_at(transform(array(value), body), 1)
    letBind(filter(split(s, ""), c => c =!= "")) { chars =>
      letBind(size(chars).cast("double")) { len =>
        coalesce(aggregate(array_distinct(chars), lit(0L), (acc, d) => {
          val k = size(filter(chars, c => c === d)).cast("double")
          acc + round(lit(1e6) * (k / len) * log2(len / k)).cast("long")
        }), lit(0L))
      }
    }
  }

  /** Beaconing candidates: (key) groups whose inter-arrival gaps are
    * suspiciously REGULAR — the C2-heartbeat shape (malware checking
    * in every N seconds shows near-zero gap variance; human activity
    * is bursty). Regularity is the squared coefficient of variation
    * of the gaps, computed exactly from long sums:
    * cv² = (n·Σg² − (Σg)²) / (Σg)² — 0 for a perfect beacon, ~1 for
    * Poisson arrivals. Flag cv² ≤ maxCv2 with ≥ minGaps gaps.
    *
    * Output: key cols + (n_gaps, mean_gap_s, cv2). Scale shape: one
    * window pass for lags (key-partitioned shuffle), one map-side-
    * combined agg of (g, g²) longs; group cardinality rows out.
    * Long-range bound: second gaps over a multi-year key still keep
    * n·Σg² < 2⁶³ for any realistic event density. */
  def beaconCandidates(events: DataFrame, keyCols: Seq[String],
      tsCol: String, orderCol: String, minGaps: Long = 10L,
      maxCv2: Double = 0.2): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*)
      .orderBy(col(tsCol), col(orderCol))
    val gaps = events
      .withColumn("__e", unix_timestamp(col(tsCol)))
      .withColumn("__g", col("__e") - lag(col("__e"), 1).over(w))
      .filter(col("__g").isNotNull)
    gaps.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("__g")).as("__sg"),
        sum(col("__g") * col("__g")).as("__sg2"))
      .filter(col("n_gaps") >= minGaps && col("__sg") > 0)
      .withColumn("mean_gap_s",
        col("__sg").cast("double") / col("n_gaps"))
      .withColumn("cv2",
        (col("n_gaps") * col("__sg2") - col("__sg") * col("__sg"))
          .cast("double") / (col("__sg") * col("__sg")))
      .filter(col("cv2") <= maxCv2)
      .select(keys :+ col("n_gaps") :+ col("mean_gap_s") :+ col("cv2"): _*)
  }

  /** First-seen (novelty) detections: (entity, value) pairs observed
    * in the window that NEVER occurred before it — new process hash on
    * a host, first login from a country, first destination for a
    * service. The history side collapses to DISTINCT pairs before the
    * anti-join (duplicates die map-side; values and entities shuffle
    * as pairs, nothing else), and both sides co-key on (entity,
    * value), so the join adds no extra exchange beyond the two
    * aggregations. Output: (entity, value, first_ts, n_events) per
    * novel pair. */
  def firstSeen(events: DataFrame, entityCol: String, valueCol: String,
      tsCol: String, windowStart: Column, windowEnd: Column): DataFrame = {
    val hist = events.filter(col(tsCol) < windowStart)
      .select(col(entityCol), col(valueCol)).distinct()
    events
      .filter(col(tsCol) >= windowStart && col(tsCol) < windowEnd)
      .groupBy(col(entityCol), col(valueCol))
      .agg(min(col(tsCol)).as("first_ts"), count(lit(1)).as("n_events"))
      .join(hist, Seq(entityCol, valueCol), "left_anti")
  }

  /** Cardinality-spike buckets: entities whose DISTINCT-value count in
    * a bucket clears the trailing baseline — the DGA/scanning shape
    * (a host suddenly resolving 50× more distinct domains, a user
    * suddenly touching 50× more distinct endpoints) that total-volume
    * alerting misses when each value appears once. Distinct counts are
    * exact (two-level agg: (entity, bucket, value) collapses
    * duplicates map-side, then a count per (entity, bucket)); the
    * spike predicate is the same pure long arithmetic as
    * [[volumeSpikes]]. Output: (entity, bucket, n_distinct, prev_sum,
    * prev_buckets). */
  def cardinalitySpikes(events: DataFrame, entityCol: String,
      valueCol: String, tsCol: String, bucketSec: Long,
      factorMicro: Long, lookback: Int = 6, minPrev: Int = 3): DataFrame = {
    val bucket = (floor(unix_timestamp(col(tsCol)) / bucketSec) *
      bucketSec).cast("long")
    val distincts = events
      .select(col(entityCol), bucket.as("bucket"), col(valueCol).as("__v"))
      .groupBy(col(entityCol), col("bucket"), col("__v"))
      .agg(count(lit(1)).as("__dup"))
      .groupBy(col(entityCol), col("bucket"))
      .agg(count(lit(1)).as("n_distinct"))
    val w = Window.partitionBy(col(entityCol)).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    distincts
      .withColumn("prev_sum",
        coalesce(sum(col("n_distinct")).over(w), lit(0L)))
      .withColumn("prev_buckets", count(col("n_distinct")).over(w))
      .filter(col("prev_buckets") >= minPrev &&
        col("n_distinct") * col("prev_buckets") * 1000000L >=
          lit(factorMicro) * col("prev_sum"))
  }

  /** Volume-spike buckets: time buckets whose event count clears
    * `factorMicro`/1e6 × the trailing mean of the previous `lookback`
    * buckets. The comparison is pure long arithmetic
    * (n · wcount · 1e6 ≥ factorMicro · Σprev), so the flag set is
    * engine-exact; buckets with fewer than `minPrev` predecessors
    * don't alert (cold start). Missing (zero-event) buckets are
    * treated as absent, the same trade as any bucket-sparse
    * monitoring table — a total silence before a burst shortens the
    * baseline rather than zero-filling it.
    *
    * Output: (group, bucket, n, prev_sum, prev_buckets). One bucketed
    * agg + one group-partitioned window. */
  /** IPv4 dotted-quad → its unsigned 32-bit value carried in a long —
    * pure column algebra, no UDF. Malformed addresses (wrong part
    * count, non-digit or out-of-range octets) go null and simply
    * never match a block — an out-of-range octet must NOT alias onto
    * another address's value. (IPv6 rides the 16-byte normalize path
    * in `functions.IpNorm`; range-matching it is the same shape over
    * a (hi, lo) long pair.) */
  def ipv4ToLong(ip: Column): Column = {
    val p = split(ip, "\\.")
    // ONE pass over ONE split: every extra reference to the split
    // array re-runs the regex split per row (conditional branches are
    // outside codegen's subexpression elimination), which made the
    // naive per-octet validation 3-4x slower than no validation at
    // all. transform guards each octet (digit gate BEFORE the cast,
    // nested when, so ANSI never throws; null = malformed), aggregate
    // folds base-256 with null poisoning and counts parts — 4 parts
    // and no poison is the only way out non-null.
    val nums = transform(p, s =>
      when(length(s).between(1, 3) &&
        translate(s, "0123456789", "") === "",
        when(s.cast("long") <= 255, s.cast("long"))))
    aggregate(nums,
      struct(lit(0L).as("v"), lit(0L).as("n")),
      (acc, x) => struct(
        (acc("v") * 256L + x).as("v"),
        (acc("n") + 1L).as("n")),
      acc => when(acc("n") === 4, acc("v")))
  }

  /** CIDR blocklist matching — the watchlist join every SIEM runs on
    * its event stream (the engine family ships IPv4CIDRToRange /
    * isIPAddressInRange for exactly this). Each block becomes a
    * [lo, hi] integer range (`lo = base div 2^(32−len) · 2^(32−len)`,
    * exact: 2^k is a whole double well below 2^53); events join the
    * BROADCAST range table on one inequality pair, so the event side
    * never shuffles and a million-block list is still just ~24 MB on
    * the wire. Returns the matching (event row, cidr) pairs. */
  def cidrMatches(events: DataFrame, ipCol: String,
      blocklist: DataFrame): DataFrame = {
    val bounds = blocklist
      .withColumn("__base", ipv4ToLong(split(col("cidr"), "/").getItem(0)))
      .withColumn("__size",
        pow(lit(2.0), lit(32) - split(col("cidr"), "/").getItem(1)
          .cast("int")).cast("long"))
      .withColumn("__lo", expr("__base div __size") * col("__size"))
      .withColumn("__hi", col("__lo") + col("__size") - 1L)
      .select(col("cidr"), col("__lo"), col("__hi"))
    events
      .withColumn("__ip", ipv4ToLong(col(ipCol)))
      .filter(col("__ip").isNotNull)
      .join(broadcast(bounds),
        col("__ip") >= col("__lo") && col("__ip") <= col("__hi"))
      .drop("__ip", "__lo", "__hi")
  }

  /** Longest-prefix-match routing/geo enrichment — the engine family's
    * `ip_trie` dictionary lookup (`dictGet(geo_dict, attrs,
    * tuple(ip))`): each event's IPv4 maps to the SINGLE most-specific
    * prefix that contains it, nested prefixes resolved by length.
    *
    * Spark-first at scale: a prefix table has at most 33 distinct
    * lengths, so LPM needs no trie and no range scan — the match is a
    * chain of per-length broadcast LEFT equi-joins on
    * (ip >> (32−plen)) for each length PRESENT in the table, and the
    * winner is the first non-null hit in descending-plen order
    * (coalesce; a plen tie is impossible after the (plen, key) dedupe
    * below — two DISTINCT same-length prefixes are disjoint).
    * Everything stays in whole-stage codegen and the event table
    * NEVER shuffles — no candidate explode, no per-event argmax
    * exchange; the prefix table crosses the wire once, broadcast in
    * per-length slices.
    *
    * Returns (idCols…, cidr, plen) for events with a match
    * ([[lpmEnrich]] wraps the payload join-back). `idCols` must
    * uniquely identify events (one output row per input event row —
    * duplicate idCols tuples would emit duplicate rows). Distinct
    * prefix lengths are collected driver-side — the prefix table is
    * broadcast-sized by premise (a full internet routing table is
    * ~1M rows, ~30 MB).
    *
    * Non-canonical prefix rows: two literals that normalize to the
    * SAME (plen, masked key) — '10.0.0.0/8' and a sloppy
    * '10.1.2.3/8' — are ONE prefix; the table is deduped to a single
    * row per (plen, key) keeping the numerically-smallest base, which
    * is the canonical zero-host literal whenever it is present, so
    * the reported `cidr` (and any payload join-back on it) never
    * surfaces a sloppy duplicate. */
  def lpmMatch(events: DataFrame, ipCol: String, prefixes: DataFrame,
      idCols: Seq[String]): DataFrame = {
    val pfx = prefixes
      // try_cast: a junk length must drop the row, not kill the job
      .withColumn("__plen",
        expr("try_cast(split(cidr, '/')[1] AS int)"))
      .filter(col("__plen").between(0, 32))
      .withColumn("__base", ipv4ToLong(split(col("cidr"), "/").getItem(0)))
      .filter(col("__base").isNotNull)
      // masking happens via the shift itself: base >> (32−plen) keeps
      // exactly the prefix bits, host bits in a sloppy base fall away
      .withColumn("__key", expr("shiftright(__base, 32 - __plen)"))
      // dedupe duplicates that normalize to the same prefix (see
      // scaladoc): argmin on (base, cidr) keeps the canonical row —
      // within a (plen, key) group the prefix bits agree, so the
      // minimal base is the zero-host literal when one exists
      .groupBy(col("__plen"), col("__key"))
      .agg(min(struct(col("__base"), col("cidr")))
        .getField("cidr").as("cidr"))
      .select(col("cidr"), col("__plen"), col("__key"))
    val lens: Seq[Int] = pfx.select(col("__plen")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    require(lens.nonEmpty, "lpmMatch: prefix table has no valid cidr rows")
    // Zero-shuffle LPM: one broadcast LEFT join per distinct length
    // present in the table (≤33), then the longest length's hit wins
    // via coalesce in descending-plen order — equivalent to the
    // explode + per-event argmax (a plen tie is impossible after the
    // (plen, key) dedupe above), but the event side never shuffles at
    // all: no candidate explode (≤33× row inflation through the join)
    // and no exchange for the argmax groupBy. The whole match fuses
    // into the event scan's codegen span; each join's build side is a
    // slice of the already-broadcast-sized prefix table.
    val base = events
      .select(idCols.map(col) :+ ipv4ToLong(col(ipCol)).as("__ip"): _*)
      .filter(col("__ip").isNotNull)
    val joined = lens.foldLeft(base) { (acc, l) =>
      acc.join(
        broadcast(pfx.filter(col("__plen") === l)
          .select(col("__key").as(s"__k$l"), col("cidr").as(s"__c$l"))),
        shiftright(col("__ip"), 32 - l) === col(s"__k$l"), "left")
    }
    val desc = lens.sorted.reverse
    joined
      .filter(desc.map(l => col(s"__c$l").isNotNull).reduce(_ || _))
      .select(idCols.map(col) :+
        coalesce(desc.map(l => col(s"__c$l")): _*).as("cidr") :+
        coalesce(desc.map(l =>
          when(col(s"__c$l").isNotNull, lit(l))): _*).as("plen"): _*)
  }

  /** Parse an IPv6/IPv4 literal column to its raw (hi, lo) long pair
    * via the codegen'd [[graft.functions.Ipv6Pair]] — the one bridge
    * incantation for every 128-bit operator in this file. Null for
    * junk. */
  private def ipv6PairOf(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.Ipv6Pair(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** IPv6 twin of [[lpmMatch]] — same ip_trie semantics over the
    * 128-bit space (IPv4 literals participate via their v4-mapped
    * form, so ONE table serves both families). The masked key is the
    * (hi, lo) long pair logically shifted down to the prefix bits:
    * plen ≤ 64 keys on (hi >>> (64−plen), 0), plen > 64 on
    * (hi, lo >>> (128−plen)) — plen 0 pinned explicitly because a
    * JVM shift count of 64 wraps to 0. At most 129 distinct lengths;
    * everything else is exactly the v4 shape: per-length candidate
    * keys, one broadcast hash equi-join, per-event max(struct(plen,
    * cidr)) — including [[lpmMatch]]'s contracts: `idCols` must
    * uniquely identify events, and duplicate literals normalizing to
    * one (plen, key) are deduped to the numerically-smallest base
    * (unsigned 128-bit order via the sign-bias trick of [[ipv6Key]]). */
  def lpm6Match(events: DataFrame, ipCol: String, prefixes: DataFrame,
      idCols: Seq[String]): DataFrame = {
    val pfx = prefixes
      .withColumn("__plen", expr("try_cast(split(cidr, '/')[1] AS int)"))
      .filter(col("__plen").between(0, 128))
      .withColumn("__p", ipv6PairOf(split(col("cidr"), "/").getItem(0)))
      .filter(col("__p").isNotNull)
      .withColumn("__kh", when(col("__plen") === 0, lit(0L))
        .when(col("__plen") <= 64,
          expr("shiftrightunsigned(__p.hi, 64 - __plen)"))
        .otherwise(col("__p.hi")))
      .withColumn("__kl", when(col("__plen") <= 64, lit(0L))
        .when(col("__plen") === 128, col("__p.lo"))
        .otherwise(expr("shiftrightunsigned(__p.lo, 128 - __plen)")))
      .groupBy(col("__plen"), col("__kh"), col("__kl"))
      .agg(min(struct(
        col("__p.hi").bitwiseXOR(lit(Long.MinValue)).as("__bh"),
        col("__p.lo").bitwiseXOR(lit(Long.MinValue)).as("__bl"),
        col("cidr"))).getField("cidr").as("cidr"))
      .select(col("cidr"), col("__plen"), col("__kh"), col("__kl"))
    val lens: Seq[Int] = pfx.select(col("__plen")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    require(lens.nonEmpty, "lpm6Match: prefix table has no valid cidr rows")
    // zero-shuffle chain of per-length broadcast LEFT joins + coalesce
    // in descending-plen order — the [[lpmMatch]] shape (see there for
    // the equivalence argument); keys are the (hi, lo) pair shifted to
    // the prefix bits exactly as the candidate explode computed them
    val base = events
      .select(idCols.map(col) :+ ipv6PairOf(col(ipCol)).as("__p"): _*)
      .filter(col("__p").isNotNull)
    val joined = lens.foldLeft(base) { (acc, l) =>
      val kh = if (l == 0) lit(0L)
        else if (l <= 64) shiftrightunsigned(col("__p.hi"), 64 - l)
        else col("__p.hi")
      val kl = if (l <= 64) lit(0L)
        else if (l == 128) col("__p.lo")
        else shiftrightunsigned(col("__p.lo"), 128 - l)
      acc.join(
        broadcast(pfx.filter(col("__plen") === l)
          .select(col("__kh").as(s"__kh$l"), col("__kl").as(s"__kl$l"),
            col("cidr").as(s"__c$l"))),
        kh === col(s"__kh$l") && kl === col(s"__kl$l"), "left")
    }
    val desc = lens.sorted.reverse
    joined
      .filter(desc.map(l => col(s"__c$l").isNotNull).reduce(_ || _))
      .select(idCols.map(col) :+
        coalesce(desc.map(l => col(s"__c$l")): _*).as("cidr") :+
        coalesce(desc.map(l =>
          when(col(s"__c$l").isNotNull, lit(l))): _*).as("plen"): _*)
  }

  /** One payload row per distinct cidr literal, deterministically:
    * duplicated cidr strings with diverging payloads collapse to the
    * lexicographically-smallest payload tuple (min over the struct),
    * so the enrich join below can never fan an event out — the
    * payload columns must be min-orderable (atomic) types. */
  private def payloadByCidr(prefixes: DataFrame,
      payloadCols: Seq[String]): DataFrame =
    prefixes.groupBy(col("cidr"))
      .agg(min(struct(payloadCols.map(col): _*)).as("__pay"))
      .select(col("cidr") +:
        payloadCols.map(c => col(s"__pay.$c").as(c)): _*)

  /** [[lpmMatch]] with the payload columns resolved — the full
    * `dictGet(geo_dict, attrs, tuple(ip))` shape of the engine
    * family's ip_trie dictionaries: each matched event comes back
    * with the winning prefix's attribute columns, not just its cidr
    * (callers were previously told to join payloads back themselves).
    *
    * Same plan as [[lpmMatch]] plus ONE more broadcast equi-join on
    * the winner's cidr (the payload side is the broadcast-sized
    * prefix table, deduped per cidr — see [[payloadByCidr]]), so the
    * event side still never shuffles on anything but its own id.
    * Because [[lpmMatch]] dedupes ties to the canonical (numerically
    * smallest base) literal, the join-back always hits that row.
    * Output: (idCols…, cidr, plen, payloadCols…); events with no
    * matching prefix are absent, exactly as in [[lpmMatch]]. */
  def lpmEnrich(events: DataFrame, ipCol: String, prefixes: DataFrame,
      idCols: Seq[String], payloadCols: Seq[String]): DataFrame =
    lpmMatch(events, ipCol, prefixes, idCols)
      .join(broadcast(payloadByCidr(prefixes, payloadCols)), Seq("cidr"))
      .select((idCols.map(col) :+ col("cidr") :+ col("plen")) ++
        payloadCols.map(col): _*)

  /** IPv6/dual-family twin of [[lpmEnrich]] over [[lpm6Match]]. */
  def lpm6Enrich(events: DataFrame, ipCol: String, prefixes: DataFrame,
      idCols: Seq[String], payloadCols: Seq[String]): DataFrame =
    lpm6Match(events, ipCol, prefixes, idCols)
      .join(broadcast(payloadByCidr(prefixes, payloadCols)), Seq("cidr"))
      .select((idCols.map(col) :+ col("cidr") :+ col("plen")) ++
        payloadCols.map(col): _*)

  /** 128-bit sortable key for an IPv6 (or IPv4 — it maps) literal:
    * struct(hi, lo) with each long XOR'd with Long.MinValue, so SIGNED
    * struct comparison equals UNSIGNED 128-bit numeric order
    * (`ffff::` must sort above `2001:db8::` even though its raw high
    * long is negative). Null for junk. */
  def ipv6Key(ip: Column): Column = {
    val p = ipv6PairOf(ip)
    when(p.isNotNull, struct(
      p.getField("hi").bitwiseXOR(lit(Long.MinValue)).as("h"),
      p.getField("lo").bitwiseXOR(lit(Long.MinValue)).as("l")))
  }

  /** IPv6 CIDR blocklist matching — the promised (hi, lo)-pair twin
    * of [[cidrMatches]]: each `base/prefix` block becomes an inclusive
    * biased-key range (mask the 128−prefix free bits down for the low
    * bound, up for the high bound — pure bitwise column algebra, no
    * BigInteger), events carry one parsed key and join the BROADCAST
    * range table on a struct between — lexicographic (hi, lo)
    * comparison IS unsigned 128-bit order after the bias. IPv4
    * literals participate via their v4-mapped form, so one blocklist
    * covers both families. Returns (event row, cidr) pairs. */
  def cidr6Matches(events: DataFrame, ipCol: String,
      blocklist: DataFrame): DataFrame = {
    val bounds = blocklist
      .withColumn("__p",
        ipv6PairOf(split(col("cidr"), "/").getItem(0)))
      .withColumn("__plen", split(col("cidr"), "/").getItem(1).cast("int"))
      // free (host) bits in each long half: lo gets min(128-plen, 64),
      // hi gets the overflow past 64
      .withColumn("__fl", least(lit(64), lit(128) - col("__plen")))
      .withColumn("__fh", greatest(lit(0), lit(64) - col("__plen")))
      .withColumn("__ml", when(col("__fl") === 64, lit(-1L))
        .otherwise(expr("shiftleft(1L, __fl) - 1L")))
      .withColumn("__mh", when(col("__fh") === 64, lit(-1L))
        .otherwise(expr("shiftleft(1L, __fh) - 1L")))
      .select(col("cidr"),
        struct(
          col("__p.hi").bitwiseAND(col("__mh").bitwiseXOR(lit(-1L)))
            .bitwiseXOR(lit(Long.MinValue)).as("h"),
          col("__p.lo").bitwiseAND(col("__ml").bitwiseXOR(lit(-1L)))
            .bitwiseXOR(lit(Long.MinValue)).as("l")).as("__lo"),
        struct(
          col("__p.hi").bitwiseOR(col("__mh"))
            .bitwiseXOR(lit(Long.MinValue)).as("h"),
          col("__p.lo").bitwiseOR(col("__ml"))
            .bitwiseXOR(lit(Long.MinValue)).as("l")).as("__hi"))
    events
      .withColumn("__k", ipv6Key(col(ipCol)))
      .filter(col("__k").isNotNull)
      .join(broadcast(bounds),
        col("__k") >= col("__lo") && col("__k") <= col("__hi"))
      .drop("__k", "__lo", "__hi")
  }

  /** Seasonal (hour-of-week) baseline spikes: like [[volumeSpikes]]
    * but the trailing baseline is the SAME SLOT of previous weeks —
    * Monday 09:00 compares against past Mondays 09:00, so the daily
    * and weekly rhythm that defeats a flat trailing window (every
    * morning "spikes" vs the night before) is the baseline itself.
    * Slot = `(epoch div bucketSec) mod slotsPerWeek` — pure integer
    * arithmetic, flag-for-flag engine-identical; slot 0 is the epoch
    * anchor (Thursday 00:00 UTC), which only labels, never reorders.
    *
    * Same scale shape as the flat variant: one map-side-combined count
    * aggregation, one (group, slot)-partitioned window pass. */
  def seasonalSpikes(events: DataFrame, groupCol: String, tsCol: String,
      bucketSec: Long, factorMicro: Long, lookback: Int = 4,
      minPrev: Int = 2): DataFrame = {
    val slotsPerWeek = 604800L / bucketSec
    val bucket = (floor(unix_timestamp(col(tsCol)) / bucketSec) *
      bucketSec).cast("long")
    val counts = events
      .groupBy(col(groupCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("slot",
        pmod(expr(s"bucket div $bucketSec"), lit(slotsPerWeek)))
    val w = Window.partitionBy(col(groupCol), col("slot"))
      .orderBy(col("bucket")).rowsBetween(-lookback, -1)
    counts
      .withColumn("prev_sum", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("prev_buckets", count(col("n")).over(w))
      .filter(col("prev_buckets") >= minPrev &&
        col("n") * col("prev_buckets") * 1000000L >=
          lit(factorMicro) * col("prev_sum"))
  }

  def volumeSpikes(events: DataFrame, groupCol: String, tsCol: String,
      bucketSec: Long, factorMicro: Long, lookback: Int = 6,
      minPrev: Int = 3): DataFrame = {
    val bucket = (floor(unix_timestamp(col(tsCol)) / bucketSec) *
      bucketSec).cast("long")
    val counts = events
      .groupBy(col(groupCol), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bucket"))
      .rowsBetween(-lookback, -1)
    counts
      .withColumn("prev_sum", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("prev_buckets", count(col("n")).over(w))
      .filter(col("prev_buckets") >= minPrev &&
        col("n") * col("prev_buckets") * 1000000L >=
          lit(factorMicro) * col("prev_sum"))
  }
}
