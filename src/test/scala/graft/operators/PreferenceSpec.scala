package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  test("impliedComparisons orients each pair once, drops ties and same-item") {
    val obs = Seq(
      // group 1: a(3.0) > b(1.0), a(3.0) > c(2.0), c(2.0) > b(1.0)
      (1L, "a", 3.0, 10L), (1L, "b", 1.0, 11L), (1L, "c", 2.0, 12L),
      // group 2: tie a/b at 5.0 → no comparison; same-item pair → none
      (2L, "a", 5.0, 20L), (2L, "b", 5.0, 21L),
      (3L, "a", 1.0, 30L), (3L, "a", 9.0, 31L))
      .toDF("g", "item", "score", "id")
    val out = Preference.impliedComparisons(obs, "g", "item", "score", "id")
      .as[(String, String)].collect().sorted
    assert(out.toSeq == Seq("a" -> "b", "a" -> "c", "c" -> "b"))
  }

  test("bradleyTerry ranks by strength and is layout-independent") {
    // a beats b 3:1, b beats c 3:1, a beats c 4:0 — strength a > b > c
    val cmp = (Seq.fill(3)(("a", "b")) ++ Seq(("b", "a")) ++
      Seq.fill(3)(("b", "c")) ++ Seq(("c", "b")) ++
      Seq.fill(4)(("a", "c"))).toDF("winner", "loser")
    val out = Preference.bradleyTerry(cmp).orderBy("item")
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq("a", "b", "c"))
    assert(out.map(_._2).toSeq == Seq(7L, 4L, 1L)) // wins
    assert(out.map(_._3).toSeq == Seq(8L, 8L, 8L)) // comparisons
    val ppm = out.map(_._4)
    assert(ppm(0) > ppm(1) && ppm(1) > ppm(2))
    // shares sum to ~1e6 (rounding of three parts)
    assert(math.abs(ppm.sum - 1000000L) <= 2)
    // bit-identical under a different physical layout: the fit is
    // exact fixed-point over a collected pair matrix, so partitioning
    // cannot leak into the integers
    val again = Preference.bradleyTerry(cmp.repartition(7)).orderBy("item")
      .as[(String, Long, Long, Long)].collect()
    assert(out.sameElements(again))
  }

  test("bradleyTerry: winless item floors at one micro-unit, stays ranked last") {
    val cmp = (Seq.fill(5)(("a", "b")) ++ Seq.fill(5)(("b", "z")))
      .toDF("winner", "loser")
    val out = Preference.bradleyTerry(cmp).orderBy(desc("score_ppm"))
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq("a", "b", "z"))
    assert(out.last._4 >= 0L) // floor keeps the share defined
  }

  test("bradleyTerry on empty comparisons returns an empty, well-typed frame") {
    val empty = Seq.empty[(String, String)].toDF("winner", "loser")
    val out = Preference.bradleyTerry(empty)
    assert(out.columns.toSeq ==
      Seq("item", "wins", "comparisons", "score_ppm"))
    assert(out.count() == 0)
  }

  test("winRates: exact counts, symmetric pairs, interval brackets the rate") {
    val cmp = (Seq.fill(3)(("a", "b")) ++ Seq(("b", "a")) ++
      Seq(("a", null))).toDF("winner", "loser")
    val out = Preference.winRates(cmp)
      .orderBy("i", "j")
      .as[(String, String, Long, Long, Double, Double, Double)].collect()
    // the null-loser row drops; a beat b 3 of 4
    assert(out.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq(("a", "b", 3L, 4L), ("b", "a", 1L, 4L)))
    val ab = out(0); val ba = out(1)
    assert(ab._5 == 0.75 && ba._5 == 0.25)
    // Wilson bounds bracket the rate, stay in [0,1], and the two
    // directions mirror: lo(a,b) = 1 - hi(b,a) (same counts, p ↔ 1-p)
    assert(ab._6 > 0.0 && ab._6 < 0.75 && ab._7 > 0.75 && ab._7 < 1.0)
    assert(math.abs(ab._6 - (1.0 - ba._7)) < 2e-6) // round(…,6) quanta
    assert(math.abs(ab._7 - (1.0 - ba._6)) < 2e-6)
  }

  test("bradleyTerry drops null-item comparisons instead of poisoning the fit") {
    val dirty = Seq(("a", "b"), ("a", "b"), ("b", "a"),
      (null, "a"), ("b", null)).toDF("winner", "loser")
    val clean = Seq(("a", "b"), ("a", "b"), ("b", "a"))
      .toDF("winner", "loser")
    val d = Preference.bradleyTerry(dirty).orderBy("item")
      .as[(String, Long, Long, Long)].collect().toSeq
    val c = Preference.bradleyTerry(clean).orderBy("item")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(d == c, "null winner/loser rows carry no signal")
  }

  test("bradleyTerry drops self-pair comparisons (winner == loser raw log rows)") {
    val dirty = Seq(("a", "b"), ("a", "b"), ("b", "a"),
      ("a", "a"), ("b", "b"), ("b", "b")).toDF("winner", "loser")
    val clean = Seq(("a", "b"), ("a", "b"), ("b", "a"))
      .toDF("winner", "loser")
    val d = Preference.bradleyTerry(dirty).orderBy("item")
      .as[(String, Long, Long, Long)].collect().toSeq
    val c = Preference.bradleyTerry(clean).orderBy("item")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(d == c, "an (i,i) row must not skew wins or the MM denominators")
  }

  test("maxPairsPerGroup bounds emitted pairs exactly and deterministically") {
    // one group of 30 rows, all distinct items/scores → 435 implied pairs
    val obs = (1 to 30).map(i => (1L, s"i$i", i.toDouble, i.toLong))
      .toDF("g", "item", "score", "id")
    val capped = Preference.impliedComparisons(obs, "g", "item", "score",
      "id", maxPairsPerGroup = 10)
    // R = maxRowsForPairs(10) = 5 → at most 10 pairs, all scores distinct
    // so exactly C(5,2) = 10 survive
    assert(Preference.maxRowsForPairs(10) == 5L)
    assert(capped.count() == 10L)
    // deterministic under physical layout: portable md5 rank, not
    // partition order
    val again = Preference.impliedComparisons(obs.repartition(7), "g",
      "item", "score", "id", maxPairsPerGroup = 10)
    assert(capped.orderBy("winner", "loser").collect().toSeq ==
      again.orderBy("winner", "loser").collect().toSeq)
    // uncapped emits the full fan-out
    assert(Preference.impliedComparisons(obs, "g", "item", "score", "id")
      .count() == 435L)
  }

  test("maxRowsForPairs is exact at triangular boundaries") {
    assert(Preference.maxRowsForPairs(1) == 2L)   // C(2,2)=1
    assert(Preference.maxRowsForPairs(2) == 2L)   // C(3,2)=3 > 2
    assert(Preference.maxRowsForPairs(3) == 3L)
    assert(Preference.maxRowsForPairs(45) == 10L)
    assert(Preference.maxRowsForPairs(46) == 10L)
    assert(Preference.maxRowsForPairs(55) == 11L)
  }

  test("pairCensus receipts implied vs capped pair bounds") {
    val obs = ((1 to 30).map(i => (1L, i.toLong)) ++
      (1 to 3).map(i => (2L, 100L + i))).toDF("g", "id")
    val out = Preference.pairCensus(obs, "g", maxPairsPerGroup = 10)
      .as[(Long, Long, Long, Long)].collect().head
    assert(out == ((2L, 33L, 435L + 3L, 10L + 3L)))
    // uncapped: bound equals implied
    val un = Preference.pairCensus(obs, "g")
      .as[(Long, Long, Long, Long)].collect().head
    assert(un == ((2L, 33L, 438L, 438L)))
  }

  test("lengthBias: longer-win share in exact ppm, equal-length excluded") {
    // group g: quality ranks c > b > a; lengths a=10, b=20, c=30 →
    // all 3 decided pairs won by the longer row → 1e6 ppm
    // group h: quality x > y, equal lengths → 1 comparison, 1 equal_len,
    // ppm of 0 decided pairs = null-safe division (0/0) → NaN-free rows
    val df = Seq(
      ("g", 1.0, 10L, 1L), ("g", 2.0, 20L, 2L), ("g", 3.0, 30L, 3L),
      ("h", 5.0, 7L, 4L), ("h", 6.0, 7L, 5L))
      .toDF("grp", "q", "len", "id")
    val out = Preference.lengthBias(df, "grp", "q", "len", "id")
      .orderBy("grp").collect()
    val g = out(0); val h = out(1)
    assert(g.getLong(1) == 3L && g.getLong(2) == 3L && g.getLong(3) == 0L)
    assert(g.getLong(4) == 1000000L)
    assert(h.getLong(1) == 1L && h.getLong(2) == 0L && h.getLong(3) == 1L)
  }

  test("lengthBias honors the pair cap") {
    val df = (1 to 30).map(i => ("g", i.toDouble, i.toLong * 10, i.toLong))
      .toDF("grp", "q", "len", "id")
    val out = Preference.lengthBias(df, "grp", "q", "len", "id",
      maxPairsPerGroup = 10).collect().head
    assert(out.getLong(1) == 10L, "capped comparisons = C(5,2)")
  }
}
