package graft.operators

import graft.SparkSpec

/** Sign-column collapsing (Collapsing / VersionedCollapsing FINAL +
  * the sum(x·sign) aggregate) against hand ledgers covering every
  * cancellation shape: clean update chains, trailing deletes,
  * out-of-order cancels, orphan cancels, retry duplicates, net-zero
  * keys, same-instant cancel/re-state pairs. */
class CollapsingSpec extends SparkSpec {
  import spark.implicits._

  // ledger rows: (key, order, version, sign, payload)
  private def ledger(rows: Seq[(Long, Long, Long, Int, Long)]) =
    rows.toDF("k", "o", "v", "sign", "x")

  test("finalState: latest state wins, trailing cancel deletes the key") {
    val df = ledger(Seq(
      // k1: state, (cancel, re-state), (cancel, re-state) — survives at x=30
      (1L, 1L, 0L, 1, 10L),
      (1L, 2L, 0L, -1, 10L), (1L, 2L, 0L, 1, 20L),
      (1L, 3L, 0L, -1, 20L), (1L, 3L, 0L, 1, 30L),
      // k2: state then a trailing cancel — DELETED
      (2L, 1L, 0L, 1, 99L), (2L, 2L, 0L, -1, 99L),
      // k3: single state — survives untouched
      (3L, 5L, 0L, 1, 7L)))
    val got = Collapsing.finalState(df, Seq("k"), "sign", Seq("o"), Seq("x"))
      .select("k", "o", "x").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 3L, 30L), (3L, 5L, 7L)), got.toSeq.toString)
  }

  test("finalState: same-instant cancel + re-state resolves to the new state") {
    // the app's atomic rewrite: both rows share the order key; +1 must
    // outrank -1 so the rewrite lands instead of the delete
    val df = ledger(Seq(
      (1L, 1L, 0L, 1, 10L),
      (1L, 2L, 0L, -1, 10L), (1L, 2L, 0L, 1, 20L)))
    val got = Collapsing.finalState(df, Seq("k"), "sign", Seq("o"), Seq("x"))
      .select("x").as[Long].collect().toSeq
    assert(got == Seq(20L), got.toString)
  }

  test("versionedFinal: out-of-order cancels annihilate by (key, version)") {
    val df = ledger(Seq(
      // k1: cancel of v2 arrives BEFORE its state (the replication
      // shape plain collapsing gets wrong); v1 state stands, v2 nets 0
      (1L, 10L, 2L, -1, 20L),
      (1L, 11L, 1L, 1, 10L),
      (1L, 12L, 2L, 1, 20L),
      // k2: v1 cancelled, v2 stands -> survives at v2
      (2L, 1L, 1L, 1, 5L), (2L, 2L, 1L, -1, 5L), (2L, 3L, 2L, 1, 6L),
      // k3: orphan cancel only (state never arrived) — no row
      (3L, 1L, 1L, -1, 8L),
      // k4: retry-duplicated state (net 2) — survives once
      (4L, 1L, 1L, 1, 3L), (4L, 2L, 1L, 1, 3L)))
    val got = Collapsing
      .versionedFinal(df, Seq("k"), "sign", "v", Seq("x"))
      .select("k", "v", "x").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1L, 10L), (2L, 2L, 6L), (4L, 1L, 3L)),
      got.toSeq.toString)
  }

  test("versionedSurvivors keeps EVERY surviving version, not just the latest") {
    val df = ledger(Seq(
      // k1: v1 and v3 survive, v2 cancelled out of order
      (1L, 10L, 2L, -1, 20L), (1L, 11L, 1L, 1, 10L),
      (1L, 12L, 2L, 1, 20L), (1L, 13L, 3L, 1, 30L),
      // k2: everything cancelled — absent entirely
      (2L, 1L, 1L, 1, 5L), (2L, 2L, 1L, -1, 5L)))
    val got = Collapsing.versionedSurvivors(df, Seq("k"), "sign", "v",
        Seq("x"))
      .select("k", "v", "x").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq((1L, 1L, 10L), (1L, 3L, 30L)),
      got.toSeq.toString)
    // the latest-only read is the max-version row of exactly this set
    val latest = Collapsing.versionedFinal(df, Seq("k"), "sign", "v",
        Seq("x"))
      .select("k", "v", "x").as[(Long, Long, Long)].collect().toSeq
    assert(latest == Seq((1L, 3L, 30L)), latest.toString)
  }

  test("collapsedSum: aggregation commutes with cancellation, net-zero keys drop") {
    val df = ledger(Seq(
      (1L, 1L, 0L, 1, 10L), (1L, 2L, 0L, -1, 10L), (1L, 3L, 0L, 1, 25L),
      (2L, 1L, 0L, 1, 4L), (2L, 2L, 0L, -1, 4L))) // net zero -> dropped
    val got = Collapsing.collapsedSum(df, Seq("k"), "sign", Seq("x"))
      .select("k", "net_rows", "net_x").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq((1L, 1L, 25L)), got.toString)
  }

  test("a sign outside {+1, -1} fails loudly, never silently weights") {
    val df = ledger(Seq((1L, 1L, 0L, 3, 10L)))
    val e = intercept[Exception] {
      Collapsing.collapsedSum(df, Seq("k"), "sign", Seq("x")).collect()
    }
    def msgs(t: Throwable): String =
      Option(t).map(x => x.getMessage + " " +
        msgs(x.getCause)).getOrElse("")
    assert(msgs(e).contains("must be +1 or -1"), msgs(e))
  }
}
