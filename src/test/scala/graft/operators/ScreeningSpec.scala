package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** The round-9b screening family: license gate, code-quality filters,
  * portable mixture materialization, directional containment dedupe and
  * confusable-skeleton dedupe. */
class ScreeningSpec extends SparkSpec {
  import spark.implicits._

  // ---- licenseScreen --------------------------------------------------

  test("licenseScreen: SPDX wins, heuristics back-fill, unknown is not ok") {
    val in = Seq(
      (1L, "SPDX-License-Identifier: MIT\nrest of file"),
      // SPDX beats a conflicting phrase lower in the file
      (2L, "SPDX-License-Identifier: GPL-3.0-only\n" +
        "permission is hereby granted, free of charge"),
      (3L, "Permission is hereby granted, free of charge, to any person"),
      (4L, "licensed under the Apache License, Version 2.0"),
      (5L, "This file is covered by the GNU General Public License."),
      (6L, "no license text at all"),
      (7L, "spdx-license-identifier:\tBSD-3-Clause lowercase tag + tab")
    ).toDF("doc_id", "text")
    val out = Curation.licenseScreen(in, "text")
      .select("doc_id", "license", "license_ok")
      .orderBy("doc_id").as[(Long, String, Boolean)].collect()
    assert(out(0) == ((1L, "MIT", true)))
    assert(out(1) == ((2L, "GPL-3.0-only", false)))
    assert(out(2) == ((3L, "MIT", true)))
    assert(out(3) == ((4L, "Apache-2.0", true)))
    assert(out(4) == ((5L, "GPL-3.0", false)))
    assert(out(5) == ((6L, "unknown", false)))
    assert(out(6) == ((7L, "BSD-3-Clause", true)))
  }

  // ---- codeFilters -----------------------------------------------------

  test("codeFilters: exact line stats and the three gates") {
    val in = Seq(
      (1L, "short\nlines\nonly"), // 3 lines: 5,5,4
      (2L, "x" * 2000), // one minified mega-line
      (3L, "ok line\n" + ("y" * 150)), // max fails, avg fails at 100
      (4L, "!@# $%^ &*( )_+ {}|")) // symbol soup: alnum_frac 0
      .toDF("doc_id", "text")
    val out = Curation.codeFilters(in, "text", "doc_id",
        maxLineLen = 100, maxAvgLineLen = 50, minAlnumFrac = 0.25)
      .select("doc_id", "n_lines", "max_line_len", "avg_line_len",
        "alnum_frac", "keep")
      .orderBy("doc_id")
      .as[(Long, Int, Int, Double, Double, Boolean)].collect()
    assert(out(0)._2 == 3 && out(0)._3 == 5)
    assert(math.abs(out(0)._4 - 14.0 / 3) < 1e-12)
    assert(out(0)._6) // keeps
    assert(out(1)._3 == 2000 && !out(1)._6) // max-line gate
    assert(out(2)._2 == 2 && out(2)._3 == 150 && !out(2)._6)
    assert(out(3)._5 == 0.0 && !out(3)._6) // alnum gate
    // empty text: one empty line, zero stats, alnum gate rejects
    val empty = Curation.codeFilters(Seq((9L, "")).toDF("doc_id", "text"),
      "text", "doc_id").select("n_lines", "max_line_len", "keep")
      .as[(Int, Int, Boolean)].head()
    assert(empty == ((1, 0, false)))
  }

  // ---- mixSourcesPortable ----------------------------------------------

  private def mixDocs = (1L to 1000L).map(i => (i, s"src${i % 4}"))
    .toDF("doc_id", "source")

  test("mixSourcesPortable: per-source rate == the portable sample cut") {
    val out = Curation.mixSourcesPortable(mixDocs, "source", col("doc_id"),
      rates = Map("src0" -> 0.8, "src1" -> 0.2), defaultRate = 0.5, seed = 7)
    // each source's kept set must equal hashSamplePortable at its rate
    for ((src, rate) <- Seq(("src0", 0.8), ("src1", 0.2), ("src2", 0.5),
        ("src3", 0.5))) {
      val got = out.filter(col("source") === src)
        .select("doc_id").as[Long].collect().sorted
      val want = Curation.hashSamplePortable(
          mixDocs.filter(col("source") === src), col("doc_id"), rate, seed = 7)
        .select("doc_id").as[Long].collect().sorted
      assert(got.sameElements(want), s"source $src at rate $rate")
    }
    // partitioning independence
    val re = Curation.mixSourcesPortable(mixDocs.repartition(13), "source",
        col("doc_id"), Map("src0" -> 0.8, "src1" -> 0.2), 0.5, seed = 7)
      .select("doc_id").as[Long].collect().sorted
    assert(re.sameElements(out.select("doc_id").as[Long].collect().sorted))
  }

  test("mixSourcesPortable: rate 0 drops a source, rate 1 keeps it whole") {
    val out = Curation.mixSourcesPortable(mixDocs, "source", col("doc_id"),
      rates = Map("src0" -> 0.0, "src1" -> 1.0), defaultRate = 0.0)
    val bySrc = out.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    assert(!bySrc.contains("src0") && !bySrc.contains("src2"))
    assert(bySrc("src1") == 250L)
  }

  // ---- selfContainmentPairs ---------------------------------------------

  test("selfContainmentPairs is directional: excerpt→host, not host→excerpt") {
    val host = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val excerpt = "alpha beta gamma delta epsilon zeta eta theta"
    val other = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen"
    val in = Seq((1L, host), (2L, excerpt), (3L, other))
      .toDF("doc_id", "text")
    val out = Dedup.selfContainmentPairs(in, "text", "doc_id",
        shingleN = 3, threshold = 0.9)
      .select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect().toSet
    // every excerpt trigram is in the host: containment 1.0 that way only
    assert(out == Set((2L, 1L, 1.0)))
    // the directional prefix filter is lossless AND selective: every
    // verified pair was a candidate, and no candidate from the disjoint
    // doc survives to the verify stage's output
    val (cands, verified) = Dedup.containmentCensus(in, "text", "doc_id",
      threshold = 0.9, shingleN = 3)
    assert(verified == 1L && cands >= verified && cands <= 4L,
      s"cands=$cands verified=$verified")
  }

  test("selfContainmentPairs df-cap drops boilerplate from both sides") {
    // 10 docs share one boilerplate sentence; each also has unique text.
    // With maxDf=4 the boilerplate shingles are cut, so no pair clears
    // the threshold — without the cut every doc would contain the
    // boilerplate-only doc 99
    val boiler = "all rights reserved contact us at example dot com"
    val in = ((1L to 10L).map(i =>
        (i, s"$boiler unique$i word$i token$i extra$i more$i")) :+
      (99L, boiler)).toDF("doc_id", "text")
    val out = Dedup.selfContainmentPairs(in, "text", "doc_id",
        shingleN = 3, threshold = 0.9, maxDf = 4)
      .as[(Long, Long, Double)].collect()
    assert(out.isEmpty)
    // with a loose cap the boilerplate doc is contained in all 10
    val loose = Dedup.selfContainmentPairs(in, "text", "doc_id",
        shingleN = 3, threshold = 0.9, maxDf = 64)
      .filter(col("id_a") === 99L).as[(Long, Long, Double)].collect()
    assert(loose.length == 10 && loose.forall(_._3 == 1.0))
  }

  // ---- confusableSkeleton -----------------------------------------------

  test("confusableSkeleton collapses homoglyph + zero-width spoofs") {
    val plain = "paypal secure checkout"
    val spoofCyr = "pаypаl secure checkout" // Cyrillic а
    val spoofZw = "pay\u200Bpal secure check\uFEFFout" // ZWSP + BOM
    val df = Seq((1L, plain), (2L, spoofCyr), (3L, spoofZw),
      (4L, "unrelated text")).toDF("doc_id", "text")
    val skel = df.orderBy("doc_id").select(
      TextFunctions.confusableSkeleton(col("text")).as("s"))
      .as[String].collect()
    assert(skel(0) == plain && skel(1) == plain && skel(2) == plain)
    assert(skel(3) == "unrelated text")
    // skeleton-dedup keeps only the min-id representative
    val kept = Dedup.exact(df.withColumn("text",
        TextFunctions.confusableSkeleton(col("text"))), "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 4L)))
  }

  test("null text: screens degrade to safe verdicts, dedupes drop the row") {
    val in = Seq((1L, Option("real text here")), (2L, None))
      .toDF("doc_id", "text")
    // license: null text → unknown / not ok (never a null verdict)
    val lic = Curation.licenseScreen(in, "text")
      .filter(col("doc_id") === 2L)
      .select("license", "license_ok").as[(String, Boolean)].head()
    assert(lic == (("unknown", false)))
    // code filters: null text → keep=false, stats null (no crash)
    val cf = Curation.codeFilters(in, "text", "doc_id")
      .filter(col("doc_id") === 2L).select("keep")
      .as[Option[Boolean]].head()
    assert(!cf.getOrElse(false))
    // containment: the null-text row simply contributes no shingles
    val pairs = Dedup.selfContainmentPairs(in, "text", "doc_id",
      shingleN = 3, threshold = 0.1)
    assert(pairs.count() == 0)
  }

  test("confusable map stays 1:1 (translate contract)") {
    assert(TextFunctions.confusableFrom.length ==
      TextFunctions.confusableTo.length)
    // every source char is non-ASCII, every target is ASCII lowercase
    assert(TextFunctions.confusableFrom.forall(_ > 0x7f))
    assert(TextFunctions.confusableTo.forall(c => c >= 'a' && c <= 'z'))
  }
}
