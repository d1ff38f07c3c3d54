package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degenerate-input sweep over the round-5 operators: empty corpora
  * and token-free documents must yield empty/sane results, never an
  * ANSI arithmetic error or a null-pointer plan — the failure mode a
  * driver-run batch job cannot tolerate at 3am. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs: DataFrame =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def blankDocs: DataFrame =
    Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
  private def emptyVecs: DataFrame =
    Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("text operators: empty and token-free corpora") {
    assert(Dedup.winnowOverlapPairs(emptyDocs, "text", "doc_id").isEmpty)
    assert(Dedup.winnowOverlapPairs(blankDocs, "text", "doc_id",
      minShared = 2).isEmpty)
    assert(Curation.minePhrases(emptyDocs, "text").isEmpty)
    assert(Curation.minePhrases(blankDocs, "text").isEmpty)
    assert(Curation.dataCard(emptyDocs, "doc_id", "text").isEmpty)
    assert(Curation.chunkBySentences(emptyDocs, "text", "doc_id", 10).isEmpty)
    assert(Curation.chunkBySentences(blankDocs, "text", "doc_id", 10).isEmpty)
    // span corruption keeps one row per doc, empty streams for blanks
    val sc = Curation.spanCorrupt(blankDocs, "text", "doc_id")
      .as[(Long, String, String)].collect().toSet
    assert(sc == Set((1L, "", ""), (2L, "", "")))
    assert(Curation.snapshotDiff(emptyDocs, emptyDocs, "doc_id", "text").isEmpty)
    val card = Curation.dataCard(blankDocs, "doc_id", "text")
    assert(card.count() == 2) // token-free rows still summarize
  }

  test("round-8 operators: empty inputs and refused degenerate parameters") {
    // lpmEnrich: empty event side -> empty result, schema intact
    val routes = Seq(("10.0.0.0/8", "corp")).toDF("cidr", "region")
    val noEvents = Seq.empty[(Long, String)].toDF("id", "ip")
    val enr = Siem.lpmEnrich(noEvents, "ip", routes, Seq("id"), Seq("region"))
    assert(enr.isEmpty &&
      enr.columns.toSeq == Seq("id", "cidr", "plen", "region"))
    // collapsing: empty ledgers are empty, not errors
    val noLedger = Seq.empty[(Long, Long, Long, Int, Long)]
      .toDF("k", "o", "v", "sign", "x")
    assert(Collapsing.finalState(noLedger, Seq("k"), "sign", Seq("o"),
      Seq("x")).isEmpty)
    assert(Collapsing.versionedFinal(noLedger, Seq("k"), "sign", "v",
      Seq("x")).isEmpty)
    assert(Collapsing.collapsedSum(noLedger, Seq("k"), "sign",
      Seq("x")).isEmpty)
    // kmeans: k larger than the corpus refuses loudly
    val tiny = Seq((1L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
    assertThrows[IllegalArgumentException](
      Similarity.kmeansIntAssign(tiny, k = 5, iters = 1))
    // truncatedRecall: dims past the vector length must fail LOUDLY —
    // slice would silently return the whole vector and recall would
    // read a trivially-perfect 1.0 for an index size that was never
    // actually evaluated
    val qs = tiny.select(col("vec_id").as("query_id"), col("embedding"))
    val overrun = intercept[Exception] {
      Similarity.truncatedRecall(tiny, qs, k = 1, dims = 99).collect()
    }
    assert(overrun.getMessage.contains("exceeds embedding length"),
      overrun.getMessage)
    // dims == length is the identity-calibration leg: recall exactly 1
    val dim = tiny.select(org.apache.spark.sql.functions.size(col("embedding")))
      .head().getInt(0)
    val tr = Similarity.truncatedRecall(tiny, qs, k = 1, dims = dim)
      .collect().head
    assert(tr.getLong(1) == 1L && tr.getDouble(2) == 1.0, tr.toString)
    // slaAlertRows: empty status frame -> no alerts
    val noStatus = Seq.empty[(String, java.sql.Timestamp, Long, Option[Long], Long)]
      .toDF("pipeline_id", "newest_ts", "freshness_threshold_min",
        "last_run_ms", "sla_min")
    assert(graft.pipelines.Monitoring
      .slaAlertRows(noStatus, lit(0L)).isEmpty)
  }

  test("round-9 operators: empty inputs, degenerate parameters, zero budget") {
    // apportionTokens: empty corpus -> empty quotas; zero budget ->
    // all-zero quotas that still sum exactly to the budget
    val noDocs = Seq.empty[(Long, String, Long)].toDF("id", "source", "n_tok")
    assert(Curation.apportionTokens(noDocs, "source", col("n_tok"), 100L)
      .isEmpty)
    val docs = Seq((1L, "a", 10L), (2L, "b", 30L)).toDF("id", "source", "n_tok")
    val zero = Curation.apportionTokens(docs, "source", col("n_tok"), 0L)
      .select("quota").as[Long].collect()
    assert(zero.toSeq == Seq(0L, 0L))
    assertThrows[IllegalArgumentException](
      Curation.apportionTokens(docs, "source", col("n_tok"), -1L))
    // a budget smaller than the source count: largest remainders win,
    // the rest get zero — never negative, still exact
    val one = Curation.apportionTokens(docs, "source", col("n_tok"), 1L)
      .orderBy("source").select("quota").as[Long].collect()
    assert(one.sum == 1L && one.forall(_ >= 0L), one.toSeq.toString)
    // lengthBatches: batchSize 1 = singleton batches; 0 refused
    val lb = Curation.lengthBatches(docs.select(col("id"), col("n_tok")),
      "n_tok", "id", batchSize = 1)
    assert(lb.select(countDistinct(col("batch_id"))).head().getLong(0) == 2L)
    assertThrows[IllegalArgumentException](
      Curation.lengthBatches(docs, "n_tok", "id", batchSize = 0))
    // TokenLcs via SQL surface: empty arrays -> 0, no error
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val lcs0 = Seq((Seq.empty[String], Seq("x"))).toDF("a", "b")
      .select(column(graft.functions.TokenLcs(
        expression(col("a")), expression(col("b")))).as("l"))
      .head().getInt(0)
    assert(lcs0 == 0)
    // encodingDamage: empty string -> all zero, not a division error
    val e = Seq(Tuple1("")).toDF("t")
      .select(graft.functions.TextFunctions.encodingDamage(col("t")).as("e"))
      .select("e.damage_ppm", "e.damaged").head()
    assert(e.getLong(0) == 0L && !e.getBoolean(1))
  }

  test("vector operators: empty corpora and empty query sets") {
    val q = emptyVecs.select(col("vec_id").as("query_id"), col("embedding"))
    assert(Similarity.int8TopK(emptyVecs, q, 5, rerank = 10).isEmpty)
    assert(Similarity.int8Codes(emptyVecs).isEmpty)
    assert(Similarity.embeddingCard(emptyVecs, "vec_id").isEmpty)
    val someVecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    // empty QUERY set against a real corpus: no candidates, no error
    assert(Similarity.int8TopK(someVecs, q, 1, rerank = 1).isEmpty)
    // an edge-less graph still returns the seed with its label (the
    // node set unions seeds, so isolated seeds never vanish)
    val lp = Similarity.labelPropagate(
      Seq.empty[(Long, Long)].toDF("src_id", "nbr_id"),
      Seq((1L, 0)).toDF("id", "label"), 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(lp == Seq((1L, 0)), s"isolated seed keeps its label: $lp")
  }

  test("siem operators: empty and single-event streams never alert") {
    val empty = Seq.empty[(Long, Long, String, java.sql.Timestamp)]
      .toDF("event_id", "user_id", "event_type", "ts")
    assert(Siem.beaconCandidates(empty, Seq("user_id"), "ts", "event_id")
      .isEmpty)
    assert(Siem.volumeSpikes(empty, "user_id", "ts", 3600L, 2000000L)
      .isEmpty)
    assert(Siem.cardinalitySpikes(empty, "user_id", "event_type", "ts",
      3600L, 2000000L).isEmpty)
    val one = Seq((1L, 1L, "x", new java.sql.Timestamp(1700000000000L)))
      .toDF("event_id", "user_id", "event_type", "ts")
    assert(Siem.beaconCandidates(one, Seq("user_id"), "ts", "event_id")
      .isEmpty, "a single event has no gaps")
  }

  test("round-10 operators: empty inputs, degenerate parameters") {
    val docs = Seq((1L, "src0"), (2L, "src1")).toDF("doc_id", "source")
    // epochUpsample: negative weights refused; all-zero recipe = empty
    intercept[IllegalArgumentException] {
      Curation.epochUpsample(docs, col("doc_id"), "source",
        Map("src0" -> -1.0))
    }
    assert(Curation.epochUpsample(docs, col("doc_id"), "source",
      Map.empty, defaultEpochs = 0.0).isEmpty)
    // empty input flows through every round-10 operator
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "source")
    assert(Curation.epochUpsample(noDocs, col("doc_id"), "source",
      Map("src0" -> 2.5)).isEmpty)
    val noCmp = Seq.empty[(String, String)].toDF("winner", "loser")
    assert(Preference.winRates(noCmp).isEmpty)
    intercept[IllegalArgumentException] {
      Preference.bradleyTerry(noCmp, iterations = 0)
    }
    val noRatings = Seq.empty[(String, String)].toDF("item", "label")
    assert(Stats.fleissKappa(noRatings, col("item"), col("label"))
      .collect().head.getAs[Long]("n_items") == 0L)
    assert(Stats.ratingDisagreement(noRatings, col("item"), col("label"))
      .isEmpty)
    // fleissKappa: a corpus where EVERY item has one rating → no
    // included items, null kappa, not a division error
    val singles = Seq(("A", "x"), ("B", "y")).toDF("item", "label")
    val k = Stats.fleissKappa(singles, col("item"), col("label"))
      .collect().head
    assert(k.getAs[Long]("n_items") == 0L &&
      k.isNullAt(k.fieldIndex("kappa")))
    // videoHash60: a 1×1 single-frame video still fingerprints (all
    // stride positions collapse to pixel (0,0))
    val tiny = Multimodal.syntheticAvi(3L, 1, 1, 1)
    assert(Multimodal.Codecs.videoHash60(tiny).isDefined)
    // pngAddText on a no-text splice is the identity
    val png = Multimodal.syntheticPngText(1L, 4, 4, Nil)
    assert(Multimodal.Codecs.pngTextChunks(png) == Nil)
  }

  test("round-11 operators: empty inputs, degenerate caps and ladders") {
    import graft.functions.TextFunctions
    // pair cap: refused at 0, single-row groups emit nothing, empty in
    // → empty out (capped and uncapped)
    val noObs = Seq.empty[(Long, String, Double, Long)]
      .toDF("g", "item", "score", "id")
    intercept[IllegalArgumentException] {
      Preference.impliedComparisons(noObs, "g", "item", "score", "id",
        maxPairsPerGroup = 0)
    }
    assert(Preference.impliedComparisons(noObs, "g", "item", "score",
      "id", maxPairsPerGroup = 10).isEmpty)
    val solo = Seq((1L, "a", 1.0, 1L)).toDF("g", "item", "score", "id")
    assert(Preference.impliedComparisons(solo, "g", "item", "score",
      "id", maxPairsPerGroup = 1).isEmpty)
    // census on empty: one row of zero counts (sum of nothing is null →
    // guarded downstream by the caller; groups/rows are exact zeros)
    val census = Preference.pairCensus(noObs, "g", 10).collect().head
    assert(census.getLong(0) == 0L)
    // lengthBias: empty → empty; self-comparisons impossible
    assert(Preference.lengthBias(noObs, "g", "score", "id", "id").isEmpty)
    // k-anonymity family on empty frames
    val noEv = Seq.empty[(String, Long)].toDF("a", "id")
    assert(Stats.kAnonymity(noEv, Seq(col("a"))).isEmpty)
    assert(Stats.kAnonymize(noEv, Seq(col("a"))).isEmpty)
    assert(Stats.kAnonymizeLadder(noEv,
      Seq(Seq(col("a")), Seq(lit(1))), k = 2).isEmpty)
    intercept[IllegalArgumentException] {
      Stats.kAnonymizeLadder(noEv, Seq.empty, k = 2)
    }
    // ladder with NULL quasi-identifiers: nulls form a group (SQL
    // PARTITION BY semantics), they are not silently suppressed
    val nullQid = Seq((null.asInstanceOf[String], 1L),
      (null.asInstanceOf[String], 2L), ("x", 3L)).toDF("a", "id")
    val ladderOut = Stats.kAnonymizeLadder(nullQid,
        Seq(Seq(col("a"))), k = 2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ladderOut == Seq(1L, 2L))
    // rater audits on empty / single-rating inputs
    val noR = Seq.empty[(String, Long, String)].toDF("item", "rater", "label")
    assert(Stats.raterConsensusKappa(noR, col("item"), col("rater"),
      col("label")).isEmpty)
    assert(Stats.raterBias(Seq.empty[(Long, Double)].toDF("rater", "s"),
      col("rater"), col("s")).isEmpty)
    // readability never divides by zero: empty text floors everywhere
    val fk = Seq((1L, "")).toDF("id", "text")
      .select(TextFunctions.fleschKincaidMicro(col("text")))
      .collect().head.getLong(0)
    assert(fk == -3400000L)
    // soft dedup weights: empty corpus → empty; no pairs → all
    // singletons at full weight
    assert(Dedup.softDedupWeights(emptyDocs, "text", "doc_id").isEmpty)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val ids = Seq(1L, 2L).toDF("doc_id")
    val w = Dedup.softDedupWeightsFromPairs(ids, noPairs, "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(w == Set((1L, 1L, 1L, 1000000L), (2L, 2L, 1L, 1000000L)))
  }

  test("corpus-overlap and gating ops survive empty / null / blank input") {
    val emptySrc = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    // overlap matrices: empty in, empty out; null sources dropped
    assert(Curation.sourceOverlap(emptySrc, "source", "text").isEmpty)
    assert(Dedup.crossSourceDupFlow(emptySrc, "text", "source").isEmpty)
    val nullSrc = Seq((1L, "a b", null.asInstanceOf[String]),
      (2L, "a b", "B")).toDF("doc_id", "text", "source")
    assert(Curation.sourceOverlap(nullSrc, "source", "text").isEmpty)
    assert(Dedup.crossSourceDupFlow(nullSrc, "text", "source").isEmpty)
    // one source alone: no pairs, never a crash
    val oneSrc = Seq((1L, "a b", "A"), (2L, "a b", "A"))
      .toDF("doc_id", "text", "source")
    assert(Dedup.crossSourceDupFlow(oneSrc, "text", "source").isEmpty)
    // group gate: empty in, empty out; a single-doc group still tiers
    assert(Curation.groupGate(emptySrc, "source", lit(0.5)).isEmpty)
    val g = Curation.groupGate(
        Seq((1L, "x", "A")).toDF("doc_id", "text", "source"),
        "source", lit(0.9), minDocs = 3L)
      .select("tier").as[String].collect().toSeq
    assert(g == Seq("review")) // high score but under minDocs
    // paragraph prune: empty and all-blank inputs
    assert(Curation.paragraphQualityPrune(emptyDocs, "text", "doc_id")
      .isEmpty)
    assert(Curation.paragraphQualityPrune(blankDocs, "text", "doc_id")
      .isEmpty) // only blank paragraphs -> no non-blank rows to group
    // oov curve: empty corpus yields the ladder with zero totals, and
    // the rate guard never divides by zero
    val oc = Curation.oovCurve(emptyDocs, "text", ks = Seq(2, 4))
      .orderBy("k").as[(Int, Long, Long, Double)].collect().toSeq
    assert(oc.isEmpty || oc.forall(r => r._2 == 0L && r._4 == 0.0))
  }

  test("screens, audits and builders survive empty / blank input") {
    // contamination curve: empty corpus -> ladder rows with 0 totals;
    // empty benchmark -> nothing contaminated, rates 0
    val cc = Dedup.contaminationCurve(emptyDocs, emptyDocs,
        "text", "doc_id", ns = Seq(2, 3))
      .orderBy("n").as[(Int, Long, Long, Double)].collect().toSeq
    assert(cc.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((2, 0L, 0L, 0.0), (3, 0L, 0L, 0.0)))
    val some = Seq((1L, "a b c")).toDF("doc_id", "text")
    val cb = Dedup.contaminationCurve(some, emptyDocs,
        "text", "doc_id", ns = Seq(2)).as[(Int, Long, Long, Double)]
      .collect().head
    assert(cb == ((2, 0L, 1L, 0.0)))
    // truncation audit on an empty log is empty
    val emptyLog = Seq.empty[(String, Long, Long, String)]
      .toDF("session", "e", "o", "text")
    assert(Curation.truncationAudit(emptyLog, "session", "e", "o",
      "text", 10L).isEmpty)
    // repetition value on an empty census is empty
    assert(Curation.repetitionValue(Seq.empty[(String, Long, Long)]
      .toDF("source", "tokens_raw", "tokens_effective")).isEmpty)
    // k-core of an empty edge list is empty, never a crash
    assert(Graph.kCorePeel(
      Seq.empty[(Long, Long)].toDF("src", "dst"), k = 2, rounds = 3)
      .isEmpty)
    // weighted consensus: empty ratings -> empty; single rating -> its
    // own label both ways, never a flip
    assert(Stats.weightedConsensus(
      Seq.empty[(String, String, String)].toDF("item", "rater", "label"),
      col("item"), col("rater"), col("label")).isEmpty)
    val one = Stats.weightedConsensus(
        Seq(("i", "r", "A")).toDF("item", "rater", "label"),
        col("item"), col("rater"), col("label"))
      .as[(String, String, String, Boolean, Long)].collect().head
    assert(one == (("i", "A", "A", false, 1000000L)))
    // license contagion: empty flags + empty pairs -> empty
    assert(Curation.licenseContagionFromPairs(
      Seq.empty[(Long, String, Boolean)]
        .toDF("doc_id", "license", "license_ok"),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), "doc_id").isEmpty)
    // injection screen on blank docs: nothing fires
    val is = Curation.injectionScreen(blankDocs, "text")
      .select("injection_score", "zero_width", "flagged")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(is.forall(r => r._1 == 0L && r._2 == 0L && !r._3))
    // needle insertion on empty input is empty; blank docs still get
    // their needle at position 0
    assert(Curation.insertNeedles(emptyDocs, "doc_id", "text", "N")
      .isEmpty)
    val bn = Curation.insertNeedles(blankDocs, "doc_id", "text", "N")
      .select("text", "position").as[(String, Long)].collect().toSeq
    assert(bn.forall(r => r._1 == "N" && r._2 == 0L))
  }
}
