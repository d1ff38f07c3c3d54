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
}
