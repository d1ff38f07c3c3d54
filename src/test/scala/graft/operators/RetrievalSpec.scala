package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown cat sleeps"),
    (3L, "lorem ipsum dolor sit amet"),
    (4L, "quick quick quick brown")
  ).toDF("doc_id", "text")

  test("postings: tf and dl per (doc, term)") {
    val p = Retrieval.postings(docs, "text", "doc_id")
      .filter($"doc_id" === 4L).orderBy("term").collect()
    assert(p.map(r => (r.getString(2), r.getInt(1), r.getLong(3))).toSeq ==
      Seq(("brown", 4, 1L), ("quick", 4, 3L)))
  }

  test("bm25TopK: ranking follows tf saturation and idf") {
    val queries = Seq((10L, "quick brown")).toDF("query_id", "query_text")
    val top = Retrieval.bm25TopK(docs, queries, k = 3).orderBy("rank").collect()
    // Docs 1, 2, 4 contain both terms' any; doc 3 neither → absent.
    assert(top.map(_.getLong(1)).toSeq.sorted == Seq(1L, 2L, 4L))
    // Doc 4 (tf(quick)=3, shortest relevant... dl=4) should outrank the
    // long doc 1: higher tf on a rarer-weighted term and shorter length.
    assert(top.head.getLong(1) == 4L)
    // Scores strictly positive, ranks dense from 1.
    assert(top.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
    assert(top.forall(_.getDouble(2) > 0))
  }

  test("bm25TopK: micro-unit scores are exact longs (order-independent)") {
    val queries = Seq((1L, "fox dog"), (2L, "lorem")).toDF("query_id", "query_text")
    val a = Retrieval.bm25TopK(docs, queries, 5).collect().toSet
    val b = Retrieval.bm25TopK(docs.repartition(7), queries, 5).collect().toSet
    assert(a == b)  // partitioning must not move any score by an ulp
  }

  test("hardNegatives: positives excluded, BM25 order kept, ranks dense") {
    val queries = Seq((10L, "quick brown")).toDF("query_id", "query_text")
    val top = Retrieval.bm25TopK(docs, queries, k = 3)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    // label the BM25 winner as the positive: negatives are the rest,
    // in unchanged relative order, re-ranked densely from 1
    val pos = Seq((10L, top.head)).toDF("query_id", "doc_id")
    val negs = Retrieval.hardNegatives(docs, queries, pos, k = 3,
      maxPositivesPerQuery = 2).orderBy("neg_rank").collect()
    assert(negs.map(_.getLong(1)).toSeq == top.tail)
    assert(negs.map(_.getInt(3)).toSeq == Seq(1, 2))
    assert(!negs.map(_.getLong(1)).contains(top.head))
  }

  test("evalRanking: recall/MRR/nDCG from hand-computed fixtures") {
    // q1: ranked 10,11,12; relevant {11, 99} -> one hit at rank 2
    // q2: ranked 20,21; relevant {20}        -> perfect at rank 1
    // q3: ranked 30;    relevant {31}        -> zero everywhere
    val ranked = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (3L, 30L, 1))
      .toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 11L, 1), (1L, 99L, 1), (2L, 20L, 1), (3L, 31L, 1))
      .toDF("query_id", "doc_id", "rel")
    val m = Retrieval.evalRanking(ranked, qrels, k = 3)
      .orderBy("query_id").collect()
    def micro(rank: Int): Long =
      math.round(1000000d / (math.log(rank + 1) / math.log(2)))
    assert(m(0).getDouble(1) == 0.5) // recall 1/2
    assert(m(0).getDouble(2) == 0.5) // mrr 1/2
    val ndcg1 = BigDecimal(micro(2).toDouble / (micro(1) + micro(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(0).getDouble(3) == ndcg1)
    assert(m(1).getDouble(1) == 1.0 && m(1).getDouble(2) == 1.0 &&
      m(1).getDouble(3) == 1.0)
    assert(m(2).getDouble(1) == 0.0 && m(2).getDouble(2) == 0.0 &&
      m(2).getDouble(3) == 0.0)
  }

  test("rrfFuse: agreement outranks a single first place; absentees score") {
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val sem = Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3))
      .toDF("query_id", "doc_id", "rank")
    val out = Retrieval.rrfFuse(Seq(lex, sem), k = 4)
      .orderBy("rank").collect()
    // doc 11 (ranks 2+1) beats doc 10 (rank 1 in one list only):
    // 1/62 + 1/61 > 1/61
    assert(out.map(_.getLong(1)).toSeq == Seq(11L, 12L, 10L, 13L))
    // absent-from-one-list docs still carry their single contribution
    val d13 = out.find(_.getLong(1) == 13L).get
    assert(math.abs(d13.getDouble(2) - 1.0 / 63) < 1e-6)
  }

  test("rrfFuse: fusion is exact and partition-order independent") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 10L, 1))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1), (2L, 12L, 1)).toDF("query_id", "doc_id", "rank")
    val x = Retrieval.rrfFuse(Seq(a, b), 5).collect().toSet
    val y = Retrieval.rrfFuse(Seq(b.repartition(7), a.repartition(3)), 5)
      .collect().toSet
    assert(x == y)
  }

  test("duplicateSpans: flags only cross-doc repeated windows") {
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d z"),   // shares the 4-gram "a b c d" with doc 1
      (3L, "c d e f c d e f"), // repeats a window, but only within itself
      (4L, "p q r s")
    ).toDF("doc_id", "text")
    val out = Retrieval.duplicateSpans(d, "text", "doc_id", windowTokens = 4)
      .orderBy("doc_id", "span_start").collect()
    // Cross-doc windows: "a b c d" (doc1@0, doc2@2) and "c d e f"
    // (doc1@2, doc3@0, doc3@4 — within-doc repeats count as
    // occurrences once another doc shares the window). Doc 4 clean.
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 0, 2L, 2L), (1L, 2, 2L, 3L), (2L, 2, 2L, 2L),
        (3L, 0, 2L, 3L), (3L, 4, 2L, 3L)))
  }

  test("removeDuplicateSpans: losers cut, winner and clean docs verbatim") {
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d z"), // loses "a b c d" to doc 1 → cut to "x y z"
      (3L, "p q r s")        // no duplicated window: untouched
    ).toDF("doc_id", "text")
    val out = Retrieval.removeDuplicateSpans(d, "text", "doc_id", 4)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "a b c d e f", 0), (2L, "x y z", 4), (3L, "p q r s", 0)))
  }

  test("removeDuplicateSpans: self-overlap keeps the winning occurrence intact") {
    val d = Seq((1L, "a b a b a b"), (2L, "q r s t")).toDF("doc_id", "text")
    // within doc 1, "a b a b" occurs at starts 0 (winner) and 2 (loser);
    // the loser overlaps the winner on tokens 2-3, which survive because
    // a winning span covers them — only tokens 4-5 are cut
    val out = Retrieval.removeDuplicateSpans(d, "text", "doc_id", 4)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "a b a b", 2), (2L, "q r s t", 0)))
  }

  test("removeContaminatedSpans: cuts leaked benchmark passages only") {
    val corpus = Seq(
      (1L, "intro a b c d outro x y"), // leaks the bench 4-gram at start 1
      (2L, "completely unrelated clean text here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val out = Retrieval.removeContaminatedSpans(corpus, bench, "text",
        "doc_id", windowTokens = 4)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "intro outro x y", 4),
        (2L, "completely unrelated clean text here", 0)))
  }

  test("removeDuplicateSpans: short and empty docs pass through") {
    val d = Seq((1L, "tiny"), (2L, "   "), (3L, "a b c d"), (4L, "a b c d e"))
      .toDF("doc_id", "text")
    // docs 3 and 4 share "a b c d": doc 3 wins, doc 4 loses its first 4
    val out = Retrieval.removeDuplicateSpans(d, "text", "doc_id", 4)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "tiny", 0), (2L, "", 0), (3L, "a b c d", 0), (4L, "e", 4)))
  }

  test("duplicateSpans: within-doc repetition counts occurrences, not docs") {
    val d = Seq(
      (1L, "a b a b a b"),  // "a b a b" at starts 0 and 2
      (2L, "z a b a b")     // "a b a b" at start 1
    ).toDF("doc_id", "text")
    val out = Retrieval.duplicateSpans(d, "text", "doc_id", windowTokens = 4)
      .orderBy("doc_id", "span_start").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4))).toSeq ==
      Seq((1L, 0, 2L, 3L), (1L, 2, 2L, 3L), (2L, 1, 2L, 3L)))
  }

  test("prfTopK: a mined feedback term retrieves what the raw query cannot") {
    import spark.implicits._
    // the query says "engine"; feedback docs pair "engine" with
    // "turbine"; doc 30 mentions ONLY "turbine" — invisible to plain
    // BM25, retrieved after expansion. Docs 40+ are off-topic noise.
    val docs = (Seq(
      (10L, "engine turbine assembly engine turbine manual"),
      (11L, "engine turbine maintenance engine schedule"),
      (12L, "engine repair engine overhaul notes"),
      (30L, "turbine blade inspection turbine report"),
      (31L, "turbine cooling systems")) ++
      (40L until 60L).map(i => (i, s"unrelated filler text number $i")))
      .toDF("doc_id", "text")
    val q = Seq((1L, "engine")).toDF("query_id", "query_text")
    val plain = Retrieval.bm25TopK(docs, q, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!plain.contains(30L) && !plain.contains(31L),
      s"turbine-only docs invisible to the raw query: $plain")
    val prf = Retrieval.prfTopK(docs, q, k = 10, fbDocs = 3, fbTerms = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(prf.contains(30L) && prf.contains(31L),
      s"expansion must surface the turbine-only docs: $prf")
    // original-term hits are not lost
    assert(Set(10L, 11L, 12L).subsetOf(prf), prf.toString)
  }
}
