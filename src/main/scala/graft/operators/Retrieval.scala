package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical (keyword) retrieval over a text corpus — the BM25 complement
  * to [[Similarity]]'s embedding search. A training-data pipeline needs
  * both: lexical ranking for benchmark decontamination and targeted
  * corpus probes, embedding ANN for semantic neighbors.
  *
  * Scale shape: [[postings]] is the inverted index — one explode + one
  * groupBy over the corpus, shuffled on (term, doc); persist it
  * partitioned/bucketed by a term hash and the per-query work becomes a
  * broadcast semi-join touching only the query's terms. Corpus text is
  * never shuffled, only (term, id, tf, dl) tuples. Document frequency
  * for scoring is computed from the postings restricted to query terms,
  * so a q-term query aggregates |postings(q-terms)| rows, not the
  * corpus.
  */
object Retrieval {

  /** Lower-cased alphanumeric tokens (codegen'd column algebra). */
  def termsOf(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => length(t) > 0)

  /** Inverted-index postings: one row per (doc, term) with the term
    * frequency and the doc's token length. This is the persistable
    * artifact — at scale, write it once partitioned by
    * `pmod(xxhash64(term), P)` and every BM25 query prunes to the
    * partitions its terms hash into. */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // repartition by id BEFORE the CPU-heavy tokenize (the minhash
    // discipline): a corpus that arrives as one parquet split would
    // otherwise tokenize on one core, and the (id, dl, term) groupBy
    // reuses the id clustering instead of adding an exchange
    val par = graft.core.Par.widthFor(docs)
    docs.repartition(par, col(idCol))
      .select(col(idCol), termsOf(col(textCol)).as("__tk"))
      .select(col(idCol), size(col("__tk")).as("dl"),
        explode(col("__tk")).as("term"))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Corpus scalars BM25 needs: document count and mean token length.
    * One cheap full-corpus aggregate, broadcast to the scorer. avgdl
    * is an exact Long sum divided once — not avg() — so the double is
    * identical regardless of partitioning or engine. */
  def corpusStats(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(size(termsOf(col(textCol))).as("__dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("__dl")).cast("double") / count(lit(1))).as("avgdl"))

  /** One row per (query, distinct term) — the unit the scorer and the
    * index's partition pruning both work in. */
  def queryTerms(queries: DataFrame, queryIdCol: String = "query_id",
      queryTextCol: String = "query_text"): DataFrame =
    queries.select(col(queryIdCol),
      explode(array_distinct(termsOf(col(queryTextCol)))).as("term"))

  /** BM25 top-k: for each query row, the k highest-scoring documents.
    *
    * score(q,d) = Σ_{t ∈ distinct terms(q)} idf(t) · tf·(k1+1) /
    * (tf + k1·(1 − b + b·dl/avgdl)), with the Robertson
    * idf = ln(1 + (N − df + ½)/(df + ½)) (always positive).
    *
    * Each per-term contribution is rounded to integer micro-units and
    * the document score summed in Long — exact, order-independent
    * arithmetic, so ranking and the reported score are reproducible
    * across engines, partitionings, and re-runs (no float-summation
    * order sensitivity). Ties break by ascending document id.
    *
    * Output: (queryIdCol, idCol, score, rank), score in units of 1e-6.
    */
  /** One (id, dl, term) row per token occurrence, REPARTITIONED by id
    * before the CPU-heavy tokenize (the minhash discipline: a corpus
    * that arrives as one parquet split would otherwise tokenize on one
    * core), with empty docs kept as a single null-term row so corpus
    * stats survive. This is the shared narrow source every retrieval
    * path derives from — the term cut, the tf/df aggregates, and the
    * corpus scalars all land AFTER it, so nothing ever shuffles the
    * corpus's full term explosion (Catalyst cannot push a join below
    * an aggregate, so the cut must be built in, not bolted on). */
  private def tokenRows(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    val par = graft.core.Par.widthFor(docs)
    docs.repartition(par, col(idCol))
      .select(col(idCol), termsOf(col(textCol)).as("__tk"))
      .select(col(idCol), size(col("__tk")).as("dl"),
        explode_outer(col("__tk")).as("term"))
  }

  /** (n_docs, avgdl) from a [[tokenRows]] frame: the per-doc collapse
    * reuses the id partitioning (no exchange), null-term rows keep
    * empty docs counted, and avgdl is the same exact-long-sum-divided-
    * once double [[corpusStats]] computes. */
  private def statsOf(toks: DataFrame, idCol: String): DataFrame =
    toks.groupBy(col(idCol)).agg(first(col("dl")).as("__dl"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("__dl")).cast("double") / count(lit(1))).as("avgdl"))

  /** Postings restricted to `terms` — the term cut applied BEFORE the
    * (doc, term) aggregate, so the shuffle carries only the touched
    * terms' rows. `terms` must be one `term` column and small (it
    * broadcasts); null-term rows (empty docs) never match a join key. */
  private def touchedOf(toks: DataFrame, terms: DataFrame): DataFrame =
    toks
      .join(broadcast(terms), Seq("term"))
      .groupBy(toks.columns.filter(_ != "term").map(col) :+ col("term"): _*)
      .agg(count(lit(1)).as("tf"))

  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      textCol: String = "text", idCol: String = "doc_id",
      queryIdCol: String = "query_id", queryTextCol: String = "query_text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = tokenRows(docs, textCol, idCol)
    val stats = statsOf(toks, idCol)
    val qterms = queryTerms(queries, queryIdCol, queryTextCol)
    // Restrict to terms any query mentions BEFORE aggregating (the
    // query set is small by construction of a top-k serving path).
    // cache() is load-bearing: df-count and the scorer both read the
    // restricted postings; uncached, the corpus tokenize runs twice.
    // The cached frame is query-term postings only — a few rows per
    // (term, matching doc), never the corpus
    val touched = touchedOf(toks, qterms.select("term").distinct()).cache()
    scoreBm25(touched, stats, qterms, k, k1, b, idCol, queryIdCol)
  }

  /** The BM25 scorer over postings already restricted to query terms —
    * shared verbatim by [[bm25TopK]] and [[PostingsIndex.query]] so the
    * in-memory and file-backed paths cannot diverge. `touched` carries
    * (term, idCol, dl, tf); `stats` one row (n_docs, avgdl). */
  private[operators] def scoreBm25(touched: DataFrame, stats: DataFrame,
      qterms: DataFrame, k: Int, k1: Double, b: Double,
      idCol: String, queryIdCol: String): DataFrame = {
    // postings are unique per (term, doc) by construction ([[postings]]
    // aggregates; the index path dropDuplicates), so document frequency
    // is a plain count — map-side combined, no distinct-aggregate pass
    val termDf = touched.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val idf = log(lit(1d) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val sat = col("tf") * (k1 + 1) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = touched
      .join(broadcast(termDf), Seq("term"))
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("__micro", round(idf * sat * 1e6).cast("long"))
      .groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("__micro")).as("__sum"))
      .withColumn("score", col("__sum") / 1e6)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__sum").desc, col(idCol).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("score"), col("rank"))
  }

  /** Pseudo-relevance feedback (the RM3-family two-pass expansion,
    * Lavrenko & Croft 2001 / Abdul-Jaleel et al. 2004): retrieve a
    * small feedback set with BM25, mine its heaviest non-query terms,
    * and rescore the corpus with the expanded term set — the standard
    * lexical-recall lift when queries underspecify their vocabulary.
    * Expansion weighting is the feedback set's total term frequency
    * (exact longs; ties break on the term string), so the whole
    * two-pass pipeline replays in SQL — no float term weights.
    *
    * Scale shape: both scoring passes ride the term-restricted
    * postings path of [[bm25TopK]] — the term cut lands BEFORE the
    * (doc, term) aggregate, so the corpus's full term explosion never
    * shuffles; the feedback docs' own term census tokenizes just those
    * fbDocs·|queries| documents (broadcast semi-join on the id before
    * tokenize — the [[PostingsIndex.prfQuery]] shape); the feedback
    * set and the expanded term set broadcast. Everything this pins, it
    * unpersists before returning — the result is one small
    * eagerly-materialized checkpoint (queries × k rows).
    *
    * Output: (queryIdCol, idCol, score, rank) — the rescored top-k. */
  def prfTopK(docs: DataFrame, queries: DataFrame, k: Int,
      fbDocs: Int = 5, fbTerms: Int = 5,
      textCol: String = "text", idCol: String = "doc_id",
      queryIdCol: String = "query_id", queryTextCol: String = "query_text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // ONE tokenize pass for the whole two-pass pipeline: the narrow
    // (id, dl, term) frame is pinned and every consumer — corpus
    // stats, both term-restricted scoring passes, the feedback-doc
    // census — derives from it. Pin materializes BEFORE the fan-out
    // (the l19/PPJoin discipline: AQE submits consumers' exchange jobs
    // concurrently, and racing the cache population re-tokenizes the
    // corpus once per consumer); everything unpersists on exit and the
    // result is one small eager checkpoint (queries × k rows)
    val toks = tokenRows(docs, textCol, idCol).persist()
    var touched1: DataFrame = null
    var touched2: DataFrame = null
    try {
      val stats = statsOf(toks, idCol)
      val qterms = queryTerms(queries, queryIdCol, queryTextCol)
      touched1 = touchedOf(toks, qterms.select("term").distinct()).persist()
      // one action populates BOTH pins before any fan-out: counting
      // touched1 materializes toks en route (no separate corpus pass)
      touched1.count() // two consumers inside scoreBm25 (df + scoring)
      // feedback set: tiny (queries × fbDocs) — sever and materialize
      // once; its ids drive both the census semi-join and the weights
      val fb = scoreBm25(touched1, stats, qterms, fbDocs, k1, b,
          idCol, queryIdCol)
        .select(col(queryIdCol), col(idCol))
        .localCheckpoint(true)
      // term census of ONLY the feedback documents, off the pinned
      // token frame: broadcast semi-join on the id, then a tiny agg
      val fbPost = toks
        .join(broadcast(fb.select(idCol).distinct()), Seq(idCol))
        .filter(col("term").isNotNull)
        .groupBy(col(idCol), col("term"))
        .agg(count(lit(1)).as("tf"))
      val expTerms = fbPost.join(broadcast(fb), Seq(idCol))
        .groupBy(col(queryIdCol), col("term"))
        .agg(sum(col("tf")).as("__w"))
        .join(qterms, Seq(queryIdCol, "term"), "left_anti")
        .withColumn("__trank", row_number().over(
          Window.partitionBy(col(queryIdCol))
            .orderBy(col("__w").desc, col("term").asc)))
        .filter(col("__trank") <= fbTerms)
        .select(col(queryIdCol), col("term"))
      val q2 = qterms.unionByName(expTerms).distinct().localCheckpoint(true)
      touched2 = touchedOf(toks, q2.select("term").distinct()).persist()
      touched2.count()
      scoreBm25(touched2, stats, q2, k, k1, b, idCol, queryIdCol)
        .localCheckpoint(true)
    } finally {
      toks.unpersist()
      if (touched1 != null) touched1.unpersist()
      if (touched2 != null) touched2.unpersist()
      ()
    }
  }

  /** Sparse tf-idf document-similarity pairs — the embedding-free
    * doc-doc cosine (Salton's vector space model): w(t,d) =
    * tf·ln(N/df) in MILLI-unit longs, pair dot products and per-doc
    * norms accumulate as exact integers (milli keeps Σw² far from
    * Long overflow), one final double sqrt/divide per pair — so the
    * scores replay to the rounded digit in SQL. Complements
    * [[graft.operators.Dedup]]'s PPJoin (set Jaccard) and the
    * embedding ANN stack: weighted-term similarity without a single
    * embedding.
    *
    * Scale shape: candidate pairs come from a self-join of postings
    * RESTRICTED to terms with df ≤ maxDf — the classic hub-term prune
    * (a stopword shared by half the corpus generates O(N²) pairs and
    * no signal; recall loss is confined to pairs that share ONLY
    * hub terms). Only (term, id, weight) triples shuffle.
    *
    * Output: (id_a, id_b, cosine, rank) — global top-k pairs,
    * id_a < id_b. */
  def tfidfPairs(docs: DataFrame, k: Int, maxDf: Int = 50,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val post = postings(docs, textCol, idCol)
    val n = docs.count()
    val withDf = post
      .join(post.groupBy(col("term")).agg(count(lit(1)).as("__df")),
        Seq("term"))
    val weighted = withDf
      .withColumn("__w", round(lit(1e3) * col("tf") *
        log(lit(n.toDouble) / col("__df"))).cast("long"))
      .select(col("term"), col(idCol), col("__w"), col("__df"))
      .cache()
    val norms = weighted.groupBy(col(idCol))
      .agg(sum(col("__w") * col("__w")).as("__n2"))
    val pruned = weighted.filter(col("__df") <= maxDf)
    val dots = pruned.as("a")
      .join(pruned.as("b"),
        col("a.term") === col("b.term") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(sum(col("a.__w") * col("b.__w")).as("__dot"))
    val scored = dots
      .join(norms.select(col(idCol).as("id_a"), col("__n2").as("__na")),
        Seq("id_a"))
      .join(norms.select(col(idCol).as("id_b"), col("__n2").as("__nb")),
        Seq("id_b"))
      .withColumn("cosine", round(col("__dot") /
        (sqrt(col("__na")) * sqrt(col("__nb"))), 6))
    // TakeOrderedAndProject first (per-partition heaps, no global
    // sort); the rank window then only ever sees k rows
    val top = scored
      .orderBy(col("cosine").desc, col("id_a").asc, col("id_b").asc)
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("id_a").asc,
          col("id_b").asc)))
      .select(col("id_a"), col("id_b"), col("cosine"), col("rank"))
  }

  /** Hard-negative mining for dual-encoder retrieval training (DPR,
    * Karpukhin et al. 2020, arXiv:2004.04906 §3.2): per query, the
    * top-k BM25 hits EXCLUDING its labeled positives — lexically close
    * but unlabeled documents, the negatives that actually move a
    * retriever. `positives` carries (queryIdCol, idCol) labeled pairs.
    * Candidates are fetched to depth k + maxPositivesPerQuery, so the
    * exclusion still leaves k negatives when up to that many positives
    * land in the candidate window; queries with more positives in-window
    * yield fewer negatives (standard behavior).
    *
    * Output: (queryIdCol, idCol, score, neg_rank), neg_rank dense 1..k
    * per query in BM25 order.
    *
    * Scale shape: candidates come from the broadcast-term-restricted
    * postings path of [[bm25TopK]] (the corpus never shuffles whole);
    * the exclusion is a broadcast anti-join (labels ≪ corpus). */
  def hardNegatives(docs: DataFrame, queries: DataFrame,
      positives: DataFrame, k: Int, maxPositivesPerQuery: Int = 8,
      textCol: String = "text", idCol: String = "doc_id",
      queryIdCol: String = "query_id", queryTextCol: String = "query_text",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val cands = bm25TopK(docs, queries, k + maxPositivesPerQuery, textCol,
      idCol, queryIdCol, queryTextCol, k1, b)
    val negs = cands.join(
      broadcast(positives.select(col(queryIdCol), col(idCol))),
      Seq(queryIdCol, idCol), "left_anti")
    val w = Window.partitionBy(col(queryIdCol)).orderBy(col("rank").asc)
    negs.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= k)
      .select(col(queryIdCol), col(idCol), col("score"), col("neg_rank"))
  }

  /** Ranking-quality evaluation against labeled relevance (qrels):
    * per query, recall@k, MRR@k and nDCG@k — the numbers that tune the
    * retrieval stack (BM25 / hybrid / ANN) this module serves. `ranked`
    * carries (queryIdCol, idCol, rankCol); `qrels` carries (queryIdCol,
    * idCol, rel) with integer gains ≥ 1.
    *
    * Fixed-point discipline as everywhere: per-hit DCG contributions
    * round to integer micro-units (rel·10⁶/log2(rank+1)) before the
    * sum, so every metric is bit-reproducible across engines and
    * partitionings. Output: (queryIdCol, recall_at_k, mrr_at_k,
    * ndcg_at_k), each rounded to 6 places.
    *
    * Scale shape: one join keyed (query, doc) against the (small) qrel
    * set, one aggregate per query — ranked lists are already ≤ k rows
    * per query, so nothing here is corpus-sized. */
  def evalRanking(ranked: DataFrame, qrels: DataFrame, k: Int,
      queryIdCol: String = "query_id", idCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    val rel = qrels.select(col(queryIdCol), col(idCol),
      col("rel").cast("long").as("__rel"))
    // ideal DCG per query: gains sorted descending, positions 1..k
    val ideal = rel.withColumn("__irank",
        row_number().over(Window.partitionBy(col(queryIdCol))
          .orderBy(col("__rel").desc, col(idCol).asc)))
      .filter(col("__irank") <= k)
      .groupBy(col(queryIdCol))
      .agg(sum(round(col("__rel") * 1000000d /
        log2(col("__irank") + 1)).cast("long")).as("__idcg"))
    val nRel = rel.groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("__nrel"))
    val hits = ranked.filter(col(rankCol) <= k)
      .join(rel, Seq(queryIdCol, idCol), "inner")
    val perQuery = hits.groupBy(col(queryIdCol))
      .agg(count(lit(1)).as("__nhit"),
        min(col(rankCol)).as("__first"),
        sum(round(col("__rel") * 1000000d /
          log2(col(rankCol) + 1)).cast("long")).as("__dcg"))
    nRel.join(ideal, Seq(queryIdCol))
      .join(perQuery, Seq(queryIdCol), "left")
      .select(col(queryIdCol),
        round(coalesce(col("__nhit"), lit(0L)).cast("double") /
          col("__nrel"), 6).as("recall_at_k"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 6)
          .as("mrr_at_k"),
        round(coalesce(col("__dcg"), lit(0L)).cast("double") /
          col("__idcg"), 6).as("ndcg_at_k"))
  }

  /** Duplicate n-gram span detection — substring-level dedup in the
    * style of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"): hash every rolling window of
    * `windowTokens` whitespace tokens; any window text occurring in
    * more than one document marks a duplicated span in every document
    * containing it. Downstream can cut the spans or drop the docs.
    *
    * Output: one row per (doc, span) whose window text appears in >1
    * document — (idCol, span_start = 0-based token offset, span_hash,
    * n_docs, n_occurrences).
    *
    * Scale shape: window hashing is per-row column algebra (no
    * shuffle); the duplicate decision shuffles (hash, id, start)
    * tuples only — window text dies at the map side. `hashFn` defaults
    * to xxhash64 (8-byte shuffle keys); pass md5 when a re-derivable
    * cross-engine fingerprint matters more than key width.
    */
  def duplicateSpans(docs: DataFrame, textCol: String, idCol: String,
      windowTokens: Int,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    // cache() is load-bearing: the duplicate census and the join-back
    // both read the span set; uncached, the tokenize+window-hash
    // explode — the expensive part — runs twice over the corpus
    val spans = docs
      .select(col(idCol), termsOf(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= windowTokens)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("__tk")) - windowTokens),
          i => hashFn(array_join(
            slice(col("__tk"), i + 1, lit(windowTokens)), " "))))
        .as(Seq("span_start", "span_hash")))
      .cache()
    val dups = spans.groupBy(col("span_hash"))
      .agg(count_distinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") > 1)
    spans.join(dups, Seq("span_hash"))
      .select(col(idCol), col("span_start"), col("span_hash"),
        col("n_docs"), col("n_occurrences"))
  }

  /** Reciprocal-rank fusion (Cormack et al. SIGIR'09): combine ranked
    * lists from incommensurable scorers — BM25 lexical, ANN cosine —
    * into one ranking by rrf(d) = Σ_lists 1/(k0 + rank_d). Rank-only
    * fusion sidesteps score normalization entirely; a document absent
    * from a list simply contributes nothing for it.
    *
    * Per-list contributions are exact nano-unit longs (1e9/(k0+rank)
    * rounded once per rank value), summed in Long — fusion order and
    * partitioning cannot move the result. Ties break by ascending id.
    *
    * Inputs need (queryIdCol, idCol, rank); extra columns are ignored.
    * Output: (queryIdCol, idCol, rrf_score, rank), score in 1e-9 units.
    * Scale shape: one union + one groupBy on (query, id) — never joins
    * the lists pairwise. */
  def rrfFuse(lists: Seq[DataFrame], k: Int, k0: Int = 60,
      idCol: String = "doc_id", queryIdCol: String = "query_id"): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val u = lists
      .map(_.select(col(queryIdCol), col(idCol),
        round(lit(1e9) / (col("rank") + k0)).cast("long").as("__nano")))
      .reduce(_.unionByName(_))
    val fused = u.groupBy(col(queryIdCol), col(idCol))
      .agg(sum(col("__nano")).as("__s"))
      .withColumn("rrf_score", col("__s") / 1e9)
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__s").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol), col("rrf_score"), col("rank"))
  }

  /** Cut duplicated spans out of the corpus (the removal half of Lee
    * et al. 2022): for every window text occurring more than once, the
    * globally-first occurrence (lowest (id, start)) is the winner; all
    * other occurrences are cut from their documents. A token survives
    * iff a winning span covers it, or no losing span does — so winning
    * occurrences are preserved verbatim even when a same-document
    * repeat overlaps them.
    *
    * Output: (idCol, textCol rebuilt from surviving tokens — single
    * spaces; this operates on the token stream a training pipeline
    * consumes, not raw bytes — and removed_tokens). Duplicated here
    * means ANY repeat, cross- or within-document.
    *
    * Scale shape: span hashing and the winner decision shuffle
    * (hash, id, start) tuples; the cut itself is per-row column
    * algebra over each doc's own span lists (O(tokens × spans-per-doc)
    * in the coverage lambda — spans-per-doc is small outside
    * pathological boilerplate). */
  def removeDuplicateSpans(docs: DataFrame, textCol: String, idCol: String,
      windowTokens: Int,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val w = windowTokens
    val spans = spansOf(docs, textCol, idCol, w, hashFn)
      .cache() // census + occurrence marking both read it
    val firsts = spans.groupBy(col("__h"))
      .agg(count(lit(1)).as("__n"),
        min(struct(col(idCol).as("__fid"), col("__start").as("__fst")))
          .as("__first"))
      .filter(col("__n") > 1)
      .select(col("__h"), col("__first.__fid").as("__fid"),
        col("__first.__fst").as("__fst"))
    val perDoc = spans.join(firsts, Seq("__h"))
      .withColumn("__win",
        col(idCol) === col("__fid") && col("__start") === col("__fst"))
      .groupBy(col(idCol))
      .agg(collect_list(when(col("__win"), col("__start"))).as("__wins"),
        collect_list(when(!col("__win"), col("__start"))).as("__loses"))
    cutSpans(docs, perDoc, textCol, idCol, w)
  }

  /** Cut every corpus span whose window text occurs ANYWHERE in the
    * benchmark set — decontamination that edits documents instead of
    * dropping them (keep the doc, lose the leaked passage). The
    * benchmark side only contributes its distinct window hashes, which
    * broadcast; corpus text never shuffles at all.
    *
    * Output shape matches [[removeDuplicateSpans]]:
    * (idCol, rebuilt textCol, removed_tokens). */
  def removeContaminatedSpans(corpus: DataFrame, bench: DataFrame,
      textCol: String, idCol: String, windowTokens: Int,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    val w = windowTokens
    val benchHashes = spansOf(bench, textCol, idCol, w, hashFn)
      .select(col("__h")).distinct()
    val perDoc = spansOf(corpus, textCol, idCol, w, hashFn)
      .join(broadcast(benchHashes), Seq("__h"))
      .groupBy(col(idCol))
      .agg(collect_list(col("__start")).as("__loses"))
      .withColumn("__wins", array().cast("array<int>"))
    cutSpans(corpus, perDoc, textCol, idCol, w)
  }

  /** All (id, 0-based token offset, window hash) rows for `w`-token
    * rolling windows; docs shorter than one window yield none. */
  private def spansOf(docs: DataFrame, textCol: String, idCol: String,
      w: Int, hashFn: Column => Column): DataFrame =
    docs
      .select(col(idCol), termsOf(col(textCol)).as("__tk"))
      .filter(size(col("__tk")) >= w)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(col("__tk")) - w),
          i => hashFn(array_join(slice(col("__tk"), i + 1, lit(w)), " "))))
        .as(Seq("__start", "__h")))

  /** Rebuild each document keeping a token iff a winning span covers it
    * or no losing span does. `perDoc` carries (idCol, __wins, __loses)
    * for the affected docs; everything else passes through verbatim. */
  private def cutSpans(docs: DataFrame, perDoc: DataFrame, textCol: String,
      idCol: String, w: Int): DataFrame = {
    val covered = (starts: Column, i: Column) =>
      exists(starts, s => i >= s && i < s + w)
    docs.join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__wins"), array().cast("array<int>")).as("__wins"),
        coalesce(col("__loses"), array().cast("array<int>")).as("__loses"),
        termsOf(col(textCol)).as("__tk"))
      .select(col(idCol),
        // transform-with-index (not sequence(0, n-1): that yields
        // [0, -1] for an empty doc — Spark infers a negative step)
        filter(transform(col("__tk"), (_, i) => i), i =>
          covered(col("__wins"), i) || !covered(col("__loses"), i))
          .as("__keep"),
        col("__tk"))
      .select(col(idCol),
        array_join(transform(col("__keep"),
          i => element_at(col("__tk"), i + 1)), " ").as(textCol),
        (size(col("__tk")) - size(col("__keep"))).as("removed_tokens"))
  }
}
