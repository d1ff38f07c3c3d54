package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-trained n-gram language model + per-document perplexity
  * scoring, the CCNet-style statistical quality filter (Wenzek et al.,
  * LREC'20): documents whose token transitions are improbable under a
  * reference LM (boilerplate, gibberish, lists) score high and can be
  * cut at a quantile. The production shape is [[train]] once on a
  * trusted reference corpus, then [[score]] any stream of candidate
  * documents against the frozen model; [[perplexity]] is the
  * self-scoring special case (corpus scores itself). `order` = 2
  * (bigram) by default; CCNet proper uses order 5.
  *
  * Shapes for 100 TB:
  *  - the n-gram stream is one explode of the token arrays; training is
  *    one hash aggregate (map-side combined) on (context, word);
  *  - scoring joins the stream to the model — a shuffle join keyed by
  *    the n-gram, or a broadcast when the trained LM fits (it is
  *    vocab-bounded, not corpus-bounded, so it usually does after a
  *    frequency floor); context totals c(ctx·) are re-derived from the
  *    model itself, so the persisted artifact is one narrow table;
  *  - per-gram log-probs are rounded to integer micro-bits and summed
  *    as longs (the house fixed-point pattern), so the per-doc score is
  *    exact and the DuckDB oracle compares bit-identically.
  *
  * Add-one smoothing over the training vocabulary:
  * P(w | ctx) = (c(ctx,w) + 1) / (c(ctx·) + |V|); transitions never
  * seen in training fall back to c=0 under the same formula. Contexts
  * are the space-join of the previous order−1 tokens (tokens cannot
  * contain whitespace, so the join is collision-free).
  */
object NgramLm {

  /** Tokenize once: (idCol, __tk). Every NgramLm entry point accepts a
    * frame that already carries a `__tk` column and skips its own
    * tokenize, so a query that trains several models over one corpus
    * (the DSIR target/raw pair, cross-scoring) pays ONE tokenize pass
    * over the text instead of one per vocab/gram/score leg — `.cache()`
    * the returned frame and pass it everywhere `docs` goes. The token
    * arrays are a fraction of the raw text and column-pruned reads of
    * the cache never touch the text again. */
  def tokenize(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // explicit-width repartition BEFORE the tokenize (the minhash
    // discipline): the LM family's scoring passes are CPU-heavy maps
    // over __tk, and both a single-split source and an AQE-coalesced
    // tiny exchange would otherwise run them on one core
    val par = graft.core.Par.widthFor(docs)
    docs.repartition(par, col(idCol))
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__tk"))
  }

  /** Pass-through for pre-tokenized frames, tokenize otherwise. */
  private def withTokens(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    if (docs.columns.contains("__tk")) docs.select(col(idCol), col("__tk"))
    else tokenize(docs, textCol, idCol)

  /** One row per n-gram occurrence: (id, ctx, w). Documents with fewer
    * than `order` tokens contribute no rows. */
  private def ngramStream(docs: DataFrame, textCol: String,
      idCol: String, order: Int): DataFrame = {
    require(order >= 2, s"ngram order $order < 2")
    val tk = col("__tk")
    withTokens(docs, textCol, idCol)
      .select(col(idCol),
        // sequence() needs size >= order (negative bounds infer a
        // negative step); the `when` guard keeps it unevaluated on
        // short docs
        explode(when(size(tk) >= order,
          transform(sequence(lit(0), size(tk) - order), i => struct(
            array_join(slice(tk, i + 1, lit(order - 1)), " ").as("ctx"),
            element_at(tk, i + order).as("w"))))
          .otherwise(array().cast("array<struct<ctx:string,w:string>>")))
          .as("__ng"))
      .select(col(idCol), col("__ng.ctx"), col("__ng.w"))
  }

  /** Train an n-gram LM: one row per distinct transition,
    * (ctx, w, __c), plus the training vocabulary size as a constant
    * __nv column (part of the model — smoothing must use the TRAINING
    * vocab no matter what corpus is scored later). Persist with a plain
    * parquet write; vocab-bounded, so it broadcasts in [[score]]. */
  def train(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", order: Int = 2): DataFrame = {
    val tk = withTokens(docs, textCol, idCol)
    val vocab = tk
      .select(explode(col("__tk")).as("__t"))
      .agg(count_distinct(col("__t")).as("__nv"))
    ngramStream(tk, textCol, idCol, order)
      .groupBy(col("ctx"), col("w")).agg(count(lit(1)).as("__c"))
      .crossJoin(broadcast(vocab))
  }

  /** Per-document mean negative log2-likelihood (bits per transition)
    * of `docs` under a trained model. Output: (idCol, n_ngrams,
    * avg_nll_bits) — n_ngrams 0 and a null score for docs too short to
    * form a gram. Lower is more fluent; filter at a quantile. `order`
    * must match the one the model was trained with. */
  def score(docs: DataFrame, lm: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", order: Int = 2): DataFrame =
    finishScore(docs, sumBits(docs, lm, textCol, idCol, order), idCol)

  /** Shared output shaping of every scorer: (idCol, n_ngrams,
    * avg_nll_bits), docs too short to form a gram kept with 0 grams
    * and a null score. ONE definition — the output contract (rounding
    * scale, null policy) must never drift between smoothers. */
  private def finishScore(docs: DataFrame, sums: DataFrame,
      idCol: String): DataFrame =
    docs.select(col(idCol))
      .join(sums, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_ngrams"),
        round((-col("__s")).cast("double") / 1000000.0 / col("__n"), 6)
          .as("avg_nll_bits"))

  /** Per-doc TOTAL log2-likelihood in exact micro-bit longs:
    * (idCol, __s, __n); docs with no grams absent. The exactness
    * anchor both [[score]] and [[dsirTopK]] stand on. */
  private def sumBits(docs: DataFrame, lm: DataFrame, textCol: String,
      idCol: String, order: Int): DataFrame = {
    // context totals are implied by the model: c(ctx·) = Σ_w c(ctx,w)
    val cCtx = lm.groupBy(col("ctx")).agg(sum(col("__c")).as("__cctx"))
    val nv = lm.select(col("__nv")).limit(1)
    val ng = ngramStream(docs, textCol, idCol, order)
    // exact integer ratio -> one log2 -> micro-bit long; summing longs
    // keeps the aggregate exact (and engine-portable) from here on
    val microBits: Column =
      round(log2((coalesce(col("__c"), lit(0L)) + 1).cast("double") /
        (coalesce(col("__cctx"), lit(0L)) + col("__nv"))) * 1000000)
        .cast("long")
    // the model and its re-aggregations are vocab-bounded (scaladoc:
    // the persisted artifact broadcasts after a frequency floor), so
    // hint them explicitly: Catalyst cannot size a derived aggregate
    // and would otherwise sort-merge-join the corpus-sized gram stream
    // against a table that fits in one broadcast (2 exchanges + 2
    // sorts per join, all carrying the gram stream)
    ng.join(broadcast(lm.drop("__nv")), Seq("ctx", "w"), "left")
      .join(broadcast(cCtx), Seq("ctx"), "left")
      .crossJoin(broadcast(nv))
      .groupBy(col(idCol))
      .agg(sum(microBits).as("__s"), count(lit(1)).as("__n"))
  }

  /** Interpolated Kneser-Ney scoring of `docs` under a [[train]]ed
    * BIGRAM model — the smoothing family CCNet's KenLM filter actually
    * uses (Kneser & Ney 1995), versus [[score]]'s add-one baseline.
    * Absolute discount `discount` (default 0.75, the standard
    * heuristic):
    *
    *   P(w|ctx) = (max(c(ctx,w)−D, 0) + D·N1+(ctx·)·Pc(w)) / c(ctx·)
    *   Pc(w)    = (N1+(·w) + 1) / (B + |V|)
    *
    * backing off to Pc alone when the context was never seen. Pc is
    * add-one-floored so words never seen as continuations stay
    * positive (the model's deterministic OOV rule — documented, and
    * replayed verbatim by the oracle). Every KN statistic derives from
    * the SAME (ctx, w, __c, __nv) frame [[train]] persists: the model
    * rows ARE the distinct bigrams, so the context totals c(ctx·),
    * continuation counts N1+(·w), left-diversity N1+(ctx·) and the
    * distinct-bigram total B are each one tiny re-aggregation of the
    * vocab-bounded model — all broadcastable, none touching the
    * corpus. Per-gram log2 P rounds to micro-bit longs (the house
    * fixed-point pattern), so per-doc sums are exact and
    * engine-portable. Output: (idCol, n_ngrams, avg_nll_bits), the
    * [[score]] shape. Bigram only: higher orders need the recursive
    * backoff chain, which this engine models as repeated bigram gates. */
  def scoreKneserNey(docs: DataFrame, lm: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      discount: Double = 0.75): DataFrame = {
    // bigram-only guard: an order-3+ model's contexts are space-joined
    // multi-token strings that match NO bigram (ctx, w) here — every
    // gram would silently back off to Pc and the scores would be
    // quietly meaningless. Fail loudly instead; the probe is a
    // limit(1)-short-circuited scan of the vocab-bounded model.
    require(lm.filter(col("ctx").contains(" ")).isEmpty,
      "scoreKneserNey: model must be BIGRAM (train(…, order = 2)); " +
        "found a multi-token context in the model's ctx column")
    val cCtx = lm.groupBy(col("ctx"))
      .agg(sum(col("__c")).as("__cctx"), count(lit(1)).as("__n1ctx"))
    val cont = lm.groupBy(col("w")).agg(count(lit(1)).as("__cont"))
    val tot = lm.agg(count(lit(1)).as("__b"),
      first(col("__nv")).as("__nv"))
    val ng = ngramStream(docs, textCol, idCol, 2)
    val pc = (coalesce(col("__cont"), lit(0L)) + 1).cast("double") /
      (col("__b") + col("__nv")).cast("double")
    val p = when(col("__cctx").isNull, pc)
      .otherwise((greatest(
        coalesce(col("__c"), lit(0L)).cast("double") - discount,
        lit(0.0)) +
        lit(discount) * col("__n1ctx").cast("double") * pc) /
        col("__cctx").cast("double"))
    val microBits = round(log2(p) * 1000000).cast("long")
    // every KN statistic is a re-aggregation of the vocab-bounded
    // model (see scaladoc) — broadcast them all; only the gram stream
    // is corpus-sized and it now never shuffles for these joins
    val sums = ng
      .join(broadcast(lm.drop("__nv")), Seq("ctx", "w"), "left")
      .join(broadcast(cCtx), Seq("ctx"), "left")
      .join(broadcast(cont), Seq("w"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(sum(microBits).as("__s"), count(lit(1)).as("__n"))
    finishScore(docs, sums, idCol)
  }

  /** DSIR-style importance resampling (Xie et al., NeurIPS'23, "Data
    * Selection for Language Models via Importance Resampling"): pick
    * the `k` candidate documents whose n-gram statistics look most like
    * a TARGET domain relative to the RAW pool, by Gumbel-top-k over the
    * log importance ratio λ(x) = log2 P_target(x) − log2 P_raw(x) —
    * equivalent to sampling without replacement with probability
    * ∝ 2^λ. Both λ terms are the exact micro-bit longs of [[sumBits]],
    * and the Gumbel noise is derived from the portable md5 hash of
    * (seed, id), so the draw is deterministic, layout-independent and
    * replayable in any engine. Documents too short to form a gram
    * carry no evidence and are excluded.
    *
    * Output: (idCol, log2_ratio, rank), rank 1..k by noisy score.
    * Scale shape: two broadcast-LM scoring passes (model is
    * vocab-bounded), one join on id, then global top-k — which Spark
    * executes as per-partition heaps + driver merge (TakeOrdered), not
    * a global sort. */
  /** Per-document DSIR log importance ratio in exact micro-bits:
    * (idCol, __lam) with __lam = Σ log2 P_target − Σ log2 P_raw over
    * the doc's grams, a LONG — the shared exactness substrate of
    * [[dsirTopK]] and [[dsirGate]]. ONE tokenize+explode of the corpus
    * scores BOTH models: the gram stream left-joins each model's
    * transition and context tables and the per-gram bit DIFFERENCE
    * sums in a single aggregate — exact, since Σ(t−r) over longs
    * ≡ Σt − Σr. */
  def logRatioMicroBits(docs: DataFrame, targetLm: DataFrame,
      rawLm: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      order: Int = 2): DataFrame = {
    def prep(lm: DataFrame, tag: String): (DataFrame, DataFrame, DataFrame) = (
      lm.select(col("ctx"), col("w"), col("__c").as(s"__c$tag")),
      lm.groupBy(col("ctx")).agg(sum(col("__c")).as(s"__cctx$tag")),
      lm.select(col("__nv").as(s"__nv$tag")).limit(1))
    val (tLm, tCtx, tNv) = prep(targetLm, "t")
    val (rLm, rCtx, rNv) = prep(rawLm, "r")
    def microBits(tag: String): Column =
      round(log2((coalesce(col(s"__c$tag"), lit(0L)) + 1).cast("double") /
        (coalesce(col(s"__cctx$tag"), lit(0L)) + col(s"__nv$tag"))) * 1000000)
        .cast("long")
    // both models and their context totals are vocab-bounded —
    // broadcast all four so the single gram stream never shuffles
    ngramStream(docs, textCol, idCol, order)
      .join(broadcast(tLm), Seq("ctx", "w"), "left")
      .join(broadcast(tCtx), Seq("ctx"), "left")
      .join(broadcast(rLm), Seq("ctx", "w"), "left")
      .join(broadcast(rCtx), Seq("ctx"), "left")
      .crossJoin(broadcast(tNv)).crossJoin(broadcast(rNv))
      .groupBy(col(idCol))
      .agg(sum(microBits("t") - microBits("r")).as("__lam"))
  }

  /** Threshold twin of [[dsirTopK]] for STREAMING curation: keep
    * documents whose log2 importance ratio clears `minLog2Ratio`. No
    * global view needed (a top-k is meaningless inside one
    * micro-batch, a fixed τ is not), so this drops straight into a
    * foreachBatch chain against frozen persisted LMs. The compare runs
    * on the micro-bit LONG against a pre-rounded integer threshold —
    * no float boundary to flip. Output: docs rows + `log2_ratio`. */
  def dsirGate(docs: DataFrame, targetLm: DataFrame, rawLm: DataFrame,
      minLog2Ratio: Double, textCol: String = "text",
      idCol: String = "doc_id", order: Int = 2): DataFrame = {
    val minMicro = math.round(minLog2Ratio * 1000000)
    docs.join(
      logRatioMicroBits(docs, targetLm, rawLm, textCol, idCol, order)
        .filter(col("__lam") >= lit(minMicro)),
      Seq(idCol))
      .withColumn("log2_ratio",
        round(col("__lam").cast("double") / 1000000.0, 6))
      .drop("__lam")
  }

  def dsirTopK(docs: DataFrame, targetLm: DataFrame, rawLm: DataFrame,
      k: Int, textCol: String = "text", idCol: String = "doc_id",
      order: Int = 2, seed: Long = 0L): DataFrame = {
    val lam = logRatioMicroBits(docs, targetLm, rawLm, textCol, idCol, order)
    val h = conv(substring(md5(concat(lit(seed.toString), lit(":"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val u = (h.cast("double") + 0.5) / lit((1L << 60).toDouble)
    val gumbel = -log(-log(u)) / lit(math.log(2.0))
    val top = lam
      .withColumn("__score", col("__lam").cast("double") / 1000000.0 + gumbel)
      .orderBy(col("__score").desc, col(idCol).asc)
      .limit(k)
    top
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions
        .Window.orderBy(col("__score").desc, col(idCol).asc)))
      .select(col(idCol),
        round(col("__lam").cast("double") / 1000000.0, 6).as("log2_ratio"),
        col("rank"))
  }

  /** Self-perplexity: the corpus scored under its own LM. Batch-only
    * (caches the model — [[score]] reads it three ways — and the
    * tokenized corpus, which train and score would otherwise each
    * re-tokenize); streaming callers should train once, persist, and
    * [[score]] per batch. */
  def perplexity(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", order: Int = 2): DataFrame = {
    val tk = tokenize(docs, textCol, idCol).cache()
    score(tk, train(tk, textCol, idCol, order).cache(), textCol,
      idCol, order)
  }
}
