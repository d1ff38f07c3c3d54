package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-trained bigram language model + per-document perplexity
  * scoring, the CCNet-style statistical quality filter (Wenzek et al.,
  * LREC'20): documents whose token transitions are improbable under a
  * reference LM (boilerplate, gibberish, lists) score high and can be
  * cut at a quantile. The production shape is [[train]] once on a
  * trusted reference corpus, then [[score]] any stream of candidate
  * documents against the frozen model; [[perplexity]] is the
  * self-scoring special case (corpus scores itself).
  *
  * Shapes for 100 TB:
  *  - the bigram stream is one explode of the token arrays; training is
  *    one hash aggregate (map-side combined) on (w1,w2);
  *  - scoring joins the stream to the model — a shuffle join keyed by
  *    the bigram, or a broadcast when the trained LM fits (it is
  *    vocab-bounded, not corpus-bounded, so it usually does after a
  *    frequency floor); context totals c(w1·) are re-derived from the
  *    model itself, so the persisted artifact is one narrow table;
  *  - per-bigram log-probs are rounded to integer micro-bits and summed
  *    as longs (the house fixed-point pattern), so the per-doc score is
  *    exact and the DuckDB oracle compares bit-identically.
  *
  * Add-one smoothing over the training vocabulary:
  * P(w2 | w1) = (c(w1,w2) + 1) / (c(w1·) + |V|); transitions never seen
  * in training fall back to c=0 under the same formula.
  */
object NgramLm {

  /** One row per bigram occurrence: (id, w1, w2). Documents with fewer
    * than two tokens contribute no rows. */
  private def bigramStream(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__tk"))
      .select(col(idCol),
        explode(when(size(col("__tk")) >= 2,
          zip_with(
            slice(col("__tk"), lit(1), size(col("__tk")) - 1),
            slice(col("__tk"), lit(2), size(col("__tk")) - 1),
            (a, b) => struct(a.as("w1"), b.as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("__bg"))
      .select(col(idCol), col("__bg.w1"), col("__bg.w2"))

  /** Train a bigram LM: one row per distinct transition,
    * (w1, w2, __c12), plus the training vocabulary size as a constant
    * __nv column (part of the model — smoothing must use the TRAINING
    * vocab no matter what corpus is scored later). Persist with a plain
    * parquet write; vocab-bounded, so it broadcasts in [[score]]. */
  def train(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .agg(count_distinct(col("__t")).as("__nv"))
    bigramStream(docs, textCol, idCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c12"))
      .crossJoin(broadcast(vocab))
  }

  /** Per-document mean negative log2-likelihood (bits per transition)
    * of `docs` under a trained model. Output: (idCol, n_bigrams,
    * avg_nll_bits) — n_bigrams 0 and a null score for docs with < 2
    * tokens. Lower is more fluent; filter at a quantile. */
  def score(docs: DataFrame, lm: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // context totals are implied by the model: c(w1·) = Σ_w2 c(w1,w2)
    val c1 = lm.groupBy(col("w1")).agg(sum(col("__c12")).as("__c1"))
    val nv = lm.select(col("__nv")).limit(1)
    val bg = bigramStream(docs, textCol, idCol)
    // exact integer ratio -> one log2 -> micro-bit long; summing longs
    // keeps the aggregate exact (and engine-portable) from here on
    val microBits: Column =
      round(log2((coalesce(col("__c12"), lit(0L)) + 1).cast("double") /
        (coalesce(col("__c1"), lit(0L)) + col("__nv"))) * 1000000)
        .cast("long")
    val perDoc = bg
      .join(lm.drop("__nv"), Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(nv))
      .groupBy(col(idCol))
      .agg(sum(microBits).as("__s"), count(lit(1)).as("__n"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_bigrams"),
        round((-col("__s")).cast("double") / 1000000.0 / col("__n"), 6)
          .as("avg_nll_bits"))
  }

  /** Self-perplexity: the corpus scored under its own LM. Batch-only
    * (caches the model — [[score]] reads it three ways); streaming
    * callers should train once, persist, and [[score]] per batch. */
  def perplexity(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    score(docs, train(docs, textCol, idCol).cache(), textCol, idCol)
}
