package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-trained bigram language model + per-document self-perplexity,
  * the CCNet-style statistical quality filter (Wenzek et al., LREC'20):
  * documents whose token transitions are improbable under the corpus's
  * own LM (boilerplate, gibberish, lists) score high and can be cut at
  * a quantile.
  *
  * Shapes for 100 TB:
  *  - the bigram stream is one explode of the token arrays; counting is
  *    two hash aggregates (map-side combined) on (w1,w2) and (w1);
  *  - scoring re-joins the stream to the counts — a shuffle join keyed
  *    by the bigram, or a broadcast when the trained LM fits (it is
  *    vocab-bounded, not corpus-bounded, so it usually does after a
  *    frequency floor);
  *  - per-bigram log-probs are rounded to integer micro-bits and summed
  *    as longs (the house fixed-point pattern), so the per-doc score is
  *    exact and the DuckDB oracle compares bit-identically.
  *
  * Add-one smoothing over the corpus vocabulary:
  * P(w2 | w1) = (c(w1,w2) + 1) / (c(w1·) + |V|).
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

  /** Per-document mean negative log2-likelihood (bits per transition)
    * under the corpus bigram LM. Output: (idCol, n_bigrams,
    * avg_nll_bits) — n_bigrams 0 and a null score for docs with < 2
    * tokens. Lower is more fluent; filter at a quantile. */
  def perplexity(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bg = bigramStream(docs, textCol, idCol).cache()
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c12"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("__c1"))
    val vocab = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .agg(count_distinct(col("__t")).as("__v"))
    // exact integer ratio -> one log2 -> micro-bit long; summing longs
    // keeps the aggregate exact (and engine-portable) from here on
    val microBits: Column =
      round(log2((col("__c12") + 1).cast("double") /
        (col("__c1") + col("__v"))) * 1000000).cast("long")
    val perDoc = bg
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy(col(idCol))
      .agg(sum(microBits).as("__s"), count(lit(1)).as("__n"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_bigrams"),
        round((-col("__s")).cast("double") / 1000000.0 / col("__n"), 6)
          .as("avg_nll_bits"))
  }
}
