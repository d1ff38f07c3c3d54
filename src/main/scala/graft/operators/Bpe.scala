package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding subword tokenizer (Sennrich et al., ACL'16,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the tokenization step of a training-data pipeline, built so the
  * expensive part never touches the corpus twice.
  *
  * Shapes for 100 TB:
  *  - ONE corpus pass builds the word dictionary (word, count) — a
  *    map-side-combined aggregate; everything after operates on the
  *    dictionary, which is VOCAB-bounded (millions of rows), not
  *    corpus-bounded (billions).
  *  - each merge round is one small aggregate over the dict (adjacent
  *    pair counts weighted by word frequency) + a 1-row argmax to the
  *    driver + one column-algebra rewrite of the symbol arrays. The
  *    dict is localCheckpoint'ed per round so N rounds never stack N
  *    nested lambda expressions into one codegen unit.
  *  - encoding the corpus is tokenize + broadcast join against the
  *    trained (word → subwords) dictionary — no per-row merge replay;
  *    out-of-vocabulary words fall back to character symbols, the
  *    standard open-vocab behavior.
  *
  * Merges apply leftmost-first within a word (a left fold over the
  * symbol array), and count ties break lexicographically on (left,
  * right) — both choices pin the model to a single deterministic
  * answer for any input, so training is reproducible run-to-run.
  * Words carry the `</w>` end-of-word sentinel as a final symbol, so
  * subwords distinguish "er" mid-word from "er</w>" word-final.
  */
object Bpe {

  private val EOW = "</w>"

  /** (word, n) over the whitespace-lowered token stream — the one
    * corpus-sized pass. */
  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("__n"))

  /** Initial symbol decomposition: characters + the `</w>` sentinel. */
  private def charSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EOW)))

  /** Merge every adjacent (a, b) into the fused symbol, leftmost
    * first: a left fold — if the accumulator ends with `a` and the
    * next symbol is `b`, replace the tail, else append. Exposed for
    * replaying merges on out-of-band words. */
  def mergePair(symbols: Column, a: String, b: String): Column =
    aggregate(symbols, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === a && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Train a BPE model: returns (merges, vocab).
    *  - merges: (merge_rank, left, right, pair_count) — the ordered
    *    merge table, the portable model artifact;
    *  - vocab: (word, __n, symbols) — every corpus word with its final
    *    subword decomposition, the broadcast side of [[encode]].
    * `minCount` floors the dictionary (hapax words can't influence
    * merges and would balloon the dict at web scale). */
  def train(docs: DataFrame, textCol: String = "text", numMerges: Int = 50,
      minCount: Long = 1L): (Seq[(Int, String, String, Long)], DataFrame) = {
    var dict = wordCounts(docs, textCol)
      .filter(col("__n") >= minCount)
      .select(col("word"), col("__n"), charSymbols(col("word")).as("symbols"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var done = false
    for (r <- 0 until numMerges if !done) {
      // adjacent-pair census, weighted by word frequency; ties break
      // lexicographically so the model is a pure function of the corpus
      val best = dict
        .select(col("__n"), posexplode(slice(col("symbols"), lit(1),
          size(col("symbols")) - 1)).as(Seq("__i", "__a")),
          col("symbols"))
        .select(col("__n"), col("__a"),
          element_at(col("symbols"), col("__i") + 2).as("__b"))
        .groupBy(col("__a"), col("__b")).agg(sum(col("__n")).as("__c"))
        .orderBy(col("__c").desc, col("__a").asc, col("__b").asc)
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((r, a, b, c))
        dict = dict.withColumn("symbols", mergePair(col("symbols"), a, b))
          .localCheckpoint()
      }
    }
    (merges.result(), dict)
  }

  /** Subword-encode a corpus against a trained vocab: tokenize, then a
    * broadcast join on the word (the dict is vocab-bounded); words the
    * training floor dropped fall back to character symbols. Output:
    * (idCol, token_idx, word, subwords). */
  def encode(docs: DataFrame, vocab: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("token_idx", "word")))
      .join(broadcast(vocab.select(col("word"), col("symbols"))),
        Seq("word"), "left")
      .select(col(idCol), col("token_idx"), col("word"),
        coalesce(col("symbols"), charSymbols(col("word"))).as("subwords"))

  /** Corpus subword statistics under a trained model — the vocabulary
    * coverage / fertility numbers a tokenizer report needs: one row per
    * doc with subword and word totals. */
  def fertility(encoded: DataFrame, idCol: String = "doc_id"): DataFrame =
    encoded.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(size(col("subwords"))).as("n_subwords"))
}
