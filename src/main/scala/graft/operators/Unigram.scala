package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram-LM subword tokenizer (Kudo, ACL'18, "Subword
  * Regularization"; the SentencePiece unigram model) — the other
  * major tokenizer family next to [[Bpe]]: instead of greedy merges,
  * a piece VOCABULARY with unigram probabilities is fit by EM over
  * all segmentations, pruned to size, and words are encoded with the
  * Viterbi-best segmentation.
  *
  * Shapes for 100 TB (the same discipline as [[Bpe]]):
  *  - ONE corpus pass builds the (word, count) dictionary —
  *    map-side-combined, vocab-bounded, capped at `maxDictWords`,
  *    and it STAYS distributed (never collected);
  *  - the seed census is a distributed substring enumeration over the
  *    dictionary; the E-step of every EM round runs ON EXECUTORS
  *    (model broadcast, per-word lattices independent) and reduces to
  *    one vocab-sized expected-count map via exact decimal sums —
  *    order-free, so the distributed result is bit-identical run to
  *    run and to a single-threaded fold; only the vocab-sized M-step
  *    and pruning run on the driver (the corpus never re-enters);
  *  - encoding broadcasts the MODEL (vocab-sized map), segments the
  *    distinct-words frame on executors, and joins tokens against the
  *    segmentations (broadcast under 10⁵ words, word-keyed shuffle
  *    above); OOV words fall back to character pieces (single chars
  *    are never pruned, so coverage is total).
  *
  * Determinism: the seed is ranked by (count desc, piece asc); the
  *  E-step quantizes every per-word expected-count contribution to
  *  1e-12 and accumulates with EXACT BigDecimal addition, which is
  *  associative and commutative — partition count, merge order and
  *  thread schedule cannot change the totals (the same order-free
  *  trick as the house fixed-point longs, with decimal headroom
  *  because expected counts are corpus-sized); Viterbi ties prefer
  *  the longer final piece. The float-free seed census is the
  *  SQL-replayable surface (suite l96); the EM/Viterbi core is
  *  pinned by exhaustive-search property specs (UnigramSpec), the
  *  same proof pattern as the funnel DP.
  */
object Unigram {

  /** Trained model: piece → natural-log probability. */
  final case class Model(logp: Map[String, Double], maxPieceLen: Int)

  private def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("__n"))

  /** Distributed seed-vocabulary census: EVERY substring occurrence
    * (overlaps included, length ≤ maxPieceLen) of every dictionary
    * word, weighted by the word's corpus count — the exact integer
    * statistic unigram training seeds from (Kudo §3.2 seeds from
    * frequent substrings). Two explodes over the VOCAB-bounded
    * dictionary (never the corpus), one map-side-combined sum.
    * Returns (piece, cnt). */
  def seedCensus(docs: DataFrame, textCol: String = "text",
      maxPieceLen: Int = 4, minCount: Long = 1L): DataFrame =
    wordCounts(docs, textCol)
      .filter(col("__n") >= minCount)
      .select(col("word"), col("__n"),
        explode(sequence(lit(1), length(col("word")))).as("__i"))
      .select(col("word"), col("__n"), col("__i"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("__l"))
      .filter(col("__i") + col("__l") - lit(1) <= length(col("word")))
      .select(col("word").substr(col("__i"), col("__l")).as("piece"),
        col("__n"))
      .groupBy("piece").agg(sum(col("__n")).as("cnt"))

  /** log(Σ eˣ) without leaving log space. */
  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Accumulate one word's E-step contributions (forward-backward
    * posteriors over its segmentation lattice, O(len·maxPieceLen))
    * into `acc`, quantized to 1e-12 — runs per-word on EXECUTORS.
    * Exact BigDecimal addition makes the global sum independent of
    * partitioning and merge order. */
  private def accumWord(acc: EAcc, w: String, n: Long,
      logp: Map[String, Double], maxPieceLen: Int): Unit = {
    val len = w.length
    val alpha = Array.fill(len + 1)(Double.NegativeInfinity)
    val beta = Array.fill(len + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 1
    while (i <= len) {
      var l = 1
      while (l <= maxPieceLen && l <= i) {
        logp.get(w.substring(i - l, i)).foreach { lp =>
          alpha(i) = logAdd(alpha(i), alpha(i - l) + lp)
        }
        l += 1
      }
      i += 1
    }
    beta(len) = 0.0
    i = len - 1
    while (i >= 0) {
      var l = 1
      while (l <= maxPieceLen && i + l <= len) {
        logp.get(w.substring(i, i + l)).foreach { lp =>
          beta(i) = logAdd(beta(i), lp + beta(i + l))
        }
        l += 1
      }
      i -= 1
    }
    val z = alpha(len)
    if (z != Double.NegativeInfinity) {
      i = 0
      while (i < len) {
        var l = 1
        while (l <= maxPieceLen && i + l <= len) {
          val p = w.substring(i, i + l)
          logp.get(p).foreach { lp =>
            val post = math.exp(alpha(i) + lp + beta(i + l) - z)
            if (post > 0.0) {
              val c = java.math.BigDecimal.valueOf(n * post)
                .setScale(12, java.math.RoundingMode.HALF_EVEN)
              acc.update(p, acc.getOrElse(p, java.math.BigDecimal.ZERO).add(c))
            }
          }
          l += 1
        }
        i += 1
      }
    }
  }

  /** Per-partition (and merged) expected-count accumulator. */
  private type EAcc =
    scala.collection.mutable.HashMap[String, java.math.BigDecimal]

  /** Train a unigram model over the corpus word dictionary.
    *
    * One corpus pass builds the (word, count) dictionary, which stays
    * DISTRIBUTED (materialized once via localCheckpoint — every EM
    * round re-reads it without replay). Seed = the `seedSize` most
    * frequent substrings by a distributed census (plus all single
    * characters, which are never pruned — total coverage); then rounds
    * of (EM ×`emIters` → prune the lowest-expected-count multi-char
    * pieces to `pruneKeep` of the vocabulary) until ≤ `vocabSize`
    * pieces survive, and one settling EM round. Each E-step broadcasts
    * the vocab-sized model, runs every word's forward-backward lattice
    * on executors, and tree-reduces ONE vocab-sized expected-count map
    * (exact decimal sums — order-free, so distributed ≡ sequential
    * bit-for-bit); the vocab-sized M-step renormalizes on the driver.
    * Driver state is never larger than the vocabulary. Pruning by
    * expected count is the common simplification of Kudo's
    * held-out-likelihood loss (e.g. Bostrom & Durrett 2020
    * replication); the spec pins that corpus log-likelihood is
    * non-decreasing across EM iterations, which is EM's guarantee.
    */
  def train(docs: DataFrame, textCol: String = "text",
      vocabSize: Int = 200, maxPieceLen: Int = 4, seedSize: Int = 2000,
      emIters: Int = 2, pruneKeep: Double = 0.8, minCount: Long = 1L,
      maxDictWords: Int = 1 << 22): Model = {
    require(vocabSize > 0 && seedSize >= vocabSize,
      s"need seedSize ($seedSize) >= vocabSize ($vocabSize) > 0")
    require(pruneKeep > 0.0 && pruneKeep < 1.0, "pruneKeep must be in (0,1)")
    val spark = docs.sparkSession
    import spark.implicits._
    val par = spark.sparkContext.defaultParallelism
    // repartition after the top-K: TakeOrdered leaves one partition,
    // which would single-thread every EM pass
    val dictDf = wordCounts(docs, textCol)
      .filter(col("__n") >= minCount)
      .orderBy(col("__n").desc, col("word").asc)
      .limit(maxDictWords)
      .repartition(par, col("word"))
      .localCheckpoint(true)

    // distributed census (same enumeration as [[seedCensus]];
    // overlapping occurrences all count); only the vocab-sized seed
    // selection is collected
    val censusDf = dictDf
      .select(col("word"), col("__n"),
        explode(sequence(lit(1), length(col("word")))).as("__i"))
      .select(col("word"), col("__n"), col("__i"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("__l"))
      .filter(col("__i") + col("__l") - lit(1) <= length(col("word")))
      .select(col("word").substr(col("__i"), col("__l")).as("piece"),
        col("__n"))
      .groupBy("piece").agg(sum(col("__n")).as("cnt"))
      .localCheckpoint(true)
    val singles: Array[(String, Long)] = censusDf
      .filter(length(col("piece")) === 1)
      .as[(String, Long)].collect().sortBy(_._1)
    val multis: Array[(String, Long)] = censusDf
      .filter(length(col("piece")) > 1)
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(math.max(0, seedSize - singles.length))
      .as[(String, Long)].collect()
    val census: Map[String, Long] = (singles ++ multis).toMap
    var pieces: Array[String] = census.keysIterator.toArray.sorted
    var logp: collection.Map[String, Double] = {
      val tot = pieces.iterator.map(census(_)).sum.toDouble
      pieces.iterator.map(p => p -> math.log(census(p) / tot)).toMap
    }

    val dictRdd = dictDf.as[(String, Long)].rdd
    val mpl = maxPieceLen

    /** One distributed EM E-step: expected piece counts. */
    def emStep(): collection.Map[String, Double] = {
      val bLogp = spark.sparkContext.broadcast(logp.toMap)
      val agg = dictRdd.treeAggregate(new EAcc)(
        (acc, wn) => { accumWord(acc, wn._1, wn._2, bLogp.value, mpl); acc },
        (a, b) => {
          b.foreach { case (k, v) =>
            a.update(k, a.getOrElse(k, java.math.BigDecimal.ZERO).add(v))
          }
          a
        })
      bLogp.unpersist(blocking = false)
      agg.iterator.map { case (k, v) => k -> v.doubleValue }.toMap
    }

    def mStep(exp: collection.Map[String, Double]): Unit = {
      // single chars keep a floor count so coverage never dies
      val counts = pieces.map(p =>
        p -> math.max(exp.getOrElse(p, 0.0), if (p.length == 1) 1e-9 else 0.0))
      val live = counts.filter(_._2 > 0.0)
      val tot = live.iterator.map(_._2).sum
      pieces = live.map(_._1)
      logp = live.iterator.map { case (p, c) => p -> math.log(c / tot) }.toMap
    }

    var lastExp: collection.Map[String, Double] = Map.empty
    def emRound(): Unit = {
      var it = 0
      while (it < emIters) {
        val exp = emStep()
        mStep(exp)
        lastExp = exp
        it += 1
      }
    }
    emRound()
    // singles are never pruned: when the alphabet alone exceeds
    // vocabSize the loop below could never converge — stop at the
    // all-singles floor instead
    while (pieces.length > vocabSize && pieces.exists(_.length > 1)) {
      val target = math.max(vocabSize, (pieces.length * pruneKeep).toInt)
      val keepMulti = pieces.iterator.filter(_.length > 1).toArray
        .sortBy(p => (-lastExp.getOrElse(p, 0.0), p))
        .take(math.max(0, target - singles.size)).toSet
      pieces = pieces.filter(p => p.length == 1 || keepMulti(p))
      logp = {
        // renormalize the survivors before the next EM round
        val kept = pieces.map(p => p -> lastExp.getOrElse(p,
          if (p.length == 1) 1e-9 else 0.0))
        val tot = kept.iterator.map(_._2).sum
        kept.iterator.map { case (p, c) => p -> math.log(c / tot) }.toMap
      }
      emRound()
    }
    Model(logp.toMap, maxPieceLen)
  }

  /** Viterbi-best segmentation of one word under the model; ties
    * prefer the longer final piece. Words with uncovered characters
    * (possible only for chars absent from training) fall back to
    * per-character pieces. */
  def viterbi(model: Model, word: String): Array[String] = {
    val len = word.length
    val best = Array.fill(len + 1)(Double.NegativeInfinity)
    val back = Array.fill(len + 1)(0)
    best(0) = 0.0
    var i = 1
    while (i <= len) {
      var l = 1
      while (l <= model.maxPieceLen && l <= i) {
        model.logp.get(word.substring(i - l, i)).foreach { lp =>
          val s = best(i - l) + lp
          if (s > best(i) || (s == best(i) && l > back(i))) {
            best(i) = s; back(i) = l
          }
        }
        l += 1
      }
      i += 1
    }
    if (best(len) == Double.NegativeInfinity)
      return word.split("").filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = len
    while (pos > 0) {
      val l = back(pos)
      out += word.substring(pos - l, pos)
      pos -= l
    }
    out.reverseIterator.toArray
  }

  /** Viterbi log-probability of a word (the score [[viterbi]]
    * maximizes) — exposed for the exhaustive-search spec. */
  def viterbiScore(model: Model, word: String): Double = {
    val len = word.length
    val best = Array.fill(len + 1)(Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= len) {
      var l = 1
      while (l <= model.maxPieceLen && l <= i) {
        model.logp.get(word.substring(i - l, i)).foreach { lp =>
          if (best(i - l) + lp > best(i)) best(i) = best(i - l) + lp
        }
        l += 1
      }
      i += 1
    }
    best(len)
  }

  /** Dictionaries at or under this word count broadcast their
    * segmentation table to the token join; larger ones shuffle on the
    * word key instead (a 2²²-row broadcast would blow the default
    * 8GB broadcast-table limit and pin executor memory for no win —
    * past ~10⁵ words the hash side stops being "small"). */
  private[graft] val BroadcastDictMaxWords = 100000L

  /** Encode the corpus: tokenize, join each token occurrence against
    * the dictionary's precomputed Viterbi segmentation; OOV words
    * fall back to character pieces. Output one row per
    * (doc, token_idx): (idCol, token_idx, word, subwords) — the same
    * surface as [[Bpe.encode]], so [[Bpe.fertility]] reads both.
    *
    * Scale shape: the MODEL broadcasts (vocab-sized `Map` — a few
    * hundred KB even at 32k pieces) and Viterbi runs ON EXECUTORS
    * over the distinct-words frame, once per distinct word — the
    * driver never touches the dictionary (the round-8 formulation
    * collected up to 2²² words, segmented them single-threaded, and
    * broadcast a millions-of-rows frame back out). The segmentation
    * table is materialized via eager localCheckpoint (blocks are
    * ContextCleaner-reclaimed; counting it is then free) and joins
    * broadcast below [[BroadcastDictMaxWords]] words, word-keyed
    * shuffle above. */
  def encode(docs: DataFrame, model: Model, textCol: String = "text",
      idCol: String = "doc_id", maxDictWords: Int = 1 << 22): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bm = spark.sparkContext.broadcast(model)
    val seg = wordCounts(docs, textCol)
      .orderBy(col("__n").desc, col("word").asc)
      .limit(maxDictWords)
      .select("word").as[String]
      .mapPartitions { it =>
        val m = bm.value
        it.map(w => (w, viterbi(m, w)))
      }
      .toDF("word", "pieces")
      .localCheckpoint(true)
    val dictSide =
      if (seg.count() <= BroadcastDictMaxWords) broadcast(seg) else seg
    docs
      .select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("token_idx", "word")))
      .join(dictSide, Seq("word"), "left")
      .select(col(idCol), col("token_idx"), col("word"),
        coalesce(col("pieces"),
          filter(split(col("word"), ""), s => length(s) > 0))
          .as("subwords"))
  }
}
