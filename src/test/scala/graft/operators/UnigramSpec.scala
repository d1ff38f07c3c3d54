package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram tokenizer: Viterbi proved against exhaustive segmentation
  * search, EM's likelihood guarantee pinned, coverage total, encode
  * deterministic and distributed. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** All segmentations of `w` into pieces of length ≤ maxLen. */
  private def allSegs(w: String, maxLen: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, w.length)).flatMap { l =>
      allSegs(w.drop(l), maxLen).map(w.take(l) +: _)
    }

  private def corpus(rows: Seq[String]) =
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("viterbi attains the exhaustive-search optimum on every short word") {
    val docs = corpus(Seq(
      "the cat sat on the mat", "the bat and the cat chat",
      "that hat is flat", "a tan van ran at a can"))
    val model = Unigram.train(docs, vocabSize = 30, seedSize = 60,
      maxPieceLen = 3)
    val words = docs.select(explode(split(col("text"), " ")))
      .distinct().as[String].collect()
    words.filter(_.length <= 8).foreach { w =>
      val exhaustive = allSegs(w, model.maxPieceLen)
        .filter(_.forall(model.logp.contains))
        .map(seg => seg.map(model.logp).sum)
      if (exhaustive.nonEmpty) {
        val best = exhaustive.max
        val got = Unigram.viterbiScore(model, w)
        assert(math.abs(got - best) < 1e-9,
          s"$w: viterbi $got != exhaustive best $best")
        // and the returned segmentation realizes that score
        val seg = Unigram.viterbi(model, w)
        assert(seg.mkString == w, s"$w: segmentation must concatenate back")
        assert(math.abs(seg.map(model.logp).sum - best) < 1e-9,
          s"$w: returned pieces must score the optimum")
      }
    }
  }

  test("EM never decreases corpus log-likelihood across iterations") {
    val docs = corpus(Seq(
      "abab abab baba", "abba baab abab", "aabb bbaa abab"))
    // run training at increasing emIters with NO pruning pressure
    // (vocab larger than the seed survivors): more EM on the same
    // support can only raise the likelihood — evaluate each model on
    // the corpus words under Viterbi-free full-lattice scoring
    def corpusLl(m: Unigram.Model): Double = {
      val words = docs.select(explode(split(col("text"), " ")))
        .as[String].collect()
      // full-lattice word probability via the same forward pass
      words.map { w =>
        val len = w.length
        val a = Array.fill(len + 1)(Double.NegativeInfinity)
        a(0) = 0.0
        for (i <- 1 to len; l <- 1 to math.min(m.maxPieceLen, i))
          m.logp.get(w.substring(i - l, i)).foreach { lp =>
            a(i) = if (a(i) == Double.NegativeInfinity) a(i - l) + lp
              else math.max(a(i), a(i - l) + lp) +
                math.log1p(math.exp(-math.abs(a(i) - (a(i - l) + lp))))
          }
        a(len)
      }.sum
    }
    val lls = Seq(1, 2, 4, 8).map { it =>
      corpusLl(Unigram.train(docs, vocabSize = 50, seedSize = 50,
        maxPieceLen = 3, emIters = it))
    }
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"EM must not decrease likelihood: $lls")
    }
  }

  test("coverage is total: every corpus word encodes, OOV falls to chars") {
    val docs = corpus(Seq("hello world", "hello again"))
    val model = Unigram.train(docs, vocabSize = 20, seedSize = 40)
    val enc = Unigram.encode(docs, model)
    assert(enc.filter(size(col("subwords")) === 0).count() == 0)
    // concatenation invariant across the whole corpus
    val bad = enc.filter(
      concat_ws("", col("subwords")) =!= col("word")).count()
    assert(bad == 0, "subwords must concatenate back to the word")
    // a word never seen in training still encodes (char fallback)
    val oov = corpus(Seq("zzzqqq"))
    val encOov = Unigram.encode(oov, model)
    assert(encOov.count() == 1)
    assert(encOov.select(concat_ws("", col("subwords")))
      .as[String].collect().head == "zzzqqq")
  }

  test("training is layout-independent: 1 partition ≡ 16 partitions, bit-for-bit") {
    // the distributed E-step accumulates exact 1e-12-quantized decimal
    // contributions, so partition count and merge order must not change
    // the model AT ALL — the property that makes distributed training
    // reproducible on any cluster layout
    val texts = (0 until 60).map(i =>
      s"alpha${i % 7} beta${i % 5} alphabeta gamma${i % 3} abab baba")
    val one = Unigram.train(corpus(texts).repartition(1),
      vocabSize = 40, seedSize = 80, maxPieceLen = 3, emIters = 3)
    val many = Unigram.train(corpus(texts).repartition(16),
      vocabSize = 40, seedSize = 80, maxPieceLen = 3, emIters = 3)
    assert(one.logp == many.logp,
      s"layout must not change the model; diff keys: " +
        s"${(one.logp.keySet diff many.logp.keySet) ++
          (many.logp.keySet diff one.logp.keySet)}; " +
        s"value diffs: ${one.logp.collect { case (k, v)
          if many.logp.get(k).exists(_ != v) => k }.take(5)}")
  }

  test("training is deterministic and frequent substrings become pieces") {
    val docs = corpus(Seq.fill(20)("lowlow lowerlower newestnewest"))
    val m1 = Unigram.train(docs, vocabSize = 25, seedSize = 50)
    val m2 = Unigram.train(docs, vocabSize = 25, seedSize = 50)
    assert(m1.logp == m2.logp, "same corpus, same params → same model")
    assert(m1.logp.size <= 25)
    assert(m1.logp.keys.exists(_.length > 1),
      s"repetitive corpus must keep multi-char pieces: ${m1.logp.keys}")
    // fertility under the trained model beats per-char encoding
    val fert = Bpe.fertility(Unigram.encode(docs, m1))
      .agg(sum("n_subwords"), sum("n_words")).collect().head
    val chars = docs.select(sum(length(regexp_replace(col("text"), " ", ""))))
      .collect().head.getLong(0)
    assert(fert.getLong(0) < chars,
      "trained pieces must beat the char baseline")
  }

  test("seedCensus counts overlapping occurrences, weighted by word count") {
    val docs = corpus(Seq("aaa ab", "aaa", "ab ab"))
    // words: aaa ×2, ab ×3
    val got = Unigram.seedCensus(docs, maxPieceLen = 4)
      .as[(String, Long)].collect().toMap
    assert(got("a") == 2 * 3 + 3 * 1) // 3 per 'aaa', 1 per 'ab'
    assert(got("aa") == 2 * 2) // overlap: two 'aa' in each 'aaa'
    assert(got("aaa") == 2)
    assert(got("ab") == 3)
    assert(got("b") == 3)
  }
}
