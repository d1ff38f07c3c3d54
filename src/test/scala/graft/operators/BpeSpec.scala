package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich corpus: low×5 lower×2 newest×6 widest×3
  private def corpus = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("train reproduces the hand-derived merge sequence, ties lexicographic") {
    val (merges, vocab) = Bpe.train(corpus, numMerges = 5)
    // round 1: (e,s),(s,t),(t,</w>) all tie at 9 -> lexicographic (e,s);
    // round 2: (es,t) ties (t,</w>) at 9 -> (es,t); then (est,</w>)=9;
    // round 4: (l,o) ties (o,w) at 7 -> (l,o); round 5: (lo,w)=7
    assert(merges.map(m => (m._2, m._3)) == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    assert(merges.map(_._4) == Seq(9L, 9L, 9L, 7L, 7L))
    val sym = vocab.select("word", "symbols").as[(String, Seq[String])]
      .collect().toMap
    assert(sym("low") == Seq("low", "</w>"))
    assert(sym("lower") == Seq("low", "e", "r", "</w>"))
    assert(sym("newest") == Seq("n", "e", "w", "est</w>"))
    assert(sym("widest") == Seq("w", "i", "d", "est</w>"))
  }

  test("encode joins the vocab, falls back to chars on OOV, round-trips") {
    val (_, vocab) = Bpe.train(corpus, numMerges = 5)
    val docs = Seq((10L, "newest gadget")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, vocab).orderBy("token_idx")
      .select("word", "subwords").as[(String, Seq[String])].collect()
    assert(enc(0) == ("newest", Seq("n", "e", "w", "est</w>")))
    // "gadget" never trained: character fallback with the sentinel
    assert(enc(1) == ("gadget", "gadget".map(_.toString) :+ "</w>"))
    // every decomposition concatenates back to word + sentinel
    assert(enc.forall { case (w, ss) => ss.mkString == w + "</w>" })
  }

  test("mergePair folds leftmost-first through repeats") {
    val df = Seq(Tuple1(Seq("a", "a", "a"))).toDF("s")
    assert(df.select(Bpe.mergePair(col("s"), "a", "a"))
      .as[Seq[String]].head() == Seq("aa", "a"))
    // a freshly fused symbol does not re-merge with the next token
    val df2 = Seq(Tuple1(Seq("x", "a", "b", "b"))).toDF("s")
    assert(df2.select(Bpe.mergePair(col("s"), "a", "b"))
      .as[Seq[String]].head() == Seq("x", "ab", "b"))
  }

  test("500 merges do NOT launch 500 Spark jobs (driver-local merge loop)") {
    // 400 distinct pseudo-words (digits mapped to letters, tripled) give
    // thousands of mergeable pairs — plenty of headroom for 500 rounds
    val docs = (0 until 400).map { i =>
      val w = i.toString.map(c => ('a' + (c - '0')).toChar)
      (i.toLong, s"q$w$w$w")
    }.toDF("doc_id", "text")
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    val merges =
      try Bpe.train(docs, numMerges = 500)._1
      finally {
        // listener bus is async: wait until the count stabilizes
        var last = -1
        var spins = 0
        while (jobs != last && spins < 50) {
          last = jobs; Thread.sleep(100); spins += 1
        }
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(merges.size == 500, s"expected 500 merges, got ${merges.size}")
    assert(jobs < 50,
      s"train(numMerges=500) launched $jobs Spark jobs — merge loop is not driver-local")
  }

  test("minCount floors the dictionary; fertility counts add up") {
    val docs = corpus.union(Seq((5L, "hapax")).toDF("doc_id", "text"))
    val (_, vocab) = Bpe.train(docs, numMerges = 2, minCount = 2)
    assert(vocab.filter(col("word") === "hapax").count() == 0)
    val fert = Bpe.fertility(Bpe.encode(corpus, vocab))
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(fert.map(_._2).toSeq == Seq(5L, 2L, 6L, 3L)) // words per doc
    assert(fert.forall(r => r._3 > r._2)) // subwords strictly exceed words
  }
}
