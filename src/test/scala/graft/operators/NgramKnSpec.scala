package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Kneser-Ney scoring against a driver-side replication of the exact
  * formula from hand-counted statistics — every branch exercised:
  * seen bigram (discounted + interpolated), unseen bigram in a seen
  * context (interpolation only), unseen context (continuation
  * backoff), and a word never seen as a continuation (add-one
  * floor). */
class NgramKnSpec extends SparkSpec {
  import spark.implicits._

  // training corpus: "a b a c a" -> (a,b)(b,a)(a,c)(c,a);
  // "b a b a" -> (b,a)(a,b)(b,a)
  private val train = Seq(
    (0L, "a b a c a"),
    (2L, "b a b a")).toDF("doc_id", "text")

  // hand counts: c12 = {(a,b):2,(a,c):1,(b,a):3,(c,a):1}
  //   cctx(a)=3 n1ctx(a)=2; cctx(b)=3 n1ctx(b)=1; cctx(c)=1 n1ctx(c)=1
  //   cont(b)=1, cont(c)=1, cont(a)=2; B=4; V=3
  private val D = 0.75
  private val B = 4L
  private val V = 3L
  private def pc(cont: Long): Double = (cont + 1).toDouble / (B + V).toDouble
  private def pSeen(c: Long, cctx: Long, n1ctx: Long, cont: Long): Double =
    (math.max(c.toDouble - D, 0.0) + D * n1ctx.toDouble * pc(cont)) /
      cctx.toDouble
  private def bits(p: Double): Long =
    math.round(math.log(p) / math.log(2.0) * 1000000)

  test("every KN branch matches the hand-computed statistic") {
    val lm = NgramLm.train(train).cache()
    val probes = Seq(
      (10L, "a b"),       // seen bigram
      (11L, "a a"),       // unseen bigram, seen context a (cont(a)=2)
      (12L, "z b"),       // unseen context -> Pc(b)
      (13L, "a z"),       // unseen continuation in seen context -> floor
      (14L, "a b a"))     // two grams: (a,b) + (b,a)
      .toDF("doc_id", "text")
    val got = NgramLm.scoreKneserNey(probes, lm)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .toMap

    def nll(micro: Long*) : Double = {
      val s = micro.sum
      BigDecimal(-s.toDouble / 1e6 / micro.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val pAB = pSeen(2, 3, 2, 1)            // (a,b)
    val pAA = pSeen(0, 3, 2, 2)            // (a,a): c=0, cont(a)=2
    val pZB = pc(1)                        // unseen ctx z -> Pc(b)
    val pAZ = pSeen(0, 3, 2, 0)            // (a,z): cont(z)=0 -> floor
    val pBA = pSeen(3, 3, 1, 2)            // (b,a)
    assert(got(10L) == ((1L, nll(bits(pAB)))))
    assert(got(11L) == ((1L, nll(bits(pAA)))))
    assert(got(12L) == ((1L, nll(bits(pZB)))))
    assert(got(13L) == ((1L, nll(bits(pAZ)))))
    assert(got(14L) == ((2L, nll(bits(pAB), bits(pBA)))))
    // sanity: the frequent transition is cheaper than the floored one
    assert(pAB > pAZ && pAB > pAA)
  }

  test("a non-bigram model is rejected loudly, not silently backed off") {
    // an order-3 model's ctx values ('a b') match NO bigram gram —
    // every probe would silently fall back to Pc and score garbage
    val lm3 = NgramLm.train(train, order = 3)
    val e = intercept[IllegalArgumentException] {
      NgramLm.scoreKneserNey(Seq((30L, "a b a")).toDF("doc_id", "text"), lm3)
    }
    assert(e.getMessage.contains("BIGRAM"), e.getMessage)
  }

  test("docs too short to form a bigram report 0 grams and a null score") {
    val lm = NgramLm.train(train)
    val got = NgramLm.scoreKneserNey(
        Seq((20L, "single")).toDF("doc_id", "text"), lm)
      .collect().head
    assert(got.getLong(1) == 0L && got.isNullAt(2))
  }
}
