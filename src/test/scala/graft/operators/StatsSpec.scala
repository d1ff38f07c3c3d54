package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the statistical aggregates against hand-computed and
  * closed-form references so the oracled suite queries (h22-h25)
  * can't silently drift: Welch t vs a direct scalar computation,
  * Mann-Whitney's doubled-U identity and a textbook example,
  * Cramér's V bounds and the perfect-association case, and
  * least-squares recovering an exactly-planted line. */
class StatsSpec extends SparkSpec {

  import spark.implicits._

  test("welchT matches a direct scalar computation") {
    val a = Seq(100L, 200L, 300L, 400L, 500L)
    val b = Seq(150L, 250L, 350L)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "cents")
    val row = Stats.welchT(df, col("cents"), col("g"), "a", "b")
      .collect().head
    assert(row.getAs[Long]("n_a") == 5 && row.getAs[Long]("n_b") == 3)
    // direct computation
    def meanVar(xs: Seq[Long]) = {
      val n = xs.size.toDouble
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (m, v, n)
    }
    val (ma, va, na) = meanVar(a)
    val (mb, vb, nb) = meanVar(b)
    val se = va / na + vb / nb
    val t = (ma - mb) / math.sqrt(se)
    val dfw = se * se /
      (va / na * (va / na) / (na - 1) + vb / nb * (vb / nb) / (nb - 1))
    assert(math.abs(row.getAs[Double]("t") - t) < 1e-5)
    assert(math.abs(row.getAs[Double]("df") - dfw) < 1e-5)
  }

  test("mannWhitneyU: doubled-U identity and a textbook example") {
    // example with ties: a = [1,2,2,5], b = [2,3,4]
    val df = (Seq(1L, 2L, 2L, 5L).map(("a", _)) ++
      Seq(2L, 3L, 4L).map(("b", _))).toDF("g", "v")
    val r = Stats.mannWhitneyU(df, col("v"), col("g"), "a", "b")
      .collect().head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    val (u2a, u2b) = (r.getAs[Long]("u2_a"), r.getAs[Long]("u2_b"))
    assert(na == 4 && nb == 3)
    // ranks: 1→1; the three 2s share (2+3+4)/3 = 3; 3→5; 4→6; 5→7
    // R_a = 1 + 3 + 3 + 7 = 14 → U_a = 14 − 4·5/2 = 4 → 2U_a = 8
    assert(u2a == 8L)
    assert(u2a + u2b == 2 * na * nb)
  }

  test("mannWhitneyU identity holds on a pseudo-random mix") {
    val rows = (1 to 200).map { i =>
      (if (i % 3 == 0) "a" else "b", (i * 7919 % 41).toLong)
    }
    val r = Stats
      .mannWhitneyU(rows.toDF("g", "v"), col("v"), col("g"), "a", "b")
      .collect().head
    assert(r.getAs[Long]("u2_a") + r.getAs[Long]("u2_b") ==
      2 * r.getAs[Long]("n_a") * r.getAs[Long]("n_b"))
  }

  test("cramersV: perfect association → 1, independence → 0") {
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"),
      ("z", "r"), ("z", "r")).toDF("a", "b")
    val v1 = Stats.cramersV(perfect, col("a"), col("b"))
      .collect().head.getAs[Double]("v")
    assert(math.abs(v1 - 1.0) < 1e-9)
    // independent: every (a,b) combination equally frequent
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q", "r");
      _ <- 1 to 4 } yield (a, b)).toDF("a", "b")
    val r0 = Stats.cramersV(indep, col("a"), col("b")).collect().head
    assert(math.abs(r0.getAs[Double]("chi2")) < 1e-6)
    assert(math.abs(r0.getAs[Double]("v")) < 1e-6)
  }

  test("corrCovar: planted ±1 correlation; zero variance → null corr") {
    val rows =
      (1L to 10L).map(i => ("up", i, 3 * i + 5)) ++
      (1L to 10L).map(i => ("down", i, -2 * i)) ++
      (1L to 5L).map(i => ("const", i, 7L))
    val out = Stats.corrCovar(rows.toDF("g", "x", "y"), col("x"),
        col("y"), col("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(math.abs(out("up").getAs[Double]("corr") - 1.0) < 1e-9)
    assert(math.abs(out("down").getAs[Double]("corr") + 1.0) < 1e-9)
    assert(out("const").isNullAt(3), "zero y-variance → null corr")
    // covar of (i, 3i+5) = 3·var(i); var(1..10) sample = 55/6
    assert(math.abs(out("up").getAs[Double]("covar_samp") - 27.5) < 1e-6)
  }

  test("weightedQuantile: ⌈q·W⌉ threshold semantics, per group") {
    // g: values 1..4 with weights 1,1,1,7 (W=10): p50 threshold
    // ⌈5⌉=5 → first value with cum ≥ 5 is 4; p10 threshold 1 → 1
    val df = Seq(("g", 1L, 1L), ("g", 2L, 1L), ("g", 3L, 1L),
      ("g", 4L, 7L), ("h", 9L, 3L)).toDF("g", "v", "w")
    val out = Stats.weightedQuantile(df, col("v"), col("w"), col("g"),
        Seq(("p10", 1, 10), ("p50", 1, 2), ("p100", 1, 1)))
      .collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(g.getAs[Long]("p10") == 1L)
    assert(g.getAs[Long]("p50") == 4L)
    assert(g.getAs[Long]("p100") == 4L)
    assert(out("h").getAs[Long]("p50") == 9L)
  }

  test("weightedQuantile equals unweighted quantile when weights=1") {
    val vals = Seq(5L, 1L, 3L, 2L, 4L) // sorted: 1 2 3 4 5; median 3
    val df = vals.map(("g", _, 1L)).toDF("g", "v", "w")
    val r = Stats.weightedQuantile(df, col("v"), col("w"), col("g"),
      Seq(("p50", 1, 2))).collect().head
    assert(r.getAs[Long]("p50") == 3L)
  }

  test("entropyMicroBits: uniform → log2(k), single key → 0") {
    val uniform = (1 to 80).map(i => ("u", s"k${i % 8}"))
    val single = (1 to 10).map(_ => ("s", "only"))
    val out = Stats.entropyMicroBits((uniform ++ single).toDF("g", "k"),
        col("k"), col("g"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("u") == 3000000L) // log2(8) = 3 bits exactly
    assert(out("s") == 0L)
  }

  test("spearman: monotone map → 1, reversal → -1, ties averaged") {
    // y = x³ is nonlinear but strictly monotone: Pearson < 1, rho = 1
    val mono = (1L to 20L).map(x => ("up", x, x * x * x))
    val rev = (1L to 20L).map(x => ("down", x, -x))
    val out = Stats.spearman((mono ++ rev).toDF("g", "x", "y"),
        col("x"), col("y"), col("g"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rho")).toMap
    assert(out("up") == 1.0, s"monotone must give rho=1: $out")
    assert(out("down") == -1.0, s"reversal must give rho=-1: $out")
    // tie handling: doubled average ranks must equal the textbook
    // half-rank computation (x ties in the middle block)
    val tied = Seq(("t", 1L, 10L), ("t", 2L, 20L), ("t", 2L, 30L),
      ("t", 3L, 40L))
    val rho = Stats.spearman(tied.toDF("g", "x", "y"), col("x"),
      col("y"), col("g")).collect().head.getAs[Double]("rho")
    // ranks x: 1, 2.5, 2.5, 4; y: 1,2,3,4 → rho = 0.948683 (6dp)
    assert(math.abs(rho - 0.948683) < 1e-6, s"got $rho")
  }

  test("ksTest: identical samples → D=0 p=1; disjoint → D=1 p~0") {
    val same = (1L to 50L).flatMap(v => Seq(("a", v), ("b", v)))
    val r1 = Stats.ksTest(same.toDF("g", "v"), col("v"), col("g"),
      "a", "b").collect().head
    assert(r1.getAs[Long]("d_micro") == 0L)
    assert(r1.getAs[Double]("p_asymptotic") == 1.0)
    val disjoint = (1L to 50L).map(v => ("a", v)) ++
      (100L to 149L).map(v => ("b", v))
    val r2 = Stats.ksTest(disjoint.toDF("g", "v"), col("v"), col("g"),
      "a", "b").collect().head
    assert(r2.getAs[Long]("d_micro") == 1000000L)
    assert(r2.getAs[Double]("p_asymptotic") < 1e-9)
  }

  test("skewKurt: symmetric → skew 0; known asymmetric case; flat → null") {
    // symmetric around 0: skew exactly 0; two-point ±1 has kurt 1
    val sym = Seq(-1L, 1L, -1L, 1L).map(("s", _))
    // {0,0,0,4}: deviations {-1,-1,-1,3} → m2=3, m3=6, m4=21
    // → skew 6/3^1.5, kurt 21/9
    val asym = Seq(0L, 0L, 0L, 4L).map(("a", _))
    val flat = Seq(7L, 7L).map(("f", _))
    val out = Stats.skewKurt((sym ++ asym ++ flat).toDF("g", "x"),
        col("x"), col("g"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("s").getAs[Double]("skew_pop") == 0.0)
    assert(out("s").getAs[Double]("kurt_pop") == 1.0)
    assert(math.abs(out("a").getAs[Double]("skew_pop")
      - 6.0 / math.pow(3.0, 1.5)) < 1e-6)
    assert(math.abs(out("a").getAs[Double]("kurt_pop") - 21.0 / 9.0) < 1e-6)
    assert(out("f").isNullAt(2) && out("f").isNullAt(3))
  }

  test("linFit recovers an exactly planted line; degenerate x → null") {
    val pts = (0L to 10L).map(x => ("g", x, 300L * x + 700L)) ++
      Seq(("flat", 5L, 100L), ("flat", 5L, 200L))
    val out = Stats.linFit(pts.toDF("g", "x", "y"), col("x"), col("y"),
      col("g")).collect().map(r => r.getString(0) -> r).toMap
    val g = out("g")
    assert(math.abs(g.getAs[Double]("slope") - 300.0) < 1e-9)
    assert(math.abs(g.getAs[Double]("intercept") - 700.0) < 1e-9)
    assert(out("flat").isNullAt(2) && out("flat").isNullAt(3))
  }
}
