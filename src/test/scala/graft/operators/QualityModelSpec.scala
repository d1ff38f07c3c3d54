package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private def sample = {
    val clean = Seq(
      "the cat sat on the mat and looked out of the window for a while",
      "a short story about the sea and the ships that sail on it",
      "in the morning the town is quiet and the air is cold and clear",
      "the engineers wrote a report on the state of the bridge for review",
      "that evening the family sat down to a meal of bread and soup")
    val junk = Seq(
      "$$$ ### !!! %%% ^^^ &&& *** ((( ))) @@@ ~~~ ???",
      "buy buy buy buy buy buy buy buy buy buy buy buy",
      "xxxxxxxxxxxxxxxxxxx yyyyyyyyyyyyyyyy zzzzzzzzzzzz",
      "!!!! click click click click here here here here !!!!",
      "@@ ## $$ %% ^^ && ** (( )) __ ++ == ;; :: ,, .. //")
    (clean.map((_, 1.0)) ++ junk.map((_, 0.0))).toDF("text", "label")
  }

  test("rocAuc: perfect, inverted, all-tied, and brute-force cross-check") {
    def auc(pairs: Seq[(Long, Int)]): Option[Double] = {
      val r = QualityModel.rocAuc(pairs.toDF("s", "y"), col("s"), col("y"))
        .collect().head
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    assert(auc(Seq((9L, 1), (8L, 1), (2L, 0), (1L, 0))).contains(1.0))
    assert(auc(Seq((1L, 1), (2L, 1), (8L, 0), (9L, 0))).contains(0.0))
    assert(auc(Seq((5L, 1), (5L, 0), (5L, 1), (5L, 0))).contains(0.5))
    assert(auc(Seq((1L, 1), (2L, 1))).isEmpty, "single class -> null")
    // brute-force pair identity on a mixed case with ties
    val data = Seq((3L, 1), (3L, 0), (7L, 1), (1L, 0), (5L, 0), (9L, 1),
      (5L, 1), (1L, 1))
    val pos = data.filter(_._2 == 1).map(_._1)
    val neg = data.filter(_._2 == 0).map(_._1)
    val expected = pos.flatMap(p => neg.map(n =>
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0)).sum / (pos.size * neg.size)
    assert(auc(data).contains(expected))
  }

  test("calibrationBins: exact counts, rates, and top-edge clamping") {
    val rows = Seq(
      (0.05, 0), (0.08, 0), (0.15, 0), (0.18, 1),
      (0.95, 1), (0.99, 1), (1.0, 1)) // 1.0 clamps into bin 9
      .toDF("s", "y")
    val got = QualityModel.calibrationBins(rows, col("s"), col("y"),
        bins = 10)
      .orderBy("bin")
      .select("bin", "n", "pos_rate")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got == Seq((0, 2L, 0.0), (1, 2L, 0.5), (9, 3L, 1.0)))
    val means = QualityModel.calibrationBins(rows, col("s"), col("y"), 10)
      .orderBy("bin").select("mean_score").as[Double].collect()
    assert(math.abs(means(0) - 0.065) < 1e-9)
  }

  test("psi: identical distributions score 0; a shifted one scores large") {
    val a = (1 to 100).map(i => (i % 10) / 10.0 + 0.05).toDF("s")
    val same = QualityModel.psi(a, a, col("s")).collect().head
    assert(same.getDouble(0) == 0.0, "identical slices: exactly zero")
    assert(same.getLong(1) == 100L && same.getLong(2) == 100L)
    // b concentrates all mass in the top bin
    val b = (1 to 100).map(_ => 0.95).toDF("s")
    val shifted = QualityModel.psi(a, b, col("s")).collect().head.getDouble(0)
    assert(shifted > 0.25, s"gross shift must clear the alert bar: $shifted")
    // symmetric by construction: psi(a,b) == psi(b,a)
    val rev = QualityModel.psi(b, a, col("s")).collect().head.getDouble(0)
    assert(math.abs(shifted - rev) < 1e-9)
  }

  test("train separates weak labels; column score == MLlib probability") {
    val (b, w) = QualityModel.train(sample, "text", "label")
    val scored = sample
      .withColumn("score", QualityModel.score(col("text"), w, b))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2))
    val clean = scored.filter(_._1 == 1.0).map(_._2)
    val junk = scored.filter(_._1 == 0.0).map(_._2)
    // full separation on the training set: the features carry the signal
    assert(clean.min > junk.max,
      s"clean ${clean.min} must outscore junk ${junk.max}")

    // the column-algebra sigmoid must reproduce MLlib's own probability
    // (same weights, same features) — pins the scoring path to the model
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val data = sample.select(col("label"),
      array_to_vector(QualityModel.features(col("text"))).as("features"))
    val model = new LogisticRegression().setMaxIter(100).setRegParam(0.01)
      .fit(data)
    val both = model.transform(data)
      .select(vector_to_array(col("probability")).getItem(1).as("p_ml"))
      .collect().map(_.getDouble(0))
      .zip(sample.select(
        QualityModel.score(col("text"), w, b)).collect().map(_.getDouble(0)))
    both.foreach { case (pMl, pCol) =>
      assert(math.abs(pMl - pCol) < 1e-9, s"$pMl vs $pCol")
    }
  }

  test("features are bounded and handle degenerate docs") {
    val edge = Seq("", "   ", "word", "!!!", "a a a a a a").toDF("text")
    val rows = edge.select(QualityModel.features(col("text")).as("f"))
      .collect().map(_.getSeq[Double](0))
    rows.foreach { f =>
      assert(f.length == QualityModel.featureNames.length)
      assert(f.forall(v => !v.isNaN && !v.isInfinite), f.mkString(","))
      // the three fraction features stay in [0, 1]
      assert(f(2) >= 0 && f(2) <= 1)
      assert(f(3) >= 0 && f(3) <= 1)
      assert(f(4) >= 0 && f(4) <= 1)
    }
    // empty doc: zero tokens -> log_tokens 0, fractions 0
    assert(rows.head == Seq(0.0, 0.0, 0.0, 0.0, 0.0))
  }

  test("scoring is map-only: no exchange in the physical plan") {
    val docs = Seq((1L, "some document text here")).toDF("doc_id", "text")
    val plan = docs.select(col("doc_id"),
        QualityModel.score(col("text"), Seq(0.3, -0.1, 1.2, -2.0, -1.5), -0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("confusion panel: counts, P/R/F1 and kappa against hand values") {
    // tp=4 fp=1 fn=2 tn=3 (n=10): precision 0.8, recall 2/3,
    // F1 = 8/11, kappa = (10*7 - (5*6+5*4)) / (100 - 50) = 20/50 = 0.4
    val rows = Seq.fill(4)((1, 1)) ++ Seq.fill(1)((1, 0)) ++
      Seq.fill(2)((0, 1)) ++ Seq.fill(3)((0, 0))
    val got = QualityModel.confusionPanel(rows.toDF("p", "y"),
        col("p"), col("y"))
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .collect().head
    assert(got._1 == 4 && got._2 == 1 && got._3 == 2 && got._4 == 3)
    assert(got._5 == 0.8 && got._6 == 0.666667)
    assert(got._7 == 0.727273 && got._8 == 0.4)
  }

  test("confusion panel: degenerate single-class input yields null kappa") {
    val got = QualityModel.confusionPanel(
        Seq((1, 1), (1, 1)).toDF("p", "y"), col("p"), col("y"))
      .select("precision", "recall", "kappa")
      .as[(Option[Double], Option[Double], Option[Double])].collect().head
    assert(got._1.contains(1.0) && got._2.contains(1.0))
    assert(got._3.isEmpty, "kappa undefined when chance agreement is total")
  }
}
