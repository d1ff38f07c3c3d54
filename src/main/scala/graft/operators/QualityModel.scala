package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality filtering — the linear-classifier stage
  * of web-corpus curation (the CCNet / GPT-3-style "looks like the
  * target distribution" filter, trained on weak labels and applied to
  * the whole crawl).
  *
  * The split that makes this 100 TB-shaped:
  *  - [[train]] runs MLlib logistic regression on a SMALL labeled
  *    sample (weak labels come free from e.g. [[TextFunctions]] gopher
  *    rules or a trusted-corpus-vs-crawl contrast) and returns plain
  *    (intercept, weights) — a dozen doubles on the driver.
  *  - [[score]] applies those frozen weights as pure built-in column
  *    algebra (sigmoid of a 5-feature dot product): map-only, no MLlib
  *    on the scoring path, no UDF, fully inside whole-stage codegen,
  *    and replayable by any SQL engine for verification.
  *
  * The 5 features are deliberately cheap single-pass text statistics
  * (no vocabulary, no shuffle): log token count, mean token length,
  * stopword fraction, non-alphanumeric fraction, duplicate-token
  * fraction. Tokenization matches the rest of the engine
  * (lower → trim → split on whitespace). */
object QualityModel {

  val featureNames: Seq[String] = Seq("log_tokens", "avg_token_len",
    "stopword_frac", "nonalnum_frac", "dup_frac")

  /** Tiny fixed English stopword list — a FEATURE definition (frozen so
    * scores are reproducible and oracle-able), not a linguistic claim. */
  val stopwords: Seq[String] =
    Seq("the", "of", "and", "to", "in", "a", "is", "for", "on", "that")

  /** Evaluate `value` once, reference it many times (same rationale as
    * Dedup.letBind: higher-order fns run without CSE). */
  private def letBind(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** The 5-feature vector as `array<double>`, one map-side pass. */
  def features(text: Column): Column =
    letBind(lower(trim(text))) { cleaned =>
      letBind(filter(split(cleaned, "\\s+"), t => length(t) > 0)) { toks =>
        val n = size(toks).cast("double")
        val nc = length(cleaned).cast("double")
        val safeN = greatest(n, lit(1.0))
        array(
          log(n + 1),
          nc / safeN,
          size(filter(toks, t => t.isin(stopwords: _*))) / safeN,
          (nc - length(regexp_replace(cleaned, "[^a-z0-9 ]", ""))) /
            greatest(nc, lit(1.0)),
          when(n === 0, lit(0.0))
            .otherwise(lit(1.0) - size(array_distinct(toks)) / n))
      }
    }

  /** sigmoid(intercept + w·features(text)) ∈ (0, 1). Frozen weights →
    * deterministic, engine-portable scores. */
  def score(text: Column, weights: Seq[Double], intercept: Double): Column = {
    require(weights.length == featureNames.length,
      s"expected ${featureNames.length} weights")
    letBind(features(text)) { f =>
      val z = weights.zipWithIndex
        .map { case (w, i) => lit(w) * element_at(f, i + 1) }
        .foldLeft(lit(intercept): Column)(_ + _)
      lit(1.0) / (lit(1.0) + exp(-z))
    }
  }

  /** Exact ROC-AUC of a score against binary labels — the standard
    * "did the quality filter actually separate good from bad" number,
    * computed distributed via the Mann–Whitney rank identity:
    * AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)
    *     = Σₛ nPos(s)·(2·cumNeg(<s) + nNeg(s)) / (2·n₁·n₀).
    * All sums are exact LONG arithmetic (order-free — no float
    * accumulation), divided once at the end, so the value replays
    * bit-for-bit in any engine.
    *
    * Scale shape: one map-side-combined groupBy collapses the corpus
    * to one row per DISTINCT score before the prefix-sum window — pass
    * a discretized score (e.g. micro-units, the engine's fixed-point
    * convention) so distinct-score cardinality is bounded; the window
    * then runs over a band-histogram, not the corpus. Output: one row
    * (auc, n_pos, n_neg). Degenerate single-class inputs yield null. */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(score.as("__s"), label.cast("long").as("__y"))
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__np"),
        sum(lit(1L) - col("__y")).as("__nn"))
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = g.withColumn("__cumn",
      coalesce(sum(col("__nn")).over(w), lit(0L)))
    c.agg(
        sum(col("__np") * (lit(2) * col("__cumn") + col("__nn"))).as("__u2"),
        sum(col("__np")).as("n_pos"), sum(col("__nn")).as("n_neg"))
      .select(
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null))
          .otherwise(col("__u2").cast("double") /
            (lit(2) * col("n_pos") * col("n_neg"))).as("auc"),
        col("n_pos"), col("n_neg"))
  }

  /** Reliability (calibration) bins — the companion diagnostic to
    * [[rocAuc]]: AUC says the filter RANKS well; calibration says its
    * probabilities MEAN something (a 0.8 bucket should be ~80%
    * positive before anyone thresholds on "quality ≥ 0.8"). Scores
    * land in `bins` equal-width buckets (top edge closed); per bin:
    * exact LONG count, positive count, and micro-unit score mass,
    * with rates as single final divisions — engine-replayable like
    * the rest of the eval family. One map-side-combined agg. */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    val b = least(floor(score * bins).cast("int"), lit(bins - 1))
    df.select(b.as("bin"), label.cast("long").as("__y"),
        round(score * 1e6).cast("long").as("__sm"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("__pos"),
        sum(col("__sm")).as("__smsum"))
      .select(col("bin"), col("n"),
        (col("__smsum").cast("double") / lit(1e6) / col("n"))
          .as("mean_score"),
        (col("__pos").cast("double") / col("n")).as("pos_rate"))
  }

  /** Population stability index between two score distributions —
    * the model-monitoring companion of `Curation.unigramDrift`'s
    * vocabulary JS: PSI = Σ_bins (p_a − p_b)·ln(p_a/p_b) over
    * equal-width [0,1) bins (rule of thumb: < 0.1 stable, > 0.25
    * shifted — retrain/recalibrate). Add-one smoothing keeps empty
    * bins finite; per-bin contributions round to micro-units BEFORE
    * the final sum, so the sum is exact long arithmetic — the same
    * fixed-point discipline as every monitoring number here (a drift
    * alert that flickers on float summation order is noise, not
    * signal). Output: one row (psi, n_a, n_b). */
  def psi(a: DataFrame, b: DataFrame, score: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    def binned(df: DataFrame, n: String) =
      df.select(least(floor(score * bins).cast("int"), lit(bins - 1))
          .as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(n))
    val joined = binned(a, "__ca").join(binned(b, "__cb"), Seq("bin"),
        "full_outer")
      .select(col("bin"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    // totals ride a broadcast 1-row crossJoin (drift-totals pattern)
    val totals = joined.agg(sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb"))
    joined.crossJoin(broadcast(totals))
      .withColumn("__pa", (col("__ca") + 1).cast("double") /
        (col("__na") + bins))
      .withColumn("__pb", (col("__cb") + 1).cast("double") /
        (col("__nb") + bins))
      .withColumn("__contrib",
        round((col("__pa") - col("__pb")) * log(col("__pa") / col("__pb"))
          * 1e6).cast("long"))
      .agg((sum(col("__contrib")).cast("double") / lit(1e6)).as("psi"),
        max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"))
  }

  /** Fit logistic regression over [[features]] on a labeled sample
    * (`labelCol` ∈ {0, 1}) and return (intercept, weights) for
    * [[score]]. MLlib runs HERE only — the sample is small by
    * construction (weak labels over a held-out slice), and what leaves
    * is six doubles, so the 100 TB scoring pass never touches the ML
    * runtime. `regParam` defaults to light L2 to keep separable weak
    * labels from diverging. */
  def train(df: DataFrame, textCol: String, labelCol: String,
      maxIter: Int = 100, regParam: Double = 0.01): (Double, Seq[Double]) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val data = df.select(col(labelCol).cast("double").as("label"),
      array_to_vector(features(col(textCol))).as("features"))
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .fit(data)
    (model.intercept, model.coefficients.toArray.toSeq)
  }

  /** Binary-classifier agreement panel: confusion counts plus
    * precision/recall/F1 and Cohen's kappa in ONE map-side-combined
    * aggregation over 0/1 columns — the held-out acceptance check a
    * quality filter ships with (next to [[rocAuc]]'s threshold-free
    * ranking view and the calibration bins).
    *
    * Kappa is computed as the exact long ratio
    * `(n·agree − a1·b1 − a0·b0) / (n² − a1·b1 − a0·b0)` — one double
    * division at the end, so it replays bit-identically. The long
    * products bound exactness to n < ~3·10⁹ rows; beyond that callers
    * evaluate on a sample (an eval set larger than that measures
    * nothing a 3·10⁹ sample doesn't). */
  def confusionPanel(df: DataFrame, pred: Column, truth: Column): DataFrame = {
    val p = pred.cast("long")
    val y = truth.cast("long")
    df.agg(
        sum(p * y).as("tp"),
        sum(p * (lit(1L) - y)).as("fp"),
        sum((lit(1L) - p) * y).as("fn"),
        sum((lit(1L) - p) * (lit(1L) - y)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        round(when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))), 6)
          .as("precision"),
        round(when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))), 6)
          .as("recall"),
        round(when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          lit(2.0) * col("tp") /
            (lit(2L) * col("tp") + col("fp") + col("fn"))), 6)
          .as("f1"),
        round({
          val n = col("tp") + col("fp") + col("fn") + col("tn")
          val a1 = col("tp") + col("fp") // predicted positive
          val b1 = col("tp") + col("fn") // actually positive
          val chance = a1 * b1 + (n - a1) * (n - b1)
          val denom = n * n - chance
          when(denom > 0,
            (n * (col("tp") + col("tn")) - chance).cast("double") / denom)
        }, 6).as("kappa"))
  }
}
