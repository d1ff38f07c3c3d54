package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hypothesis-test and regression aggregates — the engine family's
  * statistical surface (the reference stack's ClickHouse ships
  * `welchTTest`, `mannWhitneyUTest`, `cramersV`,
  * `simpleLinearRegression` as first-class aggregate functions; its
  * dashboards use them for A/B readouts over event streams, e.g. the
  * metric tables seeded by
  * `clickhouse/init/01_schema.sql.tmpl`'s events schema).
  *
  * Design for exactness AND scale:
  *  - every operator reduces the input to a handful of exact LONG
  *    moment sums per group (n, Σx, Σx², Σxy …) in fixed-point cent
  *    units — one map-side-combined aggregation, O(groups) state,
  *    nothing but counters cross the shuffle;
  *  - the final statistic is a single fixed double-expression over
  *    those longs, evaluated once per group — IEEE arithmetic over
  *    identical integers replays bit-identically in any engine, which
  *    is what lets the DuckDB oracle hash-match the t/V/slope values;
  *  - Mann-Whitney is kept INTEGER-only by working in doubled ranks
  *    (2·avgRank = 2·minRank + ties − 1 is always integral), so the
  *    U statistic needs no floating point at all.
  *
  * At 100 TB: Welch/Cramér/regression are one `groupBy` each (no
  * window, no sort). Mann-Whitney needs a global value order — that
  * is one range-partitioned sort (Spark's window over `value`), the
  * same cost class as any global rank; ties are resolved by value
  * equality so the order within a value group never matters.
  */
object Stats {

  /** Welch's unequal-variance t-test between two groups of a
    * fixed-point LONG measure (cents). Returns one row per (a,b)
    * pair: group sizes and the t statistic + Welch–Satterthwaite
    * degrees of freedom, both rounded to 6.
    *
    * The reduction is a single aggregation producing exact long
    * (n, Σc, Σc²) per group; t and df are then pure double algebra
    * over six longs. Sample variance uses the one-pass identity
    * s² = (Σc² − (Σc)²/n)/(n−1), safe here because cents are small
    * integers (no catastrophic cancellation at these magnitudes).
    */
  def welchT(df: DataFrame, valueCents: Column, group: Column,
      groupA: String, groupB: String): DataFrame = {
    val m = df
      .filter(group.isin(groupA, groupB))
      .groupBy(group.as("__g"))
      .agg(count(lit(1)).as("n"), sum(valueCents).as("s"),
        sum(valueCents * valueCents).as("q"))
    val a = m.filter(col("__g") === groupA)
      .select(col("n").as("n_a"), col("s").as("s_a"), col("q").as("q_a"))
    val b = m.filter(col("__g") === groupB)
      .select(col("n").as("n_b"), col("s").as("s_b"), col("q").as("q_b"))
    val j = a.crossJoin(b) // 1×1: both sides are single aggregate rows
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    // means and variances in CENT units (the 1/100² scale cancels in
    // t, so staying in cents keeps both engines on identical doubles)
    val mA = col("s_a").cast("double") / nA
    val mB = col("s_b").cast("double") / nB
    val vA = (col("q_a").cast("double") - col("s_a").cast("double") *
      col("s_a").cast("double") / nA) / (nA - 1.0)
    val vB = (col("q_b").cast("double") - col("s_b").cast("double") *
      col("s_b").cast("double") / nB) / (nB - 1.0)
    val seA = vA / nA
    val seB = vB / nB
    val tStat = (mA - mB) / sqrt(seA + seB)
    val dfW = (seA + seB) * (seA + seB) /
      (seA * seA / (nA - 1.0) + seB * seB / (nB - 1.0))
    j.select(col("n_a"), col("n_b"), round(tStat, 6).as("t"),
      round(dfW, 6).as("df"))
  }

  /** Mann–Whitney U rank-sum test between two groups, fully
    * integer-exact. Returns (n_a, n_b, u2_a, u2_b) where u2 = 2·U
    * (doubled so midpoint ranks of even tie groups stay integral;
    * u2_a + u2_b = 2·n_a·n_b always — spec-pinned).
    *
    * Rank structure is computed over the DISTINCT-value domain, not
    * per row: one aggregation to (value → total count, count in A,
    * count in B), a cumulative sum over the sorted distinct values
    * (domain-sized, not data-sized — for a fixed-point cent measure
    * this is bounded regardless of corpus size), then the doubled
    * rank-sum per group is Σ_v cnt_g(v)·(2·cumBefore(v)+ties(v)+1)
    * since every row of value v has doubled average rank
    * 2·minRank + ties − 1 = 2·cumBefore + ties + 1. No row-level
    * sort ever happens — the 100 TB cost is one groupBy.
    */
  def mannWhitneyU(df: DataFrame, value: Column, group: Column,
      groupA: String, groupB: String): DataFrame = {
    val byValue = df.filter(group.isin(groupA, groupB))
      .groupBy(value.as("__v"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(group === groupA, 1L).otherwise(0L)).as("ca"),
        sum(when(group === groupB, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = byValue
      .withColumn("__cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
    val r2 = lit(2) * col("__cum") + col("cnt") + 1
    val sums = withCum.agg(
      sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
      sum(col("ca") * r2).as("r2_a"), sum(col("cb") * r2).as("r2_b"))
    sums.select(col("n_a"), col("n_b"),
      (col("r2_a") - col("n_a") * (col("n_a") + 1)).as("u2_a"),
      (col("r2_b") - col("n_b") * (col("n_b") + 1)).as("u2_b"))
  }

  /** Cramér's V association between two categorical columns, with
    * the χ² statistic. One aggregation to the contingency cells, two
    * tiny re-aggregations for the margins; χ² via the zero-cell-safe
    * identity Σ(o−e)²/e = n·Σ o²/(rᵢ·cⱼ) − n (absent cells have
    * o = 0 and contribute nothing to the sum form, so only observed
    * cells are ever materialized). Each cell's o²/(r·c) ∈ (0,1] is
    * rounded to femto-units (1e-15) BEFORE the long sum — the suite's
    * fixed-point convention — so the total is independent of cell
    * summation order (safe while cells·1e15 < 2⁶³, i.e. any sane
    * category cross). Returns (n, chi2, v) rounded to 6.
    */
  def cramersV(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.groupBy(a.as("__a"), b.as("__b"))
      .agg(count(lit(1)).as("o"))
    val rowS = cells.groupBy(col("__a")).agg(sum(col("o")).as("r"))
    val colS = cells.groupBy(col("__b")).agg(sum(col("o")).as("c"))
    val joined = cells.join(broadcast(rowS), "__a")
      .join(broadcast(colS), "__b")
    val cellFemto = round(lit(1e15) *
      (col("o").cast("double") * col("o").cast("double") /
        (col("r").cast("double") * col("c").cast("double"))))
      .cast("long")
    val agg = joined.agg(
      sum(col("o")).as("n"),
      sum(cellFemto).as("frac_femto"),
      countDistinct(col("__a")).as("nr"),
      countDistinct(col("__b")).as("nc"))
    val n = col("n").cast("double")
    val frac = col("frac_femto").cast("double") / 1e15
    val chi2 = n * frac - n
    val v = sqrt((frac - 1.0) /
      least(col("nr") - 1, col("nc") - 1).cast("double"))
    agg.select(col("n"), round(chi2, 6).as("chi2"), round(v, 6).as("v"))
  }

  /** Per-group Pearson correlation and sample covariance of two
    * fixed-point LONG measures, from exact long moments (n, Σx, Σy,
    * Σxy, Σx², Σy²) — unlike the builtin one-pass double `corr`, the
    * reduction is integer-exact, so the result is independent of
    * partial-aggregation order and the oracle replays it. Degenerate
    * groups (zero variance on either side) get null corr; covariance
    * stays defined. Both rounded to 6; covar is in the product of
    * the two inputs' units.
    */
  def corrCovar(df: DataFrame, x: Column, y: Column,
      group: Column): DataFrame = {
    val m = df.groupBy(group)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"),
        sum(y * y).as("syy"))
    val nD = col("n").cast("double")
    val covN = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val varX = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val varY = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(group, col("n"),
      round(covN / (nD * (nD - 1.0)), 6).as("covar_samp"),
      round(when(varX > 0.0 && varY > 0.0,
        covN / sqrt(varX * varY)), 6).as("corr"))
  }

  /** Weighted exact quantiles of a LONG measure (the engine family's
    * `quantileExactWeighted`), integer-exact end to end: each
    * requested quantile is a rational num/den, and the answer is the
    * smallest value whose cumulative weight ≥ ⌈q·W⌉ (computed as
    * (W·num + den − 1) div den — no floating point anywhere).
    *
    * Shape: one aggregation to the (group, value) → weight domain
    * (data-sized rows never reach the window), a per-group cumulative
    * over sorted distinct values, then one min per quantile. Returns
    * (group, <one LONG column per requested quantile>).
    */
  def weightedQuantile(df: DataFrame, value: Column, weight: Column,
      group: Column, quantiles: Seq[(String, Int, Int)]): DataFrame = {
    val byValue = df.groupBy(group.as("__g"), value.as("__v"))
      .agg(sum(weight).as("__w"))
    val wCum = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("__g"))
    val cum = byValue
      .withColumn("__cum", sum(col("__w")).over(wCum))
      .withColumn("__tot", sum(col("__w")).over(wTot))
    val aggs = quantiles.map { case (name, num, den) =>
      require(num >= 0 && den > 0 && num <= den,
        s"weightedQuantile: $name = $num/$den is not in [0,1]")
      val thr = expr(s"(__tot * $num + ${den - 1}) div $den")
      min(when(col("__cum") >= thr, col("__v"))).as(name)
    }
    cum.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
  }

  /** Shannon entropy of a categorical distribution per group, in
    * exact micro-bits (the engine family's `entropy` aggregate; same
    * fixed-point discipline as the SIEM char-entropy scorer): with
    * group total N and per-key counts nᵢ,
    * H_micro = (Σ nᵢ·round(10⁶·log₂(N/nᵢ))) div N —
    * per-key contributions rounded to integers BEFORE the sum, so
    * the result replays exactly in any engine. Returns
    * (group, n, entropy_micro_bits).
    */
  def entropyMicroBits(df: DataFrame, key: Column,
      group: Column): DataFrame = {
    val counts = df.groupBy(group.as("__g"), key.as("__k"))
      .agg(count(lit(1)).as("__n"))
    val wTot = Window.partitionBy(col("__g"))
    val withTot = counts
      .withColumn("__tot", sum(col("__n")).over(wTot))
    val contrib = col("__n") * round(lit(1e6) *
      log2(col("__tot").cast("double") / col("__n").cast("double")))
      .cast("long")
    withTot.groupBy(col("__g"))
      .agg(max(col("__tot")).as("n"), sum(contrib).as("__s"))
      .select(col("__g"), col("n"),
        expr("__s div n").as("entropy_micro_bits"))
  }

  /** Spearman rank correlation per group (the engine family's
    * `rankCorr`): Pearson over average ranks, with ties handled the
    * textbook way (tied values share the mean of their rank block).
    *
    * Integer discipline: average ranks can be half-integral, so the
    * whole computation runs in DOUBLED ranks — for a tie block of
    * size t starting at min-rank r, 2·avgRank = 2r + t − 1 is always
    * an integer. Pearson over the doubled ranks equals Pearson over
    * the ranks (invariant under affine maps), so the statistic is
    * unchanged while every shuffled value stays a LONG.
    *
    * Shape: two per-group windows (one sort per axis — the same cost
    * class as any global rank), then ONE map-side-combined moment
    * aggregation; only (group, 2rx, 2ry) longs cross the shuffle and
    * the final ρ is one double expression over six exact longs.
    * Rows with a null on either axis are excluded up front (their
    * ranks would be engine-defined otherwise).
    */
  def spearman(df: DataFrame, x: Column, y: Column,
      group: Column): DataFrame = {
    val base = df.select(group.as("__g"), x.as("__x"), y.as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
    def doubled(c: String): Column = {
      val w = Window.partitionBy(col("__g")).orderBy(col(c))
      val ties = Window.partitionBy(col("__g"), col(c))
      lit(2) * rank().over(w).cast("long") +
        count(lit(1)).over(ties) - lit(1L)
    }
    val ranked = base
      .withColumn("__rx", doubled("__x"))
      .withColumn("__ry", doubled("__y"))
    val m = ranked.groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        sum(col("__rx")).as("sx"), sum(col("__ry")).as("sy"),
        sum(col("__rx") * col("__ry")).as("sxy"),
        sum(col("__rx") * col("__rx")).as("sxx"),
        sum(col("__ry") * col("__ry")).as("syy"))
    val nD = col("n").cast("double")
    val covN = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val varX = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val varY = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(col("__g"), col("n"),
      round(when(varX > 0.0 && varY > 0.0,
        covN / sqrt(varX * varY)), 6).as("rho"))
  }

  /** Two-sample Kolmogorov–Smirnov test (the engine family's
    * `kolmogorovSmirnovTest`) between the LONG-valued samples of two
    * groups: D = sup |ECDF_a − ECDF_b| plus the asymptotic two-sided
    * p-value 2·exp(−2λ²), λ = D·√(mn/(m+n)).
    *
    * Exactness: with cumulative counts cumA/cumB at each distinct
    * value, D = max |cumA·nB − cumB·nA| / (nA·nB) — the max runs over
    * INTEGERS, so the supremum point is found without any floating
    * point; D and p become double algebra over three exact longs at
    * the very end (replayable bit-identically by any engine).
    * Reported as d_micro = (maxDiff·10⁶) div (nA·nB) and p rounded
    * to 6.
    *
    * Shape at 100 TB: one aggregation to the (value) → (countA,
    * countB) domain — data-sized rows never reach the window — then
    * one global cumulative over sorted DISTINCT values (range-
    * partitioned sort over a domain already shrunk by the groupBy),
    * and a single max. Same cost class as Mann–Whitney.
    */
  def ksTest(df: DataFrame, value: Column, group: Column,
      groupA: String, groupB: String): DataFrame = {
    val byValue = df
      .filter(group.isin(groupA, groupB) && value.isNotNull)
      .groupBy(value.as("__v"))
      .agg(sum(when(group === groupA, 1L).otherwise(0L)).as("__ca"),
        sum(when(group === groupB, 1L).otherwise(0L)).as("__cb"))
    val wCum = Window.orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = byValue
      .withColumn("__cuma", sum(col("__ca")).over(wCum))
      .withColumn("__cumb", sum(col("__cb")).over(wCum))
      .withColumn("__na", sum(col("__ca")).over(wTot))
      .withColumn("__nb", sum(col("__cb")).over(wTot))
    val top = cum.agg(
      max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
      max(abs(col("__cuma") * col("__nb") -
        col("__cumb") * col("__na"))).as("__maxdiff"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val dStat = col("__maxdiff").cast("double") / (nA * nB)
    val lambda = dStat * sqrt(nA * nB / (nA + nB))
    top.select(col("n_a"), col("n_b"),
      expr("(__maxdiff * 1000000) div (n_a * n_b)").as("d_micro"),
      round(least(lit(1.0), lit(2.0) * exp(lit(-2.0) * lambda * lambda)),
        6).as("p_asymptotic"))
  }

  /** Population skewness and kurtosis per group (the engine family's
    * `skewPop` / `kurtPop`; kurtosis is the PLAIN m₄/m₂² — normal
    * ≈ 3 — matching ClickHouse, not the excess variant): one
    * map-side-combined aggregation to exact long power sums
    * (n, Σx, Σx², Σx³, Σx⁴), then central moments and the two ratios
    * as double algebra over five exact longs, rounded to 6 —
    * replayable bit-identically, unlike a streaming-moment double
    * implementation whose result depends on partial-agg order.
    *
    * Overflow discipline: needs n·max|x|⁴ < 2⁶³ — pass the measure
    * in coarse integral units (whole units, not cents; |x| ≤ 10⁴
    * keeps corpora to ~10⁶ rows per group, |x| ≤ 10² to ~10¹⁰).
    * Groups with zero variance return null skew/kurt. */
  def skewKurt(df: DataFrame, x: Column, group: Column): DataFrame = {
    val m = df.groupBy(group)
      .agg(count(lit(1)).as("n"), sum(x).as("s1"),
        sum(x * x).as("s2"), sum(x * x * x).as("s3"),
        sum(x * x * x * x).as("s4"))
    val nD = col("n").cast("double")
    val mu = col("s1").cast("double") / nD
    val m2 = col("s2").cast("double") / nD - mu * mu
    val m3 = col("s3").cast("double") / nD -
      lit(3.0) * mu * col("s2").cast("double") / nD +
      lit(2.0) * mu * mu * mu
    val m4 = col("s4").cast("double") / nD -
      lit(4.0) * mu * col("s3").cast("double") / nD +
      lit(6.0) * mu * mu * col("s2").cast("double") / nD -
      lit(3.0) * mu * mu * mu * mu
    m.select(group, col("n"),
      round(when(m2 > 0.0, m3 / sqrt(m2 * m2 * m2)), 6).as("skew_pop"),
      round(when(m2 > 0.0, m4 / (m2 * m2)), 6).as("kurt_pop"))
  }

  /** The rest of the engine family's categorical-association panel
    * (ClickHouse ships `theilsU`, `contingency`, `tschuprowT`,
    * `cramersVBiasCorrected` alongside `cramersV`): one contingency
    * pass shared by every statistic. Returns one row
    * (n, theils_u_ab, theils_u_ba, contingency_c, tschuprow_t,
    * cramers_v_bc), everything rounded to 6.
    *
    * Exactness discipline, same as [[cramersV]] / [[entropyMicroBits]]:
    *  - χ²/φ² ride the zero-cell-safe Σ o²/(r·c) identity with each
    *    cell femto-rounded BEFORE the long sum;
    *  - the three entropies (joint and both margins) are micro-bit
    *    long sums — Σ cnt·round(10⁶·log₂(n/cnt)) — so Theil's
    *    U(a|b) = (Hₐ+H_b−H_ab)/Hₐ is a ratio of exact longs;
    *  - every final statistic is one double expression over those
    *    longs, replayable bit-identically by the oracle.
    *
    * At 100 TB: one groupBy to the (a,b) cell domain; margins and
    * totals re-aggregate the domain-sized cells (broadcast-joined
    * back), so only category counters ever cross a shuffle.
    * Degenerate margins (a or b constant ⇒ zero entropy) yield null
    * for the affected U. */
  def assocMeasures(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.groupBy(a.as("__a"), b.as("__b"))
      .agg(count(lit(1)).as("o"))
    val rowS = cells.groupBy(col("__a")).agg(sum(col("o")).as("r"))
    val colS = cells.groupBy(col("__b")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"))
    def microEnt(cnt: Column): Column =
      (cnt * round(lit(1e6) *
        log2(col("n").cast("double") / cnt.cast("double"))).cast("long"))
    val joint = cells.join(broadcast(rowS), "__a")
      .join(broadcast(colS), "__b").crossJoin(broadcast(tot))
    val cellFemto = round(lit(1e15) *
      (col("o").cast("double") * col("o").cast("double") /
        (col("r").cast("double") * col("c").cast("double"))))
      .cast("long")
    val jAgg = joint.agg(max(col("n")).as("n"),
      sum(cellFemto).as("frac_femto"),
      sum(microEnt(col("o"))).as("h_ab"),
      countDistinct(col("__a")).as("nr"),
      countDistinct(col("__b")).as("nc"))
    val haAgg = rowS.crossJoin(broadcast(tot))
      .agg(sum(microEnt(col("r"))).as("h_a"))
    val hbAgg = colS.crossJoin(broadcast(tot))
      .agg(sum(microEnt(col("c"))).as("h_b"))
    val j = jAgg.crossJoin(haAgg).crossJoin(hbAgg) // 1×1×1
    val nD = col("n").cast("double")
    // clamp: femto-rounding can leave an exactly-independent table a
    // few ulps below φ² = 0, and sqrt of that is engine-divergent
    val phi2 = greatest(lit(0.0),
      col("frac_femto").cast("double") / 1e15 - 1.0)
    val chi2 = nD * phi2
    val mutual = (col("h_a") + col("h_b") - col("h_ab")).cast("double")
    val rM1 = (col("nr") - 1).cast("double")
    val cM1 = (col("nc") - 1).cast("double")
    // Bergsma's bias correction: φ²⁺ = max(0, φ² − (r−1)(c−1)/(n−1)),
    // with the margins shrunk the same way
    val phi2c = greatest(lit(0.0), phi2 - rM1 * cM1 / (nD - 1.0))
    val rC = col("nr").cast("double") - rM1 * rM1 / (nD - 1.0)
    val cC = col("nc").cast("double") - cM1 * cM1 / (nD - 1.0)
    j.select(col("n"),
      round(when(col("h_a") > 0, mutual / col("h_a").cast("double")), 6)
        .as("theils_u_ab"),
      round(when(col("h_b") > 0, mutual / col("h_b").cast("double")), 6)
        .as("theils_u_ba"),
      round(sqrt(chi2 / (chi2 + nD)), 6).as("contingency_c"),
      round(when(rM1 > 0 && cM1 > 0,
        sqrt(phi2 / sqrt(rM1 * cM1))), 6).as("tschuprow_t"),
      round(when(least(rC, cC) > 1.0,
        sqrt(phi2c / (least(rC, cC) - 1.0))), 6).as("cramers_v_bc"))
  }

  /** Student's pooled-variance t-test between two groups of a
    * fixed-point LONG measure (the equal-variance sibling of
    * [[welchT]] — the engine family ships both `studentTTest` and
    * `welchTTest`). Identical reduction (exact long n, Σc, Σc² per
    * group); t uses the pooled variance
    * sp² = (ssA + ssB)/(nA+nB−2) and df = nA+nB−2. */
  def studentT(df: DataFrame, valueCents: Column, group: Column,
      groupA: String, groupB: String): DataFrame = {
    val m = df
      .filter(group.isin(groupA, groupB))
      .groupBy(group.as("__g"))
      .agg(count(lit(1)).as("n"), sum(valueCents).as("s"),
        sum(valueCents * valueCents).as("q"))
    val a = m.filter(col("__g") === groupA)
      .select(col("n").as("n_a"), col("s").as("s_a"), col("q").as("q_a"))
    val b = m.filter(col("__g") === groupB)
      .select(col("n").as("n_b"), col("s").as("s_b"), col("q").as("q_b"))
    val j = a.crossJoin(b) // 1×1: both sides are single aggregate rows
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val mA = col("s_a").cast("double") / nA
    val mB = col("s_b").cast("double") / nB
    val ssA = col("q_a").cast("double") -
      col("s_a").cast("double") * col("s_a").cast("double") / nA
    val ssB = col("q_b").cast("double") -
      col("s_b").cast("double") * col("s_b").cast("double") / nB
    val sp2 = (ssA + ssB) / (nA + nB - 2.0)
    val tStat = (mA - mB) / sqrt(sp2 * (lit(1.0) / nA + lit(1.0) / nB))
    j.select(col("n_a"), col("n_b"), round(tStat, 6).as("t"),
      (col("n_a") + col("n_b") - 2).as("df"))
  }

  /** Two-sample proportion z-test (pooled): given a boolean success
    * per row, z = (p̂A − p̂B) / √(p̂(1−p̂)(1/nA + 1/nB)) with p̂ the
    * pooled success rate. The reduction is four exact long counters
    * (n, k per group) from one map-side-combined aggregation; z is
    * one double expression over them. Returns
    * (n_a, k_a, n_b, k_b, z) with z rounded to 6 (null when the
    * pooled rate is degenerate 0 or 1). */
  def proportionZ(df: DataFrame, success: Column, group: Column,
      groupA: String, groupB: String): DataFrame = {
    val m = df
      .filter(group.isin(groupA, groupB))
      .groupBy(group.as("__g"))
      .agg(count(lit(1)).as("n"),
        sum(success.cast("long")).as("k"))
    val a = m.filter(col("__g") === groupA)
      .select(col("n").as("n_a"), col("k").as("k_a"))
    val b = m.filter(col("__g") === groupB)
      .select(col("n").as("n_b"), col("k").as("k_b"))
    val j = a.crossJoin(b) // 1×1
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val p = (col("k_a") + col("k_b")).cast("double") / (nA + nB)
    val z = (col("k_a").cast("double") / nA -
      col("k_b").cast("double") / nB) /
      sqrt(p * (lit(1.0) - p) * (lit(1.0) / nA + lit(1.0) / nB))
    j.select(col("n_a"), col("k_a"), col("n_b"), col("k_b"),
      round(when(p > 0.0 && p < 1.0, z), 6).as("z"))
  }

  /** Time-decayed exponential moving average per key (the engine
    * family's `exponentialMovingAverage(x, t)` aggregate: each point
    * weighted 2^(−Δt/halfLife) from the key's LATEST point, result =
    * Σ w·x / Σ w).
    *
    * The fold-free formulation is what makes it both exact and
    * scale-safe: the decay exponent k = (tMax − t) div halfLife is an
    * INTEGER, so the weight 1/2^k is an exact power of two
    * (integer-built via shiftleft — never libm pow, whose last-ulp
    * behavior is engine-specific), the per-row products
    * round(10⁶·x·w) / round(10⁶·w) are micro-rounded LONGs, and both
    * sums are summation-order free. No sequential fold, no
    * collect_list: one window max per key + one map-side-combined
    * groupBy — the same cost class as any per-key aggregate at
    * 100 TB. Rows older than 62 half-lives contribute exactly zero
    * (their true weight is below 3e-19 of the newest point's).
    * Returns (key, n, ema) with ema in the measure's own fixed-point
    * units (cents in, cents out), rounded to 6. */
  def emaByKey(df: DataFrame, valueCents: Column, tUnit: Column,
      key: Column, halfLifeUnits: Int): DataFrame = {
    require(halfLifeUnits > 0, "emaByKey needs a positive half-life")
    val withMax = df
      .select(key.as("__k"), valueCents.as("__x"), tUnit.as("__t"))
      .withColumn("__tmax", max(col("__t")).over(
        Window.partitionBy(col("__k"))))
    val k = expr(s"(__tmax - __t) div $halfLifeUnits")
    val weight = when(k <= 62, lit(1.0) / expr(
      s"cast(shiftleft(1L, cast((__tmax - __t) div $halfLifeUnits" +
        " as int)) as double)"))
      .otherwise(lit(0.0))
    val num = round(lit(1e6) * col("__x").cast("double") * weight)
      .cast("long")
    val den = round(lit(1e6) * weight).cast("long")
    withMax
      .withColumn("__num", num).withColumn("__den", den)
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n"), sum(col("__num")).as("__sn"),
        sum(col("__den")).as("__sd"))
      .select(col("__k"), col("n"),
        round(col("__sn").cast("double") /
          col("__sd").cast("double"), 6).as("ema"))
  }

  /** Information value of a categorical feature against a binary
    * outcome (the engine family's `categoricalInformationValue`; the
    * credit-scoring WoE/IV measure a feature-selection pass ranks
    * predictors by): per category, WoE = ln((g/G)/(b/B)) and
    * IV = Σ (g/G − b/B)·WoE.
    *
    * Exactness: one map-side-combined pass to per-category (g, b)
    * long counters; each category's IV contribution is micro-rounded
    * to a LONG before the sum (summation-order free), WoE itself is
    * reported per category in micro units. Categories with a zero
    * cell are excluded from IV (their WoE is ±∞ — ClickHouse returns
    * nan there; the exclusion is the documented divergence) and
    * flagged by a null woe_micro. Returns one row per category
    * (category, n_good, n_bad, woe_micro, iv_contrib_micro) plus the
    * total via [[ivTotal]]-style re-aggregation in the caller. */
  def informationValue(df: DataFrame, category: Column,
      good: Column): DataFrame = {
    val cells = df.groupBy(category.as("__cat"))
      .agg(sum(good.cast("long")).as("g"),
        sum((!good).cast("long")).as("b"))
    val tot = cells.agg(sum(col("g")).as("gt"), sum(col("b")).as("bt"))
    val j = cells.crossJoin(broadcast(tot))
    val gr = col("g").cast("double") / col("gt").cast("double")
    val br = col("b").cast("double") / col("bt").cast("double")
    val woe = log(gr / br)
    j.select(col("__cat"), col("g").as("n_good"), col("b").as("n_bad"),
      when(col("g") > 0 && col("b") > 0,
        round(lit(1e6) * woe).cast("long")).as("woe_micro"),
      when(col("g") > 0 && col("b") > 0,
        round(lit(1e6) * (gr - br) * woe).cast("long"))
        .as("iv_contrib_micro"))
  }

  /** One-way ANOVA across the groups of a fixed-point LONG measure
    * (the engine family's `analysisOfVariance` aggregate): F =
    * (SSB/(k−1)) / (SSW/(n−k)) from per-group exact long moments
    * (n_g, Σx, Σx²).
    *
    * The one order-dependent piece — Σ_g s_g²/n_g — is rounded to a
    * whole LONG per group BEFORE the sum (the cramersV femto
    * discipline, at cent² scale), so the total is independent of
    * group summation order; F is then one double expression over
    * exact longs. One map-side-combined groupBy + a k-row re-agg:
    * nothing but six counters per group ever moves. Returns
    * (n_groups, n, f_stat) with F rounded to 6 (null when k < 2 or
    * n ≤ k). */
  def anovaF(df: DataFrame, valueCents: Column,
      group: Column): DataFrame = {
    val m = df.groupBy(group.as("__g"))
      .agg(count(lit(1)).as("ng"), sum(valueCents).as("sg"),
        sum(valueCents * valueCents).as("qg"))
    val term = round(col("sg").cast("double") * col("sg").cast("double")
      / col("ng").cast("double")).cast("long")
    val agg = m.agg(count(lit(1)).as("n_groups"),
      sum(col("ng")).as("n"), sum(col("sg")).as("s"),
      sum(col("qg")).as("q"), sum(term).as("bt"))
    val nD = col("n").cast("double")
    val kD = col("n_groups").cast("double")
    val ssb = col("bt").cast("double") -
      col("s").cast("double") * col("s").cast("double") / nD
    val ssw = col("q").cast("double") - col("bt").cast("double")
    val f = (ssb / (kD - 1.0)) / (ssw / (nD - kD))
    agg.select(col("n_groups"), col("n"),
      round(when(col("n_groups") >= 2 && col("n") > col("n_groups") &&
        ssw > 0.0, f), 6).as("f_stat"))
  }

  /** Tukey-fence outlier census per key (the engine family's
    * `seriesOutliersDetectTukey` shape): values outside
    * [q1 − 1.5·IQR, q3 + 1.5·IQR] of their key's distribution,
    * reported as (key, n, n_outliers, min_outlier, max_outlier).
    *
    * Fully INTEGER: quartiles use the suite's ⌈q·W⌉ convention
    * (smallest value whose cumulative count reaches ⌈q·n⌉ — the
    * [[weightedQuantile]] semantics), and the fences are compared in
    * DOUBLED units (2·x vs 2·q1 − 3·IQR) so the half-integral
    * 1.5·IQR never leaves Long. Shape: one aggregation to the
    * (key, value) domain, a domain-sized cumulative window, a
    * broadcast join-back of the two quartiles, one final agg —
    * row-level data crosses exactly one keyed shuffle. */
  def tukeyOutliers(df: DataFrame, value: Column,
      key: Column): DataFrame = {
    val byValue = df.groupBy(key.as("__k"), value.as("__v"))
      .agg(count(lit(1)).as("__w"))
    val wCum = Window.partitionBy(col("__k")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("__k"))
    val cum = byValue
      .withColumn("__cum", sum(col("__w")).over(wCum))
      .withColumn("__tot", sum(col("__w")).over(wTot))
    val quart = cum.groupBy(col("__k")).agg(
      min(when(col("__cum") >= expr("(__tot * 1 + 3) div 4"),
        col("__v"))).as("__q1"),
      min(when(col("__cum") >= expr("(__tot * 3 + 3) div 4"),
        col("__v"))).as("__q3"))
      .withColumn("__iqr", col("__q3") - col("__q1"))
    byValue.join(broadcast(quart), "__k")
      .groupBy(col("__k"))
      .agg(sum(col("__w")).as("n"),
        coalesce(sum(when(
          lit(2) * col("__v") < lit(2) * col("__q1") - lit(3) * col("__iqr") ||
          lit(2) * col("__v") > lit(2) * col("__q3") + lit(3) * col("__iqr"),
          col("__w"))), lit(0L)).as("n_outliers"),
        min(when(
          lit(2) * col("__v") < lit(2) * col("__q1") - lit(3) * col("__iqr") ||
          lit(2) * col("__v") > lit(2) * col("__q3") + lit(3) * col("__iqr"),
          col("__v"))).as("min_outlier"),
        max(when(
          lit(2) * col("__v") < lit(2) * col("__q1") - lit(3) * col("__iqr") ||
          lit(2) * col("__v") > lit(2) * col("__q3") + lit(3) * col("__iqr"),
          col("__v"))).as("max_outlier"))
  }

  /** Dominant-period detection per key over a regularly-bucketed
    * LONG series (the engine family's `seriesPeriodDetectFFT` shape,
    * done as an exact autocorrelation argmax instead of an FFT —
    * same answer on the strong-single-period series the operator
    * exists for, and every intermediate replays in any engine).
    *
    * For each lag L in 1..maxLag the mean-centered autocorrelation
    * r_L = Σ_t (x_t−μ)(x_{t+L}−μ) / Σ_t (x_t−μ)² is expanded so the
    * data-dependent sums are EXACT LONGS from one lag-exploded
    * self-join — Σ x_t·x_{t+L}, the two one-sided sums, the pair
    * count — and μ enters only in the final per-(key,lag) double
    * expression. The reported period is the micro-rounded-ACF argmax
    * (ties → smallest lag, so the choice is deterministic).
    *
    * Shapes at 100 TB: the series is already bucketed (domain-sized,
    * not event-sized) before the join; the lag explode multiplies
    * the DOMAIN by maxLag, never the raw data, and both the join and
    * the final agg are keyed by (key, t) / (key, lag). Returns one
    * row per key: (key, n, period, acf_micro). Keys with a
    * degenerate series (zero variance, or fewer than 2·maxLag
    * points) are reported with null period. */
  def detectPeriod(series: DataFrame, value: Column, tUnit: Column,
      key: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "detectPeriod needs maxLag >= 1")
    val s = series.select(key.as("__k"), tUnit.as("__t"),
      value.as("__x"))
    val tot = s.groupBy(col("__k"))
      .agg(count(lit(1)).as("n"), sum(col("__x")).as("sv"),
        sum(col("__x") * col("__x")).as("svv"))
    val lagged = s.select(col("__k"), col("__t"), col("__x"),
      explode(sequence(lit(1), lit(maxLag))).as("__lag"))
    val pairs = s.alias("a").join(lagged.alias("b"),
      col("a.__k") === col("b.__k") &&
        col("a.__t") === col("b.__t") - col("b.__lag"))
      .groupBy(col("a.__k").as("__k"), col("__lag"))
      .agg(count(lit(1)).as("m"),
        sum(col("a.__x") * col("b.__x")).as("sxy"),
        sum(col("a.__x")).as("s1"), sum(col("b.__x")).as("s2"))
    val j = pairs.join(broadcast(tot), "__k")
    val mu = col("sv").cast("double") / col("n").cast("double")
    val num = col("sxy").cast("double") -
      mu * (col("s1").cast("double") + col("s2").cast("double")) +
      col("m").cast("double") * mu * mu
    val den = col("svv").cast("double") -
      col("n").cast("double") * mu * mu
    val acf = j.select(col("__k"), col("n"), col("__lag"),
      when(den > 0.0 && col("n") >= 2L * maxLag,
        round(lit(1e6) * num / den).cast("long")).as("__acf"))
    acf.groupBy(col("__k"))
      .agg(max(col("n")).as("n"),
        max_by(col("__lag"),
          struct(col("__acf"), -col("__lag"))).as("period"),
        max(col("__acf")).as("acf_micro"))
      .select(col("__k"), col("n"),
        when(col("acf_micro").isNotNull, col("period")).as("period"),
        col("acf_micro"))
  }

  /** Mergeable EMA state — the -State/-Merge combinator treatment of
    * [[emaByKey]] (ClickHouse folds `exponentialMovingAverageState`s
    * the same way; the Summing write discipline applies: append a
    * partial per batch, never read-modify-write). A partial is
    * (key, t_max, num, den) with num/den the micro-rounded decayed
    * sums RELATIVE TO that partial's own newest point.
    *
    * Merging rescales each partial to the globally newest point by
    * an INTEGER shift — num div 2^((T−t_max) div h) — so the fold is
    * exact integer arithmetic, deterministic in any engine and
    * independent of merge order/grouping (each partial rescales
    * against the single global T, not pairwise). Floor loss per
    * partial is < 1 micro-unit — EmaStateSpec pins merged-vs-direct
    * to within #partials micro-units. */
  def emaPartials(df: DataFrame, valueCents: Column, tUnit: Column,
      key: Column, halfLifeUnits: Int): DataFrame = {
    require(halfLifeUnits > 0, "emaPartials needs a positive half-life")
    val withMax = df
      .select(key.as("__k"), valueCents.as("__x"), tUnit.as("__t"))
      .withColumn("__tmax", max(col("__t")).over(
        Window.partitionBy(col("__k"))))
    val k = expr(s"(__tmax - __t) div $halfLifeUnits")
    val weight = when(k <= 62, lit(1.0) / expr(
      s"cast(shiftleft(1L, cast((__tmax - __t) div $halfLifeUnits" +
        " as int)) as double)"))
      .otherwise(lit(0.0))
    withMax
      .withColumn("__num",
        round(lit(1e6) * col("__x").cast("double") * weight)
          .cast("long"))
      .withColumn("__den", round(lit(1e6) * weight).cast("long"))
      .groupBy(col("__k"))
      .agg(count(lit(1)).as("n"), max(col("__tmax")).as("t_max"),
        sum(col("__num")).as("num"), sum(col("__den")).as("den"))
  }

  /** Fold EMA partials (see [[emaPartials]]) down to one row per key:
    * every partial's sums shift right by its age in half-lives
    * against the key's newest partial, then plain long sums. Returns
    * (key, n, ema) matching [[emaByKey]]'s shape. */
  def emaMerge(partials: DataFrame,
      halfLifeUnits: Int): DataFrame = {
    val withT = partials.withColumn("__T", max(col("t_max")).over(
      Window.partitionBy(col("__k"))))
    val age = expr(s"(__T - t_max) div $halfLifeUnits")
    def scaled(c: String): Column =
      when(age <= 62, expr(
        s"shiftright($c, cast((__T - t_max) div $halfLifeUnits" +
          " as int))")).otherwise(lit(0L))
    withT.groupBy(col("__k"))
      .agg(sum(col("n")).as("n"),
        sum(scaled("num")).as("__sn"), sum(scaled("den")).as("__sd"))
      .select(col("__k"), col("n"),
        round(col("__sn").cast("double") /
          col("__sd").cast("double"), 6).as("ema"))
  }

  /** Per-group simple linear regression (least squares) of a
    * fixed-point LONG y (cents) on an integral x. One aggregation to
    * exact long moments (n, Σx, Σy, Σxy, Σx²), then
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) and
    * intercept = (Σy − slope·Σx)/n as double algebra, both in CENT
    * units, rounded to 6. Groups with a degenerate x (all equal) get
    * null slope/intercept rather than a division blow-up.
    */
  def linFit(df: DataFrame, x: Column, yCents: Column,
      group: Column): DataFrame = {
    val m = df.groupBy(group)
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(yCents).as("sy"),
        sum(x * yCents).as("sxy"), sum(x * x).as("sxx"))
    val nD = col("n").cast("double")
    val denom = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val slope = (nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) / denom
    val intercept =
      (col("sy").cast("double") - slope * col("sx").cast("double")) / nD
    m.select(group, col("n"),
      round(when(denom =!= 0.0, slope), 6).as("slope"),
      round(when(denom =!= 0.0, intercept), 6).as("intercept"))
  }

  /** Two-feature least squares y = b0 + b1·x1 + b2·x2 per group — the
    * multivariate step past [[linFit]], and the distributed shape of
    * the reference family's `stochasticLinearRegression`: where that
    * aggregate runs SGD over the group (order-sensitive, seed-bound),
    * this solves the NORMAL EQUATIONS exactly. One map-side-combined
    * aggregation accumulates the nine cross-sums (X^T X and X^T y over
    * integer-valued inputs — exact longs, order-free), then Cramer's
    * rule on the 3×3 system runs as a fixed double expression tree, so
    * the coefficients replay bit-identically on any engine that
    * evaluates the same formula (the DuckDB oracle does, verbatim).
    *
    * 100 TB shape: the state is 9 longs + a count per group, the same
    * cost as a sum — the full design matrix never materializes, and
    * adding features grows the state as (k+1)², not with rows. Inputs
    * must be integer-valued columns (counts / cents / micro-units);
    * groups with a singular normal matrix get null coefficients. */
  def multiLinFit(df: DataFrame, x1: Column, x2: Column, yCents: Column,
      group: Column): DataFrame = {
    val m = df.groupBy(group).agg(
      count(lit(1)).as("n"),
      sum(x1).as("s1"), sum(x2).as("s2"), sum(yCents).as("sy"),
      sum(x1 * x1).as("s11"), sum(x2 * x2).as("s22"),
      sum(x1 * x2).as("s12"),
      sum(x1 * yCents).as("s1y"), sum(x2 * yCents).as("s2y"))
    def d(c: String): Column = col(c).cast("double")
    val (n, s1, s2, sy) = (d("n"), d("s1"), d("s2"), d("sy"))
    val (s11, s22, s12) = (d("s11"), d("s22"), d("s12"))
    val (s1y, s2y) = (d("s1y"), d("s2y"))
    // Cramer's rule over A = [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]],
    // b = [sy,s1y,s2y]; the operand ORDER below is the cross-engine
    // contract — the oracle writes the same tree
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val d0 = sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)
    val d1 = n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)
    val d2 = n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)
    m.select(group, col("n"),
      round(when(det =!= 0.0, d0 / det), 6).as("b0"),
      round(when(det =!= 0.0, d1 / det), 6).as("b1"),
      round(when(det =!= 0.0, d2 / det), 6).as("b2"))
  }

  /** Inverse standard-normal CDF (Acklam's rational approximation,
    * |ε| < 4.5e-4 relative — the standard published constants), used
    * DRIVER-SIDE to turn (alpha, power) into z constants at plan
    * time. The z values are embedded as literals in both the Spark
    * plan and the generated oracle SQL, so the downstream arithmetic
    * is identical text on both engines. */
  def invNorm(p: Double): Double = {
    require(p > 0.0 && p < 1.0, s"invNorm: p must be in (0,1), got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val dd = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
    }
  }

  /** The reference family's `minSampleSizeContinous` A/B-test sizing
    * panel, per group: from the group's OBSERVED mean and variance
    * (exact fixed-point sums; two-sample pooled formula
    * n = 2σ²(z_{1−α/2}+z_{power})² / (mde·mean)²), the per-variant
    * sample size needed to detect a relative `mde` — plus the
    * detectable-effect bounds around the baseline mean, matching the
    * family's (size, lower, upper) tuple. Variance uses the
    * population form n·Σv²−(Σv)² over cents, so every input to the
    * one double expression is an exact long. */
  def minSampleSizeContinuous(df: DataFrame, valueCents: Column,
      group: Column, mde: Double, alpha: Double = 0.05,
      power: Double = 0.8): DataFrame = {
    val z = invNorm(1.0 - alpha / 2.0) + invNorm(power)
    val m = df.groupBy(group).agg(count(lit(1)).as("n"),
      sum(valueCents).as("sv"),
      sum(valueCents * valueCents).as("svv"))
    val nD = col("n").cast("double")
    val meanC = col("sv").cast("double") / nD
    val varC = (nD * col("svv").cast("double") -
      col("sv").cast("double") * col("sv").cast("double")) / (nD * nD)
    val needed = lit(2.0) * varC * lit(z * z) /
      (lit(mde) * meanC * (lit(mde) * meanC))
    m.select(group, col("n"),
      ceil(needed).cast("long").as("sample_size"),
      round(meanC * lit(1.0 - mde) / 100.0, 6).as("detect_lower"),
      round(meanC * lit(1.0 + mde) / 100.0, 6).as("detect_upper"))
  }

  /** Two-sample z test with KNOWN population variances (the family's
    * `meanZTest(pop_var_x, pop_var_y, confidence)` shape): z over the
    * observed mean difference, plus the confidence interval for the
    * difference. Means come from exact long sums; the variances are
    * PARAMETERS (that is the test's premise); the z quantile is
    * computed once driver-side ([[invNorm]]) and embedded as the same
    * literal in plan and oracle — so the whole output is one
    * replayable double expression (sqrt is correctly rounded). */
  def meanZTest(df: DataFrame, valueCents: Column, group: Column,
      gx: String, gy: String, popVarX: Double, popVarY: Double,
      alpha: Double = 0.05): DataFrame = {
    val zq = invNorm(1.0 - alpha / 2.0)
    val m = df.filter(group.isin(gx, gy))
      .groupBy(group.as("g"))
      .agg(count(lit(1)).as("n"), sum(valueCents).as("s"))
    val x = m.filter(col("g") === gx)
      .select(col("n").as("n_x"), col("s").as("s_x"))
    val y = m.filter(col("g") === gy)
      .select(col("n").as("n_y"), col("s").as("s_y"))
    val j = x.crossJoin(y) // two 1-row sides
    val nx = col("n_x").cast("double")
    val ny = col("n_y").cast("double")
    val diff = col("s_x").cast("double") / nx -
      col("s_y").cast("double") / ny
    val se = sqrt(lit(popVarX) / nx + lit(popVarY) / ny)
    j.select(col("n_x"), col("n_y"),
      round(diff / se, 6).as("z"),
      round(diff - lit(zq) * se, 6).as("ci_low"),
      round(diff + lit(zq) * se, 6).as("ci_high"))
  }

  /** Reset-aware counter delta (the metrics family's `increase()`):
    * per group, sum the per-sample deltas of a monotone counter,
    * treating a DROP as a reset — the post-reset reading counts from
    * zero, so restarts never produce negative rates and never lose
    * the partial increment before the wrap. One key-partitioned
    * window pass + one aggregation, all integer arithmetic. Ties at
    * the same timestamp are ordered by `orderCol` so the lag is
    * deterministic on every engine. */
  def counterIncrease(df: DataFrame, value: Column, tsCol: Column,
      orderCol: Column, group: Column): DataFrame = {
    val w = Window.partitionBy(group).orderBy(tsCol, orderCol)
    val prev = lag(value, 1).over(w)
    val scanned = df
      .withColumn("__inc", when(prev.isNull, lit(0L))
        .when(value >= prev, value - prev)
        .otherwise(value)) // reset: the new reading counts from zero
      .withColumn("__reset",
        when(prev.isNotNull && value < prev, 1L).otherwise(0L))
    scanned.groupBy(group)
      .agg(sum(col("__inc")).as("increase"),
        sum(col("__reset")).as("n_resets"),
        count(lit(1)).as("n_samples"))
  }

  /** Pairwise Pearson correlations over k integer-valued features in
    * ONE aggregation (the family's `corrMatrix` shape): the state is
    * k sums + k square-sums + k(k−1)/2 cross-sums per group — all
    * exact longs, order-free — and each pair's correlation is one
    * double expression (sqrt is IEEE-correctly-rounded, so the values
    * replay bit-identically). Output is the upper triangle unpivoted:
    * (group, x, y, corr), degenerate features → null. Adding a
    * feature grows the STATE quadratically but the data passes stay
    * at exactly one — the property that matters at 100 TB, where a
    * second scan costs more than any k² of longs. */
  def corrMatrix(df: DataFrame, feats: Seq[(String, Column)],
      group: Column): DataFrame = {
    require(feats.size >= 2, "corrMatrix needs at least two features")
    val pairs = for {
      i <- feats.indices; j <- feats.indices if i < j
    } yield (feats(i), feats(j))
    val aggs =
      feats.map { case (nm, c) => sum(c).as(s"s_$nm") } ++
      feats.map { case (nm, c) => sum(c * c).as(s"q_$nm") } ++
      pairs.map { case ((na, ca), (nb, cb)) =>
        sum(ca * cb).as(s"p_${na}_$nb") }
    val m = df.groupBy(group)
      .agg(count(lit(1)).as("n"), aggs: _*)
    val nD = col("n").cast("double")
    def d(c: String): Column = col(c).cast("double")
    val rows = pairs.map { case ((na, _), (nb, _)) =>
      val va = nD * d(s"q_$na") - d(s"s_$na") * d(s"s_$na")
      val vb = nD * d(s"q_$nb") - d(s"s_$nb") * d(s"s_$nb")
      val cov = nD * d(s"p_${na}_$nb") - d(s"s_$na") * d(s"s_$nb")
      struct(lit(na).as("x"), lit(nb).as("y"),
        round(when(va > 0.0 && vb > 0.0,
          cov / (sqrt(va) * sqrt(vb))), 6).as("corr"))
    }
    m.select(group, explode(array(rows: _*)).as("__p"))
      .select(group, col("__p.x").as("x"), col("__p.y").as("y"),
        col("__p.corr").as("corr"))
  }

  /** Additive seasonal decomposition (the `seriesDecomposeSTL` shape,
    * classical-decomposition flavor): value = trend + seasonal +
    * residual over a regularly-sampled per-group series.
    *
    *  - trend: centered `period`-wide moving average (null at the
    *    edges where the window is short — no fabricated values);
    *  - seasonal: the per-phase mean of the detrended series
    *    (phase = days since `epochDay` mod period — NOT the engine's
    *    locale-dependent dayofweek), centered so phases sum to ~0;
    *  - residual: what's left.
    *
    * ENTIRELY integer micro-units: every mean is `sum*1e6 div n`
    * (truncating division — Spark `div` and the oracle's `//` agree
    * on negatives), so the decomposition replays exactly on any
    * engine. Three passes: one window (trend), one tiny
    * (group × period) aggregation broadcast back, one map join.
    * The real STL iterates loess fits — this is the classical
    * single-pass decomposition, the family's documented baseline. */
  def seasonalDecompose(df: DataFrame, value: Column, day: Column,
      group: Column, period: Int, epochDay: String): DataFrame = {
    require(period >= 2 && period % 2 == 1,
      s"seasonalDecompose: period must be odd >= 3, got $period")
    val half = period / 2
    val w = Window.partitionBy(col("g")).orderBy(col("d"))
      .rowsBetween(-half, half)
    val base = df.select(group.as("g"), day.as("d"), value.as("v"))
      .withColumn("__s", sum(col("v")).over(w))
      .withColumn("__c", count(lit(1)).over(w))
      .withColumn("trend_micro", when(col("__c") === period,
        expr(s"(__s * 1000000) div $period")))
      .withColumn("detr",
        col("v") * lit(1000000L) - col("trend_micro"))
      .withColumn("ph", pmod(datediff(col("d"), lit(epochDay).cast("date")),
        lit(period)))
    val sea = base.filter(col("detr").isNotNull)
      .groupBy(col("g"), col("ph"))
      .agg(sum(col("detr")).as("sd"), count(lit(1)).as("nd"))
      .withColumn("savg", expr("sd div nd"))
    val adj = sea.groupBy(col("g"))
      .agg(expr(s"sum(savg) div $period").as("adj"))
    base
      .join(broadcast(sea.select(col("g"), col("ph"), col("savg"))),
        Seq("g", "ph"), "left")
      .join(broadcast(adj), Seq("g"), "left")
      .withColumn("seasonal_micro", col("savg") - col("adj"))
      .withColumn("resid_micro",
        col("v") * lit(1000000L) - col("trend_micro") -
          col("seasonal_micro"))
      .select(col("g"), col("d"), col("v"), col("trend_micro"),
        col("seasonal_micro"), col("resid_micro"))
  }

  /** Fleiss' kappa — inter-annotator agreement over a ratings log
    * `(item, label)` (one row per rating; rater identity is
    * irrelevant to the statistic). The label-quality gate a training
    * pipeline runs before trusting human/model annotations: kappa ≈ 1
    * means raters agree beyond chance, ≈ 0 means the labels are
    * noise. Items with fewer than 2 ratings carry no agreement signal
    * and are excluded (the standard generalization to unequal rating
    * counts).
    *
    * Exactness: per-item agreement P_i = (Σ_j n_ij² − n_i)/(n_i(n_i−1))
    * is quantized to 1e-12 units and folded as exact BIGINTs; chance
    * agreement P_e = Σ_j c_j²/N² comes entirely from exact integer
    * sums — so kappa is ONE double expression over exact integers and
    * replays bit-identically in any engine. Unanimous single-label
    * corpora (P_e = 1) yield null, not a 0/0.
    *
    * Scale shape: one map-side-combined count to (item, label) cells,
    * one aggregation per item, two scalar folds — no window, no sort;
    * only (item, label, count) longs cross the shuffle.
    * Output: one row (n_items, n_ratings, p_bar, p_e, kappa). */
  def fleissKappa(df: DataFrame, item: Column, label: Column): DataFrame =
    fleissKappaCounts(df.groupBy(item.as("item"), label.as("label"))
      .agg(count(lit(1)).as("n")))

  /** [[fleissKappa]] from a pre-aggregated `(item, label, n)` cell
    * frame. Duplicate (item, label) rows fold by addition, so partial
    * counts — a streaming counter table's batches
    * ([[graft.streaming.LabelQaStream]]) — feed in directly, and the
    * kappa over summed partials is the kappa over the full ratings
    * log, exactly. */
  def fleissKappaCounts(cellCounts: DataFrame): DataFrame = {
    val counts = cellCounts
      .groupBy(col("item").as("__i"), col("label").as("__l"))
      .agg(sum(col("n")).as("__n"))
    val per = counts.groupBy(col("__i"))
      .agg(sum(col("__n")).as("__ni"),
        sum(col("__n") * col("__n")).as("__si"))
      .filter(col("__ni") >= 2)
      .withColumn("__pi", round(
        (col("__si") - col("__ni")).cast("double") * 1.0e12 /
          (col("__ni") * (col("__ni") - 1)).cast("double")).cast("long"))
    // label marginals over the SAME included-item ratings
    val kept = counts.join(per.select("__i"), Seq("__i"), "left_semi")
    val marg = kept.groupBy(col("__l")).agg(sum(col("__n")).as("__c"))
    val itemAgg = per.agg(count(lit(1)).as("n_items"),
      sum(col("__ni")).as("n_ratings"), sum(col("__pi")).as("__spi"))
    val labelAgg = marg.agg(sum(col("__c") * col("__c")).as("__sc2"))
    val pBar = col("__spi").cast("double") / 1.0e12 /
      col("n_items").cast("double")
    val pE = col("__sc2").cast("double") / col("n_ratings").cast("double") /
      col("n_ratings").cast("double")
    itemAgg.crossJoin(broadcast(labelAgg))
      .select(col("n_items"), col("n_ratings"),
        round(pBar, 6).as("p_bar"), round(pE, 6).as("p_e"),
        when(pE >= 1.0, lit(null).cast("double"))
          .otherwise(round((pBar - pE) / (lit(1.0) - pE), 6)).as("kappa"))
  }

  /** Per-item label-disagreement audit — the relabel-queue feed next
    * to [[fleissKappa]]'s corpus-level verdict: for every item, its
    * rating count, distinct label count, majority label (ties break
    * to the smallest label — deterministic) and the majority's share
    * in ppm. Items whose majority share is low are the ones a
    * labeling pipeline routes back for adjudication.
    *
    * One count shuffle to (item, label) cells, then a per-item
    * window over those CELLS (≤ labels rows per item, not ratings) —
    * items parallelize. Share is `round(n·1e6/n_i)` over exact longs,
    * engine-replayable. */
  def ratingDisagreement(df: DataFrame, item: Column,
      label: Column): DataFrame =
    ratingDisagreementCounts(df
      .groupBy(item.as("item"), label.as("label"))
      .agg(count(lit(1)).as("n")))

  /** [[ratingDisagreement]] from a pre-aggregated `(item, label, n)`
    * cell frame — the [[fleissKappaCounts]] seam for the same
    * streaming counter table. */
  def ratingDisagreementCounts(cellCounts: DataFrame): DataFrame = {
    val counts = cellCounts
      .groupBy(col("item"), col("label").as("__l"))
      .agg(sum(col("n")).as("__n"))
    // nulls LAST in the tie-break: Spark's asc defaults nulls first,
    // SQL replays default them last — a null-vs-real-label tie would
    // otherwise pick different majorities per engine
    val w = Window.partitionBy(col("item"))
      .orderBy(col("__n").desc, col("__l").asc_nulls_last)
    counts
      .withColumn("__ni", sum(col("__n")).over(Window.partitionBy(col("item"))))
      .withColumn("__nl", count(lit(1)).over(Window.partitionBy(col("item"))))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("item"), col("__ni").as("n_ratings"),
        col("__nl").as("n_labels"), col("__l").as("majority_label"),
        round(col("__n").cast("double") * 1.0e6 /
          col("__ni").cast("double")).cast("long").as("majority_share_ppm"))
  }

  /** k-anonymity census — the compliance audit run before releasing a
    * training corpus: bucket every row by its quasi-identifier tuple,
    * then report, for each observed group SIZE s, how many groups and
    * rows sit at that size and whether s clears the k threshold. A
    * release gate reads the `anonymous_at_k = false` rows as its
    * exposure report.
    *
    * Two map-side-combined aggregations (rows → group sizes → size
    * census), exact integers only — no window, no sort, no join; the
    * second groupBy's cardinality is the number of DISTINCT sizes,
    * driver-trivial at any corpus scale. */
  def kAnonymity(df: DataFrame, qids: Seq[Column], k: Int = 5): DataFrame = {
    require(qids.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, "k must be positive")
    df.groupBy(qids: _*).agg(count(lit(1)).as("s"))
      .groupBy("s")
      .agg(count(lit(1)).as("n_groups"), sum("s").as("n_rows"))
      .withColumn(s"anonymous_at_$k", col("s") >= k)
  }

  /** Per-rater Cohen's kappa against the panel consensus — the
    * label-quality audit that finds WHICH annotator disagrees (where
    * [[fleissKappa]] scores the panel as a whole): consensus per item
    * is the majority label (ties to the smallest label, the
    * [[ratingDisagreement]] rule); each rater's kappa corrects their
    * raw agreement with that consensus for the agreement their own
    * label marginals would produce by chance.
    *
    * Exactness: po and pe reduce to exact BIGINT counts —
    * kappa = (agree·n − Σ_k n_rl(k)·n_rc(k)) / (n² − Σ_k n_rl(k)·n_rc(k))
    * with n_rl the rater's label marginals and n_rc the consensus
    * marginals over that rater's items — so the final value is ONE
    * double division over exact integers, engine-replayable. NULL when
    * chance agreement is total (pe = 1). Scale: count shuffles keyed on
    * (item) / (rater, label); the per-item window runs over label CELLS,
    * not ratings. */
  def raterConsensusKappa(df: DataFrame, item: Column, rater: Column,
      label: Column): DataFrame =
    // ONE pass over the ratings corpus: everything downstream runs on
    // the (item, rater, label) CELL table — bounded by items × raters
    // × labels, not by ratings
    raterConsensusKappaCounts(df
      .select(item.as("item"), rater.as("rater"), label.as("label"))
      .filter(col("rater").isNotNull && col("label").isNotNull)
      .groupBy("item", "rater", "label").agg(count(lit(1)).as("n")))

  /** [[raterConsensusKappa]] from a pre-aggregated
    * `(item, rater, label, n)` cell frame — duplicate cells fold by
    * addition, so a streaming counter table's per-batch partials
    * ([[graft.streaming.RaterQaStream]]) feed in directly. */
  def raterConsensusKappaCounts(cellCounts: DataFrame): DataFrame = {
    val cells3 = cellCounts
      .groupBy("item", "rater", "label").agg(sum(col("n")).as("n"))
    val cons = ratingDisagreementCounts(
        cells3.select(col("item"), col("label"), col("n")))
      .select(col("item"), col("majority_label").as("consensus"))
    // the joined cell frame feeds THREE aggregations (base, label
    // marginals, consensus marginals); localCheckpoint materializes it
    // once so the corpus-sized aggregation above doesn't replay per
    // branch (plan-identical subtrees don't dedupe across different
    // downstream groupings)
    val j = cells3.join(cons, Seq("item")).localCheckpoint()
    val base = j.groupBy("rater").agg(sum(col("n")).as("n_ratings"),
      sum(when(col("label") === col("consensus"), col("n"))
        .otherwise(0L)).as("agree"))
    val ml = j.groupBy(col("rater"), col("label"))
      .agg(sum(col("n")).as("nl"))
    val mc = j.groupBy(col("rater"), col("consensus"))
      .agg(sum(col("n")).as("nc"))
    val pe = ml.join(mc,
        ml("rater") === mc("rater") && ml("label") === mc("consensus"))
      .groupBy(ml("rater").as("rater"))
      .agg(sum(col("nl") * col("nc")).as("pe_num"))
    base.join(pe, Seq("rater"), "left")
      .withColumn("pe_num", coalesce(col("pe_num"), lit(0L)))
      .withColumn("kappa",
        when(col("n_ratings") * col("n_ratings") === col("pe_num"),
          lit(null).cast("double"))
          .otherwise(round(
            (col("agree") * col("n_ratings") - col("pe_num")).cast("double") /
              (col("n_ratings") * col("n_ratings") - col("pe_num"))
                .cast("double"), 6)))
      .select("rater", "n_ratings", "agree", "pe_num", "kappa")
  }

  /** Worker-accuracy-weighted consensus — the one-step Dawid-Skene
    * refinement of majority voting: initialize the consensus with the
    * per-item majority (ties to smallest label, the shared panel
    * rule), estimate each rater's accuracy as their exact agreement
    * rate with that consensus in micro-units, then RE-vote every item
    * with each rating weighted by its rater's accuracy. Items whose
    * label flips (`changed`) are where a reliable minority overruled a
    * noisy crowd — the rows an annotation pipeline re-queues or
    * auto-corrects first.
    *
    * ALL integer: accuracies are `(agree·1e6) div total` BIGINTs,
    * scores are Σ n·acc longs, and both argmaxes break ties by
    * (count/score desc, label asc) — nothing for a replaying engine
    * to round differently.
    *
    * Output per item: (item, majority_label, weighted_label, changed,
    * score_micro of the winning weighted label). Scale shape:
    * everything past one corpus pass runs on the (item, rater, label)
    * cell table (bounded by the key space, not rating volume); the
    * accuracy table is #raters rows joined back by rater; argmax is a
    * per-item window over the cell frame. */
  def weightedConsensus(df: DataFrame, item: Column, rater: Column,
      label: Column): DataFrame =
    weightedConsensusCounts(df
      .select(item.as("item"), rater.as("rater"), label.as("label"))
      .filter(col("rater").isNotNull && col("label").isNotNull)
      .groupBy("item", "rater", "label").agg(count(lit(1)).as("n")))

  /** [[weightedConsensus]] from a pre-aggregated
    * `(item, rater, label, n)` cell frame — duplicate cells fold by
    * addition (the [[graft.streaming.RaterQaStream]] partial shape). */
  def weightedConsensusCounts(cellCounts: DataFrame): DataFrame = {
    val cells = cellCounts
      .groupBy("item", "rater", "label").agg(sum(col("n")).as("n"))
    val cons = ratingDisagreementCounts(
        cells.select(col("item"), col("label"), col("n")))
      .select(col("item"), col("majority_label"))
    val j = cells.join(cons, Seq("item")).localCheckpoint()
    val acc = j.groupBy("rater")
      .agg(sum(col("n")).as("__t"),
        sum(when(col("label") === col("majority_label"), col("n"))
          .otherwise(0L)).as("__a"))
      .select(col("rater"), expr("(__a * 1000000) div __t").as("__acc"))
    val scores = j.join(acc, Seq("rater"))
      .groupBy("item", "label")
      .agg(sum(col("n") * col("__acc")).as("score_micro"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("score_micro").desc, col("label").asc_nulls_last)
    scores.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("item"), col("label").as("weighted_label"),
        col("score_micro"))
      .join(cons, Seq("item"))
      .select(col("item"), col("majority_label"), col("weighted_label"),
        (col("weighted_label") =!= col("majority_label")).as("changed"),
        col("score_micro"))
  }

  /** Per-rater score bias — the harshness/leniency audit over a numeric
    * rating column: each rater's mean score and its offset from the
    * global mean, in exact micro-units. A reward-model pipeline uses
    * the offset to recenter raters before fitting. Scores fold as
    * exact micro-unit longs (one map-side-combined groupBy + one 1-row
    * global that broadcasts); the mean/offset are fixed double
    * expressions over those longs — engine-replayable. */
  def raterBias(df: DataFrame, rater: Column, score: Column): DataFrame =
    raterBiasCounts(df.select(rater.as("rater"),
        round(score.cast("double") * 1e6).cast("long").as("u"))
      .filter(col("rater").isNotNull && col("u").isNotNull)
      .groupBy("rater")
      .agg(count(lit(1)).as("n_ratings"), sum("u").as("su")))

  /** [[raterBias]] from pre-aggregated `(rater, n_ratings, su)` partial
    * moment rows — partials fold by addition (the streaming counter
    * seam), and the global mean derives from the folded sums, so the
    * result over summed partials equals the batch audit exactly. */
  def raterBiasCounts(partials: DataFrame): DataFrame = {
    val per = partials.groupBy("rater")
      .agg(sum(col("n_ratings")).as("n_ratings"), sum(col("su")).as("su"))
    val glob = per.agg(sum(col("n_ratings")).as("gn"), sum(col("su")).as("gs"))
    per.crossJoin(broadcast(glob))
      .select(col("rater"), col("n_ratings"),
        round(col("su").cast("double") / col("n_ratings").cast("double"))
          .cast("long").as("mean_micro"),
        round(col("su").cast("double") / col("n_ratings").cast("double") -
          col("gs").cast("double") / col("gn").cast("double"))
          .cast("long").as("bias_micro"))
  }

  /** Suppression k-anonymization — the actionable half of
    * [[kAnonymity]]'s census: drop every row whose quasi-identifier
    * group holds fewer than k rows, so the released corpus satisfies
    * k-anonymity over `qids` by construction. Returns the input
    * columns unchanged (release shape), plus nothing — the census is
    * the audit artifact; this is the cut.
    *
    * One window count over the qid hash-partitioning (no sort — a
    * frameless partition count), so groups parallelize and no
    * group-size table is ever joined back; at 100 TB this is one
    * shuffle of the release candidate, the minimum any exact
    * suppression can pay. */
  def kAnonymize(df: DataFrame, qids: Seq[Column], k: Int = 5): DataFrame = {
    require(qids.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, "k must be positive")
    df.withColumn("__s", count(lit(1)).over(Window.partitionBy(qids: _*)))
      .filter(col("__s") >= k).drop("__s")
  }

  /** Generalization-ladder k-anonymization (local recoding): `levels`
    * is a coarsening ladder of quasi-identifier tuples, finest first
    * (e.g. (type, day, band) → (type, day) → (type)). Rows whose
    * level-0 group already holds ≥ k rows release at level 0; the
    * rest ESCALATE — at each subsequent level, group sizes are counted
    * over only the still-unassigned rows, those now in ≥ k groups
    * release at that level, and rows failing the coarsest level are
    * suppressed. Returns the surviving rows with an `anon_level`
    * column: the granularity at which each row's quasi-identifiers may
    * be read. Generalizes strictly less than global recoding (which
    * coarsens EVERY row to the first fully-anonymous level) while
    * keeping the per-row decision deterministic and SQL-replayable —
    * chained window counts over the escalation sets compute the same
    * assignment.
    *
    * Scale: every row of one combined-QID tuple shares the same fate
    * at every level (it agrees with its tuple-mates on each level's
    * keys), so the whole escalation runs on the TUPLE TABLE — one
    * map-side-combined groupBy over the corpus, a per-level fold on
    * the (distinct-tuples)-sized table, then one equi-join of the
    * assignment back onto the corpus. One scan, two corpus shuffles
    * (the second collapses to a broadcast when the tuple table is
    * small), never a per-level re-scan. */
  def kAnonymizeLadder(df: DataFrame, levels: Seq[Seq[Column]],
      k: Int = 5): DataFrame = {
    require(levels.nonEmpty, "need at least one ladder level")
    require(levels.forall(_.nonEmpty), "every level needs at least one QID")
    require(k >= 1, "k must be positive")
    // alias every level's expressions so the tuple table carries each
    // level's keys as named columns (level expressions may be computed,
    // not just column refs)
    val aliased = levels.zipWithIndex.flatMap { case (qids, i) =>
      qids.zipWithIndex.map { case (q, j) => (s"__q${i}_$j", q) }
    }
    val keyed = df.select(
      df.columns.map(col).toSeq ++
        aliased.map { case (nm, q) => q.as(nm) }: _*)
    val levelKeys: Seq[Seq[String]] = levels.zipWithIndex.map {
      case (qids, i) => qids.indices.map(j => s"__q${i}_$j")
    }
    // localCheckpoint: the per-level branches below each re-read the
    // tuple table; materializing it once means the corpus-sized
    // aggregation runs ONE scan, not one per ladder level
    var tuples = keyed
      .groupBy(aliased.map(a => col(a._1)): _*)
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint()
    // per-level fold on the tuple table: sum __n by this level's keys
    // among still-unassigned tuples; ≥ k releases at this level. A
    // window, not a groupBy+join, so NULL quasi-identifier values form
    // a group exactly as SQL PARTITION BY does — and the tuple table
    // is tiny, so the window costs nothing
    val assignedParts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    levelKeys.zipWithIndex.foreach { case (keys, i) =>
      val sized = tuples.withColumn("__lv",
        sum(col("__n")).over(Window.partitionBy(keys.map(col): _*)))
      assignedParts += sized.filter(col("__lv") >= k)
        .select(aliased.map(a => col(a._1)) :+ lit(i).as("anon_level"): _*)
      tuples = sized.filter(col("__lv") < k).drop("__lv")
    }
    val assignment = assignedParts.reduce(_ unionByName _).as("__asg")
    // null-safe equi-join: a NULL QID row must find its tuple's
    // assignment (plain = would silently suppress every null-keyed row)
    val src = keyed.as("__src")
    val cond = aliased.map { case (nm, _) =>
      col(s"__src.$nm") <=> col(s"__asg.$nm")
    }.reduce(_ && _)
    src.join(assignment, cond)
      .select(df.columns.map(c => col(s"__src.$c")).toSeq :+
        col("anon_level"): _*)
  }

  /** Embedding-space drift between two corpus slices (the unigram-drift
    * audit on the semantic axis): per `label`, mean-pool the
    * `half = true` rows and the `half = false` rows into one vector
    * each, then ONE positional cosine between the two means —
    * `mean_cosine` near 1 means the slices occupy the same region.
    *
    * Exactness: positional sums fold in exact micro-unit longs (one
    * map-side-combined groupBy over (label, half, position)); the
    * cosine is a fixed-order array fold over the assembled mean
    * vectors, so the drift number replays bit-identically in any
    * engine. Scale: rows explode to dims × rows positional cells but
    * reduce map-side; state after the first shuffle is
    * O(labels × dims), driver-trivial. */
  def embeddingDrift(df: DataFrame, label: Column, half: Column,
      embedding: Column): DataFrame = {
    val e = df.select(label.as("label"), half.as("h"),
        posexplode(embedding).as(Seq("p", "v")))
      .select(col("label"), col("h"), col("p"),
        round(col("v").cast("double") * 1e6).cast("long").as("u"))
    val m = e.groupBy("label", "h", "p")
      .agg(sum("u").as("su"), count(lit(1)).as("n"))
      .withColumn("mean",
        col("su").cast("double") / lit(1000000.0) / col("n"))
    val vecs = m.groupBy("label", "h")
      .agg(array_sort(collect_list(struct(col("p"), col("mean"))))
        .as("pv"))
      .select(col("label"), col("h"),
        transform(col("pv"), x => x.getField("mean")).as("vec"))
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val a = vecs.filter(col("h")).select(col("label"), col("vec").as("va"))
    val b = vecs.filter(!col("h")).select(col("label"), col("vec").as("vb"))
    a.join(b, Seq("label"))
      .select(col("label"), round(dot(col("va"), col("vb")) /
          (sqrt(dot(col("va"), col("va"))) *
            sqrt(dot(col("vb"), col("vb")))), 6)
        .as("mean_cosine"))
  }

  /** Classical test-theory item analysis — the ITEM-quality complement
    * to the rater-agreement audits ([[fleissKappa]],
    * [[raterConsensusKappa]]): which questions in a labeling/eval task
    * are broken? Per item: `n_persons`, `difficulty` (proportion
    * answering 1), and the corrected point-biserial discrimination
    * `r_pb` — the Pearson correlation, over persons, between the item
    * response and the person's REST score (total minus this item, the
    * correction that stops an item correlating with itself). A near-
    * zero or negative r_pb marks an item the strong performers get
    * wrong — miskeyed or ambiguous. Every row also carries Cronbach's
    * alpha, the whole-test reliability `k/(k−1)·(1 − Σᵢvarᵢ/var_total)`
    * (population variances; meaningful when the person×item grid is
    * complete — document sparsity upstream).
    *
    * Repeated observations of one (person, item) cell collapse by max.
    * House exactness rule: everything reduces to LONG moment sums
    * (x ∈ {0,1}, rest scores are small ints) — n, Σx, Σr, Σxr, Σr²,
    * Σt, Σt² — and each statistic is ONE double expression over those
    * exact integers, zero-denominator-guarded, rounded 6dp.
    *
    * Scale shape: one aggregate to the (person, item) grid, a
    * frameless window sum per person (no join back), one aggregate to
    * #items rows, and two 1-row scalar frames broadcast in — nothing
    * larger than the grid ever shuffles, and the grid is
    * #persons·#items, not #observations. */
  def itemAnalysis(df: DataFrame, person: Column, item: Column,
      correct: Column): DataFrame = {
    val grid = df.select(person.as("person"), item.as("item"),
        correct.cast("long").as("x"))
      .filter(col("person").isNotNull && col("item").isNotNull &&
        col("x").isNotNull)
      .groupBy("person", "item").agg(max("x").as("x"))
    val withRest = grid.withColumn("t",
        sum("x").over(Window.partitionBy("person")))
      .withColumn("r", col("t") - col("x"))
    val perItem = withRest.groupBy("item")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum("r").as("sr"), sum(col("x") * col("r")).as("sxr"),
        sum(col("r") * col("r")).as("srr"))
    // per-item population variance numerator n·Σx² − (Σx)²; x²=x
    val itemVarNum = perItem.select(col("n"), col("sx"),
      (col("n") * col("sx") - col("sx") * col("sx")).as("vn"))
    val varSum = itemVarNum.agg(count(lit(1)).as("k"),
      sum(col("vn").cast("double") /
        (col("n") * col("n")).cast("double")).as("sum_var"))
    val totals = grid.groupBy("person").agg(sum("x").as("t"))
      .agg(count(lit(1)).as("np"), sum("t").as("st"),
        sum(col("t") * col("t")).as("stt"))
    val d = (c: Column) => c.cast("double")
    perItem.crossJoin(broadcast(varSum)).crossJoin(broadcast(totals))
      .select(col("item"), col("n").as("n_persons"),
        round(d(col("sx")) / d(col("n")), 6).as("difficulty"),
        when((col("n") * col("sx") - col("sx") * col("sx")) > 0L &&
            (col("n") * col("srr") - col("sr") * col("sr")) > 0L,
          round((d(col("n") * col("sxr")) - d(col("sx") * col("sr"))) /
            (sqrt(d(col("n") * col("sx") - col("sx") * col("sx"))) *
              sqrt(d(col("n") * col("srr") - col("sr") * col("sr")))), 6))
          .as("r_pb"),
        when(col("k") > 1L &&
            (col("np") * col("stt") - col("st") * col("st")) > 0L,
          round((d(col("k")) / d(col("k") - 1L)) *
            (lit(1.0) - col("sum_var") /
              ((d(col("np") * col("stt")) - d(col("st") * col("st"))) /
                d(col("np") * col("np")))), 6))
          .as("alpha"))
  }
}
