package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Preference-data analytics — the leaderboard step of an RLHF /
  * evaluation pipeline: crunch a corpus of pairwise outcomes ("judge
  * preferred completion A over B") into per-item strength scores with
  * the Bradley-Terry model, the standard fit behind Chatbot-Arena-style
  * rankings and reward-model calibration audits.
  *
  * Scale posture: the only pass over the (potentially billions-row)
  * comparison corpus is ONE map-side-combined `groupBy(winner, loser)`
  * count; everything after runs on the pair-count matrix, which is
  * bounded by distinct-items² — leaderboards compare tens-to-thousands
  * of models/policies, so the matrix is driver-sized BY CONSTRUCTION
  * even when the comparison log is not. The fit itself uses the MM
  * (minorization-maximization) update of Hunter 2004, "MM algorithms
  * for generalized Bradley-Terry models" (public literature), run a
  * fixed number of iterations in exact fixed-point arithmetic so any
  * engine — the DuckDB oracle included — replays the identical scores.
  */
object Preference {

  /** Pairwise comparisons implied by co-occurring scored observations:
    * within each `groupCol` group (a user, a prompt, a session), every
    * unordered pair of rows with DIFFERENT items and DIFFERENT scores
    * yields one (winner, loser) row — higher score wins; ties and
    * same-item pairs carry no signal and are dropped. `orderCol` (a
    * unique id) orients each unordered pair exactly once, so the output
    * is deterministic under any physical layout.
    *
    * Scale shape: a self-equi-join on `groupCol` — groups parallelize
    * and the blow-up is the intrinsic Σ n_g², the comparison set's own
    * size (cap group fan-out upstream if single groups are huge). Only the
    * four needed columns enter the join. */
  def impliedComparisons(df: DataFrame, groupCol: String, itemCol: String,
      scoreCol: String, orderCol: String): DataFrame = {
    val need = df.select(col(groupCol).as("__g"), col(itemCol).as("__i"),
      col(scoreCol).as("__s"), col(orderCol).as("__o"))
    val a = need.as("a")
    val b = need.as("b")
    a.join(b,
        col("a.__g") === col("b.__g") && col("a.__o") < col("b.__o") &&
          col("a.__i") =!= col("b.__i") && col("a.__s") =!= col("b.__s"))
      .select(
        when(col("a.__s") > col("b.__s"), col("a.__i"))
          .otherwise(col("b.__i")).as("winner"),
        when(col("a.__s") > col("b.__s"), col("b.__i"))
          .otherwise(col("a.__i")).as("loser"))
  }

  /** Pairwise win-rate matrix with Wilson score bounds — the
    * leaderboard's uncertainty companion (a 7-2 record and a 700-200
    * record have the same rate and very different intervals): one row
    * per ORDERED pair (i, j) with i's wins over j, the pair's total
    * comparisons, the rate and the Wilson interval at the given z.
    * Null items are dropped (no ranking signal, [[fitCounts]]'s
    * contract).
    *
    * Exactness: wins and totals are exact longs from ONE map-side-
    * combined aggregation; rate and interval are single double
    * expressions over those longs (z enters as a literal, sqrt is
    * correctly rounded IEEE), so any engine replays the values
    * bit-for-bit. Scale shape: one shuffle on (i, j); output is
    * ≤ items² rows by definition. */
  def winRates(comparisons: DataFrame, winnerCol: String = "winner",
      loserCol: String = "loser", z: Double = 1.96): DataFrame = {
    val cmp = comparisons
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull)
    val dir = cmp.select(col(winnerCol).cast("string").as("i"),
        col(loserCol).cast("string").as("j"), lit(1L).as("__w"))
      .unionByName(cmp.select(col(loserCol).cast("string").as("i"),
        col(winnerCol).cast("string").as("j"), lit(0L).as("__w")))
    val agg = dir.groupBy(col("i"), col("j"))
      .agg(sum(col("__w")).as("wins"), count(lit(1)).as("comparisons"))
    val m = col("comparisons")
    val p = col("wins").cast("double") / m.cast("double")
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / m
    val center = (p + z2 / (m * 2)) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / m +
      z2 / (m.cast("double") * m.cast("double") * lit(4.0))) / denom
    agg.select(col("i"), col("j"), col("wins"), col("comparisons"),
      round(p, 6).as("rate"),
      round(center - half, 6).as("wilson_lo"),
      round(center + half, 6).as("wilson_hi"))
  }

  /** The fixed-point unit: scores are stored in integer micro-units
    * (1.0 ≡ 1,000,000), so every engine folds them with exact BIGINT
    * addition and only the per-term division is floating point — and
    * THAT is deterministic IEEE-754 given the identical expression
    * `x * 1.0e15 / y` on both sides. */
  private val Unit0 = 1000000L

  /** Bradley-Terry strength fit over a (winner, loser) comparison
    * corpus: `iterations` rounds of the MM update
    * `s'_i = W_i / Σ_j M_ij / (s_i + s_j)` from the uniform start,
    * where `W_i` = total wins of i and `M_ij` = total comparisons
    * between i and j. Items appearing in at least one comparison are
    * scored; winless items floor at one micro-unit (the MM zero, kept
    * positive so opponents' denominators stay defined).
    *
    * Returns one row per item: (item, wins, comparisons, score_ppm)
    * with `score_ppm` the item's share of total strength in parts per
    * million — scale-free, engine-replayable, and exactly what a
    * leaderboard publishes.
    *
    * Determinism contract: the heavy pass is the distributed pair
    * count; the fit runs on the collected pair matrix (bounded by
    * distinct-items², the documented driver cap) in fixed-point — each
    * MM term is `round(x * 1.0e15 / y)` of exact BIGINTs, so the
    * DuckDB oracle unrolling the same iterations lands on identical
    * integers; no reassociated float sums anywhere. */
  def bradleyTerry(comparisons: DataFrame, winnerCol: String = "winner",
      loserCol: String = "loser", iterations: Int = 3): DataFrame =
    // the ONLY pass over the comparison corpus: map-side-combined count
    fitCounts(comparisons
      .groupBy(col(winnerCol).cast("string").as("i"),
        col(loserCol).cast("string").as("j"))
      .agg(count(lit(1)).as("n")), iterations)

  /** [[bradleyTerry]] from an already-aggregated directed pair-count
    * frame `(i, j, n)` = "i beat j n times" (duplicate (i, j) rows
    * fold by addition, so partial counts — e.g. a streaming counter
    * table's batches — feed in directly). This is the seam the
    * streaming twin reads through: the fit over summed partials is
    * the fit over the union of the batches, exactly. */
  def fitCounts(pairCounts: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "need at least one MM iteration")
    val spark = pairCounts.sparkSession
    // null items carry no ranking signal (a dirty row in a streamed
    // comparison log must not poison every later leaderboard read) —
    // dropped, matching SQL join semantics where a null never matches.
    // Collected result is ≤ distinct-items(items-1) rows by definition
    val n: Array[(String, String, Long)] = pairCounts
      .filter(col("i").isNotNull && col("j").isNotNull)
      .groupBy(col("i"), col("j")).agg(sum(col("n")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    val schema = StructType(Seq(
      StructField("item", StringType),
      StructField("wins", LongType),
      StructField("comparisons", LongType),
      StructField("score_ppm", LongType)))
    if (n.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)

    val wins: Map[String, Long] = n.groupBy(_._1)
      .map { case (i, rs) => i -> rs.map(_._3).sum }
      .withDefaultValue(0L)
    // symmetric pair totals M_ij (i ≠ j, both directions present once)
    val m: Map[(String, String), Long] = n
      .flatMap { case (i, j, c) => Seq((i, j) -> c, (j, i) -> c) }
      .groupBy(_._1).map { case (k, rs) => k -> rs.map(_._2).sum }
    val items: Seq[String] = m.keys.map(_._1).toSeq.distinct.sorted
    // one pass over the pair matrix — an items-sized map of per-item
    // scans would be O(items·items²) driver work at leaderboard scale
    val opponents: Map[String, Seq[(String, Long)]] = m.toSeq
      .map { case ((i, j), c) => i -> (j, c) }
      .groupBy(_._1).map { case (i, rs) => i -> rs.map(_._2).sortBy(_._1) }

    var s: Map[String, Long] = items.map(_ -> Unit0).toMap
    var k = 0
    while (k < iterations) {
      s = items.map { i =>
        val denom = opponents(i).map { case (j, mij) =>
          math.round(mij.toDouble * 1.0e15 / (s(i) + s(j)).toDouble)
        }.sum
        i -> math.max(1L, math.round(
          wins(i).toDouble * 1.0e15 / denom.toDouble))
      }.toMap
      k += 1
    }
    val total = items.map(s).sum
    val rows = items.map { i =>
      Row(i, wins(i), opponents(i).map(_._2).sum,
        math.round(s(i).toDouble * 1.0e6 / total.toDouble))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }
}
