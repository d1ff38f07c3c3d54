package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-behavior analytics over the event stream: funnel depth,
  * cohort retention, and ordered-pair sequence matching — the three
  * ClickHouse-signature behavioral aggregates (`windowFunnel`,
  * `retention`, `sequenceMatch`) a user of the reference stack
  * (ClickHouse + Superset, reference `clickhouse/init/03_gold_tables
  * .sql`, `superset/bootstrap/`) reaches for next after the
  * counts/top-k its example dashboards stop at.
  *
  * All three are EXACT formulations over epoch-second longs: no float
  * arithmetic anywhere, every tie broken by an explicit order column,
  * so funnel levels and retention flags replay bit-identically across
  * engines (the DuckDB oracle runs the same algebra).
  *
  * Scale shape (100 TB): every shuffle in this file is keyed on the
  * funnel/cohort key. [[windowFunnel]] is one aggregation round per
  * step — k steps = k key-partitioned shuffles over rows that already
  * matched the previous step (monotonically shrinking), never a
  * per-key array. [[retention]] and [[sequenceMatch]] are a single
  * aggregation / single window pass. Nothing collects to the driver.
  */
object Funnel {

  /** Earliest-first sequential funnel (the `windowFunnel(window)(ts,
    * cond1, …, condK)` shape): per key, step 1 anchors at the EARLIEST
    * step-1 event; each later step matches the earliest qualifying
    * event strictly after the previous step's match and within
    * `windowSec` of the anchor.
    *
    * CAPABILITY DIVERGENCE from the reference engine family: its
    * `windowFunnel` maximizes the chain length over ALL candidate
    * anchors, so a key with an early stray step-1 event followed later
    * by a complete in-window chain reports level 1 here but the full
    * level there. This variant exists because it also returns the
    * per-step TIMESTAMPS t1..tK (the anchor chain is unique); use
    * [[windowFunnelMax]] for level-for-level reference parity.
    *
    * Returns one row per key that completed step 1:
    * key, level (1..K), t1..tK epoch seconds (null beyond `level`).
    *
    * Implementation: K aggregation rounds, NOT a per-key sorted array
    * — `groupBy(key).agg(min(ts))` per step, each joined back on the
    * key. All K shuffles hash on the same key so AQE coalesces them,
    * and the candidate set shrinks every round (only keys that
    * reached step i-1 are joined). A million-event key costs the same
    * as anywhere else in the engine: its rows hash-aggregate map-side. */
  def windowFunnel(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      steps: Seq[Column],
      windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "windowFunnel needs at least one step")
    // no tiebreak column needed: every step match is a min over epoch
    // seconds, which is order-free
    val ev = events
      .withColumn("__s", unix_timestamp(col(tsCol)))
      .select(Seq(col(keyCol), col("__s")) ++ steps.zipWithIndex
        .map { case (c, i) => c.as(s"__c${i + 1}") }: _*)

    // step 1: earliest matching event per key anchors the window
    var res = ev.filter(col("__c1"))
      .groupBy(col(keyCol)).agg(min(col("__s")).as("t1"))

    for (i <- 2 to steps.size) {
      val prev = s"t${i - 1}"
      // candidates: step-i events of keys that reached step i-1,
      // strictly after the previous match, inside the anchor window
      val cand = ev.filter(col(s"__c$i"))
        .join(res.filter(col(prev).isNotNull)
          .select(col(keyCol), col("t1"), col(prev).as("__p")), Seq(keyCol))
        .filter(col("__s") > col("__p") &&
          col("__s") <= col("t1") + lit(windowSec))
        .groupBy(col(keyCol)).agg(min(col("__s")).as(s"t$i"))
      res = res.join(cand, Seq(keyCol), "left")
    }
    // t_i is non-null only if t_{i-1} is (inner-join chain), so the
    // level is just the count of non-null step timestamps
    val level = (1 to steps.size)
      .map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    res.withColumn("level", level)
  }

  /** Reference-parity funnel: per key, the MAXIMUM level over all
    * candidate anchors — there exists a chain e1 < e2 < … < e_level
    * (strictly increasing seconds, the family's `strict_increase`
    * mode) with t_level − t1 ≤ `windowSec`. One aggregation: the
    * native [[graft.functions.WindowFunnel]] TypedImperativeAggregate
    * in max-over-anchors mode resolves each group's DP in its
    * combiner, so the shuffle carries only matched (step, second)
    * pairs. Returns (key, level), level ≥ 1 rows only. */
  def windowFunnelMax(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      steps: Seq[Column],
      windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "windowFunnelMax needs at least one step")
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, eagerExpression}
    val agg = toCol(graft.functions.WindowFunnel(windowSec,
        eagerExpression(col(tsCol).cast("timestamp")),
        steps.map(eagerExpression),
        maxOverAnchors = true).toAggregateExpression())
    events.groupBy(col(keyCol)).agg(agg.as("level"))
      .filter(col("level") >= 1)
  }

  /** The engine family's `strict_dedup` / `strict_order` funnel modes
    * over the deterministic earliest-anchor chain (the modes the
    * reference family's `windowFunnel('strict_dedup')` /
    * `windowFunnel('strict_order')` flags select):
    *
    *  - `strictDedup`: once the chain starts, an event matching an
    *    already-satisfied condition interrupts the search;
    *  - `strictOrder`: ANY event that does not extend the chain —
    *    including non-funnel events — interrupts it (A→B→D→C stops
    *    at D with level 2).
    *
    * Same single aggregation as [[windowFunnelMax]]; in strict-order
    * mode non-funnel events enter the aggregate's packed-long buffer
    * as step-0 markers (they must be SEEN to interrupt), which is the
    * cost the reference family pays in that mode too.
    *
    * `maxOverAnchors = true` applies the strict flags INSIDE the
    * maximizing scan, the way the family's `windowFunnel(w,
    * 'strict_order')` does: the level is the max over every candidate
    * anchor of the strict chain walked from that anchor — an
    * interruption ends that anchor's chain, not the whole search.
    *
    * `markerCap` bounds the one unbounded state in the engine: order
    * mode's per-group buffer grows with EVENTS-per-key (every event
    * must be seen to interrupt). Past the cap the aggregate fails
    * loudly with a deterministic error naming the cap — never a
    * silent drop (a dropped marker could only inflate levels) and
    * never a quiet executor OOM. Raise it explicitly for a genuine
    * >4M-events-per-entity workload.
    * Returns (key, level), level ≥ 1 rows only. */
  def windowFunnelStrict(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      steps: Seq[Column],
      windowSec: Long,
      strictDedup: Boolean = false,
      strictOrder: Boolean = false,
      maxOverAnchors: Boolean = false,
      markerCap: Int = graft.functions.WindowFunnel.DefaultMarkerCap)
      : DataFrame = {
    require(steps.nonEmpty, "windowFunnelStrict needs at least one step")
    require(strictDedup || strictOrder,
      "windowFunnelStrict: enable at least one strict mode " +
        "(use windowFunnel for the plain earliest-anchor scan)")
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, eagerExpression}
    val agg = toCol(graft.functions.WindowFunnel(windowSec,
        eagerExpression(col(tsCol).cast("timestamp")),
        steps.map(eagerExpression),
        maxOverAnchors = maxOverAnchors,
        strictDedup = strictDedup,
        strictOrder = strictOrder,
        markerCap = markerCap).toAggregateExpression())
    events.groupBy(col(keyCol)).agg(agg.as("level"))
      .filter(col("level") >= 1)
  }

  /** Cohort retention (the `retention(cond1, …, condK)` shape): per
    * key, flag r1 = "cond1 ever held" and r_i = "cond1 AND cond_i both
    * ever held" — the standard day-0/day-N comeback matrix when the
    * conditions are date-window predicates. One map-side-combined
    * aggregation; flags are 0/1 ints, never floats.
    *
    * Returns key, r1..rK. Callers sum the flag columns for cohort
    * totals (see the h10 suite query). */
  def retention(
      events: DataFrame,
      keyCol: String,
      conds: Seq[Column]): DataFrame = {
    require(conds.nonEmpty, "retention needs at least one condition")
    val flags = conds.zipWithIndex.map { case (c, i) =>
      max(when(c, 1).otherwise(0)).as(s"__f${i + 1}")
    }
    val agg = events.groupBy(col(keyCol))
      .agg(flags.head, flags.tail: _*)
    val out = (1 to conds.size).map { i =>
      (if (i == 1) col("__f1")
       else col("__f1") * col(s"__f$i")).as(s"r$i")
    }
    agg.select(col(keyCol) +: out: _*)
  }

  /** Ordered-pair sequence match (the `sequenceMatch('(?1)(?t<=w)(?2)')`
    * shape): per key, does a `cond1` event precede a `cond2` event with
    * gap in (0, maxGapSec]? Single window pass — a running "latest
    * cond1 timestamp so far" (conditional max over the key-ordered
    * frame) turns the pair search into a per-row predicate, so there
    * is NO self-join: one key-partitioned sort, one aggregation.
    *
    * Returns matching keys only: key, first epoch second at which the
    * pattern completed (`matched_s`), and how many events completed it
    * (`n_matches`). Ties at the same second are ordered by `orderCol`,
    * so the running max is deterministic on both engines. */
  def sequenceMatch(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      orderCol: String,
      cond1: Column,
      cond2: Column,
      maxGapSec: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val scanned = events
      .withColumn("__s", unix_timestamp(col(tsCol)))
      .withColumn("__p1",
        max(when(cond1, unix_timestamp(col(tsCol)))).over(w))
      .withColumn("__hit",
        cond2 && col("__p1").isNotNull &&
          col("__s") - col("__p1") > 0 &&
          col("__s") - col("__p1") <= maxGapSec)
    scanned.groupBy(col(keyCol))
      .agg(min(when(col("__hit"), col("__s"))).as("matched_s"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("n_matches"))
      .filter(col("matched_s").isNotNull)
  }

  /** Multi-step `sequenceMatch('(?1)(?t<=g1)(?2)(?t<=g2)(?3)…')` with
    * a PER-GAP limit on each hop (no anchor window): the deepest
    * chain level each key reaches. Exact existence DP in the
    * [[graft.functions.SequenceChain]] aggregate — greedy scans are
    * wrong here (an early step-2 match can strand a later step-3
    * while a later step-2 completes the chain), and the oracle
    * replays the semantics as EXISTS-chain joins. One aggregation;
    * only matched events enter the buffer. Returns (key, level),
    * level ≥ 1 rows only. */
  def sequenceChain(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      steps: Seq[Column],
      gaps: Seq[Long]): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge.{column => toCol, eagerExpression}
    val agg = toCol(graft.functions.SequenceChain(gaps,
        eagerExpression(col(tsCol).cast("timestamp")),
        steps.map(eagerExpression)).toAggregateExpression())
    events.groupBy(col(keyCol)).agg(agg.as("level"))
      .filter(col("level") >= 1)
  }

  /** `sequenceNextNode` shape: per key, the value of the event
    * ADJACENT to a chosen anchor event — "what did each user do
    * right after their first signup" (forward/first_match), "right
    * before their last purchase" (backward/last_match), etc.
    *
    * direction: "forward" reads the NEXT event's value, "backward"
    * the previous one's. base: "first_match" anchors at the
    * earliest event satisfying `cond` in (ts, tie) order,
    * "last_match" at the latest.
    *
    * One per-key window (lead/lag) then a min/max over
    * (ts, tie, neighbor) structs — lexicographic struct ordering
    * picks the anchor without a second pass, and the unique tie
    * column makes it deterministic. Keys whose anchor is the
    * boundary event get a null next_node (kept, not dropped — the
    * reference's aggregate returns NULL there too).
    */
  def nextNode(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      orderCol: String,
      cond: Column,
      valueCol: Column,
      direction: String = "forward",
      base: String = "first_match"): DataFrame = {
    require(direction == "forward" || direction == "backward",
      s"nextNode: direction must be forward|backward, got $direction")
    require(base == "first_match" || base == "last_match",
      s"nextNode: base must be first_match|last_match, got $base")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(orderCol))
    val neighbor =
      if (direction == "forward") lead(valueCol, 1).over(w)
      else lag(valueCol, 1).over(w)
    val anchored = events
      .withColumn("__nb", neighbor)
      .filter(cond)
      .withColumn("__pick",
        struct(col(tsCol), col(orderCol), col("__nb")))
    val pick =
      if (base == "first_match") min(col("__pick")) else max(col("__pick"))
    anchored.groupBy(col(keyCol))
      .agg(pick.getField("__nb").as("next_node"))
  }
}
