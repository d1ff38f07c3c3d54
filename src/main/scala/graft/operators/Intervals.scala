package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval and delta aggregates over ordered event data — the
  * engine family's `maxIntersections`, `intervalLengthSum` and
  * `deltaSum` aggregate functions (the reference stack's ClickHouse
  * ships all three for session/load analysis over its events
  * tables, the same stream `clickhouse/init/02_kafka_ingest.sql.tmpl`
  * materializes).
  *
  * All three are per-key window computations: one hash shuffle on
  * the group key, then a per-key ordered pass — the canonical
  * scale shape for ordered-event analytics (the sort is within a
  * key's partition, never global). Everything is integer arithmetic
  * over epoch seconds / fixed-point cents, so results replay exactly
  * in any engine.
  */
object Intervals {

  /** Maximum number of simultaneously-open half-open intervals
    * [start, end) per group — peak concurrency. Classic sweep: ±1
    * boundary events, running sum ordered by (time, delta) with
    * closers first so a touch (one ends exactly where another
    * starts) never counts as overlap. Returns (group, max_open).
    */
  def maxIntersections(df: DataFrame, startS: Column, endS: Column,
      group: Column): DataFrame = {
    val bounds = df.select(group.as("__g"), startS.as("__s"),
        endS.as("__e"))
      .select(col("__g"), explode(array(
        struct(col("__s").as("t"), lit(1).as("d")),
        struct(col("__e").as("t"), lit(-1).as("d")))).as("b"))
      .select(col("__g"), col("b.t"), col("b.d"))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("t"), col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.withColumn("__open", sum(col("d")).over(w))
      .groupBy(col("__g"))
      .agg(max(col("__open")).as("max_open"))
  }

  /** Total length of the UNION of half-open intervals [start, end)
    * per group, overlaps merged (the engine family's
    * intervalLengthSum). Gaps-and-islands: a new island starts when
    * the interval's start exceeds the running max end of everything
    * before it; island length = max(end) − min(start); degenerate
    * start ≥ end rows are dropped. Returns (group, covered).
    */
  def intervalLengthSum(df: DataFrame, startS: Column, endS: Column,
      group: Column): DataFrame = {
    val rows = df.select(group.as("__g"), startS.as("__s"),
        endS.as("__e"))
      .filter(col("__s") < col("__e"))
    val wPrev = Window.partitionBy(col("__g"))
      .orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("__g"))
      .orderBy(col("__s"), col("__e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .withColumn("__brk",
        when(col("__s") > coalesce(max(col("__e")).over(wPrev),
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("__island", sum(col("__brk")).over(wRun))
      .groupBy(col("__g"), col("__island"))
      .agg(min(col("__s")).as("__is"), max(col("__e")).as("__ie"))
      .groupBy(col("__g"))
      .agg(sum(col("__ie") - col("__is")).as("covered"))
  }

  /** Sum of POSITIVE deltas of a fixed-point long measure along each
    * group's (orderBy, tiebreak) order — the engine family's
    * `deltaSum` (counter-reset-tolerant rate aggregation: drops on a
    * resetting counter contribute nothing). Returns
    * (group, delta_sum, n). */
  def deltaSum(df: DataFrame, measure: Column, group: Column,
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("__g")).orderBy(order: _*)
    df.select(Seq(group.as("__g"), measure.as("__m")) ++ order: _*)
      .withColumn("__prev", lag(col("__m"), 1).over(w))
      .groupBy(col("__g"))
      .agg(sum(when(col("__m") > col("__prev"),
        col("__m") - col("__prev")).otherwise(0L)).as("delta_sum"),
        count(lit(1)).as("n"))
  }
}
