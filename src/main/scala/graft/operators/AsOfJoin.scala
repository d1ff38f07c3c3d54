package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF LEFT JOIN — for each left row, attach the right row with the
  * greatest `rightTs <= leftTs` among rows sharing the join key.
  *
  * This is the SCD2 as-of resolution the reference performs with
  * ClickHouse `ASOF LEFT JOIN` (three of them per fact build,
  * /root/reference/airflow/dags/sql/fact_wazuh_events.sql:60-68, matching
  * `event_ts >= effective_from`). Spark has no native asof join, so two
  * compositions are provided; both preserve every left row exactly once.
  *
  *  - [[AsOfJoin.broadcast]] — equi-join + per-left-row max: right side is
  *    broadcast; correct choice when the right side is a dimension
  *    (SCD2 dims here are ≪ memory). Cost: |L ⋈ R| intermediate rows per
  *    key — fine for version-chains, wrong for big-big.
  *  - [[AsOfJoin.merge]] — union + ordered window carry-forward: ONE
  *    shuffle by key, no row explosion; the 100 TB path when both sides
  *    are large (e.g. asof-joining two fact streams).
  *
  * Tie semantics: `>=` — a right row effective exactly at leftTs matches
  * (reference uses `>=`; property-tested in AsOfJoinSpec).
  */
object AsOfJoin {

  /** Right-side-small variant. `rightCols` = payload columns to attach
    * (defaults to all non-key, non-ts right columns). */
  def broadcast(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    val rowId = "__asof_row_id"
    val l = left.withColumn(rowId, monotonically_increasing_id())
    val payload = right.columns.filterNot(keys.contains).toSeq
    // row_number over (left row) picking the greatest matching rightTs
    val joined = l.join(
      org.apache.spark.sql.functions.broadcast(right),
      keys.map(k => l(k) <=> right(k)).reduce(_ && _) &&
        (l(leftTs) >= right(rightTs)),
      "left")
    val w = Window.partitionBy(col(rowId)).orderBy(right(rightTs).desc_nulls_last)
    val picked = joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
    // project: all left columns (by origin), then right payload columns
    val cols = left.columns.map(c => l(c).as(c)) ++
      payload.map(c => right(c).as(c))
    picked.select(cols.toIndexedSeq: _*)
  }

  /** Big-big variant: single shuffle, no row explosion.
    * Union left+right tagged rows, sort within key by (ts, side) with the
    * right side first on ties (so `>=` holds), carry the latest right
    * payload forward with last_value(ignoreNulls) over a struct (struct
    * packing keeps one version's attributes together even when some
    * attribute is genuinely null). */
  def merge(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c)).toSeq
      .filterNot(_ == rightTs)
    val ts = "__asof_ts"
    val side = "__asof_side" // 0 = right (sorts first on tie), 1 = left
    val pack = "__asof_pack"

    val rightTagged = right.select(
      (keys.map(col) :+
        col(rightTs).as(ts) :+
        lit(0).as(side) :+
        struct((col(rightTs).as(rightTs) +: payload.map(col)).toIndexedSeq: _*).as(pack)) ++
        left.columns.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = left.select(
      (keys.map(col) :+
        col(leftTs).cast(right.schema(rightTs).dataType).as(ts) :+
        lit(1).as(side) :+
        lit(null).cast(rightTagged.schema(pack).dataType).as(pack)) ++
        left.columns.filterNot(keys.contains).map(col): _*)

    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(col(ts).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightTagged.unionByName(leftTagged)
      .withColumn(pack, last(col(pack), ignoreNulls = true).over(w))
      .filter(col(side) === 1)

    val cols = left.columns.map {
      case c if keys.contains(c) => col(c)
      case c if c == leftTs => col(ts).as(leftTs)
      case c => col(c)
    }.toSeq ++ payload.map(c => col(pack)(c).as(c)) :+
      col(pack)(rightTs).as(rightTs)
    carried.select(cols.toIndexedSeq: _*)
  }
}
