package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF LEFT JOIN — for each left row, attach the nearest right row by
  * time among rows sharing the join key: the greatest `rightTs <=
  * leftTs` (direction "backward", the default) or the smallest
  * `rightTs >= leftTs` ("forward"). An optional tolerance (seconds)
  * nulls the match when the nearest version is further away than that.
  *
  * This is the SCD2 as-of resolution the reference performs with
  * ClickHouse `ASOF LEFT JOIN` (three of them per fact build,
  * /root/reference/airflow/dags/sql/fact_wazuh_events.sql:60-68, matching
  * `event_ts >= effective_from`). Spark has no native asof join, so two
  * compositions are provided; both preserve every left row exactly once.
  *
  *  - [[AsOfJoin.broadcast]] — equi-join + per-left-row extremum: right
  *    side is broadcast; correct choice when the right side is a
  *    dimension (SCD2 dims here are ≪ memory). Cost: |L ⋈ R|
  *    intermediate rows per key — fine for version-chains, wrong for
  *    big-big.
  *  - [[AsOfJoin.merge]] — union + ordered window carry-forward: ONE
  *    shuffle by key, no row explosion; the 100 TB path when both sides
  *    are large (e.g. asof-joining two fact streams).
  *
  * Tie semantics: equality matches in both directions (reference uses
  * `>=`; property-tested in AsOfJoinSpec).
  */
object AsOfJoin {

  private def checkDirection(d: String): Unit =
    require(d == "backward" || d == "forward",
      s"direction must be backward|forward, got $d")

  /** Right-side-small variant. Attaches all non-key right columns. */
  def broadcast(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    checkDirection(direction)
    val rowId = "__asof_row_id"
    val l = left.withColumn(rowId, monotonically_increasing_id())
    val payload = right.columns.filterNot(keys.contains).toSeq
    val timeCond =
      if (direction == "backward") l(leftTs) >= right(rightTs)
      else l(leftTs) <= right(rightTs)
    val tolCond = toleranceSeconds.map { tol =>
      abs(unix_timestamp(l(leftTs)) - unix_timestamp(right(rightTs))) <= tol
    }.getOrElse(lit(true))
    val joined = l.join(
      org.apache.spark.sql.functions.broadcast(right),
      keys.map(k => l(k) <=> right(k)).reduce(_ && _) && timeCond && tolCond,
      "left")
    val order =
      if (direction == "backward") right(rightTs).desc_nulls_last
      else right(rightTs).asc_nulls_last
    val w = Window.partitionBy(col(rowId)).orderBy(order)
    val picked = joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
    // project: all left columns (by origin), then right payload columns
    val cols = left.columns.map(c => l(c).as(c)) ++
      payload.map(c => right(c).as(c))
    picked.select(cols.toIndexedSeq: _*)
  }

  /** Big-big variant: single shuffle, no row explosion.
    * Union left+right tagged rows, sort within key by (ts, side) with
    * the right side winning ties (so equality matches), carry the
    * nearest right payload through with last_value(ignoreNulls) over a
    * struct (struct packing keeps one version's attributes together
    * even when some attribute is genuinely null). "forward" is the same
    * carry over the reversed sort.
    *
    * `nullKeysMatch = false` short-circuits null join keys around the
    * window: every left row whose key tuple contains a null would land
    * in ONE window partition (nulls group together) — at 100 TB that
    * single task absorbs all unkeyed facts, and when the right side has
    * no null-keyed rows (dims by construction) those facts can only
    * resolve to null anyway. The bypass filters them out before the
    * shuffle and unions them back with a null payload; null-keyed right
    * rows are dropped (nothing left can match them). The default keeps
    * the null-safe (`<=>`-style) matching semantics. */
  def merge(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None,
      nullKeysMatch: Boolean = true): DataFrame = {
    checkDirection(direction)
    val payload = right.columns.filterNot(c => keys.contains(c)).toSeq
      .filterNot(_ == rightTs)
    val (leftIn, leftBypass, rightIn) =
      if (nullKeysMatch) (left, None, right)
      else {
        val anyNull = keys.map(col(_).isNull).reduce(_ || _)
        (left.filter(!anyNull), Some(left.filter(anyNull)),
          right.filter(keys.map(col(_).isNotNull).reduce(_ && _)))
      }
    val ts = "__asof_ts"
    val side = "__asof_side" // 0 = right (sorts first on tie), 1 = left
    val pack = "__asof_pack"

    val rightTagged = rightIn.select(
      (keys.map(col) :+
        col(rightTs).as(ts) :+
        lit(0).as(side) :+
        struct((col(rightTs).as(rightTs) +: payload.map(col)).toIndexedSeq: _*).as(pack)) ++
        left.columns.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val leftTagged = leftIn.select(
      (keys.map(col) :+
        col(leftTs).cast(right.schema(rightTs).dataType).as(ts) :+
        lit(1).as(side) :+
        lit(null).cast(rightTagged.schema(pack).dataType).as(pack)) ++
        left.columns.filterNot(keys.contains).map(col): _*)

    val order =
      if (direction == "backward") col(ts).asc else col(ts).desc
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(order, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = rightTagged.unionByName(leftTagged)
      .withColumn(pack, last(col(pack), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
    val carried = toleranceSeconds.fold(carried0) { tol =>
      carried0.withColumn(pack,
        when(abs(unix_timestamp(col(ts)) -
          unix_timestamp(col(pack)(rightTs))) <= tol, col(pack)))
    }

    val cols = left.columns.map {
      case c if keys.contains(c) => col(c)
      case c if c == leftTs => col(ts).as(leftTs)
      case c => col(c)
    }.toSeq ++ payload.map(c => col(pack)(c).as(c)) :+
      col(pack)(rightTs).as(rightTs)
    val resolved = carried.select(cols.toIndexedSeq: _*)
    leftBypass.fold(resolved) { nulls =>
      val nullCols = left.columns.map {
        case c if c == leftTs =>
          col(c).cast(right.schema(rightTs).dataType).as(c)
        case c => col(c)
      }.toSeq ++ payload.map(c =>
        lit(null).cast(right.schema(c).dataType).as(c)) :+
        lit(null).cast(right.schema(rightTs).dataType).as(rightTs)
      resolved.unionByName(nulls.select(nullCols.toIndexedSeq: _*))
    }
  }
}
