package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Time-series downsampling for dashboards — the engine family's
  * `largestTriangleThreeBuckets` aggregate (Steinarsson 2013,
  * "Downsampling Time Series for Visual Representation"; ClickHouse
  * ships it for exactly the BI-panel use the reference stack's
  * dashboards serve): reduce each series to `threshold` points that
  * preserve its visual shape — first and last points fixed, one
  * point per equal-size bucket chosen to maximize the triangle area
  * against the previously selected point and the NEXT bucket's
  * average.
  *
  * Exactness discipline: the area argmax is evaluated on
  * CROSS-MULTIPLIED integers — the next-bucket average (a rational
  * sum/count) never becomes a float; 2·area·count =
  * |(t_prev·c − Σt)·(v − v_prev) − (t_prev − t)·(Σv − v_prev·c)|
  * is an exact Long, ties break on (t, v) ascending — so the greedy
  * selection is deterministic and replays in SQL (the suite oracle
  * unrolls the bucket loop into chained argmax CTEs, the same
  * fixed-iteration unrolling as the BPE oracle).
  *
  * Scale shape: one shuffle groups each series; the sequential scan
  * is per-series (LTTB is inherently order-dependent — the choice in
  * bucket k depends on bucket k−1's choice). Each series must fit an
  * executor: bounded by construction for dashboard series (points
  * per metric per window); for unbounded series, pre-bucket by time
  * range first — the same precondition family as within-doc line
  * dedup. Long overflow bound: |Δt|·|Δv|·bucket_count < 2⁶³ — epochs
  * within a window times integer measures are far inside it.
  */
object Downsample {

  /** LTTB per series: returns (groupCol, tCol, vCol) — the ≤
    * `threshold` selected points of each series, in time order.
    * Series with ≤ threshold points pass through whole. `tCol` and
    * `vCol` must be integral (epoch seconds / fixed-point units —
    * the suite convention); duplicate timestamps are ordered by
    * (t, v) so selection never depends on arrival order. */
  def lttb(points: DataFrame, tCol: String, vCol: String,
      groupCol: String, threshold: Int): DataFrame = {
    require(threshold >= 3, s"lttb needs >= 3 output points, got $threshold")
    val spark = points.sparkSession
    import spark.implicits._
    val ds: Dataset[(String, Long, Long)] = points
      .select(col(groupCol).cast("string"), col(tCol).cast("long"),
        col(vCol).cast("long"))
      .as[(String, Long, Long)]
    ds.groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val pts = it.map(r => (r._2, r._3)).toArray
        java.util.Arrays.sort(pts,
          Ordering.Tuple2(Ordering.Long, Ordering.Long))
        val n = pts.length
        if (n <= threshold) pts.iterator.map(p => (g, p._1, p._2))
        else {
          val b = threshold
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](b)
          out += pts(0)
          var prev = pts(0)
          var k = 0
          // middle point at index idx (1..n−2) belongs to bucket
          // k = floor((idx−1)·(B−2)/(n−2)) — the floor-division
          // assignment the SQL oracle replays; its inverse boundary
          // is the CEIL form below (bucket k = [ceil(kM/K)+1,
          // ceil((k+1)M/K)+1) over idx, M = n−2, K = B−2)
          def lo(kk: Int): Int =
            ((kk.toLong * (n - 2) + (b - 3)) / (b - 2)).toInt + 1
          while (k < b - 2) {
            val s = lo(k)
            val e = lo(k + 1)
            // next bucket's stats (the last bucket points at the
            // final point)
            val (st, sv, c) =
              if (k == b - 3) (pts(n - 1)._1, pts(n - 1)._2, 1L)
              else {
                val ns = lo(k + 1)
                val ne = lo(k + 2)
                var tt = 0L; var vv = 0L
                var i = ns
                while (i < ne) { tt += pts(i)._1; vv += pts(i)._2; i += 1 }
                (tt, vv, (ne - ns).toLong)
              }
            var best = pts(s)
            var bestArea = -1L
            var i = s
            while (i < e) {
              val (t, v) = pts(i)
              val area = math.abs(
                (prev._1 * c - st) * (v - prev._2) -
                  (prev._1 - t) * (sv - prev._2 * c))
              // strict >: scanning in (t, v) order, the first maximum
              // IS the (t, v)-ascending tie-break
              if (area > bestArea) { bestArea = area; best = (t, v) }
              i += 1
            }
            out += best
            prev = best
            k += 1
          }
          out += pts(n - 1)
          out.iterator.map(p => (g, p._1, p._2))
        }
      }
      .toDF(groupCol, tCol, vCol)
  }
}
