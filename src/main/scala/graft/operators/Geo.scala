package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference engine family's geo function surface
  * (`greatCircleDistance`, `geohashEncode`, `pointInPolygon`) as
  * column algebra — the SIEM deployment's "how far is this login from
  * the last one / which region is this IP in" layer.
  *
  * Cross-engine determinism is tiered, and deliberately so:
  *
  *  - [[pointInPolygon]] uses ONLY +,−,×,÷ and comparisons — IEEE-
  *    deterministic everywhere, so membership replays exactly on any
  *    engine (the oracle repeats the unrolled edge tests verbatim);
  *  - [[graft.functions.GeoOps.geohash]] bisects with plain double
  *    midpoints — also exact cross-engine (cells are JOIN KEYS, they
  *    must not drift);
  *  - [[greatCircleDistance]] goes through libm (sin/asin) whose last
  *    ulp is implementation-defined; consumers must bucket or round
  *    before comparing across engines — the suite query buckets to
  *    100 km bands, where a ulp can never flip a band (band edges are
  *    rational, haversine outputs are not).
  *
  * Everything here is a map-side column expression: no shuffle, no
  * state, codegen-friendly — at 100 TB these run at scan speed inside
  * whole-stage codegen. */
object Geo {

  /** Haversine great-circle distance in METERS (the family's
    * `greatCircleDistance(lon1, lat1, lon2, lat2)`), mean earth
    * radius 6371000 m. Written as one fixed expression tree — the
    * operand order is part of the cross-engine contract. */
  def greatCircleDistance(lat1: Column, lon1: Column,
      lat2: Column, lon2: Column): Column = {
    val dphi = radians(lat2 - lat1)
    val dl = radians(lon2 - lon1)
    val a = sin(dphi / 2) * sin(dphi / 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * (sin(dl / 2) * sin(dl / 2))
    lit(6371000.0) * (lit(2.0) * asin(sqrt(a)))
  }

  /** Geohash cell id at `precision` chars (join-key safe — see
    * [[graft.functions.GeoOps]]). */
  def geohashEncode(lat: Column, lon: Column, precision: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, eagerExpression}
    column(graft.functions.GeohashEncode(
      eagerExpression(lat), eagerExpression(lon), precision))
  }

  /** Ray-casting point-in-polygon against a CONSTANT polygon (the
    * family's `pointInPolygon((x, y), [(x1,y1), …])` with a literal
    * ring — the blocklist-region / geofence shape). The polygon is
    * unrolled at plan time into one crossing test per edge, XOR-ed:
    * only +,−,×,÷ and comparisons, so the answer is bit-identical on
    * every IEEE engine. Vertices must not duplicate consecutive y
    * values (no horizontal edges) — the standard ray-cast guard; the
    * require below enforces it at plan time rather than dividing by
    * zero at runtime. Points exactly ON an edge follow the half-open
    * convention (y1 > y) != (y2 > y). */
  def pointInPolygon(x: Column, y: Column,
      polygon: Seq[(Double, Double)]): Column = {
    require(polygon.size >= 3, "pointInPolygon: need at least 3 vertices")
    val edges = polygon.zip(polygon.tail :+ polygon.head)
    edges.foreach { case ((_, y1), (_, y2)) =>
      require(y1 != y2,
        "pointInPolygon: horizontal edges are not supported (ray-cast " +
          "division by zero); perturb the vertex by an epsilon")
    }
    edges.map { case ((x1, y1), (x2, y2)) =>
      ((lit(y1) > y) =!= (lit(y2) > y)) &&
        (x < (lit(x2 - x1) * (y - lit(y1)) / lit(y2 - y1) + lit(x1)))
    }.reduce(_ =!= _)
  }
}
