package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed pins for the interval/delta aggregates (h26/h27/d18
  * suite queries run the same code against the DuckDB oracle). */
class IntervalsSpec extends SparkSpec {

  import spark.implicits._

  test("maxIntersections: half-open touch does not count as overlap") {
    // [0,10) [5,15) [10,20): two open on [5,10); at t=10 the first
    // closes BEFORE the third opens (closers sort first)
    val iv = Seq(("g", 0L, 10L), ("g", 5L, 15L), ("g", 10L, 20L),
      ("h", 0L, 1L), ("h", 1L, 2L)).toDF("g", "s", "e")
    val out = Intervals.maxIntersections(iv, col("s"), col("e"),
        col("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("g") == 2L)
    assert(out("h") == 1L) // back-to-back, never concurrent
  }

  test("intervalLengthSum merges overlaps and drops degenerates") {
    val iv = Seq(
      ("g", 0L, 10L), ("g", 5L, 15L),   // merge → [0,15) = 15
      ("g", 20L, 30L),                  // island → 10
      ("g", 7L, 9L),                    // contained, adds nothing
      ("g", 50L, 50L),                  // degenerate, dropped
      ("h", 3L, 4L)).toDF("g", "s", "e")
    val out = Intervals.intervalLengthSum(iv, col("s"), col("e"),
        col("g"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("g") == 25L)
    assert(out("h") == 1L)
  }

  test("deltaSum sums only positive deltas in the declared order") {
    val rows = Seq(("g", 1L, 5L), ("g", 2L, 3L), ("g", 3L, 8L),
      ("g", 4L, 2L), ("g", 5L, 9L), ("h", 1L, 7L))
      .toDF("g", "ord", "m")
    val out = Intervals.deltaSum(rows, col("m"), col("g"),
        Seq(col("ord")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(out("g") == ((5L + 7L, 5L))) // 3→8 and 2→9
    assert(out("h") == ((0L, 1L)))      // single row: no delta
  }
}
