package graft.functions

import graft.SparkSpec

/** window_funnel_max vs an exhaustive reference: the one-pass DP must
  * equal a brute-force search over every anchor chain (strictly
  * increasing seconds, window measured from the anchor) on random
  * event streams — including same-second pileups, stray anchors, and
  * out-of-window decoys. */
class WindowFunnelPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Max level over all chains e1 < e2 < … < eL with step(ei) = i and
    * sec(eL) − sec(e1) ≤ w. Exhaustive: branches over every
    * qualifying event per step. */
  private def brute(events: Seq[(Long, Int)], k: Int, w: Long): Int = {
    def extend(level: Int, lastSec: Long, anchor: Long): Int =
      if (level == k) k
      else {
        val nexts = events.filter { case (s, st) =>
          st == level + 1 && s > lastSec && s - anchor <= w }
        if (nexts.isEmpty) level
        else nexts.map { case (s, _) => extend(level + 1, s, anchor) }.max
      }
    val anchors = events.collect { case (s, 1) => s }
    if (anchors.isEmpty) 0 else anchors.map(a => extend(1, a, a)).max
  }

  test("DP equals exhaustive search on 300 random keys (k=3, dense seconds)") {
    graft.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(20260814L)
    val base = 1700000000L
    val w = 40L
    // dense second range [0, 100) forces same-second collisions and
    // many in/out-of-window boundaries against w = 40
    val cases: Map[Long, Seq[(Long, Int)]] = (1L to 300L).map { key =>
      val n = 1 + rnd.nextInt(12)
      key -> Seq.fill(n)((base + rnd.nextInt(100).toLong, 1 + rnd.nextInt(3)))
    }.toMap
    val rows = cases.toSeq.flatMap { case (key, evs) =>
      evs.map { case (s, st) => (key, st, new java.sql.Timestamp(s * 1000L)) }
    }
    rows.toDF("user_id", "step", "ts").repartition(8)
      .createOrReplaceTempView("wfp_events")
    val got = spark.sql(
      s"""SELECT user_id, window_funnel_max(${w}L, ts,
         |  step = 1, step = 2, step = 3) AS level
         |FROM wfp_events GROUP BY user_id""".stripMargin)
      .as[(Long, Int)].collect().toMap
    val bad = cases.flatMap { case (key, evs) =>
      val expect = brute(evs, 3, w)
      if (got.getOrElse(key, 0) != expect)
        Some(s"key $key: dp=${got.getOrElse(key, 0)} brute=$expect evs=$evs")
      else None
    }
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }
}
