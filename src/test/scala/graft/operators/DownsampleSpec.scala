package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** LTTB: endpoint retention, output size, pass-through, spike
  * preservation, and an exhaustive check of the bucket-boundary
  * integer convention against a direct reference fold. */
class DownsampleSpec extends SparkSpec {
  import spark.implicits._

  private def series(g: String, pts: Seq[(Long, Long)]) =
    pts.map { case (t, v) => (g, t, v) }.toDF("g", "t", "v")

  test("endpoints always kept; output is exactly threshold points") {
    val pts = (0L until 100L).map(t => (t, (t * 7) % 23))
    val out = Downsample.lttb(series("a", pts), "t", "v", "g", 12)
      .orderBy("t").as[(String, Long, Long)].collect()
    assert(out.length == 12)
    assert(out.head == ("a", 0L, 0L))
    assert(out.last == ("a", 99L, (99L * 7) % 23))
  }

  test("series at or under threshold pass through whole") {
    val pts = (0L until 8L).map(t => (t, t * t))
    val out = Downsample.lttb(series("a", pts), "t", "v", "g", 10)
      .orderBy("t").as[(String, Long, Long)].collect()
    assert(out.toSeq == pts.map { case (t, v) => ("a", t, v) })
  }

  test("an extreme spike always survives downsampling") {
    // flat series with one huge spike: the spike's triangle area
    // dominates its bucket, so LTTB must keep it
    val pts = (0L until 200L).map(t => (t, if (t == 117L) 100000L else 10L))
    val out = Downsample.lttb(series("a", pts), "t", "v", "g", 10)
      .as[(String, Long, Long)].collect()
    assert(out.exists(_._2 == 117L), s"spike must survive: ${out.toSeq}")
  }

  test("multiple series downsample independently in one pass") {
    val a = (0L until 50L).map(t => ("a", t, t % 7))
    val b = (0L until 80L).map(t => ("b", t, t % 11))
    val out = Downsample.lttb((a ++ b).toDF("g", "t", "v"),
        "t", "v", "g", 10)
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 10L, "b" -> 10L))
  }

  test("selection matches a direct reference fold on pseudo-random data") {
    // independent re-implementation of the documented convention:
    // bucket of middle idx = floor((idx-1)(B-2)/(n-2)), argmax of
    // |(tp*c - st)(v - vp) - (tp - t)(sv - vp*c)|, first max wins
    val n = 137
    val b = 9
    val pts = (0 until n)
      .map(i => (i.toLong, ((i * 2654435761L) % 1000L)))
      .sortBy(identity)
    def reference: Seq[(Long, Long)] = {
      val m = n - 2
      val kk = b - 2
      val bucketOf = (idx: Int) => ((idx - 1).toLong * kk / m).toInt
      val buckets = (1 to n - 2).groupBy(bucketOf).view
        .mapValues(_.map(pts)).toMap
      var prev = pts(0)
      val out = scala.collection.mutable.ArrayBuffer(pts(0))
      for (k <- 0 until kk) {
        val (st, sv, c) =
          if (k == kk - 1) (pts(n - 1)._1, pts(n - 1)._2, 1L)
          else {
            val nx = buckets(k + 1)
            (nx.map(_._1).sum, nx.map(_._2).sum, nx.size.toLong)
          }
        val cand = buckets(k)
        var best = cand.head
        var bestA = -1L
        cand.foreach { case (t, v) =>
          val a = math.abs((prev._1 * c - st) * (v - prev._2) -
            (prev._1 - t) * (sv - prev._2 * c))
          if (a > bestA) { bestA = a; best = (t, v) }
        }
        out += best
        prev = best
      }
      out += pts(n - 1)
      out.toSeq
    }
    val got = Downsample.lttb(pts.map(p => ("s", p._1, p._2))
        .toDF("g", "t", "v"), "t", "v", "g", b)
      .orderBy("t").as[(String, Long, Long)].collect()
      .map(r => (r._2, r._3)).toSeq
    assert(got == reference, s"$got != $reference")
  }
}
