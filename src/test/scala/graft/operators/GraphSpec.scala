package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-exact PageRank: checked against an in-test scalar
  * re-implementation of the same long arithmetic (the strongest
  * oracle a deterministic formulation allows), plus structural
  * properties. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000000L
  private val Damp = 850000L

  /** Driver-side mirror of [[Graph.pageRankInt]]'s long arithmetic. */
  private def refRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = Scale * (1000000L - Damp) / n / 1000000L
    var rank = nodes.map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val inc = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
      rank = nodes.map(v =>
        v -> (base + Damp * inc.getOrElse(v, 0L) / 1000000L)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRankInt(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("ranks equal the scalar long-arithmetic mirror on a mixed graph") {
    // hub, cycle, dangling node and a parallel edge all at once
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 5),
      (5, 2), (2, 5), (2, 5), // parallel edge weights dst 5
      (6, 1)) // 6 is a source-only node; 5->... keeps 5 non-dangling
    for (iters <- Seq(1, 3, 5))
      assert(run(edges, iters) == refRank(edges, iters),
        s"divergence at iters=$iters")
  }

  test("a symmetric cycle stays exactly uniform") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1))
    val got = run(edges, 4)
    assert(got.values.toSet.size == 1, s"cycle ranks must be equal: $got")
    // deg=1 everywhere: r' = base + 0.85*r exactly, in longs
    val expected = Iterator.iterate(Scale / 3)(r =>
      Scale * 150000L / 3L / 1000000L + Damp * r / 1000000L)
      .drop(4).next()
    assert(got(1L) == expected)
  }

  test("bfsDepth levels a chain, stops at maxDepth, survives cycles") {
    // chain 1->2->3->4->5 plus a back edge 3->1 (cycle must not loop)
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (4, 5), (3, 1))
      .toDF("src", "dst")
    val got = Graph.bfsDepth(edges, Seq(1L).toDF("node"), maxDepth = 3)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3),
      s"node 5 is 4 hops out and must be absent: $got")
    // an isolated seed exits on the first empty frontier
    val iso = Graph.bfsDepth(edges, Seq(99L).toDF("node"), maxDepth = 3)
      .as[(Long, Int)].collect().toSeq
    assert(iso == Seq(99L -> 0))
  }

  test("the sink of a star outranks the leaves; dangling mass decays") {
    // 5 leaves all pointing at node 0 (which points nowhere)
    val edges = (1L to 5L).map(i => (i, 0L))
    val got = run(edges, 3)
    assert(got(0L) > got(1L) * 3, s"star center dominates: $got")
    assert((1L to 5L).map(got).toSet.size == 1, "leaves tie exactly")
    assert(got == refRank(edges, 3))
  }

  test("seeded pagerank: mass flows FROM seeds; unreachable nodes get zero") {
    // 1 -> 2 -> 3 and an island 8 -> 9; seed at 1
    val edges = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val got = Graph.pageRankIntSeeded(edges, Seq(1L).toDF("node"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) > got(2L) && got(2L) > got(3L),
      s"rank decays with distance from the seed: $got")
    assert(got(8L) == 0L && got(9L) == 0L,
      s"no uniform reset: the island gets nothing: $got")
    // an isolated seed (no edges touching it) still holds reset mass
    val iso = Graph.pageRankIntSeeded(edges, Seq(42L).toDF("node"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(iso(42L) > 0L && iso(1L) == 0L, iso.toString)
  }

  test("triangle counts: K4 has 3 per node; direction/dups/loops ignored") {
    // K4 (every node in 3 triangles) + a pendant edge + noise:
    // reversed duplicates, a self-loop — none may change the count
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (2L, 1L), (4L, 3L),        // reversed duplicates of existing edges
      (3L, 3L),                  // self-loop
      (4L, 5L))                  // pendant: 5 closes nothing
      .toDF("src", "dst")
    val got = Graph.triangleCount(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"K4: every node in exactly 3 triangles, pendant absent: $got")
    // global total = sum/3
    assert(got.values.sum / 3 == 4L)
  }

  test("kCorePeel: cascade peels the tail, exact round semantics, dedupe") {
    import spark.implicits._
    // triangle {1,2,3} with a path tail 3-4-5; parallel edge and
    // self-loop must collapse before counting
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L),
      (3L, 4L), (4L, 5L), (3L, 3L)).toDF("src", "dst")
    // round 1 removes 5 (degree 1); node 4 SURVIVES round 1 and shows
    // its restricted degree 1 — exactly-`rounds` semantics, not fixpoint
    val r1 = Graph.kCorePeel(edges, k = 2, rounds = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r1 == Seq((1L, 2L), (2L, 2L), (3L, 3L), (4L, 1L)))
    // by round 3 the peel has converged to the triangle 2-core
    val r3 = Graph.kCorePeel(edges, k = 2, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r3 == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // extra rounds past convergence change nothing
    val r5 = Graph.kCorePeel(edges, k = 2, rounds = 5)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(r5 == r3)
    // k above the max core empties the graph without error
    assert(Graph.kCorePeel(edges, k = 3, rounds = 3).isEmpty)
  }
}
