package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted skew join: result-set equality with the plain join under
  * M:N multiplicity, and the plan shape that makes it worth having —
  * the hot set broadcasts and the shuffle keys on (key, salt). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("equals the plain join exactly, including M:N hot keys") {
    // key 1 is hot on BOTH sides (M:N): 300 big rows × 3 small rows;
    // cold keys are 1:1
    val big = ((1 to 300).map(i => (1L, i.toLong)) ++
      (2 to 40).map(k => (k.toLong, (1000 + k).toLong)))
      .toDF("k", "rid")
    val small = (Seq((1L, "h1"), (1L, "h2"), (1L, "h3")) ++
      (2 to 40).map(k => (k.toLong, s"c$k")))
      .toDF("k", "attr")
    val salted = Skew.saltedJoin(big, small, "k", "rid",
        replicas = 4, hotThreshold = 100L)
      .select("k", "rid", "attr")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val plain = big.join(small, Seq("k"))
      .select("k", "rid", "attr")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == 1L) == 900) // 300 × 3: M:N preserved
  }

  test("plan: hot set broadcasts, the shuffle keys on (key, salt)") {
    val big = (1 to 100).map(i => ((i % 5).toLong, i.toLong)).toDF("k", "rid")
    val small = (0 to 4).map(k => (k.toLong, s"a$k")).toDF("k", "attr")
    val plan = Skew.saltedJoin(big, small, "k", "rid",
      replicas = 4, hotThreshold = 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan) // the hot census
    assert(plan.contains("__salt"), plan)            // salted join key
  }
}
