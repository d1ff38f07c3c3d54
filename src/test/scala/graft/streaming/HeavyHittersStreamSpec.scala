package graft.streaming

import graft.SparkSpec

/** Streaming heavy hitters: bounded per-batch summaries land
  * replay-safe, the folded view tracks exact counts in the exact
  * regime and keeps the heavy item under churn. */
class HeavyHittersStreamSpec extends SparkSpec {
  import spark.implicits._

  test("view equals exact counts in the exact regime; replay is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("graft_hhs").toString
    new java.io.File(s"$base/in").mkdirs()

    def writeBatch(rows: Seq[(String, String)]): Unit =
      rows.toDF("g", "item").coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    def run(): Unit = {
      val src = spark.readStream.schema("g STRING, item STRING")
        .parquet(s"$base/in")
      val q = HeavyHittersStream.start(src, Seq("g"), "item", 4,
        s"$base/hh", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    // batch 0: a=3, b=2 in group x; batch 1: a=1, c=2 in x, z=5 in y
    writeBatch(Seq.fill(3)(("x", "a")) ++ Seq.fill(2)(("x", "b")))
    run()
    writeBatch(Seq(("x", "a")) ++ Seq.fill(2)(("x", "c")) ++
      Seq.fill(5)(("y", "z")))
    run()

    def view = HeavyHittersStream.topKView(
        spark.read.parquet(s"$base/hh"), Seq("g"), 4)
      .select("g", "item", "est")
      .as[(String, String, Long)].collect().toSet
    // <= 4 distinct per group: the MG summaries are exact, so the
    // folded view equals plain counts
    assert(view == Set(("x", "a", 4L), ("x", "b", 2L), ("x", "c", 2L),
      ("y", "z", 5L)), view.toString)

    // at-least-once replay rewrites its own batch partition
    HeavyHittersStream.processBatch(
      (Seq(("x", "a")) ++ Seq.fill(2)(("x", "c")) ++
        Seq.fill(5)(("y", "z"))).toDF("g", "item"),
      1L, Seq("g"), "item", 4, s"$base/hh")
    assert(view == Set(("x", "a", 4L), ("x", "b", 2L), ("x", "c", 2L),
      ("y", "z", 5L)), "replay never double-counts")

    // bounded store: <= k rows per key per batch
    val stored = spark.read.parquet(s"$base/hh")
    assert(stored.count() <= 2 * 2 * 4, s"rows: ${stored.count()}")
  }
}
