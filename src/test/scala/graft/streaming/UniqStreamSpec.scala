package graft.streaming

import graft.SparkSpec

/** Streaming HLL distinct counters: per-batch 4 KiB states land
  * replay-safe, the merged view tracks the exact distinct count
  * across restarts, and duplicated states cannot inflate it. */
class UniqStreamSpec extends SparkSpec {
  import spark.implicits._

  test("view tracks exact distincts; replay and dup states are no-ops") {
    val base = java.nio.file.Files.createTempDirectory("graft_uqs").toString
    new java.io.File(s"$base/in").mkdirs()

    def writeBatch(rows: Seq[(String, Long)]): Unit =
      rows.toDF("g", "u").coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    def run(): Unit = {
      val src = spark.readStream.schema("g STRING, u LONG")
        .parquet(s"$base/in")
      val q = UniqStream.start(src, Seq("g"), "u",
        s"$base/states", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    // batch 0: g=a sees users 0..99; g=b sees 0..9
    writeBatch((0L until 100L).map(("a", _)) ++ (0L until 10L).map(("b", _)))
    run()
    // batch 1: g=a sees 50..149 (50 new), g=b nothing new
    writeBatch((50L until 150L).map(("a", _)) ++ Seq(("b", 3L)))
    run()

    def view = UniqStream.uniqView(
        spark.read.parquet(s"$base/states"), Seq("g"))
      .as[(String, Long)].collect().toMap
    // p=12 registers are effectively exact at these cardinalities
    assert(view == Map("a" -> 150L, "b" -> 10L), view.toString)

    // at-least-once replay: batch 1 re-lands into its own partition
    UniqStream.processBatch(
      ((50L until 150L).map(("a", _)) ++ Seq(("b", 3L))).toDF("g", "u"),
      1L, Seq("g"), "u", s"$base/states")
    assert(view == Map("a" -> 150L, "b" -> 10L), "replay is a no-op")

    // HLL merge is idempotent: even a DUPLICATED state row (landed
    // under a fresh batch id) cannot inflate the estimate — the
    // property additive counters don't have
    UniqStream.processBatch(
      (50L until 150L).map(("a", _)).toDF("g", "u"),
      7L, Seq("g"), "u", s"$base/states")
    assert(view == Map("a" -> 150L, "b" -> 10L),
      "re-counting already-seen users changes nothing")

    // state is bounded: one 4 KiB row per key per batch
    val stored = spark.read.parquet(s"$base/states")
    assert(stored.count() == 5, s"2+2+1 state rows, got ${stored.count()}")
    assert(stored.select("hll_state").as[Array[Byte]].collect()
      .forall(_.length == graft.functions.Hll.M))
  }
}
