package graft.streaming

import graft.SparkSpec

/** Streaming exact audience sets: per-batch bitmap states land
  * replay-safe, the OR-view is the exact union across restarts, the
  * AND-view is the exact every-batch core, and duplicated states
  * cannot change either. */
class BitmapStreamSpec extends SparkSpec {
  import spark.implicits._

  test("OR/AND views are exact; replay and dup states are no-ops") {
    val base = java.nio.file.Files.createTempDirectory("graft_bms").toString
    new java.io.File(s"$base/in").mkdirs()

    def writeBatch(rows: Seq[(String, Long)]): Unit =
      rows.toDF("g", "u").coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    def run(): Unit = {
      val src = spark.readStream.schema("g STRING, u LONG")
        .parquet(s"$base/in")
      val q = BitmapStream.start(src, Seq("g"), "u",
        s"$base/states", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    // batch 0: a sees 0..99, b sees 0..9
    writeBatch((0L until 100L).map(("a", _)) ++ (0L until 10L).map(("b", _)))
    run()
    // batch 1: a sees 50..149 (overlap 50..99), b sees only 3
    writeBatch((50L until 150L).map(("a", _)) ++ Seq(("b", 3L)))
    run()

    def view = BitmapStream.audienceView(
        spark.read.parquet(s"$base/states"), Seq("g"))
      .select("g", "audience_size", "core_size")
      .as[(String, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // union is EXACT (not an estimate); core = present in both batches
    assert(view == Map("a" -> ((150, 50)), "b" -> ((10, 1))), view.toString)

    // the audience itself is the sorted distinct id set
    val aud = BitmapStream.audienceView(
        spark.read.parquet(s"$base/states"), Seq("g"))
      .where($"g" === "b").select("audience")
      .as[Seq[Long]].collect().head
    assert(aud == (0L until 10L))

    // at-least-once replay rewrites its own partition: no change
    BitmapStream.processBatch(
      ((50L until 150L).map(("a", _)) ++ Seq(("b", 3L))).toDF("g", "u"),
      1L, Seq("g"), "u", s"$base/states")
    assert(view == Map("a" -> ((150, 50)), "b" -> ((10, 1))),
      "replay is a no-op")

    // a DUPLICATED state under a fresh batch id: union unchanged
    // (idempotent), and the core can only be computed over stored
    // states — the duplicate equals batch 1's set, so the AND of
    // {b0, b1, dup(b1)} still intersects to the same core
    BitmapStream.processBatch(
      ((50L until 150L).map(("a", _)) ++ Seq(("b", 3L))).toDF("g", "u"),
      7L, Seq("g"), "u", s"$base/states")
    assert(view == Map("a" -> ((150, 50)), "b" -> ((10, 1))),
      "duplicated state changes neither view")
  }
}
