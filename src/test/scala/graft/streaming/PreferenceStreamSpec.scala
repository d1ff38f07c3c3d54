package graft.streaming

import graft.SparkSpec
import graft.operators.Preference

/** Streaming preference leaderboard: per-batch partial pair counts
  * land replay-safe; the read-time fit is integer-identical to the
  * batch Bradley-Terry over the concatenated comparison log. */
class PreferenceStreamSpec extends SparkSpec {
  import spark.implicits._

  test("leaderboard equals the batch fit; replay never double-counts") {
    val base = java.nio.file.Files.createTempDirectory("graft_pfs").toString
    new java.io.File(s"$base/in").mkdirs()

    val batch0 = Seq.fill(3)(("a", "b")) ++ Seq(("b", "a")) ++
      Seq.fill(2)(("a", "c"))
    val batch1 = Seq.fill(3)(("b", "c")) ++ Seq(("c", "b")) ++
      Seq.fill(2)(("a", "c"))

    def writeBatch(rows: Seq[(String, String)]): Unit =
      rows.toDF("winner", "loser").coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    def run(): Unit = {
      val src = spark.readStream.schema("winner STRING, loser STRING")
        .parquet(s"$base/in")
      val q = PreferenceStream.start(src, "winner", "loser",
        s"$base/counts", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    writeBatch(batch0)
    run()
    writeBatch(batch1)
    run()

    def board = PreferenceStream.leaderboard(spark, s"$base/counts")
      .orderBy("item").as[(String, Long, Long, Long)].collect().toSeq
    val expected = Preference.bradleyTerry(
        (batch0 ++ batch1).toDF("winner", "loser"))
      .orderBy("item").as[(String, Long, Long, Long)].collect().toSeq
    assert(board == expected,
      "stream fold must be integer-identical to the batch fit")

    // at-least-once replay: re-running batch 1's body overwrites its
    // own batch partition instead of appending a second copy
    PreferenceStream.processBatch(batch1.toDF("winner", "loser"), 1L,
      "winner", "loser", s"$base/counts")
    assert(board == expected, "replay rewrote its partition, fit unchanged")
    // an empty replayed batch writes nothing
    PreferenceStream.processBatch(
      batch1.toDF("winner", "loser").limit(0), 99L,
      "winner", "loser", s"$base/counts")
    assert(board == expected)

    // partials are bounded by distinct directed pairs, not batch size
    val stored = spark.read.parquet(s"$base/counts")
    assert(stored.count() == 3 + 3,
      "3 directed pairs per batch regardless of comparison volume")
  }
}
