package graft.streaming

import graft.SparkSpec
import graft.operators.Summing
import org.apache.spark.sql.functions._

/** Streaming counter tables: per-batch partial sums land replay-safe,
  * the folded view equals the batch aggregate across restarts. */
class SummingStreamSpec extends SparkSpec {
  import spark.implicits._

  test("view equals the batch aggregate; replay never double-counts") {
    val base = java.nio.file.Files.createTempDirectory("graft_sst").toString
    new java.io.File(s"$base/in").mkdirs()

    def writeBatch(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("key", "n").coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    def run(): Unit = {
      val src = spark.readStream.schema("key LONG, n LONG")
        .parquet(s"$base/in")
      val q = SummingStream.start(src, Seq("key"), Seq("n"),
        s"$base/counters", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    writeBatch(Seq((1L, 3L), (1L, 4L), (2L, 5L)))
    run()
    writeBatch(Seq((1L, 10L), (3L, 1L)))
    run()

    def view = Summing.summedView(
        spark.read.parquet(s"$base/counters"), Seq("key"), Seq("n"))
      .as[(Long, Long)].collect().toSet
    assert(view == Set((1L, 17L), (2L, 5L), (3L, 1L)))

    // at-least-once replay: re-running the same batch body overwrites
    // its own batch partition instead of appending a second copy
    val replayed = spark.read.parquet(s"$base/in")
    SummingStream.processBatch(replayed.limit(0), 99L,
      Seq("key"), Seq("n"), s"$base/counters") // empty: writes nothing
    SummingStream.processBatch(
      Seq((1L, 10L), (3L, 1L)).toDF("key", "n"), 1L,
      Seq("key"), Seq("n"), s"$base/counters")
    assert(view == Set((1L, 17L), (2L, 5L), (3L, 1L)),
      "replaying batch 1 rewrote its partition, totals unchanged")

    // the partial rows per batch are one per key (pre-aggregated)
    val stored = spark.read.parquet(s"$base/counters")
    assert(stored.count() == 4, s"2 keys in batch 0 + 2 in batch 1")
  }
}
