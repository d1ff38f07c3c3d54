package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Continuous funnel: emits exactly once per key when the anchor
  * window is watermark-final, agreeing level-for-level with the batch
  * operator over the same (out-of-order) events. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val Window = 100L
  private val Steps = 3

  private def writeBatch(in: String, rows: Seq[(Long, Int, Long)]): Unit =
    rows.map { case (k, st, sec) =>
      (k, st, new java.sql.Timestamp(sec * 1000L))
    }.toDF("key", "step", "ts")
      .coalesce(1).write.mode("append").parquet(in)

  private def run(base: String): Unit = {
    val events = spark.readStream
      .schema("key LONG, step INT, ts TIMESTAMP")
      .parquet(s"$base/in").as[FunnelStream.StepEvent]
    val q = FunnelStream.start(events, Steps, Window, "60 seconds",
      s"$base/out", s"$base/ckpt")
    q.awaitTermination(120000)
  }

  test("stream levels equal the batch twin; one row per key, on finality") {
    val base = java.nio.file.Files.createTempDirectory("graft_fst").toString
    new java.io.File(s"$base/in").mkdirs()

    val batch1 = Seq[(Long, Int, Long)](
      (1L, 1, 1000L), (1L, 2, 1030L), (1L, 3, 1060L), // full chain
      (2L, 1, 1000L), (2L, 2, 1030L),                 // purchase later
      (3L, 2, 990L), (3L, 1, 1000L),                  // step 2 precedes
      (4L, 2, 1040L))                                 // step 1 arrives late
    val batch2 = Seq[(Long, Int, Long)](
      (4L, 1, 1010L),   // late anchor, still above the watermark (1000)
      (2L, 3, 1200L))   // outside key 2's anchor window
    val batch3 = Seq[(Long, Int, Long)](
      (999L, 9, 2000L)) // heartbeat: advances the watermark past finality

    writeBatch(s"$base/in", batch1); run(base)
    writeBatch(s"$base/in", batch2); run(base)
    // nothing final yet: watermark (1140 after batch 2) only passes
    // t1+window during batch 3's timeouts
    writeBatch(s"$base/in", batch3); run(base)

    val got = spark.read.parquet(s"$base/out")
      .select(col("key"), col("level"),
        col("steps").getItem(0).as("t1"),
        col("steps").getItem(1).as("t2"),
        col("steps").getItem(2).as("t3"))
      .as[(Long, Int, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1)

    // batch twin over the union of all three deliveries
    val all = (batch1 ++ batch2 ++ batch3).map { case (k, st, sec) =>
      (k, st, new java.sql.Timestamp(sec * 1000L))
    }.toDF("key", "step", "ts")
    val twin = graft.operators.Funnel.windowFunnel(all, "key", "ts",
        Seq(col("step") === 1, col("step") === 2, col("step") === 3),
        windowSec = Window)
      .select(col("key"), col("level"), col("t1"), col("t2"), col("t3"))
      .as[(Long, Int, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1)

    assert(got.toSeq == twin.toSeq,
      s"stream ${got.toSeq} != batch ${twin.toSeq}")
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L), "exactly one row per key")
    assert(got.map(r => r._1 -> r._2).toMap ==
      Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 2))

    // a late burst for an already-final key must NOT re-anchor: the
    // batch twin anchors once per key at the global earliest step 1
    writeBatch(s"$base/in", Seq((1L, 1, 2100L), (1L, 2, 2130L)))
    run(base)
    writeBatch(s"$base/in", Seq((999L, 9, 4000L)))
    run(base)
    val after = spark.read.parquet(s"$base/out")
      .filter(col("key") === 1L).count()
    assert(after == 1L, "done marker suppresses a second funnel row")
  }
}
