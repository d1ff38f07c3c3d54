package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Streaming rater QA: per-batch partial cells/moments land
  * replay-safe; the read-time kappa and bias views are
  * integer-identical to the batch audits over the concatenated log. */
class RaterQaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("views equal the batch audits; replay never double-counts") {
    val base = java.nio.file.Files.createTempDirectory("graft_rqs").toString
    new java.io.File(s"$base/in").mkdirs()

    val batch0 = Seq(("A", 1L, "x", 4.0), ("A", 2L, "x", 3.0),
      ("A", 3L, "y", 5.0), ("B", 1L, "y", 2.0))
    val batch1 = Seq(("B", 2L, "y", 4.0), ("B", 3L, "x", 1.0),
      ("C", 1L, "x", 3.0), ("C", 2L, "x", 3.5))

    def writeBatch(rows: Seq[(String, Long, String, Double)]): Unit =
      rows.toDF("item", "rater", "label", "score").coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    def run(): Unit = {
      val q = RaterQaStream.start(
        spark.readStream
          .schema("item STRING, rater BIGINT, label STRING, score DOUBLE")
          .parquet(s"$base/in"),
        "item", "rater", "label", "score", s"$base/counts", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    writeBatch(batch0)
    run()
    writeBatch(batch1)
    run()

    val all = (batch0 ++ batch1).toDF("item", "rater", "label", "score")
    def kappa = RaterQaStream.kappaView(spark, s"$base/counts")
      .orderBy("rater").collect().toSeq
    val expectedK = Stats.raterConsensusKappa(all, col("item"),
      col("rater"), col("label")).orderBy("rater").collect().toSeq
    assert(kappa == expectedK,
      "streamed kappa must be integer-identical to the batch audit")
    def bias = RaterQaStream.biasView(spark, s"$base/counts")
      .orderBy("rater").collect().toSeq
    val expectedB = Stats.raterBias(all, col("rater"), col("score"))
      .orderBy("rater").collect().toSeq
    assert(bias == expectedB)

    // at-least-once replay rewrites its own batch partition
    RaterQaStream.processBatch(
      batch1.toDF("item", "rater", "label", "score"), 1L,
      "item", "rater", "label", "score", s"$base/counts")
    assert(kappa == expectedK && bias == expectedB)
    // an empty replayed batch writes nothing
    RaterQaStream.processBatch(
      batch1.toDF("item", "rater", "label", "score").limit(0), 99L,
      "item", "rater", "label", "score", s"$base/counts")
    assert(kappa == expectedK && bias == expectedB)

    // partials are bounded by touched keys per batch, not ratings
    assert(spark.read.parquet(s"$base/counts/cells").count() == 4 + 4)
    assert(spark.read.parquet(s"$base/counts/moments").count() == 3 + 3)

    // the weighted-consensus view folds the same cells — identical to
    // the batch audit over the concatenated log
    val cons = RaterQaStream.consensusView(spark, s"$base/counts")
      .orderBy("item").collect().toSeq
    val expectedC = Stats.weightedConsensus(all, col("item"),
      col("rater"), col("label")).orderBy("item").collect().toSeq
    assert(cons == expectedC,
      "streamed consensus must be integer-identical to the batch audit")
  }
}
