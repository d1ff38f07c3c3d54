package graft.streaming

import graft.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Streaming domain gate: per-batch partial moments land replay-safe;
  * the read-time tier view is integer-identical to the batch
  * [[Curation.groupGate]] tier table over the concatenated log. */
class DomainGateStreamSpec extends SparkSpec {
  import spark.implicits._

  test("tier view equals the batch gate; replay never double-counts") {
    val base = java.nio.file.Files.createTempDirectory("graft_dgs").toString
    new java.io.File(s"$base/in").mkdirs()

    // good drifts downward across batches: keep after batch 0, but the
    // low-scoring batch-1 docs drag its mean into review territory
    val batch0 = Seq(("good", 1L, 0.9), ("good", 2L, 0.8),
      ("good", 3L, 0.7), ("bad", 4L, 0.1), ("bad", 5L, 0.2))
    val batch1 = Seq(("good", 6L, 0.1), ("good", 7L, 0.1),
      ("good", 8L, 0.1), ("bad", 9L, 0.15))

    def writeBatch(rows: Seq[(String, Long, Double)]): Unit =
      rows.toDF("source", "doc_id", "q").coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    def run(): Unit = {
      val q = DomainGateStream.start(
        spark.readStream
          .schema("source STRING, doc_id BIGINT, q DOUBLE")
          .parquet(s"$base/in"),
        "source", "q", s"$base/counts", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    def tiers = DomainGateStream.tierView(spark, s"$base/counts")
      .orderBy("grp")
      .as[(String, Long, Long, String)].collect().toSeq

    writeBatch(batch0)
    run()
    // after batch 0: good mean 0.8 -> keep; bad mean 0.15 -> drop
    assert(tiers == Seq(("bad", 2L, 150000L, "drop"),
      ("good", 3L, 800000L, "keep")))

    writeBatch(batch1)
    run()
    // the drift is visible: good mean (0.9+0.8+0.7+0.1*3)/6 = 0.45
    assert(tiers == Seq(("bad", 3L, 150000L, "drop"),
      ("good", 6L, 450000L, "review")))

    // stream ≡ batch: the folded tier table equals the batch gate's
    val all = (batch0 ++ batch1).toDF("source", "doc_id", "q")
    val batchTiers = Curation.groupGate(all, "source", col("q"))
      .select(col("source").as("grp"), col("n_docs"),
        col("mean_score_micro"), col("tier")).distinct()
      .orderBy("grp")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(tiers == batchTiers)

    // at-least-once replay rewrites its own batch partition
    DomainGateStream.processBatch(
      batch1.toDF("source", "doc_id", "q"), 1L, "source", "q",
      s"$base/counts")
    assert(tiers == batchTiers)
    // an empty replayed batch writes nothing
    DomainGateStream.processBatch(
      batch1.toDF("source", "doc_id", "q").limit(0), 99L, "source", "q",
      s"$base/counts")
    assert(tiers == batchTiers)

    // partials are bounded by touched groups per batch, not documents
    assert(spark.read.parquet(s"$base/counts/moments").count() == 2 + 2)
  }
}
