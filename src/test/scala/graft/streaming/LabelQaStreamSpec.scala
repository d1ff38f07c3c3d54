package graft.streaming

import graft.SparkSpec
import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Streaming label QA: per-batch partial cell counts land replay-safe;
  * the read-time kappa and disagreement views are integer-identical to
  * the batch audits over the concatenated ratings log. */
class LabelQaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("views equal the batch audits; replay never double-counts") {
    val base = java.nio.file.Files.createTempDirectory("graft_lqs").toString
    new java.io.File(s"$base/in").mkdirs()

    val batch0 = Seq(("A", "x"), ("A", "x"), ("A", "y"), ("B", "x"))
    val batch1 = Seq(("B", "x"), ("B", "y"), ("C", "y"), ("C", "y"))

    def writeBatch(rows: Seq[(String, String)]): Unit =
      rows.toDF("item", "label").coalesce(1)
        .write.mode("append").parquet(s"$base/in")
    def run(): Unit = {
      val src = spark.readStream.schema("item STRING, label STRING")
        .parquet(s"$base/in")
      val q = LabelQaStream.start(src, "item", "label",
        s"$base/counts", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    writeBatch(batch0)
    run()
    writeBatch(batch1)
    run()

    val all = (batch0 ++ batch1).toDF("item", "label")
    def kappa = LabelQaStream.kappaView(spark, s"$base/counts")
      .collect().head
    val expectedK = Stats.fleissKappa(all, col("item"), col("label"))
      .collect().head
    assert(kappa == expectedK,
      "streamed kappa must be integer-identical to the batch audit")
    def queue = LabelQaStream.disagreementView(spark, s"$base/counts")
      .orderBy("item").collect().toSeq
    val expectedQ = Stats.ratingDisagreement(all, col("item"), col("label"))
      .orderBy("item").collect().toSeq
    assert(queue == expectedQ)

    // at-least-once replay rewrites its own batch partition
    LabelQaStream.processBatch(batch1.toDF("item", "label"), 1L,
      "item", "label", s"$base/counts")
    assert(kappa == expectedK && queue == expectedQ)
    // an empty replayed batch writes nothing
    LabelQaStream.processBatch(batch1.toDF("item", "label").limit(0), 99L,
      "item", "label", s"$base/counts")
    assert(kappa == expectedK)

    // partials are bounded by touched (item, label) cells per batch
    assert(spark.read.parquet(s"$base/counts").count() == 3 + 3)
  }
}
