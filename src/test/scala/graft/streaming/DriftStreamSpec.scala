package graft.streaming

import graft.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Streaming drift monitor: per-batch JS vs a frozen reference must
  * equal the batch operator exactly; replays rewrite their own row. */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq((1L, "alpha beta gamma alpha"),
    (2L, "beta gamma delta")).toDF("doc_id", "text")

  test("file-source drift stream matches the batch twin per batch") {
    val base = java.nio.file.Files.createTempDirectory("graft_dstream").toString
    val in = s"$base/in"
    new java.io.File(in).mkdirs()
    val refCounts = Curation.unigramCounts(ref).cache()

    def run(): Unit = {
      val docs = spark.readStream.format("text").load(in)
        .select(col("value").as("text"))
      val q = DriftStream.start(docs, refCounts, "text",
        s"$base/metrics", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/a.txt"),
      "alpha beta gamma\nbeta gamma delta")
    run()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b.txt"),
      "omega psi chi\nchi psi omega")
    run() // restart: checkpoint must deliver only b.txt as a new batch

    val metrics = spark.read.parquet(s"$base/metrics")
      .orderBy("__batch_id").collect()
    assert(metrics.length == 2)
    val batchTwin0 = Curation.unigramDrift(
      Seq("alpha beta gamma", "beta gamma delta").toDF("text"), ref)
      .head.getDouble(0)
    val batchTwin1 = Curation.unigramDrift(
      Seq("omega psi chi", "chi psi omega").toDF("text"), ref)
      .head.getDouble(0)
    assert(metrics(0).getAs[Double]("js_bits") == batchTwin0)
    assert(metrics(1).getAs[Double]("js_bits") == batchTwin1)
    // disjoint-vocab batch maxes the divergence
    assert(metrics(1).getAs[Double]("js_bits") == 1.0)
  }

  test("batch replay rewrites its own metrics row idempotently") {
    val base = java.nio.file.Files.createTempDirectory("graft_dreplay").toString
    val refCounts = Curation.unigramCounts(ref)
    val b0 = Seq("alpha beta").toDF("text")
    DriftStream.processBatch(b0, 0L, refCounts, "text", s"$base/m")
    DriftStream.processBatch(Seq("gamma delta").toDF("text"), 1L,
      refCounts, "text", s"$base/m")
    val before = spark.read.parquet(s"$base/m").orderBy("__batch_id")
      .collect().toSeq.map(_.toString)
    DriftStream.processBatch(b0, 0L, refCounts, "text", s"$base/m") // replay
    val after = spark.read.parquet(s"$base/m").orderBy("__batch_id")
      .collect().toSeq.map(_.toString)
    assert(after == before)
  }

  test("empty micro-batch skips its metrics row instead of landing NULL js") {
    val base = java.nio.file.Files.createTempDirectory("graft_dempty").toString
    val refCounts = Curation.unigramCounts(ref)
    DriftStream.processBatch(Seq("alpha beta").toDF("text"), 0L,
      refCounts, "text", s"$base/m")
    // zero rows AND rows-with-no-tokens both have no distribution
    DriftStream.processBatch(Seq.empty[String].toDF("text"), 1L,
      refCounts, "text", s"$base/m")
    DriftStream.processBatch(Seq("   ").toDF("text"), 2L,
      refCounts, "text", s"$base/m")
    val m = spark.read.parquet(s"$base/m")
    assert(m.count() == 1)
    assert(m.filter(col("js_bits").isNull).count() == 0)
  }
}
