package graft.streaming

import graft.SparkSpec
import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Streaming data cards: each micro-batch's per-source card must equal
  * the batch operator on that slice; replays rewrite their own rows. */
class CardStreamSpec extends SparkSpec {
  import spark.implicits._

  private def cardKey(df: org.apache.spark.sql.DataFrame) =
    df.select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("dup_rate"), 9).as("d"),
        round(col("english_frac"), 9).as("e"))
      .collect().map(_.toSeq).toSet

  test("file-source card stream matches the batch twin per batch; replay inert") {
    val base = java.nio.file.Files.createTempDirectory("graft_cstream").toString
    val in = s"$base/in"
    new java.io.File(in).mkdirs()
    def run(): Unit = {
      val docs = spark.readStream.format("csv")
        .schema("source STRING, text STRING").option("sep", "|").load(in)
      val q = CardStream.start(docs, "source", "text",
        s"$base/cards", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    val b0 = Seq(("web", "the cat sat on the mat"),
      ("web", "the cat sat on the mat"), ("books", "a tale of two cities"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/a.csv"),
      b0.map { case (s, t) => s"$s|$t" }.mkString("\n"))
    run()
    val b1 = Seq(("web", "der hund und die katze"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b.csv"),
      b1.map { case (s, t) => s"$s|$t" }.mkString("\n"))
    run() // checkpoint restart: only b.csv arrives as a new batch

    val cards = spark.read.parquet(s"$base/cards")
    val batches = cards.select("__batch_id").distinct()
      .as[Long].collect().sorted
    assert(batches.length == 2)
    val streamed0 = cardKey(cards.filter(col("__batch_id") === batches(0)))
    val twin0 = cardKey(Curation.dataCard(
      b0.toDF("source", "text"), "source", "text"))
    assert(streamed0 == twin0)
    val streamed1 = cardKey(cards.filter(col("__batch_id") === batches(1)))
    assert(streamed1 == cardKey(Curation.dataCard(
      b1.toDF("source", "text"), "source", "text")))

    // replaying a batch body rewrites its own partition — row set
    // stable (capture the count BEFORE the overwrite; the old frame's
    // file listing goes stale once its parquet parts are replaced)
    val nBefore = cards.count()
    CardStream.processBatch(b1.toDF("source", "text"), batches(1),
      "source", "text", s"$base/cards")
    val fresh = spark.read.parquet(s"$base/cards")
    assert(cardKey(fresh.filter(col("__batch_id") === batches(1)))
      == streamed1)
    assert(fresh.count() == nBefore)
  }
}
