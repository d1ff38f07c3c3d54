package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming text-curation stage: accept/reject split with reasons,
  * checkpointed restart, at-least-once replay idempotency, compaction. */
class CurationStreamSpec extends SparkSpec {

  // ≥50 words, English stopwords, sane word lengths → accepted
  private val goodText = Iterator.continually(
    "the cat is in the garden and it plays with a ball for hours")
    .take(5).mkString(" ")
  // 2 words → fails the Gopher word-count rule
  private val shortText = "too short"
  // passes Gopher (incl. ≥2 English stopword hits) but German wins the
  // stopword vote → rejected by the language gate, not by Gopher
  private val germanText = Iterator.continually(
    "der hund und die katze spielen immer wieder draussen zusammen " +
      "heute morgen").take(5).mkString(" ") + " the story for children"

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("file-source curation stream splits accept/reject across restarts") {
    val base = java.nio.file.Files.createTempDirectory("graft_cstream").toString
    val in = s"$base/in"
    new java.io.File(in).mkdirs()

    def run(): Unit = {
      val docs = spark.readStream.format("text").load(in)
        .select(split(col("value"), "\\|").as("f"))
        .select(col("f").getItem(0).cast("long").as("doc_id"),
          col("f").getItem(1).as("text"))
      val q = CurationStream.start(docs, "text",
        s"$base/accept", s"$base/reject", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/a.txt"),
      Seq(s"1|$goodText", s"2|$shortText").mkString("\n"))
    run()
    assert(spark.read.parquet(s"$base/accept")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
    val rej1 = spark.read.parquet(s"$base/reject")
      .select("doc_id", "reject_reason")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rej1 == Set((2L, "gopher")))

    // restart with new data: the checkpoint must not re-deliver a.txt
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b.txt"),
      Seq(s"3|$germanText", s"4|$goodText").mkString("\n"))
    run()
    assert(spark.read.parquet(s"$base/accept")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    val rej2 = spark.read.parquet(s"$base/reject")
      .select("doc_id", "reject_reason")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rej2 == Set((2L, "gopher"), (3L, "lang")))
    // enrichment columns ride along into the sinks
    val acc = spark.read.parquet(s"$base/accept")
    assert(acc.columns.toSet.contains("quality"))
    assert(acc.filter(col("lang") =!= "en").count() == 0)
    assert(acc.filter(col("quality") < 0.3).count() == 0)
  }

  test("frozen-LM gate rejects unseen-transition docs the rule gates pass") {
    import graft.operators.NgramLm
    val lm = NgramLm.train(docsDF((0L until 5L).map(i => (i, goodText))))
    // same words, reversed order: identical under every order-blind
    // gate (gopher/lang/quality), but every transition is unseen
    val reversed = goodText.split(" ").reverse.mkString(" ")
    val batch = docsDF(Seq((1L, goodText), (2L, reversed)))
    val bits = NgramLm.score(batch, lm).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bits(2L) > bits(1L))
    val cut = (bits(1L) + bits(2L)) / 2
    val out = CurationStream.curate(batch, "text",
        lm = Some(lm), maxNllBits = cut)
      .select("doc_id", "accepted", "reject_reason").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), Option(r.getString(2))))
      .toMap
    assert(out(1L) == ((true, None)))
    assert(out(2L) == ((false, Some("perplexity"))))

    // the foreachBatch body routes on the same gate and the score
    // rides into both sinks
    val base = java.nio.file.Files.createTempDirectory("graft_clm").toString
    CurationStream.processBatch(batch, 0L, "text", s"$base/a", s"$base/r",
      lm = Some(lm), maxNllBits = cut)
    val acc = spark.read.parquet(s"$base/a")
    assert(acc.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
    assert(acc.columns.contains("avg_nll_bits"))
    assert(spark.read.parquet(s"$base/r")
      .select("reject_reason").collect().map(_.getString(0)).toSet ==
      Set("perplexity"))
  }

  test("batch replay is idempotent on both sinks") {
    val base = java.nio.file.Files.createTempDirectory("graft_creplay").toString
    val b0 = docsDF(Seq((1L, goodText), (2L, shortText)))
    val b1 = docsDF(Seq((3L, germanText), (4L, goodText)))
    def snap(p: String) = spark.read.parquet(p)
      .drop("__batch_id").collect().map(_.toString).sorted.toSeq

    CurationStream.processBatch(b0, 0L, "text", s"$base/a", s"$base/r")
    CurationStream.processBatch(b1, 1L, "text", s"$base/a", s"$base/r")
    val (a1, r1) = (snap(s"$base/a"), snap(s"$base/r"))
    // a crash between writes and checkpoint commit re-runs batch 1:
    // dynamic overwrite rewrites its partition, sinks don't grow
    CurationStream.processBatch(b1, 1L, "text", s"$base/a", s"$base/r")
    assert(snap(s"$base/a") == a1)
    assert(snap(s"$base/r") == r1)
  }

  test("sink compaction bounds partitions without changing contents") {
    val base = java.nio.file.Files.createTempDirectory("graft_ccompact").toString
    (0 until 4).foreach { i =>
      CurationStream.processBatch(
        docsDF(Seq((i * 10L, goodText), (i * 10L + 1, shortText))),
        i.toLong, "text", s"$base/a", s"$base/r")
    }
    def rows(p: String) = spark.read.parquet(p).drop("__batch_id")
      .collect().map(_.toString).sorted.toSeq
    val (a, r) = (rows(s"$base/a"), rows(s"$base/r"))
    CurationStream.compactSinks(spark, s"$base/a", s"$base/r", keepRecent = 1)
    def dirs(p: String) = new java.io.File(p).listFiles()
      .filter(_.isDirectory).count(_.getName.startsWith("__batch_id="))
    assert(dirs(s"$base/a") == 2 && dirs(s"$base/r") == 2)
    assert(rows(s"$base/a") == a && rows(s"$base/r") == r)
  }
}
