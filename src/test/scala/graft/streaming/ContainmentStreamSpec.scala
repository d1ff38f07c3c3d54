package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The containment stream: cross-batch doc-inside-doc detection equals
  * the batch operator, incrementally; replay is idempotent. */
class ContainmentStreamSpec extends SparkSpec {
  import spark.implicits._

  private def host(i: Long) =
    (0 until 16).map(w => s"h${i}w$w").mkString(" ")

  test("stream finds cross-batch containment; union-equivalent to batch op") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_cstream").toString
    val in = s"$base/in"
    new java.io.File(in).mkdirs()

    def run(): Unit = {
      val docs = spark.readStream.format("text").load(in)
        .select(split(col("value"), "\\|").as("f"))
        .select(col("f").getItem(0).cast("long").as("doc_id"),
          col("f").getItem(1).as("text"))
      val q = ContainmentStream.start(docs, "text", "doc_id",
        s"$base/index", s"$base/pairs", s"$base/ckpt", threshold = 0.9,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    // batch 0: three hosts
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/a.txt"),
      (0L until 3L).map(i => s"$i|${host(i)}").mkString("\n"))
    run()
    // batch 1: an excerpt of host 1 (first 8 words) + a novel doc +
    // a within-batch excerpt pair (101 ⊂ 102's text prefix)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b.txt"),
      Seq(s"100|${(0 until 8).map(w => s"h1w$w").mkString(" ")}",
        "101|novel fresh body of arriving text here",
        "102|novel fresh body of arriving text here with extra trailing words")
        .mkString("\n"))
    run()

    val pairs = spark.read.parquet(s"$base/pairs")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((100L, 1L)), s"cross-batch excerpt: $pairs")
    assert(pairs.contains((101L, 102L)), s"within-batch excerpt: $pairs")
    assert(!pairs.exists(_._1 == 0L) && !pairs.exists(_._1 == 2L))
    // accumulated union equals the batch operator over everything,
    // restricted per batch to its own arriving ids (the directional-new
    // contract applied batch by batch)
    val all = ((0L until 3L).map(i => (i, host(i))) ++ Seq(
      (100L, (0 until 8).map(w => s"h1w$w").mkString(" ")),
      (101L, "novel fresh body of arriving text here"),
      (102L, "novel fresh body of arriving text here with extra trailing words")))
      .toDF("doc_id", "text")
    val b0Ids = Set(0L, 1L, 2L); val b1Ids = Set(100L, 101L, 102L)
    val want = Dedup.selfContainmentPairs(all, "text", "doc_id",
        shingleN = 4, threshold = 0.9)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => (b0Ids(p._1) && b0Ids(p._2)) || b1Ids(p._1))
      // ^ batch-0 self-pairs + batch-1 arriving-id pairs
    assert(pairs == want)
    // the index accumulated each doc exactly once
    assert(spark.read.parquet(s"$base/index/docs").count() == 6)
  }

  test("containment stream batch replay is idempotent") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_creplay").toString
    val b0 = (0L until 3L).map(i => (i, host(i))).toDF("doc_id", "text")
    val b1 = Seq(
      (100L, (0 until 8).map(w => s"h1w$w").mkString(" ")),
      (101L, "some fresh unique text body here")).toDF("doc_id", "text")

    def pairs() = spark.read.parquet(s"$base/pairs")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    ContainmentStream.processBatch(b0, 0L, "text", "doc_id",
      s"$base/index", s"$base/pairs")
    ContainmentStream.processBatch(b1, 1L, "text", "doc_id",
      s"$base/index", s"$base/pairs")
    val firstPairs = pairs()
    assert(firstPairs.contains((100L, 1L)))
    assert(spark.read.parquet(s"$base/index/docs").count() == 5)

    // at-least-once replay of the same batch id: pairs and index both
    // settle to the same state (the probe sees its own docs already
    // indexed; the collapses make them count once)
    ContainmentStream.processBatch(b1, 1L, "text", "doc_id",
      s"$base/index", s"$base/pairs")
    assert(pairs() == firstPairs)
    assert(spark.read.parquet(s"$base/index/docs").count() == 5)
    assert(spark.read.parquet(s"$base/index/docs")
      .select("__id").distinct().count() == 5)
  }

  test("restarted stream derives shingleN/numBuckets from the index meta") {
    // index created with non-default gram space; a restarted stream
    // driving processBatch with DEFAULT params must probe AND append
    // against the existing meta instead of crashing ensureMeta
    val base = java.nio.file.Files
      .createTempDirectory("graft_cmeta").toString
    val b0 = (0L until 3L).map(i => (i, host(i))).toDF("doc_id", "text")
    ContainmentStream.processBatch(b0, 0L, "text", "doc_id",
      s"$base/index", s"$base/pairs", shingleN = 3, numBuckets = 16)
    val b1 = Seq(
      (100L, (0 until 8).map(w => s"h1w$w").mkString(" "))).toDF("doc_id", "text")
    // defaults here ≠ the index's (3, 16): must not throw
    ContainmentStream.processBatch(b1, 1L, "text", "doc_id",
      s"$base/index", s"$base/pairs")
    val pairs = spark.read.parquet(s"$base/pairs")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // with shingleN = 3 (from meta) the 8-word excerpt of host 1 is
    // still a containment hit
    assert(pairs.contains((100L, 1L)), s"$pairs")
    // and the appended batch joined the SAME gram space
    val (nb, sn) = graft.operators.ContainmentIndex.readMeta(
      spark, s"$base/index")
    assert((nb, sn) == (16, 3))
    assert(spark.read.parquet(s"$base/index/docs").count() == 4)
  }
}
