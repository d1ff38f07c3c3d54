package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The persisted containment index: probe ≡ the batch operator
  * restricted to arriving ids, replay-tolerant, horizon-scoped, and
  * actually file-pruned. */
class ContainmentIndexSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // history: 30 docs with distinct vocabularies (so df stays low and
  // nothing is cut at maxDf = 64)
  private def history = docsDF((0L until 30L).map(i =>
    (i, (0 until 16).map(w => s"w${i}x$w").mkString(" "))))

  // arriving batch: an excerpt of doc 3 (first 8 words → contained),
  // a novel doc, and a doc that CONTAINS doc 7 wholesale
  private def arriving = docsDF(Seq(
    (1000L, (0 until 8).map(w => s"w3x$w").mkString(" ")),
    (1001L, "entirely novel arriving content nothing shared here at all"),
    (1002L, (0 until 16).map(w => s"w7x$w").mkString(" ") +
      " plus extra trailing words beyond the original document body")))

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet

  test("probe ≡ selfContainmentPairs(old ∪ new) restricted to arriving ids") {
    val root = tmp("graft_cidx")
    ContainmentIndex.append(history, "text", "doc_id", root, 0L,
      shingleN = 4, numBuckets = 16)
    val got = pairSet(ContainmentIndex.probe(arriving, "text", "doc_id",
      root, threshold = 0.9))
    val newIds = Set(1000L, 1001L, 1002L)
    val want = pairSet(Dedup.selfContainmentPairs(
        history.unionByName(arriving), "text", "doc_id",
        shingleN = 4, threshold = 0.9)
      .filter(col("id_a").isin(newIds.toSeq: _*)))
    assert(got == want)
    // the planted directions: the excerpt is contained in doc 3; the
    // wrapping doc 1002 is NOT a contained side (doc 7 ⊂ 1002, and the
    // old-in-new direction is out of probe scope by contract)
    assert(got.exists { case (a, b, c) => a == 1000L && b == 3L && c == 1.0 })
    assert(!got.exists { case (a, _, _) => a == 1001L })
    assert(!got.exists { case (a, _, _) => a == 1002L })
  }

  test("replayed batch counts once: probe after its own append is unchanged") {
    val root = tmp("graft_cidx_replay")
    ContainmentIndex.append(history, "text", "doc_id", root, 0L,
      shingleN = 4, numBuckets = 16)
    val before = pairSet(ContainmentIndex.probe(arriving, "text", "doc_id",
      root, threshold = 0.9))
    ContainmentIndex.append(arriving, "text", "doc_id", root, 1L,
      shingleN = 4, numBuckets = 16)
    // at-least-once delivery: the batch sits in BOTH the new frame and
    // the index — the (__g, __id) / (__id) collapses must keep the df
    // census and the verify arrays single-counted
    assert(pairSet(ContainmentIndex.probe(arriving, "text", "doc_id",
      root, threshold = 0.9)) == before)
    // a second append of the same batchId is a partition rewrite, not a
    // duplication (crash-replay of the writer)
    ContainmentIndex.append(arriving, "text", "doc_id", root, 1L,
      shingleN = 4, numBuckets = 16)
    assert(pairSet(ContainmentIndex.probe(arriving, "text", "doc_id",
      root, threshold = 0.9)) == before)
  }

  test("dedup horizon: old batches age out; empty probe batch is clean") {
    val root = tmp("graft_cidx_horizon")
    ContainmentIndex.append(history, "text", "doc_id", root, 0L,
      shingleN = 4, numBuckets = 16)
    ContainmentIndex.append(docsDF(Seq(
      (500L, (0 until 16).map(w => s"w3x$w").mkString(" ") +
        " recent re-crawl of doc three with additions")),
      ), "text", "doc_id", root, 1L, shingleN = 4, numBuckets = 16)
    val full = pairSet(ContainmentIndex.probe(arriving, "text", "doc_id",
      root, threshold = 0.9))
    assert(full.exists { case (a, b, _) => a == 1000L && b == 3L })
    assert(full.exists { case (a, b, _) => a == 1000L && b == 500L })
    val recent = pairSet(ContainmentIndex.probe(arriving, "text", "doc_id",
      root, threshold = 0.9, sinceBatch = Some(1L)))
    // content older than the horizon is allowed to recur; the recent
    // re-crawl still catches the excerpt
    assert(!recent.exists { case (_, b, _) => b == 3L })
    assert(recent.exists { case (a, b, _) => a == 1000L && b == 500L })
    // empty arriving batch: no candidates, no error, under a horizon
    assert(ContainmentIndex.probe(docsDF(Seq.empty[(Long, String)]),
      "text", "doc_id", root, threshold = 0.9,
      sinceBatch = Some(1L)).isEmpty)
  }

  test("pairs exactly AT the threshold survive candidate generation (ceil rounding)") {
    // 0.9·10 in IEEE doubles is 9.000000000000002: a plain ceil reads
    // 10, shrinking the prefix to 1 gram and demanding |B| ≥ 10 — both
    // silently drop pairs whose containment is exactly the threshold.
    // Fixture (shingleN = 1 → grams = distinct tokens): A has 10
    // tokens, B holds 9 of them and nothing else. A-in-B containment
    // is exactly 0.9; A's rarest gram (the one only A has) leads its
    // prefix, so the buggy 1-gram prefix misses B entirely, and the
    // buggy length filter rejects |B| = 9 < 10. Both directions must
    // be emitted, by the batch operator AND the index probe.
    val words = (1 to 10).map(i => f"tok$i%02d")
    val a = (2000L, words.mkString(" "))
    val b = (2001L, words.drop(1).mkString(" "))
    val both = docsDF(Seq(a, b))
    val batch = pairSet(Dedup.selfContainmentPairs(both, "text", "doc_id",
      shingleN = 1, threshold = 0.9, maxDf = 64))
    assert(batch.contains((2000L, 2001L, 0.9)), s"A-in-B at 0.9: $batch")
    assert(batch.contains((2001L, 2000L, 1.0)), s"B-in-A: $batch")
    val root = tmp("graft_cidx_boundary")
    ContainmentIndex.append(docsDF(Seq(b)), "text", "doc_id", root, 0L,
      shingleN = 1, numBuckets = 16)
    val probed = pairSet(ContainmentIndex.probe(docsDF(Seq(a)),
      "text", "doc_id", root, threshold = 0.9))
    assert(probed.contains((2000L, 2001L, 0.9)), s"probe at 0.9: $probed")
  }

  test("probeCensus counts are exact: batch-gram postings vs touched-bucket read") {
    val root = tmp("graft_cidx_census")
    ContainmentIndex.append(history, "text", "doc_id", root, 0L,
      shingleN = 4, numBuckets = 16)
    val (readRows, batchRows) = ContainmentIndex.probeCensus(
      arriving, "text", "doc_id", root)
    // ground truth from the raw postings table: how many index
    // postings carry a gram the arriving batch also has
    val batchGrams = arriving
      .select(explode(Dedup.hashedShingles(col("text"), 4)).as("__g"))
      .distinct()
    val want = spark.read.parquet(s"$root/postings")
      .join(batchGrams, Seq("__g"), "left_semi").count()
    assert(batchRows == want, s"batch-gram postings: got $batchRows want $want")
    assert(readRows >= batchRows)
    // and the touched-bucket read is a subset of the whole table
    assert(readRows <= spark.read.parquet(s"$root/postings").count())
  }

  test("probe scans only touched posting partitions (file-level pruning)") {
    val root = tmp("graft_cidx_prune")
    val n = 16
    ContainmentIndex.append(history, "text", "doc_id", root, 0L,
      shingleN = 4, numBuckets = n)
    // 30 docs × 13 shingles fill all n posting partitions
    def scanOf(df: DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.get
    val total = scanOf(spark.read.parquet(s"$root/postings"))
      .selectedPartitions.partitionCount
    assert(total == n)
    // one tiny probe doc touches a strict subset of prefixes
    val tiny = docsDF(Seq((900L, (0 until 8).map(w => s"w3x$w").mkString(" "))))
    val touched = tiny
      .select(explode(Dedup.hashedShingles(col("text"), 4)).as("__g"))
      .select(pmod(col("__g"), lit(n.toLong)).as("__p")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(touched.nonEmpty && touched.size < n,
      s"fixture should touch a strict subset, got $touched")
    val probed = ContainmentIndex.probe(tiny, "text", "doc_id", root,
      threshold = 0.9)
    assert(pairSet(probed).exists { case (a, b, _) => a == 900L && b == 3L })
    // the pruned read itself selects exactly the touched partitions
    val pruned = spark.read.parquet(s"$root/postings")
      .where(col(ContainmentIndex.PostPart).isin(touched: _*))
    assert(scanOf(pruned).selectedPartitions.partitionCount == touched.size)
  }
}
