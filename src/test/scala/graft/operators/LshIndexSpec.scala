package graft.operators

import graft.SparkSpec
import graft.core.BatchCompaction
import graft.streaming.DedupStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The persisted LSH index: probe ≡ the DataFrame incremental path,
  * file-level partition pruning actually prunes, and compaction keeps
  * results identical while bounding the partition count. */
class LshIndexSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  import org.apache.spark.sql.Row

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // deterministic corpus with planted cross-batch near-dups: doc i of a
  // later batch reuses the text of doc (i - 100) with one word changed
  private def batch0 = docsDF((0L until 40L).map(i =>
    (i, s"document $i discusses topic ${i % 5} covering alpha beta gamma " +
      s"delta epsilon zeta eta theta word${i % 11} tail${i % 3}")))
  private def batch1 = docsDF(Seq(
    (100L, "document 0 discusses topic 0 covering alpha beta gamma " +
      "delta epsilon zeta eta theta word0 tail9"), // near-dup of doc 0
    (101L, "an entirely novel text unlike anything else in the corpus"),
    (102L, "an entirely novel text unlike anything else in the corpus too")))

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet

  test("file-backed probe equals the DataFrame incremental path") {
    val root = tmp("graft_lshidx")
    val idx0 = Dedup.buildIndex(batch0, "text", "doc_id")
    LshIndex.append(idx0, root, 0L, numBuckets = 16)
    val idx1 = Dedup.buildIndex(batch1, "text", "doc_id")

    val got = pairSet(LshIndex.probe(idx1, root))
    val want = pairSet(Dedup.incrementalCandidates(idx1, idx0))
    assert(got == want)
    assert(got.exists { case (a, b, j) => a == 0L && b == 100L && j >= 0.5 })
    assert(got.exists { case (a, b, _) => a == 101L && b == 102L })

    // replay: the probed batch is already appended — the probe must
    // emit the same pair set (self-pair guard + per-(bucket,id)
    // collapse on the file path, same as the DataFrame path)
    LshIndex.append(idx1, root, 1L, numBuckets = 16)
    assert(pairSet(LshIndex.probe(idx1, root)) == got)
  }

  test("probe scans only touched member partitions (file-level pruning)") {
    val root = tmp("graft_lshprune")
    val n = 16
    LshIndex.append(Dedup.buildIndex(batch0, "text", "doc_id"), root, 0L, n)

    // one tiny doc → 16 band-bucket keys → strictly fewer than n=16
    // distinct pmod prefixes w.h.p. (verified for this fixed fixture)
    val tiny = docsDF(Seq((500L,
      "a single small probe document with a handful of words only")))
    val newIdx = Dedup.buildIndex(tiny, "text", "doc_id")
    val touched = Dedup.bandMembers(newIdx, isNew = true)
      .select(pmod(col("__bh"), lit(n.toLong)).as("__p")).distinct()
      .collect().map(_.getLong(0)).toSeq
    assert(touched.nonEmpty && touched.size < n,
      s"fixture should touch a strict subset of prefixes, got $touched")

    def scanOf(df: DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.get

    // 40 docs × 16 bands fill all 16 prefix partitions of batch 0
    val total = scanOf(spark.read.parquet(s"$root/members"))
      .selectedPartitions.partitionCount
    assert(total == n)

    val pruned = LshIndex.prunedMembers(spark, root, touched)
    val scan = scanOf(pruned)
    assert(scan.selectedPartitions.partitionCount == touched.size)
    // every file the scan will read lives under a touched prefix dir
    val files = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString)
    assert(files.nonEmpty)
    assert(files.forall(f =>
      touched.exists(p => f.contains(s"${LshIndex.MemberPart}=$p/"))))
  }

  test("probeSince: dedup horizon drops old batches, file-pruned, probe-equivalent") {
    val root = tmp("graft_lshhorizon")
    val n = 16
    // batch 0: the 40-doc corpus (contains doc 0, the near-dup target)
    LshIndex.append(Dedup.buildIndex(batch0, "text", "doc_id"), root, 0L, n)
    // batch 1: unrelated filler
    LshIndex.append(Dedup.buildIndex(docsDF(Seq(
      (300L, "completely different filler content about nothing at all"))),
      "text", "doc_id"), root, 1L, n)
    val newIdx = Dedup.buildIndex(batch1, "text", "doc_id")

    // full probe sees the batch-0 near-dup; a horizon at batch 1 must
    // NOT (content older than the horizon is allowed to recur)
    val full = pairSet(LshIndex.probe(newIdx, root))
    assert(full.exists { case (a, b, _) => a == 0L && b == 100L })
    val recent = pairSet(LshIndex.probeSince(newIdx, root, Some(1L)))
    assert(!recent.exists { case (a, b, _) => a == 0L || b == 0L },
      s"horizon must exclude batch-0 members: $recent")
    // within-new-batch pairs survive either way
    assert(recent.exists { case (a, b, _) => a == 101L && b == 102L })
    // sinceBatch = None ≡ probe; floor 0 ≡ everything
    assert(pairSet(LshIndex.probeSince(newIdx, root, None)) == full)
    assert(pairSet(LshIndex.probeSince(newIdx, root, Some(0L))) == full)

    // an EMPTY probe batch under a horizon: no candidates, no error
    val emptyIdx = Dedup.buildIndex(
      docsDF(Seq.empty[(Long, String)]), "text", "doc_id")
    assert(LshIndex.probeSince(emptyIdx, root, Some(1L)).isEmpty)

    // the batch floor prunes whole batch DIRECTORIES at file level
    def scanOf(df: DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.get
    val touched = Dedup.bandMembers(newIdx, isNew = true)
      .select(pmod(col("__bh"), lit(n.toLong)).as("__p")).distinct()
      .collect().map(_.getLong(0)).toSeq
    val files = scanOf(LshIndex.prunedMembers(spark, root, touched, Some(1L)))
      .selectedPartitions.toPartitionArray.map(_.filePath.toString)
    assert(files.nonEmpty)
    assert(files.forall(_.contains(s"${LshIndex.BatchCol}=1/")),
      s"horizon scan must touch only batch >= 1 dirs: ${files.take(3).toSeq}")
  }

  test("numBuckets is pinned by the index metadata") {
    val root = tmp("graft_lshmeta")
    LshIndex.append(Dedup.buildIndex(batch0, "text", "doc_id"), root, 0L, 16)
    val idx1 = Dedup.buildIndex(batch1, "text", "doc_id")
    // a different layout param on append must be refused, not silently
    // written into a mixed (pruning-breaking) directory tree
    val e = intercept[IllegalArgumentException] {
      LshIndex.append(idx1, root, 1L, numBuckets = 32)
    }
    assert(e.getMessage.contains("numBuckets=16"))
  }

  test("compaction bounds partitions and preserves probe + pair results") {
    val base = tmp("graft_lshcompact")
    val (indexPath, pairsPath) = (s"$base/index", s"$base/pairs")
    // four micro-batches, each with a near-dup of an earlier batch so
    // every sink (members, grams, pairs) accumulates real content
    val batches = (0 until 4).map { b =>
      docsDF((0L until 10L).map { i =>
        val id = b * 10L + i
        val txt =
          if (b > 0 && i < 3) // near-dup of the previous batch's doc
            s"document ${(b - 1) * 10 + i} number alpha beta gamma delta " +
              s"epsilon zeta eta theta iota kappa changed$b"
          else
            s"document $id number alpha beta gamma delta epsilon zeta " +
              s"eta theta iota kappa original${id % 7}"
        (id, txt)
      })
    }
    batches.zipWithIndex.foreach { case (b, i) =>
      DedupStream.processBatch(b, i.toLong, "text", "doc_id",
        indexPath, pairsPath, threshold = 0.5)
    }

    val probeBatch = Dedup.buildIndex(docsDF(Seq(
      (900L, "document 5 number alpha beta gamma delta epsilon zeta " +
        "eta theta iota kappa original5"))), "text", "doc_id")
    val before = pairSet(LshIndex.probe(probeBatch, indexPath))
    assert(before.nonEmpty)
    def pairRows() = spark.read.parquet(pairsPath)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pairsBefore = pairRows()

    DedupStream.compactSinks(spark, indexPath, pairsPath, keepRecent = 1)

    def batchDirs(p: String) = new java.io.File(p).listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith(s"${LshIndex.BatchCol}=")).toSet
    // one compacted segment + the newest (still replayable) batch
    assert(batchDirs(s"$indexPath/members") ==
      Set(s"${LshIndex.BatchCol}=-1", s"${LshIndex.BatchCol}=3"))
    assert(batchDirs(s"$indexPath/grams") ==
      Set(s"${LshIndex.BatchCol}=-1", s"${LshIndex.BatchCol}=3"))

    // results are unchanged: same probe pairs, same pairs-table content
    assert(pairSet(LshIndex.probe(probeBatch, indexPath)) == before)
    assert(pairRows() == pairsBefore)
    // grams still one row per accumulated doc
    assert(spark.read.parquet(s"$indexPath/grams")
      .select("__id").distinct().count() == 40)

    // immediately re-compacting has nothing to fold (one segment + one
    // live batch) — must be a no-op, not a churn loop
    assert(BatchCompaction.compact(spark, s"$indexPath/members", 1).isEmpty)
  }
}
