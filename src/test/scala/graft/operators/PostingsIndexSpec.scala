package graft.operators

import graft.SparkSpec
import graft.core.BatchCompaction
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The persisted postings index: query ≡ the in-memory bm25TopK path,
  * term-partition pruning actually prunes the scan, and
  * append/replay/compaction keep results identical. */
class PostingsIndexSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // deterministic corpus: every doc shares filler, docs i % 7 == 0 talk
  // about "quantum turbines", others about assorted topics
  private def docsDF(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map { i =>
      val topic =
        if (i % 7 == 0) "quantum turbine maintenance and quantum safety"
        else if (i % 3 == 0) "orbital greenhouse crop rotation schedule"
        else "general ledger reconciliation for shipping manifests"
      (i.toLong, s"document $i describes $topic with filler token$i")
    }.toDF("doc_id", "text")
  }

  private val queries = {
    import spark.implicits._
    Seq((1L, "quantum turbine"), (2L, "greenhouse schedule"))
      .toDF("query_id", "query_text")
  }

  private def resultSet(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

  test("file-backed query equals the in-memory bm25TopK path") {
    val root = tmp("graft_postidx")
    val d = docsDF(0 until 120)
    PostingsIndex.build(d, root, parts = 16)
    val want = resultSet(Retrieval.bm25TopK(d, queries, k = 5))
    val got = resultSet(PostingsIndex.query(spark, root, queries, k = 5))
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("query scans only the query terms' partitions (file-level pruning)") {
    val root = tmp("graft_postprune")
    PostingsIndex.build(docsDF(0 until 120), root, parts = 16)

    def scanOf(df: DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.get

    val total = scanOf(spark.read.parquet(s"$root/postings"))
      .selectedPartitions.partitionCount
    val parts = 16
    // the corpus vocabulary covers (nearly) all term partitions
    assert(total > parts / 2)

    val qt = Retrieval.queryTerms(queries)
      .select(PostingsIndex.termPartition(col("term"), parts))
      .distinct().collect().map(_.getLong(0)).toSeq
    val scan = scanOf(PostingsIndex.prunedPostings(spark, root, qt))
    assert(scan.selectedPartitions.partitionCount == qt.size)
    val files = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString)
    assert(files.nonEmpty)
    assert(files.forall(f =>
      qt.exists(p => f.contains(s"${PostingsIndex.TermPart}=$p/"))))
    // the residual term predicate reaches the parquet row groups
    val plan = PostingsIndex.query(spark, root, queries, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(term"), plan)
  }

  test("append updates df and avgdl; replay and compaction are inert") {
    val root = tmp("graft_postappend")
    PostingsIndex.build(docsDF(0 until 60), root, parts = 16)
    PostingsIndex.append(docsDF(60 until 90), root, batchId = 1L)
    PostingsIndex.append(docsDF(90 until 120), root, batchId = 2L)

    // results equal a from-scratch index over the union
    val want = resultSet(Retrieval.bm25TopK(docsDF(0 until 120), queries, 5))
    val before = resultSet(PostingsIndex.query(spark, root, queries, 5))
    assert(before == want)

    // stats are the exact union stats
    val st = PostingsIndex.stats(spark, root).collect().head
    assert(st.getLong(0) == 120)

    // at-least-once replay of batch 2 overwrites itself
    PostingsIndex.append(docsDF(90 until 120), root, batchId = 2L)
    assert(resultSet(PostingsIndex.query(spark, root, queries, 5)) == before)

    // compaction folds old batches, results unchanged
    assert(BatchCompaction.compact(spark, s"$root/postings", 1).contains(-1L))
    assert(resultSet(PostingsIndex.query(spark, root, queries, 5)) == before)
  }

  test("layout misuse is refused: double build, bad batch id, no meta") {
    val root = tmp("graft_postmeta")
    PostingsIndex.build(docsDF(0 until 30), root, parts = 8)
    intercept[IllegalArgumentException] {
      PostingsIndex.build(docsDF(0 until 30), root, parts = 16)
    }
    intercept[IllegalArgumentException] {
      PostingsIndex.append(docsDF(30 until 40), root, batchId = 0L)
    }
    intercept[Exception] {
      PostingsIndex.append(docsDF(30 until 40), tmp("graft_postempty"),
        batchId = 1L)
    }
    assert(PostingsIndex.readParts(spark, root) == 8)
  }

  test("empty first build writes nothing; next stream batch builds instead") {
    val root = tmp("graft_postings_empty")
    // an empty first micro-batch must not leave fileless table dirs
    // (exists() would flip true and break the next query's schema read)
    graft.streaming.LexStream.processBatch(docsDF(0 until 0), 0L,
      root, parts = 8)
    assert(!PostingsIndex.exists(spark, root))
    graft.streaming.LexStream.processBatch(docsDF(0 until 40), 1L,
      root, parts = 8)
    assert(PostingsIndex.exists(spark, root))
    val clean = tmp("graft_postings_empty_clean")
    PostingsIndex.build(docsDF(0 until 40), clean, parts = 8)
    assert(resultSet(PostingsIndex.query(spark, root, queries, k = 5)) ==
      resultSet(PostingsIndex.query(spark, clean, queries, k = 5)))
  }
}
