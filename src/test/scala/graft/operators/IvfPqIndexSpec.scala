package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The persisted IVF-PQ index: query ≡ the in-memory ivfPqTopK path on
  * the same frozen artifacts, the compressed code scan file-prunes to
  * probed cells, and appends under frozen artifacts stay consistent. */
class IvfPqIndexSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def vec(i: Long): Array[Float] = {
    val a = Array.fill(8)(0.05f + (i % 3) * 0.01f)
    a((i % 8).toInt) = 1.0f
    a(((i / 8) % 8).toInt) += 0.2f
    a
  }

  private def corpus(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, vec(i.toLong))).toDF("vec_id", "embedding")
  }

  private def queriesDF(n: Int): DataFrame =
    corpus(0 until n).select(col("vec_id").as("query_id"), col("embedding"))

  private def resultSet(df: DataFrame): Set[(Long, Long, Int)] =
    df.select("query_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("file-backed query equals the in-memory ivfPqTopK path") {
    val root = tmp("graft_ivfpqidx")
    val c = corpus(0 until 200)
    IvfPqIndex.build(c, root, nlist = 8, m = 4, ksub = 8, dim = 8)
    val cents = IvfPqIndex.centroids(spark, root)
    val cb = IvfPqIndex.codebook(spark, root)
    val cells = Similarity.assignCells(c, cents)
    val q = queriesDF(3)
    val want = resultSet(Similarity.ivfPqTopK(cells, cents, cb, q,
      k = 5, rerank = 20, nprobe = 3, m = 4, dim = 8))
    val got = resultSet(IvfPqIndex.query(spark, root, c, q,
      k = 5, rerank = 20, nprobe = 3))
    assert(got == want)
    assert(got.size == 15)
  }

  test("code scan reads only probed cell partitions, codes only") {
    val root = tmp("graft_ivfpqprune")
    IvfPqIndex.build(corpus(0 until 200), root, nlist = 8, m = 4,
      ksub = 8, dim = 8)
    def scanOf(df: DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s }.get
    val cents = IvfPqIndex.centroids(spark, root)
    val probed = queriesDF(1).select(col("embedding").as("__qv"))
      .join(broadcast(cents))
      .withColumn("__sim", Similarity.cosine(col("__qv"), col("__centroid")))
      .orderBy(col("__sim").desc, col("centroid_id").asc).limit(2)
      .select("centroid_id").collect().map(_.getLong(0)).toSeq
    val scan = scanOf(IvfPqIndex.prunedCodes(spark, root, probed))
    assert(scan.selectedPartitions.partitionCount == probed.size)
    val files = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString)
    assert(files.nonEmpty && files.forall(f =>
      probed.exists(p => f.contains(s"${IvfPqIndex.CellPart}=$p/"))))
    // the index never stores raw vectors — codes only
    val schema = spark.read.parquet(s"$root/codes").schema.fieldNames.toSet
    assert(!schema.contains("embedding"), schema.mkString(","))
  }

  test("streaming twin: processBatchPq == batch build+append; build replay inert") {
    val root = tmp("graft_ivfpqstream")
    graft.streaming.AnnStream.processBatchPq(corpus(0 until 100), 0L,
      root, nlist = 8, m = 4, ksub = 8, dim = 8)
    graft.streaming.AnnStream.processBatchPq(corpus(100 until 150), 1L,
      root, nlist = 8, m = 4, ksub = 8, dim = 8)
    val all = corpus(0 until 150)
    val q = queriesDF(3)
    val streamed = resultSet(IvfPqIndex.query(spark, root, all, q,
      k = 5, rerank = 30, nprobe = 8))
    val batchRoot = tmp("graft_ivfpqbatch2")
    IvfPqIndex.build(corpus(0 until 100), batchRoot, nlist = 8, m = 4,
      ksub = 8, dim = 8)
    IvfPqIndex.append(corpus(100 until 150), batchRoot, 1L)
    val batch = resultSet(IvfPqIndex.query(spark, batchRoot, all, q,
      k = 5, rerank = 30, nprobe = 8))
    assert(streamed == batch)
    // an at-least-once redelivery of the BUILD batch re-encodes under
    // the frozen artifacts instead of retraining — results unchanged
    graft.streaming.AnnStream.processBatchPq(corpus(0 until 100), 0L,
      root, nlist = 8, m = 4, ksub = 8, dim = 8)
    assert(resultSet(IvfPqIndex.query(spark, root, all, q,
      k = 5, rerank = 30, nprobe = 8)) == streamed)
    // compaction folds batch partitions without changing any answer
    graft.streaming.AnnStream.compactSinksPq(spark, root, keepRecent = 1)
    assert(resultSet(IvfPqIndex.query(spark, root, all, q,
      k = 5, rerank = 30, nprobe = 8)) == streamed)
  }

  test("append under frozen artifacts; batch replay is idempotent") {
    val root = tmp("graft_ivfpqappend")
    IvfPqIndex.build(corpus(0 until 100), root, nlist = 8, m = 4,
      ksub = 8, dim = 8)
    IvfPqIndex.append(corpus(100 until 150), root, batchId = 1L)
    val all = corpus(0 until 150)
    val q = queriesDF(3)
    val before = resultSet(IvfPqIndex.query(spark, root, all, q,
      k = 5, rerank = 30, nprobe = 8))
    // new vectors are findable
    val cents = IvfPqIndex.centroids(spark, root)
    val cb = IvfPqIndex.codebook(spark, root)
    val cells = Similarity.assignCells(all, cents)
    val want = resultSet(Similarity.ivfPqTopK(cells, cents, cb, q,
      k = 5, rerank = 30, nprobe = 8, m = 4, dim = 8))
    assert(before == want)
    // replaying the same append overwrites its own partitions — inert
    IvfPqIndex.append(corpus(100 until 150), root, batchId = 1L)
    val after = resultSet(IvfPqIndex.query(spark, root, all, q,
      k = 5, rerank = 30, nprobe = 8))
    assert(after == before)
    // misuse refused
    intercept[IllegalArgumentException] {
      IvfPqIndex.append(corpus(150 until 160), root, batchId = 0L)
    }
    intercept[IllegalArgumentException] {
      IvfPqIndex.build(corpus(0 until 10), root, 8, 4, 8, 8)
    }
  }
}
