package graft.operators

import graft.SparkSpec
import graft.core.BatchCompaction
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The persisted IVF index: query ≡ the in-memory ivfTopK path,
  * file-level partition pruning actually prunes to the probed cells,
  * and append/compaction keep results identical. */
class IvfIndexSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // deterministic clustered corpus: 8 well-separated cluster axes in
  // dim 8; vector i leans on axis i%8 with a small id-dependent wobble
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

  private def resultSet(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e9) / 1e9, r.getInt(3))).toSet

  test("file-backed query equals the in-memory ivfTopK path") {
    val root = tmp("graft_ivfidx")
    val c = corpus(0 until 200)
    IvfIndex.build(c, root, nlist = 8)

    val cents = IvfIndex.centroids(spark, root)
    val cells = Similarity.assignCells(c, cents)
    val q = queriesDF(3)
    val want = resultSet(Similarity.ivfTopK(cells, cents, q, k = 5, nprobe = 3))
    val got = resultSet(IvfIndex.query(spark, root, q, k = 5, nprobe = 3))
    assert(got == want)
    assert(got.size == 15)
    // rank 1 of each query is the query vector itself (it's in-corpus)
    assert((0L until 3L).forall(i => got.contains((i, i, 1.0, 1))))
  }

  test("query scans only probed cell partitions (file-level pruning)") {
    val root = tmp("graft_ivfprune")
    IvfIndex.build(corpus(0 until 200), root, nlist = 8)

    def scanOf(df: DataFrame): FileSourceScanExec =
      df.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.get

    // 200 clustered vectors fill all 8 cells
    val total = scanOf(spark.read.parquet(s"$root/cells"))
      .selectedPartitions.partitionCount
    assert(total == 8)

    // one query probing 2 cells must read exactly those 2 partitions
    val cents = IvfIndex.centroids(spark, root)
    val q = queriesDF(1)
    val probed = q.select(col("embedding").as("__qv"))
      .join(broadcast(cents))
      .withColumn("__sim", Similarity.cosine(col("__qv"), col("__centroid")))
      .orderBy(col("__sim").desc, col("centroid_id").asc).limit(2)
      .select("centroid_id").collect().map(_.getLong(0)).toSeq
    assert(probed.size == 2)

    val scan = scanOf(IvfIndex.prunedCells(spark, root, probed))
    assert(scan.selectedPartitions.partitionCount == probed.size)
    val files = scan.selectedPartitions.toPartitionArray
      .map(_.filePath.toString)
    assert(files.nonEmpty)
    assert(files.forall(f =>
      probed.exists(p => f.contains(s"${IvfIndex.CellPart}=$p/"))))
  }

  test("append under frozen centroids; replay and compaction are inert") {
    val root = tmp("graft_ivfappend")
    IvfIndex.build(corpus(0 until 100), root, nlist = 8)
    IvfIndex.append(corpus(100 until 150), root, batchId = 1L)
    IvfIndex.append(corpus(150 until 200), root, batchId = 2L)

    val q = queriesDF(3)
    val before = resultSet(IvfIndex.query(spark, root, q, k = 5, nprobe = 3))
    // the full three-batch corpus is searchable
    val cents = IvfIndex.centroids(spark, root)
    val want = resultSet(Similarity.ivfTopK(
      Similarity.assignCells(corpus(0 until 200), cents), cents, q, 5, 3))
    assert(before == want)

    // at-least-once replay of batch 2 overwrites itself: same results
    IvfIndex.append(corpus(150 until 200), root, batchId = 2L)
    assert(resultSet(IvfIndex.query(spark, root, q, 5, 3)) == before)

    // compaction folds old batches, results unchanged, vectors intact
    assert(BatchCompaction.compact(spark, s"$root/cells", 1).contains(-1L))
    assert(resultSet(IvfIndex.query(spark, root, q, 5, 3)) == before)
    assert(spark.read.parquet(s"$root/cells")
      .select("vec_id").distinct().count() == 200)
  }

  test("querySince: freshness horizon equals in-memory search over recent batches") {
    val root = tmp("graft_ivfhorizon")
    IvfIndex.build(corpus(0 until 100), root, nlist = 8)
    IvfIndex.append(corpus(100 until 150), root, batchId = 1L)
    IvfIndex.append(corpus(150 until 200), root, batchId = 2L)
    val q = queriesDF(3)
    val cents = IvfIndex.centroids(spark, root)
    // horizon >= 1 must equal an in-memory search over ONLY the
    // batch-1/2 vectors, under the same frozen centroids
    val got = resultSet(IvfIndex.querySince(spark, root, q, k = 5,
      nprobe = 3, sinceBatch = Some(1L)))
    val want = resultSet(Similarity.ivfTopK(
      Similarity.assignCells(corpus(100 until 200), cents), cents, q, 5, 3))
    assert(got == want)
    // no horizon / floor 0 ≡ the plain query
    val full = resultSet(IvfIndex.query(spark, root, q, 5, 3))
    assert(resultSet(IvfIndex.querySince(spark, root, q, 5, 3, None)) == full)
    assert(resultSet(IvfIndex.querySince(spark, root, q, 5, 3,
      Some(0L))) == full)
    assert(got != full, "fixture must make the horizon visible")
  }

  test("layout misuse is refused: double build, bad batch id, no meta") {
    val root = tmp("graft_ivfmeta")
    IvfIndex.build(corpus(0 until 50), root, nlist = 4)
    intercept[IllegalArgumentException] {
      IvfIndex.build(corpus(0 until 50), root, nlist = 8)
    }
    intercept[IllegalArgumentException] {
      IvfIndex.append(corpus(50 until 60), root, batchId = 0L)
    }
    intercept[Exception] { // meta missing entirely
      IvfIndex.append(corpus(50 until 60), tmp("graft_ivfempty"), batchId = 1L)
    }
    assert(IvfIndex.readNlist(spark, root) == 4)
  }
}
