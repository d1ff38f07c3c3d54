package graft.streaming

import graft.SparkSpec
import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.DataFrame

/** The streaming ANN-index twin: first batch trains, later batches
  * assign under frozen centroids, replays (including the build batch)
  * and compaction never change query results. */
class AnnStreamSpec extends SparkSpec {

  private def vec(i: Long): Array[Float] = {
    val a = Array.fill(8)(0.05f + (i % 3) * 0.01f)
    a((i % 8).toInt) = 1.0f
    a(((i / 8) % 8).toInt) += 0.2f
    a
  }

  private def vecs(ids: Range): DataFrame = {
    import spark.implicits._
    ids.map(i => (i.toLong, vec(i.toLong))).toDF("vec_id", "embedding")
  }

  private def resultSet(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e9) / 1e9, r.getInt(3))).toSet

  test("train-on-first, assign-on-rest; replay and compaction are inert") {
    val root = java.nio.file.Files.createTempDirectory("graft_annstream")
      .toString + "/idx"
    import org.apache.spark.sql.functions.col
    val q = vecs(0 until 3)
      .select(col("vec_id").as("query_id"), col("embedding"))

    // three micro-batches through the exact foreachBatch body
    AnnStream.processBatch(vecs(0 until 100), 0L, root, nlist = 8)
    AnnStream.processBatch(vecs(100 until 150), 1L, root, nlist = 8)
    AnnStream.processBatch(vecs(150 until 200), 2L, root, nlist = 8)

    // queries see the full streamed corpus, identical to the batch path
    val cents = IvfIndex.centroids(spark, root)
    val want = resultSet(Similarity.ivfTopK(
      Similarity.assignCells(vecs(0 until 200), cents), cents, q, 5, 3))
    val got = resultSet(IvfIndex.query(spark, root, q, 5, 3))
    assert(got == want)

    // centroids were trained ONCE, on the first batch only
    val centsAfter = cents.collect().map(_.getLong(0)).sorted.toSeq
    assert(centsAfter == (0L until 8L))

    // at-least-once replays: a later batch AND the build batch itself
    AnnStream.processBatch(vecs(150 until 200), 2L, root, nlist = 8)
    assert(resultSet(IvfIndex.query(spark, root, q, 5, 3)) == got)
    AnnStream.processBatch(vecs(0 until 100), 0L, root, nlist = 8)
    assert(resultSet(IvfIndex.query(spark, root, q, 5, 3)) == got)
    // ... and the replayed build batch did NOT re-train the centroids
    assert(IvfIndex.centroids(spark, root).collect()
      .map(_.getLong(0)).sorted.toSeq == centsAfter)

    // maintenance fold: results unchanged, corpus intact
    AnnStream.compactSinks(spark, root, keepRecent = 1)
    assert(resultSet(IvfIndex.query(spark, root, q, 5, 3)) == got)
    assert(spark.read.parquet(s"$root/cells")
      .select("vec_id").distinct().count() == 200)
  }
}
