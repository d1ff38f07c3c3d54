package graft.streaming

import graft.SparkSpec
import graft.operators.{PostingsIndex, Retrieval}
import org.apache.spark.sql.DataFrame

/** The streaming BM25-index twin: first batch builds, later batches
  * append under the frozen partition count, replays (including the
  * build batch) and compaction never change query results. */
class LexStreamSpec extends SparkSpec {

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

  test("build-on-first, append-on-rest; replay and compaction are inert") {
    val root = java.nio.file.Files.createTempDirectory("graft_lexstream")
      .toString + "/idx"

    // three micro-batches through the exact foreachBatch body
    LexStream.processBatch(docsDF(0 until 60), 0L, root, parts = 16)
    LexStream.processBatch(docsDF(60 until 90), 1L, root, parts = 16)
    LexStream.processBatch(docsDF(90 until 120), 2L, root, parts = 16)

    // queries see the full streamed corpus, identical to the batch path
    val want = resultSet(Retrieval.bm25TopK(docsDF(0 until 120), queries, 5))
    val got = resultSet(PostingsIndex.query(spark, root, queries, 5))
    assert(got == want)

    // at-least-once replays: a later batch AND the build batch itself
    LexStream.processBatch(docsDF(90 until 120), 2L, root, parts = 16)
    assert(resultSet(PostingsIndex.query(spark, root, queries, 5)) == got)
    LexStream.processBatch(docsDF(0 until 60), 0L, root, parts = 16)
    assert(resultSet(PostingsIndex.query(spark, root, queries, 5)) == got)
    // ... and the replayed build batch kept the frozen partition count
    assert(PostingsIndex.readParts(spark, root) == 16)

    // stats stay the exact union (no double count from any replay)
    assert(PostingsIndex.stats(spark, root).collect().head.getLong(0) == 120)

    // maintenance fold: results unchanged
    LexStream.compactSinks(spark, root, keepRecent = 1)
    assert(resultSet(PostingsIndex.query(spark, root, queries, 5)) == got)
    assert(PostingsIndex.stats(spark, root).collect().head.getLong(0) == 120)
  }
}
