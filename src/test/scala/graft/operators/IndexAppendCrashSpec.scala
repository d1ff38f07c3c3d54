package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crash injection for the STREAMING index-append paths: the batch
  * writers' staged-swap lifecycle has StagedSwapCrashSpec; this is the
  * same discipline for [[LshIndex.append]]/[[IvfIndex.append]], whose
  * batch-replay tolerance the streaming twins rely on. A crash is just
  * disk state, so each test constructs the exact state a kill leaves
  * at an interruption point, replays the SAME batch (what a restarted
  * streaming query does on at-least-once re-delivery), and asserts the
  * probe/query results are identical to one clean append — and that no
  * doubled rows survive.
  *
  * Interruption points per append protocol:
  *  - LSH writes TWO tables (members, then grams): a kill between them
  *    leaves members committed for the batch and grams absent — the
  *    two-table seam is LSH-specific and the most dangerous state.
  *  - Within one dynamic-overwrite parquet write, a kill between task
  *    staging and job commit leaves `_temporary` staging junk but NO
  *    visible files (FileOutputCommitter renames at commit) — the
  *    replay must converge and the junk must not poison reads.
  */
class IndexAppendCrashSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def fs(root: String) = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def docsDF(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def batch0 = docsDF((0L until 40L).map(i =>
    (i, s"document $i discusses topic ${i % 5} covering alpha beta gamma " +
      s"delta epsilon zeta eta theta word${i % 11} tail${i % 3}")))
  private def batch1 = docsDF(Seq(
    (100L, "document 0 discusses topic 0 covering alpha beta gamma " +
      "delta epsilon zeta eta theta word0 tail9"),
    (101L, "an entirely novel text unlike anything else in the corpus"),
    (102L, "an entirely novel text unlike anything else in the corpus too")))
  private def batch2 = docsDF(Seq(
    (200L, "document 3 discusses topic 3 covering alpha beta gamma " +
      s"delta epsilon zeta eta theta word3 tail0"),
    (201L, "fresh verification text probing the crashed-and-replayed index")))

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet

  /** One clean LSH root with batches 0 and 1 appended — the reference
    * state every crashed-and-replayed root must converge to. */
  private def cleanLshRoot(): String = {
    val root = tmp("graft_lshcrash_clean")
    LshIndex.append(Dedup.buildIndex(batch0, "text", "doc_id"), root, 0L, 16)
    LshIndex.append(Dedup.buildIndex(batch1, "text", "doc_id"), root, 1L, 16)
    root
  }

  private def rowCount(path: String): Long =
    try spark.read.parquet(path).count() catch { case _: Throwable => -1L }

  test("LSH: kill between the grams and members writes, replay converges") {
    val clean = cleanLshRoot()

    // crashed root: full batch-1 append, then construct the exact disk
    // state of a kill after the grams commit — members has no batch-1
    // partitions (dynamic overwrite commits per table, grams first)
    val root = tmp("graft_lshcrash_seam")
    LshIndex.append(Dedup.buildIndex(batch0, "text", "doc_id"), root, 0L, 16)
    LshIndex.append(Dedup.buildIndex(batch1, "text", "doc_id"), root, 1L, 16)
    val f = fs(root)
    val membersB1 = f.globStatus(
      new Path(s"$root/members/${LshIndex.BatchCol}=1"))
    assert(membersB1.nonEmpty, "fixture: batch-1 members must exist pre-crash")
    membersB1.foreach(s => f.delete(s.getPath, true))
    // the torn state IS torn: a probe over it would miss batch-1 members
    assert(rowCount(s"$root/members") < rowCount(s"$clean/members"))

    // at-least-once replay of the SAME batch
    LshIndex.append(Dedup.buildIndex(batch1, "text", "doc_id"), root, 1L, 16)

    val probe = Dedup.buildIndex(batch2, "text", "doc_id")
    assert(pairSet(LshIndex.probe(probe, root)) ==
      pairSet(LshIndex.probe(probe, clean)))
    assert(rowCount(s"$root/members") == rowCount(s"$clean/members"),
      "replay must overwrite its own member partitions, not double them")
    assert(rowCount(s"$root/grams") == rowCount(s"$clean/grams"))
  }

  test("LSH: torn FIRST batch reads as no-index; empty first batch writes nothing") {
    // crash between the first batch's two table writes: grams/
    // committed, members/ absent — exists() requires both, so the
    // replayed DedupStream batch takes the clean first-append path
    val root = tmp("graft_lshcrash_first")
    LshIndex.append(Dedup.buildIndex(batch0, "text", "doc_id"), root, 0L, 16)
    val f = fs(root)
    f.delete(new Path(s"$root/members"), true)
    assert(f.exists(new Path(s"$root/grams")))
    assert(!LshIndex.exists(spark, root),
      "torn first-batch state must read as 'no index yet'")
    LshIndex.append(Dedup.buildIndex(batch0, "text", "doc_id"), root, 0L, 16)
    val clean = tmp("graft_lshcrash_first_clean")
    LshIndex.append(Dedup.buildIndex(batch0, "text", "doc_id"), clean, 0L, 16)
    val probe = Dedup.buildIndex(batch2, "text", "doc_id")
    assert(pairSet(LshIndex.probe(probe, root)) ==
      pairSet(LshIndex.probe(probe, clean)))

    // an empty FIRST batch must not create fileless table dirs (which
    // would flip exists() true and break the next probe's schema read)
    val root2 = tmp("graft_lshcrash_empty")
    LshIndex.append(Dedup.buildIndex(batch0.limit(0), "text", "doc_id"),
      root2, 0L, 16)
    assert(!LshIndex.exists(spark, root2))
    LshIndex.append(Dedup.buildIndex(batch0, "text", "doc_id"), root2, 1L, 16)
    assert(pairSet(LshIndex.probe(probe, root2)) ==
      pairSet(LshIndex.probe(probe, clean)))
  }

  test("LSH: restarted stream derives numBuckets from the index meta") {
    // index created with non-default numBuckets; a restarted stream
    // driving processBatch with the DEFAULT must append against the
    // existing layout instead of crashing ensureMeta
    val base = tmp("graft_lsh_meta")
    graft.streaming.DedupStream.processBatch(batch0, 0L, "text", "doc_id",
      s"$base/index", s"$base/pairs", threshold = 0.8, numBuckets = 16)
    graft.streaming.DedupStream.processBatch(batch1, 1L, "text", "doc_id",
      s"$base/index", s"$base/pairs", threshold = 0.8) // default 256 ≠ 16
    assert(LshIndex.readNumBuckets(spark, s"$base/index") == 16)
    val pairs = spark.read.parquet(s"$base/pairs")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch-1's exact re-crawl of doc 0 (id 100) is found cross-batch
    assert(pairs.contains((0L, 100L)), s"$pairs")
  }

  test("LSH: kill between task staging and job commit, replay converges") {
    val clean = cleanLshRoot()

    val root = tmp("graft_lshcrash_stage")
    LshIndex.append(Dedup.buildIndex(batch0, "text", "doc_id"), root, 0L, 16)
    // the state a kill leaves mid-job: staged task output under
    // _temporary, nothing committed for the batch
    val f = fs(root)
    val staged = new Path(
      s"$root/members/_temporary/0/_temporary/attempt_x/part-00000.parquet")
    f.mkdirs(staged.getParent)
    val out = f.create(staged, true)
    try out.write(Array.fill(64)(0x5A.toByte)) finally out.close()

    // staging junk must not poison reads of the committed batches
    assert(rowCount(s"$root/members") == rowCount(s"$clean/members") -
      spark.read.parquet(s"$clean/members")
        .filter(col(LshIndex.BatchCol) === 1L).count())

    LshIndex.append(Dedup.buildIndex(batch1, "text", "doc_id"), root, 1L, 16)
    val probe = Dedup.buildIndex(batch2, "text", "doc_id")
    assert(pairSet(LshIndex.probe(probe, root)) ==
      pairSet(LshIndex.probe(probe, clean)))
    assert(rowCount(s"$root/members") == rowCount(s"$clean/members"))
  }

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

  private def resultSet(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e9) / 1e9, r.getInt(3))).toSet

  test("IVF: empty first build writes nothing; next batch trains (freeze-on-first-data)") {
    val root = tmp("graft_ivfcrash_empty")
    // an empty first micro-batch must not freeze an empty centroid set
    // or leave fileless table dirs behind
    IvfIndex.build(corpus(0 until 0), root, nlist = 8)
    assert(!IvfIndex.exists(spark, root))
    graft.streaming.AnnStream.processBatch(corpus(0 until 100), 1L,
      root, nlist = 8)
    assert(IvfIndex.exists(spark, root))
    val clean = tmp("graft_ivfcrash_empty_clean")
    IvfIndex.build(corpus(0 until 100), clean, nlist = 8)
    val q = corpus(0 until 3)
      .select(col("vec_id").as("query_id"), col("embedding"))
    assert(resultSet(IvfIndex.query(spark, root, q, k = 5, nprobe = 3)) ==
      resultSet(IvfIndex.query(spark, clean, q, k = 5, nprobe = 3)))
  }

  test("IVF: kill mid-append leaves staging junk; replay converges") {
    val q = corpus(0 until 3)
      .select(col("vec_id").as("query_id"), col("embedding"))

    val clean = tmp("graft_ivfcrash_clean")
    IvfIndex.build(corpus(0 until 100), clean, nlist = 8)
    IvfIndex.append(corpus(100 until 150), clean, batchId = 1L)

    val root = tmp("graft_ivfcrash")
    IvfIndex.build(corpus(0 until 100), root, nlist = 8)
    // kill state 1: staged-but-uncommitted task output for batch 1
    val f = fs(root)
    val staged = new Path(
      s"$root/cells/_temporary/0/_temporary/attempt_y/part-00000.parquet")
    f.mkdirs(staged.getParent)
    val out = f.create(staged, true)
    try out.write(Array.fill(64)(0x5A.toByte)) finally out.close()

    IvfIndex.append(corpus(100 until 150), root, batchId = 1L)
    assert(resultSet(IvfIndex.query(spark, root, q, k = 5, nprobe = 3)) ==
      resultSet(IvfIndex.query(spark, clean, q, k = 5, nprobe = 3)))
    assert(rowCount(s"$root/cells") == rowCount(s"$clean/cells"))

    // kill state 2: batch committed, THEN re-delivered (the plain
    // at-least-once replay) — partitions overwrite, rows don't double
    IvfIndex.append(corpus(100 until 150), root, batchId = 1L)
    assert(rowCount(s"$root/cells") == rowCount(s"$clean/cells"))
    assert(resultSet(IvfIndex.query(spark, root, q, k = 5, nprobe = 3)) ==
      resultSet(IvfIndex.query(spark, clean, q, k = 5, nprobe = 3)))
  }

  test("Containment: kill between the docs and postings writes, replay converges") {
    // same two-table seam as LSH (docs commit first, then postings):
    // the torn state has batch-1 doc arrays but no batch-1 postings —
    // a probe would miss batch-1 partners until the replay lands
    def cleanRoot(): String = {
      val root = tmp("graft_cidxcrash_clean")
      ContainmentIndex.append(batch0, "text", "doc_id", root, 0L, 4, 16)
      ContainmentIndex.append(batch1, "text", "doc_id", root, 1L, 4, 16)
      root
    }
    val clean = cleanRoot()

    val root = tmp("graft_cidxcrash_seam")
    ContainmentIndex.append(batch0, "text", "doc_id", root, 0L, 4, 16)
    ContainmentIndex.append(batch1, "text", "doc_id", root, 1L, 4, 16)
    val f = fs(root)
    val postB1 = f.globStatus(
      new Path(s"$root/postings/${ContainmentIndex.BatchCol}=1"))
    assert(postB1.nonEmpty, "fixture: batch-1 postings must exist pre-crash")
    postB1.foreach(s => f.delete(s.getPath, true))
    assert(rowCount(s"$root/postings") < rowCount(s"$clean/postings"))

    // at-least-once replay of the SAME batch, then probe with a batch
    // containing an excerpt of a batch-1 doc (candidates must come from
    // the replayed postings)
    ContainmentIndex.append(batch1, "text", "doc_id", root, 1L, 4, 16)
    val probe = docsDF(Seq(
      (900L, "an entirely novel text unlike anything else"),
      (901L, "document 5 discusses topic 0 covering alpha beta")))
    def probed(r: String) = pairSet(ContainmentIndex.probe(
      probe, "text", "doc_id", r, threshold = 0.9))
    assert(probed(root) == probed(clean))
    assert(rowCount(s"$root/postings") == rowCount(s"$clean/postings"),
      "replay must overwrite its own posting partitions, not double them")
    assert(rowCount(s"$root/docs") == rowCount(s"$clean/docs"))
  }

  test("Containment: torn FIRST batch reads as no-index; replayed stream batch converges") {
    // crash between the two table writes of the very first append:
    // docs/ committed, postings/ absent. exists() requires both, so
    // the replayed ContainmentStream batch takes the clean first-batch
    // path (selfContainmentPairs + full append) instead of probing a
    // half-written index and throwing
    val root = tmp("graft_cidxcrash_first")
    ContainmentIndex.append(batch0, "text", "doc_id", root, 0L, 4, 16)
    val f = fs(root)
    f.delete(new Path(s"$root/postings"), true)
    assert(f.exists(new Path(s"$root/docs")))
    assert(!ContainmentIndex.exists(spark, root),
      "torn first-batch state must read as 'no index yet'")

    val pairsDir = tmp("graft_cidxcrash_first_pairs")
    graft.streaming.ContainmentStream.processBatch(batch0, 0L, "text",
      "doc_id", root, pairsDir, threshold = 0.9, maxDf = 64,
      shingleN = 4, numBuckets = 16)
    val clean = tmp("graft_cidxcrash_first_clean")
    ContainmentIndex.append(batch0, "text", "doc_id", clean, 0L, 4, 16)
    assert(rowCount(s"$root/postings") == rowCount(s"$clean/postings"))
    assert(rowCount(s"$root/docs") == rowCount(s"$clean/docs"))
    // and the rebuilt index serves probes identically
    val probe = docsDF(Seq(
      (901L, "document 5 discusses topic 0 covering alpha beta")))
    assert(pairSet(ContainmentIndex.probe(probe, "text", "doc_id", root)) ==
      pairSet(ContainmentIndex.probe(probe, "text", "doc_id", clean)))
  }

  test("Containment: effectively-empty batch writes nothing and wedges nothing") {
    val root = tmp("graft_cidxcrash_empty")
    // all-null first batch (blank-but-non-null text is a real document
    // with one empty-string gram, same as the batch operator): no table
    // dirs may appear — a fileless postings/ dir would flip exists()
    // true and break the next probe's schema inference
    ContainmentIndex.append(docsDF(Seq((1L, null: String))),
      "text", "doc_id", root, 0L, 4, 16)
    assert(!ContainmentIndex.exists(spark, root))
    // the stream's first REAL batch after the empty one proceeds as a
    // clean first append
    ContainmentIndex.append(batch0, "text", "doc_id", root, 1L, 4, 16)
    assert(ContainmentIndex.exists(spark, root))
    // an empty LATER batch is a no-op, not a fileless batch partition
    val before = rowCount(s"$root/postings")
    ContainmentIndex.append(docsDF(Seq.empty[(Long, String)]),
      "text", "doc_id", root, 2L, 4, 16)
    assert(rowCount(s"$root/postings") == before)
    val probe = docsDF(Seq(
      (901L, "document 5 discusses topic 0 covering alpha beta")))
    val clean = tmp("graft_cidxcrash_empty_clean")
    ContainmentIndex.append(batch0, "text", "doc_id", clean, 0L, 4, 16)
    assert(pairSet(ContainmentIndex.probe(probe, "text", "doc_id", root)) ==
      pairSet(ContainmentIndex.probe(probe, "text", "doc_id", clean)))
  }
}
