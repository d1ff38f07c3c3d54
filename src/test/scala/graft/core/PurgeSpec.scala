package graft.core

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten: purgeKeys removes exactly the requested
  * rows, rewrites only the partitions that held them, and is
  * idempotent. */
class PurgeSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = {
    val root = Files.createTempDirectory("purge_spec_").toString + "/t"
    // 3 date partitions; users 1..6, user u active on days (u % 3)
    val rows = for {
      u <- 1L to 6L
      i <- 0 until 4
    } yield (u * 100 + i, u,
      java.sql.Timestamp.valueOf(s"2024-01-0${(u % 3) + 1} 0$i:00:00"))
    PartitionedWriter.append(
      rows.toDF("event_id", "user_id", "ts"), root, "ts", Seq("event_id"))
    root
  }

  private def partFiles(root: String): Map[String, Set[(String, Long)]] = {
    val dir = new java.io.File(root)
    dir.listFiles().filter(_.getName.startsWith("event_date="))
      .map(p => p.getName -> p.listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet)
      .toMap
  }

  test("purge removes exactly the keyed rows with a correct receipt") {
    val root = freshTable()
    val del = Seq(2L, 5L).toDF("user_id") // both live on day 3
    val stats = PartitionedWriter.purgeKeys(spark, root, "user_id", del)
    assert(stats.map(s => (s.partition, s.rowsBefore, s.rowsRemoved)) ==
      Seq(("event_date=2024-01-03", 8L, 8L)))
    val left = spark.read.parquet(root)
    assert(left.filter(col("user_id").isin(2L, 5L)).count() == 0)
    assert(left.count() == 16, "4 surviving users x 4 events")
  }

  test("untouched partitions keep byte-identical files; emptied ones vanish") {
    val root = freshTable()
    val before = partFiles(root)
    // users 2 and 5 are ALL of day 3's rows -> that partition drops;
    // days 1 and 2 contain no match and must not be reopened
    val stats = PartitionedWriter.purgeKeys(spark, root, "user_id",
      Seq(2L, 5L).toDF("user_id"))
    val after = partFiles(root)
    assert(!after.contains("event_date=2024-01-03"),
      "fully-purged partition is dropped")
    assert(after("event_date=2024-01-01") == before("event_date=2024-01-01"))
    assert(after("event_date=2024-01-02") == before("event_date=2024-01-02"))
    assert(stats.size == 1)
  }

  test("partial purge rewrites only the affected partition") {
    val root = freshTable()
    val before = partFiles(root)
    // user 3 lives on day 1 alongside user 6
    val stats = PartitionedWriter.purgeKeys(spark, root, "user_id",
      Seq(3L).toDF("user_id"))
    val after = partFiles(root)
    assert(stats == Seq(PartitionedWriter.PurgeStats(
      "event_date=2024-01-01", 8L, 4L)))
    assert(after("event_date=2024-01-01") != before("event_date=2024-01-01"),
      "affected partition was rewritten")
    assert(after("event_date=2024-01-02") == before("event_date=2024-01-02"))
    assert(after("event_date=2024-01-03") == before("event_date=2024-01-03"))
    val day1 = spark.read.parquet(s"$root/event_date=2024-01-01")
    assert(day1.select("user_id").distinct().as[Long].collect().toSet ==
      Set(6L))
  }

  test("TTL expiry drops only partitions strictly before the cutoff") {
    val root = freshTable()
    val stats = PartitionedWriter.expirePartitions(spark, root,
      java.time.LocalDate.parse("2024-01-03"))
    assert(stats.map(_.partition) ==
      Seq("event_date=2024-01-01", "event_date=2024-01-02"))
    assert(stats.forall(s => s.files > 0 && s.bytes > 0),
      "receipts record freed files and bytes")
    val left = spark.read.parquet(root)
    assert(left.count() == 8, "only day 3 survives")
    // future cutoff removes nothing more; past cutoff is a no-op
    assert(PartitionedWriter.expirePartitions(spark, root,
      java.time.LocalDate.parse("2024-01-03")).isEmpty)
  }

  test("purging again removes nothing (idempotent erasure)") {
    val root = freshTable()
    val del = Seq(1L).toDF("user_id")
    val first = PartitionedWriter.purgeKeys(spark, root, "user_id", del)
    assert(first.map(_.rowsRemoved).sum == 4L)
    val second = PartitionedWriter.purgeKeys(spark, root, "user_id", del)
    assert(second.isEmpty, "no partition contains the key anymore")
    assert(spark.read.parquet(root).count() == 20)
  }

  test("heal deletes a stale bak when live exists — no purge resurrection") {
    val root = freshTable()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    // simulate a swap that crashed after both renames but before the
    // bak delete: live partition present AND a completed-swap bak in
    // staging. Heal must DELETE that bak — keeping it opens a window
    // where a later legitimate drop of the partition (TTL, full purge)
    // is undone by the next heal restoring pre-purge rows.
    val staging = root + "__purge"
    fs.mkdirs(hp(staging))
    val live = root + "/event_date=2024-01-03"
    val bak = staging + "/event_date=2024-01-03.bak"
    org.apache.hadoop.fs.FileUtil.copy(fs, hp(live), fs, hp(bak), false,
      spark.sparkContext.hadoopConfiguration)
    PartitionedWriter.purgeKeys(spark, root, "user_id",
      Seq(99L).toDF("user_id")) // any lifecycle call heals staging
    assert(!fs.exists(hp(bak)), "completed-swap bak deleted, not kept")
    assert(fs.exists(hp(live)), "live partition untouched")
    assert(spark.read.parquet(root).count() == 24)
    // the crash-restore path still works: live missing + bak present
    val live2 = root + "/event_date=2024-01-01"
    val bak2 = staging + "/event_date=2024-01-01.bak"
    fs.mkdirs(hp(staging))
    assert(fs.rename(hp(live2), hp(bak2)))
    PartitionedWriter.purgeKeys(spark, root, "user_id",
      Seq(99L).toDF("user_id"))
    assert(fs.exists(hp(live2)), "interrupted swap restored from bak")
    assert(spark.read.parquet(root).count() == 24)
  }
}
