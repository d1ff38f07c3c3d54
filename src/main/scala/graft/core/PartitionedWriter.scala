package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet table layout + the two write disciplines the
  * reference's storage engine provides implicitly.
  *
  * Layout mirrors MergeTree `PARTITION BY toDate(event_ts) ORDER BY
  * (event_ts, event_id)` (/root/reference/clickhouse/init/01_bronze_tables.sql:25-27):
  * Hive-style `event_date=` directories give partition pruning for every
  * windowed scan (SURVEY.md §4), and sortWithinPartitions gives parquet
  * row-group min/max locality on the ORDER BY columns.
  *
  * Write disciplines:
  *  - [[append]] — blind append (bronze ingest; dedupe happens on read or
  *    downstream via anti-joins).
  *  - [[appendIfAbsent]] — the reference's idempotent insert: anti-join
  *    against the existing rows *in the touched window only* before
  *    appending (fact_wazuh_events.sql:76-79). Reading only the window's
  *    partitions keeps the anti-join bounded regardless of table size.
  */
object PartitionedWriter {

  val DateCol = "event_date"

  def withDate(df: DataFrame, tsCol: String): DataFrame =
    df.withColumn(DateCol, to_date(col(tsCol)))

  def append(df: DataFrame, path: String, tsCol: String,
      orderCols: Seq[String] = Nil): DataFrame = {
    val dated = withDate(df, tsCol)
    val sorted =
      if (orderCols.nonEmpty)
        dated.repartition(col(DateCol))
          .sortWithinPartitions((DateCol +: orderCols).map(col).toIndexedSeq: _*)
      else dated
    sorted.write.mode(SaveMode.Append).partitionBy(DateCol).parquet(path)
    dated
  }

  /** Append rows whose `keys` are not already present in the target's
    * partitions overlapping [the rows' own dates]. Returns rows appended.
    * An all-duplicates (or empty) input writes nothing — parquet dirs
    * never end up file-less/schema-less. */
  def appendIfAbsent(df: DataFrame, path: String, tsCol: String,
      keys: Seq[String]): Long = {
    val spark = df.sparkSession
    val dated = withDate(df, tsCol)
    val fresh =
      if (exists(spark, path)) {
        // restrict the existing-side scan to the touched dates (partition
        // pruning via an IN filter over the partition column)
        val dates = dated.select(DateCol).distinct()
        val existing = spark.read.parquet(path)
          .join(org.apache.spark.sql.functions.broadcast(dates), Seq(DateCol), "left_semi")
          .select(keys.map(col).toIndexedSeq: _*)
        dated.join(existing, keys, "left_anti")
      } else dated
    fresh.cache()
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode(SaveMode.Append).partitionBy(DateCol).parquet(path)
    fresh.unpersist()
    n
  }

  /** Full overwrite of only the partitions present in df (MERGE-style
    * window replacement; requires partitionOverwriteMode=dynamic, set by
    * GraftSession). */
  def replacePartitions(df: DataFrame, path: String, tsCol: String): Unit =
    withDate(df, tsCol).write.mode(SaveMode.Overwrite)
      .partitionBy(DateCol).parquet(path)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  case class CompactStats(partition: String, filesBefore: Int, filesAfter: Int)

  /** Rewrite date partitions that accumulated too many files into
    * size-targeted, range-sorted ones. Every cadence append writes its
    * own file set, so a 10-minute pipeline leaves ~144 files per
    * partition per day — file listing, scan task count, and row-group
    * locality all degrade without a periodic fold (the reference's
    * storage engine merges parts in the background continuously; this
    * is the explicit Spark-side equivalent).
    *
    * Only partitions with ≥ `minFiles` data files are touched. The
    * compacted copy is range-partitioned + sorted on `orderCols` (the
    * table's ORDER BY), restoring global sort order so parquet row-group
    * min/max pruning works across the whole partition again — appends
    * keep locality only within each append's own files.
    *
    * Swap discipline per partition, same as GoldContext.rewriteDim:
    * write to a staging dir OUTSIDE the table root (a tmp dir inside it
    * would corrupt Hive-style partition discovery), rename live → bak,
    * staged → live, delete bak; a crash between the renames is healed
    * on the next call (bak restored when live is missing). Readers see
    * the partition missing only between two metadata-speed renames.
    * Content is byte-for-byte the same rows, so appendIfAbsent's
    * key-level idempotency is unaffected. */
  def compactPartitions(spark: SparkSession, path: String,
      orderCols: Seq[String] = Nil, minFiles: Int = 8,
      targetFileBytes: Long = 128L << 20): Seq[CompactStats] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val staging = new Path(path + "__compact")
    val parts = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$DateCol="))

    // heal a crash from a previous run: live partition gone, bak present
    if (fs.exists(staging)) fs.listStatus(staging).toSeq
      .filter(_.getPath.getName.endsWith(".bak"))
      .foreach { b =>
        val live = new Path(root, b.getPath.getName.stripSuffix(".bak"))
        if (!fs.exists(live)) fs.rename(b.getPath, live)
      }

    def mustRename(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"rename $from -> $to failed")

    val stats = parts.flatMap { p =>
      val dataFiles = fs.listStatus(p.getPath)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (dataFiles.length < minFiles) None
      else {
        val bytes = dataFiles.map(_.getLen).sum
        val files = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
        val part = spark.read.parquet(p.getPath.toString)
        val shaped =
          if (orderCols.nonEmpty)
            part.repartitionByRange(files, orderCols.map(col).toIndexedSeq: _*)
              .sortWithinPartitions(orderCols.map(col).toIndexedSeq: _*)
          else part.repartition(files)
        val tmp = new Path(staging, p.getPath.getName + ".tmp")
        val bak = new Path(staging, p.getPath.getName + ".bak")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        if (fs.exists(bak)) fs.delete(bak, true)
        shaped.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        mustRename(p.getPath, bak)
        try mustRename(tmp, p.getPath)
        catch {
          case e: java.io.IOException =>
            if (!fs.exists(p.getPath)) fs.rename(bak, p.getPath)
            throw e
        }
        fs.delete(bak, true)
        val after = fs.listStatus(p.getPath)
          .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        Some(CompactStats(p.getPath.getName, dataFiles.length, after))
      }
    }
    if (fs.exists(staging) && fs.listStatus(staging).isEmpty)
      fs.delete(staging, true)
    stats
  }

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
