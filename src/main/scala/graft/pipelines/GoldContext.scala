package graft.pipelines

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PartitionedWriter
import graft.ingest.Bronze

/** Warehouse handle for the medallion layout: bronze + gold tables as
  * date-partitioned (facts/bronze) or flat (dims) parquet directories.
  *
  * Mirrors the reference's table universe
  * (/root/reference/clickhouse/init/01_bronze_tables.sql,
  * 03_gold_tables.sql) with Spark-native storage. Dim tables are small
  * by construction (SURVEY.md §4 "small-dim joins"), so they are stored
  * unpartitioned and rewritten wholesale by SCD2 updates via an
  * atomic-enough temp-write-and-swap; facts/bridges/bronze are
  * `event_date=`-partitioned append-only tables.
  */
class GoldContext(
    val spark: SparkSession,
    val root: String,
    val tz: String = "Asia/Jakarta") {

  def path(table: String): String = s"$root/$table"

  def exists(table: String): Boolean = PartitionedWriter.exists(spark, path(table))

  /** Bronze table for a source; empty frame with the projection's schema
    * if nothing was ingested yet. */
  def bronze(source: String): DataFrame =
    if (exists(s"bronze_$source")) spark.read.parquet(path(s"bronze_$source"))
    else {
      val emptyRaw = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(Bronze.Raw,
            org.apache.spark.sql.types.StringType))))
      Bronze.route(emptyRaw)(source)
    }

  /** Bronze rows in [start, end) — the universal incremental window scan
    * (B1). The event_date predicate is derived from the window bounds so
    * partition pruning never depends on inferring it from event_ts. */
  def bronzeWindow(source: String, w: TimeWindow): DataFrame = {
    val df = bronze(source)
    val pruned =
      if (df.columns.contains(PartitionedWriter.DateCol))
        df.filter(col(PartitionedWriter.DateCol)
          .between(to_date(lit(w.start)), to_date(lit(w.end))))
      else df
    pruned.filter(col("event_ts") >= lit(w.start) && col("event_ts") < lit(w.end))
  }

  /** Gold table; empty frame with `schema` if absent. */
  def gold(table: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (exists(table)) spark.read.parquet(path(table))
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Append new dim rows (C1 insert-if-absent output). */
  def appendDim(table: String, rows: DataFrame): Long = {
    val n = rows.count()
    if (n > 0) rows.write.mode(SaveMode.Append).parquet(path(table))
    n
  }

  /** Full rewrite of a dim table: write temp, compact to size-based
    * file count, two-step swap. The SCD2 "ALTER TABLE UPDATE" close-step
    * (dim_agent_scd2.sql:1-25) becomes a rewrite because parquet has no
    * in-place mutation.
    *
    * Swap order matters for concurrent readers: rename live → `.bak`,
    * rename tmp → live, delete `.bak`. The table is missing only
    * between two metadata-speed renames — never for the duration of a
    * recursive delete (the old delete-then-rename gap). A crash between
    * the renames leaves `.bak`, which the next rewrite restores before
    * proceeding, so the table always reappears.
    *
    * File count is sized from actual bytes (targeting 128 MB files),
    * not hardcoded to 1: dims here are broadcast-sized today, but a dim
    * that grows keeps scan parallelism instead of bottlenecking on one
    * file. Compaction reads the temp parquet back — one cheap IO pass —
    * rather than re-evaluating the (SCD2 chain) plan for a count. */
  def rewriteDim(table: String, df: DataFrame): Long = {
    import org.apache.hadoop.fs.Path
    val target = new Path(path(table))
    val raw = new Path(path(table) + "__tmpraw")
    val tmp = new Path(path(table) + "__tmp")
    val bak = new Path(path(table) + "__bak")
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recover a crash that happened between the two renames below
    if (!fs.exists(target) && fs.exists(bak)) fs.rename(bak, target)
    if (fs.exists(bak)) fs.delete(bak, true)

    df.write.mode(SaveMode.Overwrite).parquet(raw.toString)
    val hasData = fs.listStatus(raw)
      .exists(s => s.getLen > 0 && s.getPath.getName.endsWith(".parquet"))
    if (hasData) {
      val bytes = fs.getContentSummary(raw).getLength
      val targetFileBytes = 128L << 20
      val files = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
      spark.read.parquet(raw.toString).repartition(files)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    } else {
      // empty result: still write one schema-bearing parquet file so the
      // table stays readable
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
        .repartition(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    }
    fs.delete(raw, true)
    val n = spark.read.parquet(tmp.toString).count()

    // FileSystem.rename reports many failures by returning false, not
    // throwing (quota, permissions, concurrent recreation of the
    // destination) — an unchecked false here followed by the bak delete
    // would destroy the only remaining copy of the table
    def mustRename(from: Path, to: Path): Unit =
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"rename $from -> $to failed")
    val hadTable = fs.exists(target)
    if (hadTable) mustRename(target, bak)
    try mustRename(tmp, target)
    catch {
      case e: java.io.IOException =>
        // put the live table back before surfacing the failure
        if (hadTable && !fs.exists(target)) fs.rename(bak, target)
        throw e
    }
    if (hadTable) fs.delete(bak, true)
    n
  }

  /** Idempotent fact/bridge append: anti-join on `keys` within the
    * touched partitions (C2), then append. Returns rows appended. */
  def appendFact(table: String, rows: DataFrame, tsCol: String,
      keys: Seq[String]): Long =
    PartitionedWriter.appendIfAbsent(rows, path(table), tsCol, keys)

  def count(table: String): Long =
    if (exists(table)) spark.read.parquet(path(table)).count() else 0L

  /** Fold a fact/bronze table's accumulated per-append files into
    * size-targeted sorted ones (the background-merge equivalent; see
    * PartitionedWriter.compactPartitions). Run off-cadence. */
  def compactTable(table: String,
      orderCols: Seq[String] = Seq("event_ts", "event_id"),
      minFiles: Int = 8): Seq[PartitionedWriter.CompactStats] =
    PartitionedWriter.compactPartitions(spark, path(table), orderCols, minFiles)
}

/** Half-open incremental window [start, end) (gold_pipeline.py:27-49). */
case class TimeWindow(start: Timestamp, end: Timestamp)

object TimeWindow {
  def of(start: String, end: String): TimeWindow =
    TimeWindow(parse(start), parse(end))

  /** Accepts `yyyy-MM-dd[ HH:mm:ss[.fff]]` or ISO `yyyy-MM-ddTHH:mm:ss`. */
  def parse(s: String): Timestamp = {
    val t = s.replace('T', ' ')
    Timestamp.valueOf(if (t.contains(' ')) t else t + " 00:00:00")
  }

  /** Default window: [now - minutes, now) — the reference's 10-minute
    * overlapping window (10_metadata.sql:53). */
  def lastMinutes(minutes: Int): TimeWindow = {
    val now = System.currentTimeMillis()
    TimeWindow(new Timestamp(now - minutes * 60000L), new Timestamp(now))
  }
}
