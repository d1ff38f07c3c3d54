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

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
