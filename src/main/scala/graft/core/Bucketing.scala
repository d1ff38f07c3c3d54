package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed (hash-clustered) catalog tables for shuffle-free big-big
  * joins — the physical-design lever the reference gets from MergeTree
  * ORDER BY locality, re-expressed as Spark bucketing.
  *
  * At 100 TB the fact↔fact (and fact↔huge-dim) joins cannot broadcast;
  * without co-location every such join shuffles both full inputs. Two
  * tables bucketed by the join key into the same bucket count join with
  * ZERO exchanges: each task reads bucket i of both sides. `sortBy` on
  * the same key additionally removes the sort of the sort-merge join
  * (and gives parquet min/max locality, like [[PartitionedWriter]]'s
  * sortWithinPartitions).
  *
  * Bucketed tables must live in the session catalog (bucket metadata is
  * catalog state, not directory layout), hence `saveAsTable` rather
  * than `.parquet(path)`. Pick the bucket count once per subject area
  * (e.g. 4× target cluster cores) — both sides must match for the
  * exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table.
    *
    * Idempotent across JVMs: with the in-memory (non-Hive) catalog, a
    * previous process's managed-table directory survives while the
    * catalog entry does not, and Overwrite-saveAsTable then refuses
    * with LOCATION_ALREADY_EXISTS — so any orphaned location is
    * cleared first. `table` is an unqualified name in the session's
    * current database. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty)
    val spark = df.sparkSession
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }
}
