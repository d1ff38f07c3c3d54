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

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty)
    val sorted = if (sortCols.isEmpty) bucketCols else sortCols
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .saveAsTable(table)
  }
}
