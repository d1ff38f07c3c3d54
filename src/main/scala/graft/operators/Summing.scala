package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PartitionedWriter

/** SummingMergeTree semantics — the additive sibling of
  * [[Replacing]]'s latest-wins dedup. The reference's engine family
  * offers both table kinds; its repo uses Replacing for gold tables
  * (`clickhouse/init/03_gold_tables.sql:12`) and this is the
  * pre-aggregation counterpart: the table stores PARTIAL sums, readers
  * fold rows with equal keys by adding measures, and a background
  * merge collapses the stored rows without changing what readers see.
  *
  * Why it matters at 100 TB: a counter table fed by every micro-batch
  * appends partial rows cheaply (no read-modify-write, no state), and
  * the fold is a per-key SUM that combines map-side — the write path
  * never contends, the read path shrinks as merges run. Long measures
  * only: additive folding must be associative-exact, and long addition
  * is (doubles would drift with merge order — callers scale to
  * micro-units first, as the suite convention does everywhere).
  */
object Summing {

  /** Reader fold: collapse stored partial rows to one row per key by
    * summing the measure columns — ClickHouse's `SELECT … FINAL`.
    * One map-side-combined aggregation; returns keys + measures and is
    * invariant to merge state. */
  def summedView(stored: DataFrame, keyCols: Seq[String],
      measureCols: Seq[String]): DataFrame =
    stored.groupBy(keyCols.map(col): _*)
      .agg(sum(col(measureCols.head)).as(measureCols.head),
        measureCols.tail.map(m => sum(col(m)).as(m)): _*)

  /** Append a batch of partial sums to the date-partitioned store —
    * blind and cheap by design (dedup/merging is the readers' and
    * [[merge]]'s job, exactly the MergeTree write discipline). */
  def appendPartials(df: DataFrame, path: String, tsCol: String): Unit = {
    PartitionedWriter.append(df, path, tsCol)
    ()
  }

  case class MergeStats(partition: String, rowsBefore: Long, rowsAfter: Long)

  /** The explicit background merge: rewrite each date partition with
    * equal-key rows folded — measures summed, the timestamp carried as
    * the per-key max (deterministic; stays inside the partition's
    * date). [[summedView]] answers are identical before, during and
    * after (the fold only re-associates long additions); the stored
    * row count shrinks to one per (key, date partition). Partition-
    * at-a-time via the staged-rename swap compaction uses —
    * crash-healed, reader-safe. */
  def merge(spark: SparkSession, path: String, keyCols: Seq[String],
      measureCols: Seq[String], tsCol: String): Seq[MergeStats] = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val parts = fs.listStatus(root).toSeq.filter(s =>
      s.isDirectory &&
        s.getPath.getName.startsWith(s"${PartitionedWriter.DateCol}="))
    parts.map { p =>
      val part = spark.read.parquet(p.getPath.toString)
      val before = part.count()
      val folded = part.groupBy(keyCols.map(col): _*)
        .agg(max(col(tsCol)).as(tsCol),
          measureCols.map(m => sum(col(m)).as(m)): _*)
        .select(part.columns.map(col).toIndexedSeq: _*) // original order
        .cache()
      try {
        val after = folded.count()
        if (after < before)
          PartitionedWriter.swapPartitionIn(spark, root, p.getPath) { tmp =>
            folded.write.parquet(tmp.toString)
          }
        MergeStats(p.getPath.getName, before, after)
      } finally folded.unpersist()
    }
  }
}
