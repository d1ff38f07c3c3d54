package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Continuous near-dup detection: each micro-batch of documents is
  * signature-indexed once ([[Dedup.buildIndex]]), probed against the
  * accumulated index ([[Dedup.incrementalCandidates]]), and appended to
  * it — history is never re-tokenized or re-paired. This is the 100 TB
  * continuous-ingestion shape: per-batch cost is O(|batch| + collisions)
  * regardless of corpus size, and the index is a plain parquet table
  * any batch job can also read.
  *
  * Outputs duplicate pairs (id_a, id_b, jaccard ≥ threshold) to
  * `pairsPath`.
  *
  * Replay safety: foreachBatch is at-least-once — a crash after the
  * writes but before the checkpoint commit re-runs the SAME batch id.
  * Both sinks are therefore `__batch_id`-partitioned with dynamic
  * partition overwrite: a replay rewrites its own partition instead of
  * appending a second copy, so the "index accumulates each doc exactly
  * once" invariant survives failure-replay, not just clean runs. (The
  * replayed probe sees its own docs already indexed; the self-pair
  * guard and pair normalization in [[Dedup.incrementalCandidates]]
  * make that re-probe emit the same pair set, which the overwrite then
  * replaces in place.)
  *
  * Note: a partitioned parquet sink materializes no files for an empty
  * batch result, so `pairsPath` becomes readable at the first batch
  * that actually emits a pair (readers should Try/exists-guard it, as
  * GoldContext does for all tables); the index path always
  * materializes — every batch has rows.
  */
object DedupStream {

  private val BatchCol = "__batch_id"

  /** One micro-batch: index, probe against history, persist both —
    * idempotent on `batchId`. Public so tests (and batch replayers)
    * can drive the exact foreachBatch body. */
  def processBatch(batch: DataFrame, batchId: Long, textCol: String,
      idCol: String, indexPath: String, pairsPath: String,
      threshold: Double): Unit = {
    val spark = batch.sparkSession
    val newIdx = Dedup.buildIndex(batch, textCol, idCol).cache()
    try {
      val oldIdx = scala.util.Try(
          spark.read.parquet(indexPath).drop(BatchCol))
        .getOrElse(newIdx.limit(0)) // first batch: empty index
      Dedup.incrementalCandidates(newIdx, oldIdx)
        .filter(col("jaccard") >= threshold)
        .withColumn(BatchCol, lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BatchCol)
        .parquet(pairsPath)
      newIdx.withColumn(BatchCol, lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BatchCol)
        .parquet(indexPath)
    } finally { newIdx.unpersist(); () }
  }

  def start(docs: DataFrame, textCol: String, idCol: String,
      indexPath: String, pairsPath: String, checkpointDir: String,
      threshold: Double = 0.8,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, idCol, indexPath, pairsPath,
          threshold)
      }
      .start()
}
