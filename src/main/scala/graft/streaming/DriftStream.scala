package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Curation, LshIndex}

/** Per-micro-batch corpus-drift monitor: each batch's unigram
  * distribution is compared to a FROZEN reference snapshot (its
  * (term, n) table, computed once with [[Curation.unigramCounts]] and
  * persisted) by exact fixed-point Jensen–Shannon divergence — the
  * alert signal when an incoming crawl/feed shifts vocabulary away
  * from the corpus the current model was trained on.
  *
  * One metrics row lands per batch, partitioned by batch id with
  * dynamic overwrite, so checkpoint replays rewrite their own row
  * idempotently (same replay-safe sink discipline as the other
  * streaming sinks). The reference counts are vocab-bounded and
  * broadcast inside the drift join; batch text never shuffles — only
  * (term, count) pairs do.
  */
object DriftStream {

  private val BatchCol = LshIndex.BatchCol

  /** One micro-batch: drift vs the frozen reference → one metrics row.
    * Public so tests and batch backfill audits drive the exact
    * foreachBatch body. */
  def processBatch(batch: DataFrame, batchId: Long, refCounts: DataFrame,
      textCol: String, metricsPath: String): Unit = {
    Curation.unigramDriftVsCounts(batch, refCounts, textCol)
      .withColumn(BatchCol, lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol)
      .parquet(metricsPath)
  }

  def start(docs: DataFrame, refCounts: DataFrame, textCol: String,
      metricsPath: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, refCounts, textCol, metricsPath)
      }
      .start()
}
