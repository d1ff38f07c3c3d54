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
  * `pairsPath`. Batch ids must be globally unique (the reference's
  * event-hash discipline); re-delivered ids produce re-detected pairs,
  * deduplicated downstream like every other at-least-once sink.
  */
object DedupStream {

  def start(docs: DataFrame, textCol: String, idCol: String,
      indexPath: String, pairsPath: String, checkpointDir: String,
      threshold: Double = 0.8,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val newIdx = Dedup.buildIndex(batch, textCol, idCol).cache()
        try {
          val oldIdx = scala.util.Try(spark.read.parquet(indexPath))
            .getOrElse(newIdx.limit(0)) // first batch: empty index
          Dedup.incrementalCandidates(newIdx, oldIdx)
            .filter(col("jaccard") >= threshold)
            .write.mode(SaveMode.Append).parquet(pairsPath)
          newIdx.write.mode(SaveMode.Append).parquet(indexPath)
        } finally { newIdx.unpersist(); () }
      }
      .start()
}
