package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming EXACT dedup — the stateful-native twin of batch
  * `Dedup.exact` (the near-dup twin, [[DedupStream]], keeps its state
  * in a persisted LSH index; here the state is Spark's own watermarked
  * dedup store): arriving documents drop when their content hash was
  * already seen within the watermark horizon, using
  * `dropDuplicatesWithinWatermark` so the state store evicts expired
  * hashes instead of growing with the corpus.
  *
  * Semantics, stated honestly: duplicates separated by MORE than the
  * watermark horizon pass (their hash has been evicted) — this is the
  * bounded-state trade every watermarked dedup makes. A pipeline that
  * needs corpus-lifetime exactness chains this (cheap, in-memory,
  * catches the overwhelmingly-common near-in-time duplicates — retry
  * storms, double-posts, crawler revisits) with the batch
  * `Dedup.exact` pass over the landed table. Only the 8-byte content
  * hash enters the state store, never text. */
object ExactDedupStream {

  def start(docs: DataFrame, textCol: String, tsCol: String,
      watermark: String, outPath: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    docs
      .withWatermark(tsCol, watermark)
      .withColumn("__h", xxhash64(col(textCol)))
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
