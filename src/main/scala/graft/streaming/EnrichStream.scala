package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — continuous enrichment of
  * one event stream with recent context from another: the alert
  * stream joined to the events that preceded it within a horizon
  * (reference-world use: a Suricata alert enriched with the Zeek
  * connections of the prior minutes; its batch twin is the plain
  * interval join the suite's h11 family replays).
  *
  * Both sides carry watermarks and the join condition carries an
  * explicit event-time interval — together they let Spark BOUND the
  * buffered state: a left row can stop waiting once the right
  * watermark passes `l_ts` (no more in-interval context can arrive),
  * and a right row evicts once the left watermark passes
  * `r_ts + gapSec`. Without the interval bound, stream-stream inner
  * join state grows forever; with it, state is the horizon's worth of
  * events per side — the property EnrichStreamSpec exercises by
  * replaying out-of-order micro-batches against the batch join.
  *
  * Columns: callers pass distinct column names on the two sides
  * (`key`/`l_ts` vs `r_key`/`r_ts`-style) — the output is the plain
  * joined row set, append-mode, exactly-once per match.
  */
object EnrichStream {

  def joined(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      gapSec: Long, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"interval $gapSec seconds") &&
        col(rightTs) <= col(leftTs))
  }

  /** Parquet-sink runner (append mode). */
  def start(left: DataFrame, leftKey: String, leftTs: String,
      right: DataFrame, rightKey: String, rightTs: String,
      gapSec: Long, watermarkDelay: String,
      outPath: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    joined(left, leftKey, leftTs, right, rightKey, rightTs,
      gapSec, watermarkDelay)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outPath).option("checkpointLocation", checkpoint)
      .trigger(trigger).start()
}
