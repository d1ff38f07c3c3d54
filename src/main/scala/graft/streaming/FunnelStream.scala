package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous funnel evaluation — the streaming twin of
  * [[graft.operators.Funnel.windowFunnel]] with identical
  * earliest-first semantics: step 1 anchors at the key's earliest
  * step-1 event, each later step matches the earliest qualifying event
  * strictly after the previous match and within `windowSec` of the
  * anchor. Like the batch twin, this DIVERGES from the reference
  * family's max-over-anchors reading (see
  * [[graft.operators.Funnel.windowFunnelMax]] for parity) — the
  * earliest anchor is what makes the single-emission watermark bound
  * below possible; a max-over-anchors stream would have to hold state
  * until the key goes quiet forever.
  *
  * A key's funnel row is emitted EXACTLY ONCE, when the event-time
  * watermark passes `t1 + windowSec` — at that point no in-watermark
  * arrival can change any step (every influential event lies in
  * `[t1, t1 + windowSec]`, and t1 itself can no longer decrease), so
  * the emitted level equals the batch twin's on the same events.
  * FunnelStreamSpec replays out-of-order batches against the batch
  * operator to pin that equality.
  *
  * State per key is BOUNDED, not a replay buffer: the running minimum
  * step-1 second (one long — only the min can ever anchor), plus the
  * non-anchor step events still inside the reachable window
  * `[anchor floor, anchor floor + windowSec]`, where the anchor floor
  * is min(t1 so far, watermark) — everything outside it is pruned on
  * every update because it can never match. After emission only a
  * `done` marker remains (a later burst must NOT re-open the funnel:
  * the batch semantics anchor once per key).
  */
object FunnelStream {

  /** Pre-classified input: `step` is 1-based (callers map their
    * predicate per step and drop non-participating events). */
  case class StepEvent(key: Long, step: Int, ts: Timestamp)

  case class FunnelState(
      done: Boolean,
      t1: Option[Long],
      buf: List[(Int, Long)])

  case class FunnelRow(key: Long, level: Int, steps: Seq[Option[Long]])

  /** Fold the bounded state into final step seconds — the same
    * min-per-step chain as the batch operator. */
  private[streaming] def resolve(t1: Long, buf: List[(Int, Long)],
      numSteps: Int, windowSec: Long): Seq[Option[Long]] = {
    val hi = t1 + windowSec
    val out = Array.fill[Option[Long]](numSteps)(None)
    out(0) = Some(t1)
    var prev = t1
    var i = 2
    var stalled = false
    while (i <= numSteps && !stalled) {
      val cand = buf.iterator
        .filter { case (s, sec) => s == i && sec > prev && sec <= hi }
        .map(_._2)
      if (cand.isEmpty) stalled = true
      else {
        val m = cand.min
        out(i - 1) = Some(m)
        prev = m
      }
      i += 1
    }
    out.toSeq
  }

  def funnels(events: Dataset[StepEvent], numSteps: Int, windowSec: Long,
      watermarkDelay: String = "10 minutes"): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[StepEvent], state: GroupState[FunnelState]) =>
          def emit(st: FunnelState): Iterator[FunnelRow] = {
            state.update(FunnelState(done = true, None, Nil))
            val steps = resolve(st.t1.get, st.buf, numSteps, windowSec)
            Iterator.single(FunnelRow(key, steps.count(_.isDefined), steps))
          }
          if (state.hasTimedOut) {
            // the watermark passed t1 + window with no further events
            // for this key — the chain is final; the timeout is how a
            // quiet key still gets its row. A key that never anchored
            // just evicts (a future step-1 burst legitimately starts
            // its funnel then, same as the batch twin's global min)
            val st = state.get
            if (st.t1.isDefined) emit(st)
            else { state.remove(); Iterator.empty }
          } else {
            val prior = state.getOption.getOrElse(FunnelState(false, None, Nil))
            if (prior.done) {
              // consumed iterator, nothing to emit; the marker stays so
              // a late burst can't re-anchor an already-final funnel
              it.foreach(_ => ())
              Iterator.empty
            } else {
              val evs = it.toSeq
              val t1 = (prior.t1.toSeq ++ evs.collect {
                case e if e.step == 1 => e.ts.getTime / 1000L
              }).minOption
              val wmSec = state.getCurrentWatermarkMs() / 1000L
              // the FINAL anchor lies in [min(t1, wm), t1]: it can only
              // decrease from t1, and any new step-1 arrival is >= the
              // watermark. Events at or below that floor can never be
              // strictly after the anchor; events beyond t1 + window
              // can never be inside its window (no upper prune until
              // t1 exists — the buffer is then bounded by the
              // watermark horizon instead)
              val floor = t1.fold(wmSec)(math.min(_, wmSec))
              val buf = (prior.buf ++ evs.collect {
                case e if e.step > 1 && e.step <= numSteps =>
                  (e.step, e.ts.getTime / 1000L)
              }).filter { case (_, sec) =>
                sec > floor && t1.forall(a => sec <= a + windowSec)
              }
              t1 match {
                case Some(a) if wmSec > a + windowSec =>
                  emit(FunnelState(false, t1, buf))
                case Some(a) =>
                  state.update(FunnelState(done = false, t1, buf))
                  // fire once the watermark passes the anchor window;
                  // +1 s keeps the timestamp strictly above both the
                  // emission bound and the current watermark
                  state.setTimeoutTimestamp((a + windowSec + 1) * 1000L)
                  Iterator.empty
                case None =>
                  state.update(FunnelState(done = false, t1, buf))
                  // anchor-less state evicts once the watermark clears
                  // every buffered event (a buffered step event stays
                  // matchable exactly while its second exceeds the
                  // watermark — any future anchor arrives >= watermark)
                  val evictSec =
                    if (buf.isEmpty) wmSec + 1 else buf.map(_._2).max + 1
                  state.setTimeoutTimestamp(evictSec * 1000L)
                  Iterator.empty
              }
            }
          }
      }
  }

  /** Parquet-sink runner (append mode; a key's row lands exactly once,
    * so replays stay idempotent at the sink). */
  def start(events: Dataset[StepEvent], numSteps: Int, windowSec: Long,
      watermarkDelay: String, outPath: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    funnels(events, numSteps, windowSec, watermarkDelay)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outPath).option("checkpointLocation", checkpoint)
      .trigger(trigger).start()
}
