package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state — the
  * `flatMapGroupsWithState` path for when session windows must close
  * continuously instead of in a batch rebuild. Batch twin (identical
  * gap semantics): [[graft.operators.Curation.sessionize]].
  *
  * State per key is the list of still-open sessions; the event-time
  * watermark both bounds the state store and drives session closing:
  * a session is emitted exactly once, when the watermark passes its
  * end + gap (no later event can extend it). Out-of-order events
  * inside the watermark merge correctly because sessions are re-merged
  * on every update, not only appended.
  */
object Sessionize {

  case class Event(key: Long, ts: Timestamp)
  /** Open session bounds in epoch millis (state payload). */
  case class Open(startMs: Long, endMs: Long, n: Long)
  case class Session(key: Long, start_s: Long, end_s: Long, n_events: Long)

  /** Fold sorted event times into gap-separated sessions, merging with
    * any existing open sessions. Pure — shared by every state update. */
  private[streaming] def merge(open: List[Open], eventMs: Seq[Long],
      gapMs: Long): List[Open] = {
    val pts = (open ++ eventMs.map(m => Open(m, m, 1))).sortBy(_.startMs)
    pts.foldLeft(List.empty[Open]) {
      case (last :: rest, cur) if cur.startMs - last.endMs <= gapMs =>
        Open(last.startMs, math.max(last.endMs, cur.endMs), last.n + cur.n) :: rest
      case (acc, cur) => cur :: acc
    }.reverse
  }

  def sessions(events: Dataset[Event], gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[List[Open], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Event], state: GroupState[List[Open]]) =>
          val prior = state.getOption.getOrElse(Nil)
          val merged = merge(prior, it.map(_.ts.getTime).toSeq.sorted, gapMs)
          // Watermark drives closing. 0 = streaming but not yet advanced
          // (close nothing); absent (batch execution) = close everything.
          val wm = scala.util.Try(state.getCurrentWatermarkMs()).toOption match {
            case Some(w) if w > 0 => w
            case Some(_) => 0L
            case None => Long.MaxValue
          }
          val (closed, open) = merged.partition(_.endMs + gapMs <= wm)
          if (open.nonEmpty) {
            state.update(open)
            // earliest possible close time; always > current watermark
            state.setTimeoutTimestamp(open.map(_.endMs).min + gapMs)
          } else state.remove()
          closed.sortBy(_.startMs).iterator.map(o =>
            Session(key, o.startMs / 1000L, o.endMs / 1000L, o.n))
      }
  }
}
