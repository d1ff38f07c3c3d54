package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `window_funnel(window_sec, ts, cond1, …, condK)` — the funnel as a
  * true AGGREGATE function, matching the shape the reference's engine
  * family exposes to its SQL users (an aggregate over the group's
  * events, not a pre-built per-key table). Default semantics are
  * identical to [[graft.operators.Funnel.windowFunnel]]: the earliest
  * step-1 second anchors, each later step takes the earliest
  * qualifying event strictly after the previous match and within
  * `window_sec` of the anchor; returns the reached level (0 when step
  * 1 never fires). An event satisfying several step predicates counts
  * for each, like the operator's independent per-step filters.
  *
  * `maxOverAnchors = true` (SQL surface: `window_funnel_max`) is the
  * reference-family parity mode: the level is the MAXIMUM over ALL
  * candidate anchors — a key with an early stray step-1 event followed
  * later by a complete in-window chain reports the full level, where
  * the earliest-anchor mode reports 1. Timestamps must STRICTLY
  * increase along a chain (the engine family's `strict_increase`
  * mode) — that is the only deterministic, cross-engine-replayable
  * reading when events share a second. Resolution is the standard
  * one-pass DP over the group's matched events sorted by second:
  * `chain(i)` = the latest anchor second of any chain reaching level
  * i+1; a step-i event at second s extends when
  * `s − chain(i−2) ≤ window` (ordering is implied — chains only ever
  * extend from snapshots of strictly earlier seconds). O(events·K)
  * per group, same packed-long state as the default mode.
  *
  * State is the group's matched (step, second) pairs packed into one
  * long each (step in the top 16 bits, second in the low 48 — valid
  * until year ~8.9 M): partial aggregation combines map-side, merge is
  * buffer concat, and only matched events enter the buffer at all —
  * the same per-group footprint the reference's implementation keeps.
  * The chain is resolved once, in `eval`.
  */
case class WindowFunnel(
    windowSec: Long,
    ts: Expression,
    conds: Seq[Expression],
    maxOverAnchors: Boolean = false,
    strictDedup: Boolean = false,
    strictOrder: Boolean = false,
    markerCap: Int = WindowFunnel.DefaultMarkerCap,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  require(conds.nonEmpty, "window_funnel needs at least one step predicate")
  require(conds.size <= 0xfffe, "window_funnel: too many steps")
  require(markerCap >= 1, "window_funnel: markerCap must be >= 1")

  /** strict_order is the one mode whose per-group state is bounded by
    * EVENTS-per-key, not matches-per-key (every non-funnel event must
    * be buffered as a step-0 marker to interrupt chains — the honest
    * cost of the mode). A pathological hot entity therefore has no
    * natural cap; past `markerCap` buffered entries the aggregate
    * FAILS LOUDLY (deterministic error naming the cap) rather than
    * silently eating executor memory or — worse — silently dropping
    * markers, which could only inflate levels (a dropped marker is an
    * uninterrupted chain). Callers with a genuine >cap entity should
    * raise the cap explicitly or pre-filter/split the key. Enforced
    * in both update and merge, so partial aggregation cannot
    * assemble an over-cap buffer from under-cap partials. */
  private def failMarkerCap(size: Int): Nothing =
    throw new IllegalStateException(
      s"$prettyName: a single group buffered $size events, over " +
        s"markerCap=$markerCap (strict_order must see every event of " +
        "the group). Raise markerCap or pre-filter the hot key.")

  override def children: Seq[Expression] = ts +: conds
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String =
    if (maxOverAnchors && (strictDedup || strictOrder))
      "window_funnel_strict_max"
    else if (maxOverAnchors) "window_funnel_max"
    else if (strictDedup || strictOrder) "window_funnel_strict"
    else "window_funnel"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (ts.dataType != TimestampType)
      TypeCheckFailure(s"$prettyName: ts must be TIMESTAMP, got ${ts.dataType}")
    else conds.find(_.dataType != BooleanType) match {
      case Some(c) => TypeCheckFailure(
        s"$prettyName: step predicates must be BOOLEAN, got ${c.dataType}")
      case None => TypeCheckSuccess
    }
  }

  private val SecMask = (1L << 48) - 1

  /** Repack the buffer's (step<<48)|sec entries as (sec<<16)|step and
    * sort — every eval mode walks events in (second, step) order.
    * ONE definition: the three eval modes must never disagree on the
    * packing. */
  private def sortedBySec(buf: ArrayBuffer[Long]): Array[Long] = {
    val arr = new Array[Long](buf.length)
    var i = 0
    while (i < arr.length) {
      val e = buf(i)
      arr(i) = ((e & SecMask) << 16) | (e >>> 48)
      i += 1
    }
    java.util.Arrays.sort(arr)
    arr
  }

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  override def update(buf: ArrayBuffer[Long], input: InternalRow)
      : ArrayBuffer[Long] = {
    val t = ts.eval(input)
    // pre-1970 timestamps are rejected, not packed: a negative second
    // would wrap through `& SecMask` into a huge positive 48-bit value
    // and silently corrupt ordering/levels (the mask's upper bound
    // ~year 8.9M is documented above; this is the lower bound)
    if (t != null && t.asInstanceOf[Long] >= 0L) {
      val sec = t.asInstanceOf[Long] / 1000000L // TimestampType micros
      var i = 0
      var matched = false
      while (i < conds.length) {
        val c = conds(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean]) {
          buf += (((i + 1).toLong << 48) | (sec & SecMask))
          matched = true
        }
        i += 1
      }
      // strict_order needs to SEE non-funnel events — they interrupt a
      // started chain — so they enter the buffer as step-0 markers.
      // Only in that mode: the other modes never read them, and the
      // whole point of the packed buffer is that unmatched events
      // (the vast majority at 100 TB) cost nothing.
      if (strictOrder && !matched) buf += (sec & SecMask)
      if (strictOrder && buf.length > markerCap) failMarkerCap(buf.length)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long])
      : ArrayBuffer[Long] = {
    if (strictOrder && b1.length + b2.length > markerCap)
      failMarkerCap(b1.length + b2.length)
    b1 ++= b2; b1
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    if (maxOverAnchors && (strictDedup || strictOrder)) evalStrictMax(buf)
    else if (maxOverAnchors) evalMaxOverAnchors(buf)
    else if (strictDedup || strictOrder) evalStrict(buf)
    else evalEarliestAnchor(buf)

  /** The engine family's `strict_dedup` / `strict_order` modes over
    * the deterministic earliest-anchor chain. One forward walk over
    * the group's events sorted by (second, step):
    *
    *  - the chain anchors at the EARLIEST step-1 event; each later
    *    step must arrive strictly after the previous match (the
    *    family's `strict_increase` — the only reading that replays
    *    bit-identically across engines) and within `windowSec` of
    *    the anchor;
    *  - `strict_dedup`: once the chain has started, an event matching
    *    an ALREADY-SATISFIED condition (step ≤ current level)
    *    interrupts the search — the level at interruption is final;
    *  - `strict_order`: any event that does NOT extend the chain —
    *    a non-funnel event (step 0), an out-of-order step, or an
    *    in-order step outside the window — interrupts it (the
    *    family's A→B→D→C example stops at D with level 2).
    *
    * Both modes end the walk the moment the chain completes, so a
    * post-completion repeat never demotes a full funnel. */
  private def evalStrict(buf: ArrayBuffer[Long]): Int = {
    if (buf.isEmpty) return 0
    val arr = sortedBySec(buf)
    val n = arr.length
    var i = 0
    val k = conds.length
    var level = 0
    var anchor = 0L
    var prev = 0L
    i = 0
    while (i < n) {
      val sec = arr(i) >>> 16
      val step = (arr(i) & 0xffffL).toInt
      if (level == 0) {
        // events before the first step-1 match are ignored in every
        // mode — the chain has not started, nothing to interrupt
        if (step == 1) { level = 1; anchor = sec; prev = sec }
      } else if (level >= k) {
        i = n // complete — stop scanning
      } else if (strictDedup && step >= 1 && step <= level) {
        return level
      } else if (step == level + 1 && sec > prev &&
        sec <= anchor + windowSec) {
        level += 1; prev = sec
      } else if (strictOrder) {
        return level
      }
      i += 1
    }
    level
  }

  /** `strict_dedup`/`strict_order` COMBINED with max-over-anchors —
    * the engine family applies its strict flags inside the maximizing
    * scan, so `window_funnel_max` with a strict mode must too. The
    * semantics are the compositional reading: the reported level is
    * the MAXIMUM over every candidate anchor (each step-1 event) of
    * the strict chain walked forward from that anchor — identical
    * per-chain rules to [[evalStrict]] (strict increase; dedup: a
    * repeat of an already-satisfied step ends the chain; order: ANY
    * non-extending event ends it), but an interruption only ends THAT
    * anchor's chain, never the whole search.
    *
    * Cost: the sort dominates. In order mode a walk ends at the first
    * non-extending event (≤ K extensions per anchor → O(n·K) walk
    * total); in dedup mode a walk ends at the NEXT step-1 event at the
    * latest (step 1 ≤ level always), so each event is visited by at
    * most two walks → O(n). Same packed state as every other mode. */
  private def evalStrictMax(buf: ArrayBuffer[Long]): Int = {
    if (buf.isEmpty) return 0
    val arr = sortedBySec(buf)
    val n = arr.length
    var i = 0
    val k = conds.length
    var best = 0
    i = 0
    while (i < n && best < k) {
      if ((arr(i) & 0xffffL) == 1L) {
        val anchor = arr(i) >>> 16
        var level = 1
        var prev = anchor
        var j = i + 1
        var go = true
        while (go && j < n && level < k) {
          val sec = arr(j) >>> 16
          val step = (arr(j) & 0xffffL).toInt
          if (strictDedup && step >= 1 && step <= level) go = false
          else if (step == level + 1 && sec > prev &&
            sec <= anchor + windowSec) {
            level += 1; prev = sec
          } else if (strictOrder) go = false
          j += 1
        }
        if (level > best) best = level
      }
      i += 1
    }
    best
  }

  /** Reference-parity DP: max level over every candidate anchor,
    * strictly increasing timestamps. Events are re-packed to sort by
    * (second, step); same-second events update against a SNAPSHOT of
    * the chain state, so a chain can never advance twice within one
    * second — that is exactly strict increase. */
  private def evalMaxOverAnchors(buf: ArrayBuffer[Long]): Int = {
    if (buf.isEmpty) return 0
    val arr = sortedBySec(buf)
    val n = arr.length
    var i = 0
    val k = conds.length
    val chain = Array.fill(k)(Long.MinValue) // latest anchor reaching lvl i+1
    val upd = new Array[Long](k)
    i = 0
    while (i < n) {
      val sec = arr(i) >>> 16
      var j = i
      var u = 0
      while (u < k) { upd(u) = Long.MinValue; u += 1 }
      while (j < n && (arr(j) >>> 16) == sec) {
        val step = (arr(j) & 0xffffL).toInt
        if (step == 1) {
          if (sec > upd(0)) upd(0) = sec
        } else {
          val anchor = chain(step - 2)
          if (anchor != Long.MinValue && sec - anchor <= windowSec &&
            anchor > upd(step - 1)) upd(step - 1) = anchor
        }
        j += 1
      }
      u = 0
      while (u < k) {
        if (upd(u) > chain(u)) chain(u) = upd(u)
        u += 1
      }
      i = j
    }
    var level = 0
    i = 0
    while (i < k) { if (chain(i) != Long.MinValue) level = i + 1; i += 1 }
    level
  }

  private def evalEarliestAnchor(buf: ArrayBuffer[Long]): Int = {
    var t1 = Long.MaxValue
    var j = 0
    while (j < buf.length) {
      val e = buf(j)
      if ((e >>> 48) == 1L && (e & SecMask) < t1) t1 = e & SecMask
      j += 1
    }
    if (t1 == Long.MaxValue) return 0
    val hi = t1 + windowSec
    var level = 1
    var prev = t1
    var stalled = false
    var step = 2
    while (step <= conds.length && !stalled) {
      var best = Long.MaxValue
      var k = 0
      while (k < buf.length) {
        val e = buf(k)
        val sec = e & SecMask
        if ((e >>> 48) == step.toLong && sec > prev && sec <= hi &&
          sec < best) best = sec
        k += 1
      }
      if (best == Long.MaxValue) stalled = true
      else { level += 1; prev = best }
      step += 1
    }
    level
  }

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new ArrayBuffer[Long](bytes.length / 8)
    while (bb.remaining() >= 8) out += bb.getLong
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WindowFunnel =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WindowFunnel =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WindowFunnel =
    copy(ts = newChildren.head, conds = newChildren.tail)
}

object WindowFunnel {
  /** Default strict_order per-group buffer cap: 4M packed longs
    * (~32 MB of markers for one key) — far above any sane
    * events-per-entity density, small enough that a runaway hot key
    * fails an executor's task loudly long before it OOMs it. */
  val DefaultMarkerCap: Int = 4000000
}
