package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `retention(cond1, …, condK)` — the cohort-retention aggregate in
  * the reference engine family's native shape: returns an int array
  * where r(1) = "cond1 ever held in the group" and r(i) = "cond1 AND
  * cond_i both ever held". Same algebra as
  * [[graft.operators.Funnel.retention]], but as a SQL aggregate whose
  * whole state is ONE long bitmask — the cheapest distributed
  * aggregate there is: map-side partials OR together. */
case class Retention(
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(conds.nonEmpty && conds.size <= 63,
    "retention supports 1..63 conditions")

  override def children: Seq[Expression] = conds
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "retention"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    conds.find(_.dataType != BooleanType) match {
      case Some(c) => TypeCheckFailure(
        s"$prettyName: conditions must be BOOLEAN, got ${c.dataType}")
      case None => TypeCheckSuccess
    }
  }

  // single-cell array: a mutable box for the bitmask
  override def createAggregationBuffer(): Array[Long] = Array(0L)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    var i = 0
    while (i < conds.length) {
      val c = conds(i).eval(input)
      if (c != null && c.asInstanceOf[Boolean]) buf(0) |= (1L << i)
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    b1(0) |= b2(0); b1
  }

  override def eval(buf: Array[Long]): Any = {
    val m = buf(0)
    val first = (m & 1L) != 0L
    val out = new Array[Int](conds.length)
    var i = 0
    while (i < conds.length) {
      out(i) = if (i == 0) (if (first) 1 else 0)
        else if (first && (m & (1L << i)) != 0L) 1 else 0
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] =
    java.nio.ByteBuffer.allocate(8).putLong(buf(0)).array()
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Array(java.nio.ByteBuffer.wrap(bytes).getLong)

  override def withNewMutableAggBufferOffset(n: Int): Retention =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): Retention =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Retention = copy(conds = c)
}

/** `sequence_match(max_gap_sec, ts, cond1, cond2)` — existential
  * ordered-pair aggregate: did ANY cond1 event precede ANY cond2 event
  * with gap in (0, max_gap_sec]? (The windowed OPERATOR twin,
  * [[graft.operators.Funnel.sequenceMatch]], answers the latest-
  * predecessor variant with per-event match counts; the aggregate is
  * the existential form, the one a `HAVING sequence_match(...)` filter
  * wants.) State buffers only matching events' seconds, partials
  * concat; eval sorts each side once and walks a two-pointer scan —
  * O(n log n) in the group's MATCHED events only. */
case class SequenceMatch(
    maxGapSec: Long,
    ts: Expression,
    cond1: Expression,
    cond2: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  override def children: Seq[Expression] = Seq(ts, cond1, cond2)
  override def nullable: Boolean = false
  override def dataType: DataType = BooleanType
  override def prettyName: String = "sequence_match"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (ts.dataType != TimestampType)
      TypeCheckFailure(s"$prettyName: ts must be TIMESTAMP, got ${ts.dataType}")
    else if (cond1.dataType != BooleanType || cond2.dataType != BooleanType)
      TypeCheckFailure(s"$prettyName: conditions must be BOOLEAN")
    else TypeCheckSuccess
  }

  private val SecMask = (1L << 48) - 1

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  override def update(buf: ArrayBuffer[Long], input: InternalRow)
      : ArrayBuffer[Long] = {
    val t = ts.eval(input)
    // pre-1970 timestamps are rejected, not packed: a negative second
    // would wrap through `& SecMask` into a huge positive 48-bit value
    // and silently corrupt ordering (upper bound ~year 8.9M documented
    // on the mask)
    if (t != null && t.asInstanceOf[Long] >= 0L) {
      val sec = (t.asInstanceOf[Long] / 1000000L) & SecMask
      val c1 = cond1.eval(input)
      if (c1 != null && c1.asInstanceOf[Boolean]) buf += (1L << 48) | sec
      val c2 = cond2.eval(input)
      if (c2 != null && c2.asInstanceOf[Boolean]) buf += (2L << 48) | sec
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long])
      : ArrayBuffer[Long] = { b1 ++= b2; b1 }

  override def eval(buf: ArrayBuffer[Long]): Any = {
    val firsts = buf.collect { case e if (e >>> 48) == 1L => e & SecMask }
      .sorted
    val seconds = buf.collect { case e if (e >>> 48) == 2L => e & SecMask }
      .sorted
    // two-pointer: for each second-side sec ascending, advance the
    // first-side pointer to the latest first < sec; any first in
    // [sec - maxGap, sec - 1] completes the pattern
    var i = 0
    var best = Long.MinValue // largest first strictly below current sec
    var j = 0
    while (j < seconds.length) {
      val sec = seconds(j)
      while (i < firsts.length && firsts(i) < sec) {
        best = firsts(i); i += 1
      }
      if (best != Long.MinValue && sec - best <= maxGapSec) return true
      j += 1
    }
    false
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

  override def withNewMutableAggBufferOffset(n: Int): SequenceMatch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SequenceMatch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SequenceMatch =
    copy(ts = c(0), cond1 = c(1), cond2 = c(2))
}

/** `sequence_count([max_gap_sec,] ts, cond1, cond2)` — the counting
  * member of the family (`sequenceCount` in the reference engine):
  * how many NON-OVERLAPPING cond1→cond2 pairs does the group contain,
  * each cond2 strictly after its cond1 (same-second pairs never
  * match — the engine's strict_increase stance) and, when
  * `maxGapSec > 0`, within that many seconds of it.
  *
  * Matching is greedy in time order, each cond2 consuming the
  * EARLIEST still-valid cond1 — earliest-deadline-first, which the
  * standard exchange argument makes a MAXIMUM matching, so the count
  * is well-defined (not an artifact of scan order). The unlimited-gap
  * count has a closed window-algebra form
  * (`total₂ − max(0, maxₜ(C₂(t) − C₁(t⁻)))`) — that is the h20
  * oracle; the gapped variant is property-tested against brute-force
  * maximum matching.
  *
  * State buffers only matched events' seconds (one packed long each);
  * eval is one sort + one linear queue scan. */
case class SequenceCount(
    maxGapSec: Long,
    ts: Expression,
    cond1: Expression,
    cond2: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  override def children: Seq[Expression] = Seq(ts, cond1, cond2)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "sequence_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (ts.dataType != TimestampType)
      TypeCheckFailure(s"$prettyName: ts must be TIMESTAMP, got ${ts.dataType}")
    else if (cond1.dataType != BooleanType || cond2.dataType != BooleanType)
      TypeCheckFailure(s"$prettyName: conditions must be BOOLEAN")
    else TypeCheckSuccess
  }

  private val SecMask = (1L << 48) - 1

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  override def update(buf: ArrayBuffer[Long], input: InternalRow)
      : ArrayBuffer[Long] = {
    val t = ts.eval(input)
    // pre-1970 timestamps are rejected, not packed: a negative second
    // would wrap through `& SecMask` into a huge positive 48-bit value
    // and silently corrupt ordering (upper bound ~year 8.9M documented
    // on the mask)
    if (t != null && t.asInstanceOf[Long] >= 0L) {
      val sec = (t.asInstanceOf[Long] / 1000000L) & SecMask
      val c1 = cond1.eval(input)
      if (c1 != null && c1.asInstanceOf[Boolean]) buf += (1L << 48) | sec
      val c2 = cond2.eval(input)
      if (c2 != null && c2.asInstanceOf[Boolean]) buf += (2L << 48) | sec
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long])
      : ArrayBuffer[Long] = { b1 ++= b2; b1 }

  override def eval(buf: ArrayBuffer[Long]): Any = {
    // sort by (sec, kind) with cond2 ordered BEFORE cond1 within a
    // second: every cond2 is processed against the queue before that
    // second's cond1s enter it — "strictly after" for free. (kind
    // sits above the sec bits in the packed long, so repack first;
    // 3 − kind maps cond2 → 1, cond1 → 2.)
    val n = buf.length
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) {
      val e = buf(i)
      arr(i) = ((e & SecMask) << 2) | (3L - (e >>> 48))
      i += 1
    }
    java.util.Arrays.sort(arr)
    // FIFO queue of available cond1 seconds; earliest first = the
    // earliest deadline when a gap applies
    val q = new java.util.ArrayDeque[Long]()
    var matches = 0L
    i = 0
    while (i < n) {
      val sec = arr(i) >>> 2
      val isC2 = (arr(i) & 3L) == 1L
      if (isC2) {
        if (maxGapSec > 0)
          while (!q.isEmpty && q.peekFirst() + maxGapSec < sec) q.pollFirst()
        if (!q.isEmpty) { q.pollFirst(); matches += 1 }
      } else q.addLast(sec)
      i += 1
    }
    matches
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

  override def withNewMutableAggBufferOffset(n: Int): SequenceCount =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SequenceCount =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SequenceCount =
    copy(ts = c(0), cond1 = c(1), cond2 = c(2))
}

/** `bottom_k(k, key, value)` — the k values with the SMALLEST keys,
  * exactly (ties broken by value, so the result is deterministic and
  * replayable in any engine). With `key = portable_hash(id)` this is
  * min-wise (bottom-k) sampling: a uniform without-replacement sample
  * of k ids whose membership any engine can recompute — the
  * deterministic counterpart of the reference family's
  * `groupArraySample` (which draws from an RNG and is NOT
  * replayable), and the exact-sample twin of the engine's
  * hash-fraction samplers ([[graft.operators.Curation.hashSample]]
  * keeps a fixed FRACTION; this keeps a fixed COUNT per group).
  *
  * State is bounded at 2k pairs: updates append, and the buffer
  * compacts (sort, keep k) whenever it doubles — amortized O(1) per
  * row, O(k log k) per compaction, and partial states cross the
  * shuffle already compacted to k. Merge is concat + compact. At
  * 100 TB the aggregate is the whole story: a billion-row group
  * still ships only k pairs per mapper.
  */
case class BottomK(
    k: Int,
    key: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  require(k >= 1 && k <= 1000000, s"bottom_k: k must be in [1, 1e6], got $k")

  override def children: Seq[Expression] = Seq(key, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (key.dataType != LongType)
      TypeCheckFailure(s"$prettyName: key must be BIGINT, got ${key.dataType}")
    else if (value.dataType != LongType)
      TypeCheckFailure(s"$prettyName: value must be BIGINT, got ${value.dataType}")
    else TypeCheckSuccess
  }

  // pairs stored flat: (key at 2i, value at 2i+1)
  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  private def compact(buf: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    val n = buf.length / 2
    if (n <= k) return buf
    val keys = new Array[Long](n)
    val vals = new Array[Long](n)
    var i = 0
    while (i < n) { keys(i) = buf(2 * i); vals(i) = buf(2 * i + 1); i += 1 }
    val sorted = Array.range(0, n).sortBy(j => (keys(j), vals(j)))
    buf.clear()
    i = 0
    while (i < k) {
      buf += keys(sorted(i)); buf += vals(sorted(i)); i += 1
    }
    buf
  }

  override def update(buf: ArrayBuffer[Long], input: InternalRow)
      : ArrayBuffer[Long] = {
    val kv = key.eval(input)
    val vv = value.eval(input)
    if (kv != null && vv != null) {
      buf += kv.asInstanceOf[Long]
      buf += vv.asInstanceOf[Long]
      if (buf.length >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long])
      : ArrayBuffer[Long] = { b1 ++= b2; compact(b1) }

  override def eval(buf: ArrayBuffer[Long]): Any = {
    compact(buf)
    val n = buf.length / 2
    val idx = Array.range(0, n).sortBy(j => (buf(2 * j), buf(2 * j + 1)))
    new GenericArrayData(idx.map(j => buf(2 * j + 1)))
  }

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    compact(buf)
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

  override def withNewMutableAggBufferOffset(n: Int): BottomK =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BottomK =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BottomK =
    copy(key = c(0), value = c(1))
}

/** `sequence_chain('g1,g2,…', ts, cond1, …, condK)` — the family's
  * multi-step `sequenceMatch('(?1)(?t<=g1)(?2)(?t<=g2)(?3)…')`
  * pattern: the deepest level L such that a chain e1 < e2 < … < eL
  * EXISTS with each gap bounded by its own limit
  * (0 < t_{i+1} − t_i ≤ g_i). Unlike the funnel there is no anchor
  * window — each gap is constrained independently.
  *
  * Exact existence DP (greedy is wrong here: an early step-2 match
  * can strand a later step-3, while a later step-2 completes): one
  * pass over the group's matched events sorted by (second, step),
  * keeping per level the ASCENDING list of seconds at which the
  * level was achieved; an event at second s reaches level i+1 iff a
  * level-i time lies in [s − g_i, s). The lists build in sorted order
  * so the range probe is one binary search — O(n·(log n + K)) per
  * group, and the oracle replays the same semantics as EXISTS-chain
  * joins. Same packed-long buffer discipline as the funnel: only
  * matched events cross the shuffle. */
case class SequenceChain(
    gaps: Seq[Long],
    ts: Expression,
    conds: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]] {

  require(conds.size >= 2, "sequence_chain needs at least two steps")
  require(gaps.size == conds.size - 1,
    s"sequence_chain: ${conds.size} steps need ${conds.size - 1} gaps, " +
      s"got ${gaps.size}")
  require(gaps.forall(_ > 0), "sequence_chain: gaps must be positive seconds")

  override def children: Seq[Expression] = ts +: conds
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sequence_chain"

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

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  override def update(buf: ArrayBuffer[Long], input: InternalRow)
      : ArrayBuffer[Long] = {
    val t = ts.eval(input)
    // pre-1970 timestamps are rejected, not packed: a negative second
    // would wrap through `& SecMask` into a huge positive 48-bit value
    // and silently corrupt the DP's ordering
    if (t != null && t.asInstanceOf[Long] >= 0L) {
      val sec = t.asInstanceOf[Long] / 1000000L
      var i = 0
      while (i < conds.length) {
        val c = conds(i).eval(input)
        if (c != null && c.asInstanceOf[Boolean])
          buf += (((i + 1).toLong << 48) | (sec & SecMask))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: ArrayBuffer[Long], b2: ArrayBuffer[Long])
      : ArrayBuffer[Long] = { b1 ++= b2; b1 }

  override def eval(buf: ArrayBuffer[Long]): Any = {
    if (buf.isEmpty) return 0
    val n = buf.length
    val arr = new Array[Long](n)
    var i = 0
    while (i < n) { // (step<<48)|sec → (sec<<16)|step: sorts by second
      val e = buf(i)
      arr(i) = ((e & SecMask) << 16) | (e >>> 48)
      i += 1
    }
    java.util.Arrays.sort(arr)
    val k = conds.length
    val achieved = Array.fill(k)(new ArrayBuffer[Long]())
    i = 0
    while (i < n) {
      val sec = arr(i) >>> 16
      val step = (arr(i) & 0xffffL).toInt
      if (step == 1) {
        achieved(0) += sec
      } else {
        // any level-(step-1) time in [sec - g, sec)? binary search the
        // ascending achieved list for the first element >= sec - g
        val prev = achieved(step - 2)
        if (prev.nonEmpty) {
          val loBound = sec - gaps(step - 2)
          var lo = 0
          var hi = prev.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (prev(mid) < loBound) lo = mid + 1 else hi = mid
          }
          if (lo < prev.length && prev(lo) < sec &&
            (achieved(step - 1).isEmpty || achieved(step - 1).last != sec))
            achieved(step - 1) += sec
        }
      }
      i += 1
    }
    var level = 0
    i = 0
    while (i < k) { if (achieved(i).nonEmpty) level = i + 1; i += 1 }
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

  override def withNewMutableAggBufferOffset(n: Int): SequenceChain =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): SequenceChain =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SequenceChain =
    copy(ts = c.head, conds = c.tail)
}
