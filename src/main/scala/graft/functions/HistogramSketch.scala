package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Column-level readers over [[HistogramSketch]] states. */
object HistogramOps {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Quantile num/den from a histogram state (the role the engine
    * family's `quantileTDigest` plays, read from stored sketch
    * states): the smallest centroid whose cumulative count reaches
    * ⌈q·W⌉ — the same integer-threshold semantics as
    * [[graft.operators.Stats.weightedQuantile]], so in the sketch's
    * EXACT regime (distinct ≤ nbins) the answer IS the exact
    * weighted quantile and replays in SQL (oracled, d24). In the
    * compressed regime it reads the same rule over merged centroids
    * (the paper's uniform/quantile procedure, nearest-centroid
    * flavor). Pure array algebra over the state — no second
    * aggregation pass. */
  def histQuantile(h: Column, num: Int, den: Int): Column = {
    require(num >= 0 && den > 0 && num <= den,
      s"hist_quantile: $num/$den is not in [0,1]")
    val total = aggregate(h, lit(0L), (acc, x) => acc + x("cnt"))
    // cum ≥ ceil(q·W) collapses to cum·den ≥ W·num over exact longs
    // — no division anywhere. Scan once with a (cum, answer) struct
    // accumulator; the first bin reaching the threshold wins.
    aggregate(h,
      struct(lit(0L).as("cum"), lit(null).cast("double").as("ans")),
      (acc, x) => struct(
        (acc("cum") + x("cnt")).as("cum"),
        coalesce(acc("ans"),
          when((acc("cum") + x("cnt")) * den >= total * num,
            x("centroid")))
          .as("ans")),
      acc => acc("ans"))
  }
}

/** Mutable streaming-histogram state: parallel arrays of bin
  * centroids (ascending) and counts, at most `nbins` live entries.
  * Kept as flat primitive arrays so update is allocation-free on the
  * hot path. */
final class HistBuf(
    var size: Int,
    var centroids: Array[Double],
    var counts: Array[Long])

/** The insert-then-compress step shared by [[HistogramSketch]]
  * (raw values) and [[HistMerge]] (stored states). */
private[functions] object HistAlg {

  def newBuf(nbins: Int): HistBuf =
    new HistBuf(0, new Array[Double](nbins + 1), new Array[Long](nbins + 1))

  /** Binary search for v among the first `size` centroids; returns
    * the insertion point (index of first centroid ≥ v). */
  private def lowerBound(buf: HistBuf, v: Double): Int = {
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf.centroids(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Insert (v, w) keeping centroid order; fold on exact centroid
    * match; compress the closest pair when the buffer overflows. */
  def add(buf: HistBuf, nbins: Int, v: Double, w: Long): Unit = {
    val i = lowerBound(buf, v)
    if (i < buf.size && buf.centroids(i) == v) {
      buf.counts(i) += w
      return
    }
    System.arraycopy(buf.centroids, i, buf.centroids, i + 1, buf.size - i)
    System.arraycopy(buf.counts, i, buf.counts, i + 1, buf.size - i)
    buf.centroids(i) = v
    buf.counts(i) = w
    buf.size += 1
    if (buf.size > nbins) compressOnce(buf)
  }

  /** Merge the adjacent pair with the smallest centroid gap
    * (leftmost on ties) into its weighted mean. */
  private def compressOnce(buf: HistBuf): Unit = {
    var best = 0
    var bestGap = Double.MaxValue
    var i = 0
    while (i < buf.size - 1) {
      val gap = buf.centroids(i + 1) - buf.centroids(i)
      if (gap < bestGap) { bestGap = gap; best = i }
      i += 1
    }
    val c1 = buf.counts(best)
    val c2 = buf.counts(best + 1)
    val tot = c1 + c2
    buf.centroids(best) =
      (buf.centroids(best) * c1 + buf.centroids(best + 1) * c2) / tot
    buf.counts(best) = tot
    System.arraycopy(buf.centroids, best + 2, buf.centroids, best + 1,
      buf.size - best - 2)
    System.arraycopy(buf.counts, best + 2, buf.counts, best + 1,
      buf.size - best - 2)
    buf.size -= 1
  }

  def evalRows(buf: HistBuf): GenericArrayData = {
    val rows = new Array[Any](buf.size)
    var i = 0
    while (i < buf.size) {
      rows(i) = InternalRow(buf.centroids(i), buf.counts(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  def serialize(buf: HistBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.centroids(i)); bb.putLong(buf.counts(i))
      i += 1
    }
    bb.array()
  }

  def deserialize(nbins: Int, bytes: Array[Byte]): HistBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = newBuf(nbins)
    var i = 0
    while (i < n) {
      // stored sketches are sorted and ≤ nbins: append directly
      buf.centroids(i) = bb.getDouble
      buf.counts(i) = bb.getLong
      i += 1
    }
    buf.size = n
    buf
  }

  val stateType: DataType = ArrayType(StructType(Seq(
    StructField("centroid", DoubleType), StructField("cnt", LongType))))
}

/** `hist_sketch(nbins, x)` — the streaming mergeable histogram of
  * Ben-Haim & Yom-Tov (JMLR 2010, "A Streaming Parallel Decision
  * Tree Algorithm"), the algorithm behind the engine family's
  * `histogram(bins)(x)` adaptive aggregate (reference stack's
  * ClickHouse exposes it for dashboard distribution panels over the
  * events schema, `clickhouse/init/01_schema.sql.tmpl`).
  *
  * State is ≤ nbins (centroid, count) pairs regardless of input
  * size — the sketch IS the operator at 100 TB, where an exact
  * value-grain GROUP BY on a continuous measure is unbounded:
  *
  *  - update: insert (x, 1) in centroid order; if the value equals an
  *    existing centroid, fold into its count; when a (nbins+1)-th bin
  *    appears, merge the two centroids with the smallest gap into
  *    their weighted mean (leftmost such pair on gap ties —
  *    deterministic);
  *  - merge: fold the other sketch's bins in centroid order through
  *    the same insert-then-compress step (equal centroids fold
  *    directly). Any merge tree yields a valid sketch (the paper's
  *    parallel construction).
  *
  * EXACT regime: while a group never exceeds nbins distinct values,
  * no compression ever fires, centroids are the raw values and
  * counts are exact occurrence counts — in that regime the output is
  * the value-grain GROUP BY, deterministic under any partitioning,
  * which is what the oracled suite query pins (d22). The compressed
  * regime's invariants (Σcount preserved; bins ≤ nbins; centroids
  * sorted, inside [min, max]) are spec-pinned instead — bin
  * placement there legitimately depends on arrival order, exactly as
  * in the reference engine.
  *
  * Returns array<struct<centroid double, cnt bigint>> in ascending
  * centroid order. Input must be numeric (normalized to double —
  * same convention as the family's Float64 histogram).
  */
case class HistogramSketch(
    nbins: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistBuf] {

  require(nbins >= 2 && nbins <= 4096,
    s"hist_sketch: nbins must be in [2, 4096], got $nbins")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("centroid", DoubleType), StructField("cnt", LongType))))
  override def prettyName: String = "hist_sketch"

  private def isNumeric = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType => true
    case _: DecimalType => false // no lossless double for wide decimals
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumeric) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hist_sketch: expr must be a non-decimal numeric, got ${child.dataType}")

  override def createAggregationBuffer(): HistBuf = HistAlg.newBuf(nbins)

  private def add(buf: HistBuf, v: Double, w: Long): Unit =
    HistAlg.add(buf, nbins, v, w)

  override def update(buf: HistBuf, input: InternalRow): HistBuf = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case b: Byte => b.toDouble
        case s: Short => s.toDouble
        case i: Int => i.toDouble
        case l: Long => l.toDouble
        case f: Float => f.toDouble
        case d: Double => d
      }
      if (!d.isNaN) add(buf, d, 1L)
    }
    buf
  }

  override def merge(b1: HistBuf, b2: HistBuf): HistBuf = {
    var i = 0
    while (i < b2.size) {
      add(b1, b2.centroids(i), b2.counts(i))
      i += 1
    }
    b1
  }

  override def eval(buf: HistBuf): Any = HistAlg.evalRows(buf)

  override def serialize(buf: HistBuf): Array[Byte] = HistAlg.serialize(buf)

  override def deserialize(bytes: Array[Byte]): HistBuf =
    HistAlg.deserialize(nbins, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistogramSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistogramSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistogramSketch =
    copy(child = newChildren.head)
}

/** `hist_merge(nbins, state)` — fold STORED histogram states (the
  * array<struct<centroid, cnt>> [[HistogramSketch]] emits) into one
  * histogram: the read-side merge of the AggregatingMergeTree
  * histogram-state flow ([[graft.streaming.HistStream]] lands one
  * state per key per micro-batch; this is what readers fold them
  * with). Exactly [[HistogramSketch]]'s merge, applied to persisted
  * states instead of sibling buffers — the same insert-then-compress
  * step, so the combined sketch carries the same guarantees. NOTE:
  * unlike HLL merge this is ADDITIVE, not idempotent — a duplicated
  * state row double-counts; replay safety comes from the
  * batch-partitioned dynamic-overwrite sink discipline. */
case class HistMerge(
    nbins: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HistBuf] {

  require(nbins >= 2 && nbins <= 4096,
    s"hist_merge: nbins must be in [2, 4096], got $nbins")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = HistAlg.stateType
  override def prettyName: String = "hist_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == DoubleType &&
          s(1).dataType == LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hist_merge: state must be array<struct<double, bigint>>, got $other")
  }

  override def createAggregationBuffer(): HistBuf = HistAlg.newBuf(nbins)

  override def update(buf: HistBuf, input: InternalRow): HistBuf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.getStruct(i, 2)
        HistAlg.add(buf, nbins, row.getDouble(0), row.getLong(1))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: HistBuf, b2: HistBuf): HistBuf = {
    var i = 0
    while (i < b2.size) {
      HistAlg.add(b1, nbins, b2.centroids(i), b2.counts(i))
      i += 1
    }
    b1
  }

  override def eval(buf: HistBuf): Any = HistAlg.evalRows(buf)
  override def serialize(buf: HistBuf): Array[Byte] = HistAlg.serialize(buf)
  override def deserialize(bytes: Array[Byte]): HistBuf =
    HistAlg.deserialize(nbins, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HistMerge =
    copy(child = newChildren.head)
}
