package graft.core

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism for the operators' explicit repartitions.
  *
  * The CPU-heavy text/similarity operators repartition their input
  * before tokenize/shingle stages so a single-split source still
  * parallelizes. Sizing that width as a CONSTANT (defaultParallelism)
  * is wrong at both ends: on a 100 TB corpus the scan already yields
  * thousands of splits and the constant under-parallelizes the
  * cluster, while on a small corpus it fans tiny inputs out into
  * `cores` near-empty tasks whose launch/codegen overhead dwarfs the
  * work (measured at sf0.1: the same pipeline at width 4 runs ~40%
  * faster than at width 32 on the same 32 cores — guide §2.2's
  * "fewer, larger partitions").
  *
  * [[widthFor]] derives the width from the plan's size estimate
  * instead: ceil(bytes / bytesPerTask), clamped to [1, 2·cores].
  *  - bytes come from Catalyst's optimized-plan stats — exact file
  *    size for a parquet scan, a conservative estimate downstream;
  *  - `bytesPerTask` (conf `spark.graft.repartition.bytesPerTask`,
  *    default 2 MiB of source bytes ≈ 8 MiB of decoded tokens) keeps
  *    each task big enough to amortize launch overhead yet small
  *    enough that a CPU-heavy map stage saturates well before the
  *    cap;
  *  - the 2·cores cap restores today's behavior at scale (a 100 TB
  *    input hits the cap, with the extra 2× for stragglers — the
  *    size-derived part only ever REDUCES the width for small
  *    inputs).
  */
object Par {

  val BytesPerTaskConf = "spark.graft.repartition.bytesPerTask"
  val DefaultBytesPerTask: Long = 2L << 20

  /** Size-derived repartition width for `df`: see the object doc.
    * `factor` scales the size estimate for stages whose downstream
    * CPU work is a known multiple of the input bytes (e.g. a per-row
    * gram explosion that fans each byte out ~100×) — the width then
    * tracks the WORK, not just the bytes read. */
  def widthFor(df: DataFrame, factor: Double = 1.0): Int = {
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    val perTask = spark.conf.getOption(BytesPerTaskConf)
      .map(_.toLong).getOrElse(DefaultBytesPerTask)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val cap = BigInt(math.max(1, 2 * cores))
    val scaled = (BigDecimal(bytes) * factor).toBigInt
    ((scaled + perTask - 1) / perTask).max(1).min(cap).toInt
  }
}
