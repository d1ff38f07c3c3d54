package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-column collapsing — the engine family's CollapsingMergeTree /
  * VersionedCollapsingMergeTree semantics (the reference's storage
  * engine declares the pattern for mutable-state-over-append-only
  * tables; its cousin tables in the repo use Replacing/Summing —
  * see /root/reference/clickhouse/init/01_bronze_tables.sql for the
  * MergeTree family in use). Applications record state changes as
  * (+1 state, −1 cancel) row pairs; reads collapse the ledger back to
  * the net current state. This file is the read-side collapse, the
  * exact counterpart of [[Replacing.latestPerKey]] for ledgers that
  * must also support DELETES and out-of-order arrival:
  *
  *  - [[finalState]] — plain Collapsing: the latest row per key in
  *    explicit (orderCols) order wins, and the key survives only if
  *    that row is a state (+1) row. A trailing cancel deletes the key.
  *  - [[versionedFinal]] — VersionedCollapsing: (+1, −1) pairs cancel
  *    by (key, version) regardless of arrival order (the reason the
  *    versioned variant exists: replication/retries deliver the
  *    cancel before its state); the surviving state with the highest
  *    version wins.
  *  - [[collapsedSum]] — the family's canonical aggregate pattern
  *    `sum(x · sign) … HAVING sum(sign) > 0`, exact over longs.
  *
  * Scale shape: each is ONE map-side-combined hash aggregation keyed
  * on the collapse key (plus version for the pair-cancel stage) — no
  * windows, no self-joins, nothing driver-side; a 100 TB ledger
  * collapses at aggregation speed and the output is key-cardinality.
  * Determinism: every argmax is a max over a struct whose leading
  * fields are the explicit order (then sign, then payload), so ties
  * resolve identically in any engine — a (cancel, re-state) pair
  * written at the same instant resolves to the new state (+1 sorts
  * above −1 at equal order keys).
  */
object Collapsing {

  private def checkSign(df: DataFrame, signCol: String): Column =
    when(col(signCol) === 1 || col(signCol) === -1, col(signCol))
      .otherwise(raise_error(concat(
        lit(s"collapsing: $signCol must be +1 or -1, got "),
        col(signCol).cast("string"))))

  /** CollapsingMergeTree FINAL: one row per surviving key — the row
    * with the highest (orderCols…) whose sign is +1; keys whose
    * latest ledger row is a cancel (−1) are deleted. `payloadCols`
    * are carried from the winning row. Single hash aggregation. */
  def finalState(df: DataFrame, keyCols: Seq[String], signCol: String,
      orderCols: Seq[String], payloadCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "finalState needs an explicit order")
    val ord = (orderCols.map(col) :+ checkSign(df, signCol).as("__sign")) ++
      payloadCols.map(col)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(ord: _*)).as("__last"))
      .filter(col("__last.__sign") === 1)
      .select(keyCols.map(col) ++
        orderCols.map(c => col(s"__last.$c").as(c)) ++
        payloadCols.map(c => col(s"__last.$c").as(c)): _*)
  }

  /** VersionedCollapsingMergeTree FINAL: (+1, −1) rows cancel in
    * PAIRS per (key, version) — arrival order is irrelevant, so a
    * cancel delivered before its state still annihilates it. A
    * (key, version) whose signs net > 0 survives as a state; the
    * highest surviving version's row wins the key. Two chained
    * aggregations on (key, version) then (key): both map-side
    * combined, the second over version-cardinality rows only. */
  /** The (key, version) pair-cancel stage shared by the versioned
    * reads: one hash aggregation netting signs per (key, version),
    * keeping groups with net > 0 and the deterministic max state row
    * as the version's payload. */
  private def netPerVersion(df: DataFrame, keyCols: Seq[String],
      signCol: String, versionCol: String,
      payloadCols: Seq[String]): DataFrame =
    df.groupBy((keyCols :+ versionCol).map(col): _*)
      .agg(sum(checkSign(df, signCol)).as("__net"),
        // payload of the version = its max state row (+1 first, then
        // payload) — retries may duplicate the state row; determinism
        // over duplicates is the same max-struct rule as finalState
        max(struct(col(signCol).as("__sign") +:
          payloadCols.map(col): _*)).as("__row"))
      .filter(col("__net") > 0)

  /** VersionedCollapsingMergeTree FINAL proper: EVERY surviving
    * (key, version) state row — the family's ORDER BY usually
    * includes the version, so FINAL keeps one row per surviving
    * version, not one per key ([[versionedFinal]] is the
    * latest-version convenience on top of this). One hash
    * aggregation; output cardinality = surviving versions. */
  def versionedSurvivors(df: DataFrame, keyCols: Seq[String],
      signCol: String, versionCol: String,
      payloadCols: Seq[String]): DataFrame =
    netPerVersion(df, keyCols, signCol, versionCol, payloadCols)
      .select((keyCols :+ versionCol).map(col) ++
        payloadCols.map(c => col(s"__row.$c").as(c)): _*)

  def versionedFinal(df: DataFrame, keyCols: Seq[String],
      signCol: String, versionCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val perVersion =
      netPerVersion(df, keyCols, signCol, versionCol, payloadCols)
    perVersion
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct(col(versionCol) +: payloadCols.map(c =>
        col(s"__row.$c").as(c)): _*)).as("__win"))
      .select((keyCols.map(col) :+
        col(s"__win.$versionCol").as(versionCol)) ++
        payloadCols.map(c => col(s"__win.$c").as(c)): _*)
  }

  /** The family's canonical collapsing aggregate: per key,
    * `sum(measure · sign)` for each measure plus `sum(sign)` as
    * `net_rows`, keeping keys with net_rows > 0 — correct totals over
    * a ledger WITHOUT collapsing it first (the whole point of the
    * pattern: aggregation and cancellation commute). Measures must be
    * integral columns (exact long sums; the engine's fixed-point
    * convention — scale doubles to micro-units first). */
  def collapsedSum(df: DataFrame, keyCols: Seq[String], signCol: String,
      measureCols: Seq[String]): DataFrame = {
    val sign = checkSign(df, signCol)
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as("net_rows"),
        measureCols.map(m =>
          // coalesce: a surviving key whose measure values are all NULL
          // must net to 0, not NULL — net_<m> is an exact-long column
          coalesce(sum(col(m).cast("long") * sign), lit(0L))
            .as(s"net_$m")): _*)
      .filter(col("net_rows") > 0)
  }
}
