package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-shot JDBC backfill — the Spark stand-in for the reference's
  * `INSERT INTO … SELECT … FROM postgresql(host, db, table, …)` foreign
  * scans (/root/reference/scripts/postgres_to_clickhouse_backfill.sql).
  *
  * Reads a remote table with predicate-pushdown-capable partitioned
  * scans: `partitionColumn`/bounds split the source into `numPartitions`
  * parallel range queries, so a backfill of a large Postgres table
  * streams through the cluster instead of a single connection. The
  * driver jar must be on the cluster classpath; the live round-trip is
  * exercised in CI against the embedded Derby engine Spark ships
  * (JdbcBackfillSpec — real driver resolution, result-set decoding and
  * range-partitioned scans), so a production deployment only swaps the
  * URL and driver jar.
  */
object JdbcBackfill {

  def read(spark: SparkSession, url: String, table: String,
      user: String, password: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    partitionColumn match {
      case Some((col, lower, upper, n)) =>
        spark.read.jdbc(url, table, col, lower, upper, n, props)
      case None =>
        spark.read.jdbc(url, table, props)
    }
  }

  /** Backfill into a date-partitioned bronze table with cast
    * normalization supplied by the caller (the reference normalizes
    * inet/jsonb columns to String on the way in). */
  def backfill(src: DataFrame, normalize: DataFrame => DataFrame,
      targetPath: String, tsCol: String): Unit =
    graft.core.PartitionedWriter.append(normalize(src), targetPath, tsCol)
}
