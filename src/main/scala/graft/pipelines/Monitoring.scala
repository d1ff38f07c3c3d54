package graft.pipelines

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Operational monitoring (G6) — the Spark counterparts of the
  * reference's monitoring schema
  * (/root/reference/postgres/init/04_monitoring_tables.sql: ingest lag,
  * volume anomalies, schema drift, freshness/SLA thresholds per pipeline,
  * 06_dynamic_dag_metadata.sql:36-37). The reference declares the tables
  * but ships no populating code; here each check is a function over the
  * warehouse, and [[snapshot]] appends one row per table to
  * `_monitoring`.
  */
object Monitoring {

  /** Minutes since the newest event_ts in a table; None if absent/empty.
    * Compare against the reference's freshness thresholds (default 2 min,
    * seeded 120–720 min). */
  def freshnessMinutes(ctx: GoldContext, table: String): Option[Double] = {
    if (!ctx.exists(table)) return None
    val df = ctx.spark.read.parquet(ctx.path(table))
    if (!df.columns.contains("event_ts")) return None
    val row = df.agg(max("event_ts")).collect().head
    Option(row.getTimestamp(0)).map(ts =>
      (System.currentTimeMillis() - ts.getTime) / 60000.0)
  }

  /** Row volume per event_date partition — feed for volume-anomaly
    * alerting (monitoring.volume_anomalies). */
  def dailyVolume(ctx: GoldContext, table: String): DataFrame = {
    val df = ctx.spark.read.parquet(ctx.path(table))
    df.groupBy("event_date").agg(count(lit(1)).as("rows"))
      .orderBy("event_date")
  }

  /** Schema drift: columns that differ between the table on disk and the
    * expected schema (monitoring.schema_drift's expected_columns check).
    * Returns (missing, unexpected, typeChanged). */
  def schemaDrift(ctx: GoldContext, table: String,
      expected: StructType): (Seq[String], Seq[String], Seq[String]) = {
    val actual = ctx.spark.read.parquet(ctx.path(table)).schema
    val exp = expected.fields.map(f => f.name -> f.dataType).toMap
    val act = actual.fields.map(f => f.name -> f.dataType).toMap
    val missing = exp.keys.filterNot(act.contains).toSeq.sorted
    val unexpected = act.keys.filterNot(exp.contains).toSeq.sorted
      .filterNot(_ == graft.core.PartitionedWriter.DateCol)
    val changed = exp.keys.filter(k =>
      act.contains(k) && act(k) != exp(k)).toSeq.sorted
    (missing, unexpected, changed)
  }

  /** Append a monitoring snapshot (freshness + row count per table). */
  def snapshot(ctx: GoldContext, tables: Seq[String]): DataFrame = {
    import ctx.spark.implicits._
    val rows = tables.map { t =>
      (t, ctx.count(t), freshnessMinutes(ctx, t).getOrElse(-1.0))
    }.toDF("table", "rows", "freshness_minutes")
      .withColumn("checked_at", current_timestamp())
    rows.write.mode(SaveMode.Append).parquet(ctx.path("_monitoring"))
    rows
  }
}
