package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Keys, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator inventory lives in [[graft.queries.Suite]]; this object
  * just exposes it in the driver's shape. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the star-schema
    * acceptance shape (dim-joined daily top event types with share of
    * total — superset_sql_examples.sql:11-29 re-expressed). */
  def entry(spark: SparkSession): DataFrame = {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val dimType = ev.select(col("event_type")).distinct()
      .withColumn("type_key", Keys.surrogateKey(col("event_type")))
    ev.withColumn("type_key", Keys.surrogateKey(col("event_type")))
      .join(broadcast(dimType.select("type_key")), Seq("type_key"))
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .withColumn("pct_of_day", round(col("n") /
        sum("n").over(org.apache.spark.sql.expressions.Window.partitionBy("day")) * 100, 4))
      .orderBy(desc("n"), col("day"), col("event_type"))
      .limit(50)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Suite.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Suite.oracleSql
}
