package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * The `events` table stores `ts` as parquet INT64 TIMESTAMP(NANOS), which
  * Spark's parquet reader rejects outright; we read it via the legacy
  * `nanosAsLong` conf and convert to a microsecond TimestampType column
  * (truncation — identical to how DuckDB's epoch_* functions truncate ns).
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf directory. Idempotent wrt session confs. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    name match {
      case "events" =>
        // ts: ns-since-epoch Long -> TimestampType (µs, truncated).
        // `div` keeps the arithmetic in integers: a double division here
        // loses precision (ns epochs ≈ 1.7e18 exceed double's 2^53 exact
        // range) and can shift values by ±1 µs.
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  /** Register every table as a temp view (for spark.sql use). Footer
    * reads are driver-side and independent — run them concurrently
    * (10 sequential schema inferences cost ~2 s; parallel, ~the max of
    * one). */
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = all.map(n => Future {
      load(spark, sfDir, n).createOrReplaceTempView(n)
    })
    Await.result(Future.sequence(fs), 5.minutes)
    ()
  }
}
