package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Keys, Tables}

/** Tiny CLI smoke-driver: loads the driver testdata through the public
  * library API and prints a few observable results. Usage:
  *   sbt "runMain graft.tools.Smoke /root/testdata/sf0.001"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = Tables.load(spark, sfDir, "events")
    ev.printSchema()
    ev.orderBy("event_id").show(3, false)

    val probe = spark.sql("select cast(null as string) a, '' b")
    probe.select(
      Keys.surrogateKey(col("a")).as("k_null"),
      Keys.surrogateKey(col("b")).as("k_empty"),
      Keys.dateKey(lit("2024-01-05 10:11:12").cast("timestamp")).as("dk"),
      Keys.timeKey(lit("2024-01-05 10:11:12").cast("timestamp")).as("tk")
    ).show(false)

    Tables.registerAll(spark, sfDir)
    spark.sql("select count(*) c from lineitem").show()
    spark.stop()
  }
}
