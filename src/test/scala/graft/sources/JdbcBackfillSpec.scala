package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** No JDBC driver jar ships in this container, so the live `read()`
  * round-trip can't run; this covers the half that is ours — the
  * normalization + date-partitioned landing plumbing `backfill()`
  * applies to whatever frame the JDBC scan yields (the reference's
  * backfill normalizes inet/jsonb columns to text on the way in,
  * /root/reference/scripts/postgres_to_clickhouse_backfill.sql). */
class JdbcBackfillSpec extends SparkSpec {

  test("backfill normalizes and lands date-partitioned, re-run appends blind") {
    import spark.implicits._
    val target = java.nio.file.Files
      .createTempDirectory("graft_jdbc").toString + "/bronze_pg"
    // stand-in for a JDBC scan result: jsonb/inet arrive as strings in
    // need of trimming/casting, ts drives the partition layout
    val src = Seq(
      (1L, " 10.0.0.1 ", """{"a":1}""", "2026-03-01 10:00:00"),
      (2L, "192.168.0.9", """{"a":2}""", "2026-03-02 11:30:00"),
      (3L, null.asInstanceOf[String], "{}", "2026-03-02 23:59:59")
    ).toDF("id", "ip_raw", "payload", "ts_raw")

    def normalize(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id"),
        graft.functions.IpNorm.normalizeIp(trim(col("ip_raw"))).as("ip"),
        col("payload"),
        to_timestamp(col("ts_raw")).as("event_ts"))

    JdbcBackfill.backfill(src, normalize, target, "event_ts")

    val landed = spark.read.parquet(target)
    assert(landed.count() == 3)
    // normalization applied before landing
    assert(landed.filter(col("id") === 1).select("ip").collect()
      .head.getString(0) == "::ffff:10.0.0.1")
    assert(landed.filter(col("id") === 3).select("ip").collect()
      .head.isNullAt(0))
    // date-partitioned layout (event_date derived from event_ts)
    assert(landed.columns.contains(graft.core.PartitionedWriter.DateCol))
    assert(landed.select(graft.core.PartitionedWriter.DateCol)
      .distinct().count() == 2)
    // partition pruning works on the landed table
    val pruned = landed.filter(
      col(graft.core.PartitionedWriter.DateCol) === lit("2026-03-02"))
    assert(pruned.count() == 2)

    // chunked backfills append (range-partitioned JDBC scans land
    // chunk by chunk); dedupe discipline stays with appendIfAbsent
    JdbcBackfill.backfill(
      Seq((4L, "1.2.3.4", "{}", "2026-03-03 00:00:00"))
        .toDF("id", "ip_raw", "payload", "ts_raw"),
      normalize, target, "event_ts")
    assert(spark.read.parquet(target).count() == 4)
  }
}
