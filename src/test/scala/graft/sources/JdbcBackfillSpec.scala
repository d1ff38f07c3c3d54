package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Covers both halves of the backfill operator (the reference's
  * `INSERT INTO … SELECT … FROM postgresql(…)` foreign scan,
  * /root/reference/scripts/postgres_to_clickhouse_backfill.sql):
  * the normalization + date-partitioned landing plumbing, AND the live
  * JDBC `read()` itself against the embedded Derby engine that ships
  * with Spark — real driver resolution, real result-set decoding, real
  * range-partitioned parallel scans. A production deployment swaps
  * only the URL and driver jar (no Postgres driver ships in this
  * container). */
class JdbcBackfillSpec extends SparkSpec {

  test("live JDBC round-trip: range-partitioned scan, normalize, land") {
    import java.sql.DriverManager
    val url = "jdbc:derby:memory:graftbackfill;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE events_src (" +
        "id BIGINT NOT NULL, ip_raw VARCHAR(64), payload VARCHAR(256), " +
        "ts_raw TIMESTAMP)")
      val ps = conn.prepareStatement("INSERT INTO events_src VALUES (?,?,?,?)")
      for (i <- 0 until 50) {
        ps.setLong(1, i.toLong)
        if (i % 10 == 9) ps.setNull(2, java.sql.Types.VARCHAR)
        else ps.setString(2, s" 10.0.${i % 3}.$i ")
        ps.setString(3, s"""{"a":$i}""")
        ps.setTimestamp(4, java.sql.Timestamp.valueOf(
          f"2026-03-${1 + i % 3}%02d 10:00:${i % 60}%02d"))
        ps.addBatch()
      }
      ps.executeBatch()

      // range-partitioned read: 4 parallel connections, each a bounded
      // range query — the shape a large-table backfill runs with
      val src = JdbcBackfill.read(spark, url, "events_src", "app", "",
        partitionColumn = Some(("id", 0L, 50L, 4)))
      assert(src.rdd.getNumPartitions == 4)
      assert(src.count() == 50)

      def normalize(df: org.apache.spark.sql.DataFrame) = df
        .select(col("ID").as("id"),
          graft.functions.IpNorm.normalizeIp(trim(col("IP_RAW"))).as("ip"),
          col("PAYLOAD").as("payload"),
          col("TS_RAW").as("event_ts"))

      val target = java.nio.file.Files
        .createTempDirectory("graft_jdbc_live").toString + "/bronze_pg"
      JdbcBackfill.backfill(src, normalize, target, "event_ts")

      val landed = spark.read.parquet(target)
      assert(landed.count() == 50)
      // cast normalization ran on the wire data
      assert(landed.filter(col("id") === 0).select("ip").collect()
        .head.getString(0) == "::ffff:10.0.0.0")
      assert(landed.filter(col("id") === 9).select("ip").collect()
        .head.isNullAt(0))
      // date-partitioned landing: ts days 1..3 → 3 partitions
      assert(landed.select(graft.core.PartitionedWriter.DateCol)
        .distinct().count() == 3)

      // the plain (single-connection) read decodes identically
      val single = JdbcBackfill.read(spark, url, "events_src", "app", "")
      assert(single.count() == 50)
    } finally {
      conn.close()
      // in-memory Derby lives for the JVM: drop so reruns in the same
      // suite JVM start clean (drop "succeeds" via 08006 disconnect)
      try DriverManager.getConnection(
        "jdbc:derby:memory:graftbackfill;drop=true")
      catch { case _: java.sql.SQLException => () }
    }
  }

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
