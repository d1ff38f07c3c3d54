package graft.core

import graft.SparkSpec
import graft.functions.IpNorm
import graft.operators.Replacing
import org.apache.spark.sql.functions._

class CoreSpec extends SparkSpec {

  test("IpNorm: IPv4, mapped IPv6, plain IPv6, garbage") {
    assert(IpNorm.normalize("192.168.1.2") == "::ffff:192.168.1.2")
    assert(IpNorm.normalize("::ffff:192.168.1.2") == "::ffff:192.168.1.2")
    assert(IpNorm.normalize("::FFFF:10.0.0.1") == "::ffff:10.0.0.1")
    assert(IpNorm.normalize("ff02::1:3") == "ff02::1:3")
    assert(IpNorm.normalize("FF02:0:0:0:0:0:1:3") == "ff02::1:3")
    assert(IpNorm.normalize("2001:db8:0:0:1:0:0:1") == "2001:db8::1:0:0:1")
    assert(IpNorm.normalize("::1") == "::1")
    assert(IpNorm.normalize("localhost") == null)
    assert(IpNorm.normalize("999.1.1.1") == null)
    assert(IpNorm.normalize("") == null)
    assert(IpNorm.normalize(null) == null)
    assert(IpNorm.normalize(" 10.1.2.3 ") == "::ffff:10.1.2.3")
  }

  test("IpNorm as column function") {
    import spark.implicits._
    val out = Seq("1.2.3.4", "ff02::1:3", "nope")
      .toDF("ip").select(IpNorm.normalizeIp(col("ip")).as("n"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("::ffff:1.2.3.4", "ff02::1:3", null))
  }

  test("normalize_ip: native expression stays in codegen and registers in SQL") {
    import spark.implicits._
    val df = Seq("1.2.3.4").toDF("ip").select(IpNorm.normalizeIp(col("ip")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan) // native expression, not a ScalaUDF
    // registered via GraftExtensions (GraftSession attaches them)
    val viaSql = sql("SELECT normalize_ip('ff02:0:0:0:0:0:1:3') AS ip").collect()
    assert(viaSql.head.getString(0) == "ff02::1:3")
    assert(sql("SELECT normalize_ip('junk') AS ip").collect().head.isNullAt(0))
  }

  test("Replacing.latestByKey keeps max-version row per key, deterministic ties") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, "v1"), ("a", 3L, "v3"), ("a", 2L, "v2"),
      ("b", 5L, "x"), ("b", 5L, "y") // tie on version -> lexicographic payload
    ).toDF("k", "updated_at", "payload")
    val out = Replacing.latestByKey(df, Seq("k"), "updated_at")
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(("a", 3L, "v3"), ("b", 5L, "y")))
    assert(out.length == 2)
  }

  test("PartitionedWriter appendIfAbsent is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_paw").toString + "/t"
    val df = Seq(
      ("e1", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      ("e2", java.sql.Timestamp.valueOf("2024-01-02 11:00:00"), 2.0)
    ).toDF("event_id", "event_ts", "v")
    PartitionedWriter.appendIfAbsent(df, dir, "event_ts", Seq("event_id", "event_ts"))
    PartitionedWriter.appendIfAbsent(df, dir, "event_ts", Seq("event_id", "event_ts"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    // partition layout is hive-style event_date=
    assert(new java.io.File(dir).list().exists(_.startsWith("event_date=")))
    // a third, new row appends
    val df2 = Seq(("e3", java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 3.0))
      .toDF("event_id", "event_ts", "v")
    PartitionedWriter.appendIfAbsent(df2, dir, "event_ts", Seq("event_id", "event_ts"))
    assert(spark.read.parquet(dir).count() == 3)
  }
}
