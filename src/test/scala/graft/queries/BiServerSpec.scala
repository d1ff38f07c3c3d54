package graft.queries

import java.sql.DriverManager

import graft.SparkSpec
import graft.core.PartitionedWriter
import graft.ingest.Bronze
import graft.pipelines.{GoldContext, Registry, TimeWindow}
import org.apache.spark.sql.functions._

/** Real network round-trip: gold build → Thrift endpoint → Hive JDBC
  * client over localhost — the path a BI tool takes. */
class BiServerSpec extends SparkSpec {

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  test("BI tool attaches over JDBC and reads deduped gold views") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bi").toString
    val ctx = new GoldContext(spark, dir)
    import spark.implicits._
    val events = (0 until 4).map { i =>
      s"""{"event":{"hash":"bi$i","provider":"wazuh","dataset":"alert","kind":"alert"},
          "@timestamp":"2026-01-07T0$i:00:00.000Z","agent":{"name":"a1","ip":"10.0.0.1"},
          "rule":{"id":"7","level":5,"name":"r7"},"tags":["t"],"message":"m"}"""
        .replaceAll("\n\\s*", "")
    }
    val routed = Bronze.route(events.toDF("raw"))
    PartitionedWriter.append(routed("wazuh"), ctx.path("bronze_wazuh"),
      "event_ts", Seq("event_ts", "event_id"))
    Registry.run(ctx, TimeWindow.of("2026-01-01", "2026-01-31"))

    val port = freePort()
    // the thrift stack sets datetime.java8API on the (shared) session
    // for its wire serialization; restore afterward so later suites
    // still collect java.sql.Timestamp (see BiServer scaladoc)
    val java8Before = spark.conf.get("spark.sql.datetime.java8API.enabled")
    val server = BiServer.serve(ctx, port)
    try {
      Class.forName("org.apache.hive.jdbc.HiveDriver")
      // the server accepts connections asynchronously after start
      val conn = {
        var c: java.sql.Connection = null
        var attempts = 0
        while (c == null) {
          try c = DriverManager.getConnection(
            s"jdbc:hive2://localhost:$port/default", "", "")
          catch {
            case e: Exception =>
              attempts += 1
              if (attempts > 30) throw e
              Thread.sleep(1000)
          }
        }
        c
      }
      try {
        val st = conn.createStatement()
        val rs = st.executeQuery(
          "SELECT count(*) AS n FROM fact_wazuh_events")
        assert(rs.next() && rs.getLong(1) == 4L)
        // dim join through the socket — the acceptance-query shape
        val rs2 = st.executeQuery(
          """SELECT d.rule_name, count(*) AS n
            |FROM fact_wazuh_events f
            |JOIN dim_rule d ON f.rule_key = d.rule_key
            |GROUP BY d.rule_name""".stripMargin)
        assert(rs2.next() && rs2.getString(1) == "r7" && rs2.getLong(2) == 4L)
        // the engine's SQL function family rides the shared session:
        // remote BI clients can call it too
        val rs3 = st.executeQuery(
          "SELECT normalize_ip('192.168.1.1') AS ip")
        assert(rs3.next() && rs3.getString(1) == "::ffff:192.168.1.1")
        // guardrails are set on the serving session (BiServer scaladoc):
        // incremental collect + idle-operation/session sweep
        assert(spark.conf.get("spark.sql.thriftServer.incrementalCollect")
          == "true")
        assert(spark.conf.get("hive.server2.session.check.interval").toLong > 0)
        assert(spark.conf.get("hive.server2.idle.operation.timeout").toLong
          == 60000L)
        assert(spark.conf.get("hive.server2.thrift.bind.host") == "localhost")
      } finally conn.close()
    } finally {
      server.stop()
      spark.conf.set("spark.sql.datetime.java8API.enabled", java8Before)
    }
  }
}
