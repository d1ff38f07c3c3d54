package graft.queries

import graft.SparkSpec
import graft.core.PartitionedWriter
import graft.ingest.Bronze
import graft.pipelines.{GoldContext, Monitoring, Registry, TimeWindow}
import org.apache.spark.sql.functions._

/** End-to-end: reference fixture events → full gold build → the
  * reference's own Superset/example queries over the registered views,
  * plus monitoring checks. */
class GoldViewsSpec extends SparkSpec {

  private lazy val ctx: GoldContext = {
    val dir = java.nio.file.Files.createTempDirectory("graft_views").toString
    val c = new GoldContext(spark, dir)
    import spark.implicits._
    // suricata fixture + synthesized variants across two days/severities
    val base = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/scripts/data-suricata-1.json")), "UTF-8")
    val payload = Seq(base).toDF("raw")
      .select(get_json_object(col("raw"), "$.value.payload"))
      .collect().head.getString(0)
    val variants = (0 until 20).map { i =>
      payload
        .replace("cl4Acqi82vNwpWOVC15Hkg", s"ev$i")
        .replace("2026-01-07T02:43:59.077361+0000",
          f"2026-01-0${7 + i % 2}%dT0$i%02d:00:00.000+0000".replace("T024", "T04"))
        .replace("\"severity\":3}", s""""severity":${i % 3}}""")
    }
    val wazuh = (0 until 3).map { i =>
      s"""{"event":{"hash":"wz$i","provider":"wazuh","dataset":"alert","kind":"alert"},
          "@timestamp":"2026-01-07T0$i:00:00.000Z","agent":{"name":"a1","ip":"10.0.0.1"},
          "rule":{"id":"7","level":5,"name":"r7"},"tags":["t"],"message":"m"}"""
        .replaceAll("\n\\s*", "")
    }
    val routed = Bronze.route((variants ++ wazuh).toDF("raw"))
    PartitionedWriter.append(routed("suricata"), c.path("bronze_suricata"),
      "event_ts", Seq("event_ts", "event_id"))
    PartitionedWriter.append(routed("wazuh"), c.path("bronze_wazuh"),
      "event_ts", Seq("event_ts", "event_id"))
    Registry.run(c, TimeWindow.of("2026-01-01", "2026-01-31"))
    c
  }

  test("reference acceptance queries run over registered gold views") {
    val results = GoldViews.runAcceptance(ctx)
    val fiveMin = results("five_minute_severity").collect()
    assert(fiveMin.nonEmpty)
    val topSig = results("daily_top_signatures").collect()
    assert(topSig.nonEmpty && topSig.head.getAs[Long]("alert_count") > 0)
    val share = results("protocol_share_of_day").collect()
    // share-of-total sums to 1 per day
    val byDay = share.groupBy(_.getDate(0)).view
      .mapValues(_.map(_.getDouble(2)).sum)
    byDay.foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-9) }
    assert(results("severity_topk").count() == 3) // severities 0,1,2
  }

  test("monitoring: freshness, volume, schema drift") {
    assert(Monitoring.freshnessMinutes(ctx, "fact_suricata_events").exists(_ > 0))
    val vol = Monitoring.dailyVolume(ctx, "fact_suricata_events").collect()
    assert(vol.map(_.getAs[Long]("rows")).sum == 20)
    val (missing, unexpected, changed) = Monitoring.schemaDrift(
      ctx, "dim_sensor", graft.pipelines.Dims.schemas.dimSensor)
    assert(missing.isEmpty && unexpected.isEmpty && changed.isEmpty)
    val snap = Monitoring.snapshot(ctx,
      Seq("fact_suricata_events", "dim_sensor"))
    assert(snap.count() == 2)
    assert(ctx.exists("_monitoring"))
  }
  test("dedupe-on-read view collapses doubled appends") {
    // duplicate a fact row by raw append, bypassing the idempotent writer
    val fact = spark.read.parquet(ctx.path("fact_suricata_events"))
    val before = fact.count()
    fact.limit(1).drop("event_date").write.mode("append")
      .parquet(ctx.path("fact_suricata_events") + "/event_date=2026-01-07")
    GoldViews.registerAll(ctx)
    assert(spark.table("fact_suricata_events").count() == before)
  }

}
