package graft.pipelines

import graft.SparkSpec
import graft.core.PartitionedWriter
import graft.ingest.Bronze
import org.apache.spark.sql.functions._

/** Golden end-to-end tests: fixture JSON → bronze → all 16 pipelines →
  * gold star schema; SCD2 change sequences; idempotent re-runs;
  * Jakarta-midnight calendar keys (FIXTURES.md §3 scenarios). */
class PipelineRunSpec extends SparkSpec {

  private def wazuhEvent(hash: String, ts: String, agent: String,
      ip: String, ruleId: String = "100", level: Int = 3,
      tags: Seq[String] = Seq("t1", "t2")): String = {
    val tagsJson = tags.map(t => "\"" + t + "\"").mkString("[", ",", "]")
    s"""{"event":{"hash":"$hash","provider":"wazuh","dataset":"alert","kind":"alert","module":"audit"},
        "@timestamp":"$ts","agent":{"name":"$agent","ip":"$ip"},
        "host":{"name":"$agent","ip":"$ip"},
        "rule":{"id":"$ruleId","level":$level,"name":"rule-$ruleId","ruleset":["a"]},
        "tags":$tagsJson,"message":"m-$hash"}""".replaceAll("\n\\s*", "")
  }

  private def freshCtx(): GoldContext = {
    val dir = java.nio.file.Files.createTempDirectory("graft_gold").toString
    new GoldContext(spark, dir, "Asia/Jakarta")
  }

  private def ingest(ctx: GoldContext, events: Seq[String]): Unit = {
    import spark.implicits._
    Bronze.route(events.toDF("raw")).foreach { case (src, df) =>
      if (df.count() > 0)
        PartitionedWriter.append(df, ctx.path(s"bronze_$src"), "event_ts",
          Seq("event_ts", "event_id"))
    }
  }

  private val w1 = TimeWindow.of("2026-01-08 00:00:00", "2026-01-08 12:00:00")
  private val w2 = TimeWindow.of("2026-01-08 12:00:00", "2026-01-09 00:00:00")

  test("full run over the reference fixtures + synthetic wazuh events") {
    val ctx = freshCtx()
    ingest(ctx, Seq(
      wazuhEvent("ev1", "2026-01-08T01:00:00.000Z", "agentA", "10.0.0.1"),
      wazuhEvent("ev2", "2026-01-08T02:00:00.000Z", "agentB", "10.0.0.2",
        ruleId = "200", level = 7, tags = Seq("t2", "t3"))))
    val stats = Registry.run(ctx, w1)
    assert(stats.size == 16)
    val byId = stats.map(s => s.pipelineId -> s).toMap
    assert(byId("dim_date").rowsAfter == 1)
    assert(byId("dim_time").rowsAfter == 2)
    assert(byId("dim_agent_scd2").rowsAfter == 2)
    assert(byId("dim_rule_scd2").rowsAfter == 2)
    assert(byId("dim_tag").rowsAfter == 3)
    assert(byId("fact_wazuh_events").rowsAfter == 2)
    assert(byId("bridge_wazuh_event_tag").rowsAfter == 4)

    // facts resolved their SCD2 dims
    val fact = spark.read.parquet(ctx.path("fact_wazuh_events"))
    assert(fact.filter(col("agent_key").isNotNull).count() == 2)
    assert(fact.filter(col("rule_key").isNotNull).count() == 2)
    assert(fact.filter(col("event_key").isNotNull).count() == 2)

    // idempotency: re-running the same window appends nothing
    val stats2 = Registry.run(ctx, w1)
    val by2 = stats2.map(s => s.pipelineId -> s).toMap
    assert(by2("fact_wazuh_events").rowsAppended == 0)
    assert(by2("dim_date").rowsAppended == 0)
    assert(by2("bridge_wazuh_event_tag").rowsAppended == 0)
    assert(by2("dim_agent_scd2").rowsAfter == 2) // SCD2 rewrite stable
    // the idempotency receipt must read zero EVERYWHERE — the SCD2
    // rewrite reports its new-version delta, not the rebuilt table size
    assert(stats2.map(_.rowsAppended).sum == 0,
      stats2.filter(_.rowsAppended != 0).map(s =>
        s"${s.pipelineId}=${s.rowsAppended}").mkString(", "))

    // run ledger recorded both runs
    assert(spark.read.parquet(ctx.path("_run_ledger")).count() == 32)
  }

  test("rewriteDim: two-step swap, debris-free, crash-recoverable, sized files") {
    import spark.implicits._
    val ctx = freshCtx()
    val fs = new org.apache.hadoop.fs.Path(ctx.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def p(s: String) = new org.apache.hadoop.fs.Path(ctx.path(s))

    assert(ctx.rewriteDim("dim_x", Seq((1L, "a"), (2L, "b")).toDF("k", "v")) == 2)
    assert(ctx.rewriteDim("dim_x", Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("k", "v")) == 3)
    assert(spark.read.parquet(ctx.path("dim_x")).count() == 3)
    // no swap debris and a small dim compacts to exactly one data file
    assert(!fs.exists(p("dim_x__tmp")) && !fs.exists(p("dim_x__bak"))
      && !fs.exists(p("dim_x__tmpraw")))
    assert(fs.listStatus(p("dim_x")).count(
      _.getPath.getName.endsWith(".parquet")) == 1)

    // crash between the two renames: live was moved to .bak, new never
    // landed — the next rewrite must restore and proceed
    fs.rename(p("dim_x"), p("dim_x__bak"))
    assert(!fs.exists(p("dim_x")))
    assert(ctx.rewriteDim("dim_x", Seq((9L, "z")).toDF("k", "v")) == 1)
    assert(spark.read.parquet(ctx.path("dim_x")).select("v")
      .collect().map(_.getString(0)).toSeq == Seq("z"))
    assert(!fs.exists(p("dim_x__bak")))

    // empty rewrite keeps a readable schema-bearing table
    assert(ctx.rewriteDim("dim_x", Seq.empty[(Long, String)].toDF("k", "v")) == 0)
    assert(spark.read.parquet(ctx.path("dim_x")).columns.toSeq == Seq("k", "v"))
  }

  test("SCD2 change sequence: close old version, open new, asof resolves both") {
    val ctx = freshCtx()
    // window 1: agentA @ ip .1 ; window 2: agentA moved to ip .9
    ingest(ctx, Seq(
      wazuhEvent("e1", "2026-01-08T01:00:00.000Z", "agentA", "10.0.0.1"),
      wazuhEvent("e2", "2026-01-08T13:00:00.000Z", "agentA", "10.0.0.9"),
      wazuhEvent("e3", "2026-01-08T14:00:00.000Z", "agentA", "10.0.0.9")))
    Registry.run(ctx, w1)
    Registry.run(ctx, w2)

    val dim = spark.read.parquet(ctx.path("dim_agent")).orderBy("effective_from")
    val rows = dim.collect()
    assert(rows.length == 2)
    val (old, cur) = (rows(0), rows(1))
    assert(old.getAs[Int]("is_current") == 0)
    assert(cur.getAs[Int]("is_current") == 1)
    // old closed exactly at the new version's effective_from
    assert(old.getAs[java.sql.Timestamp]("effective_to")
      == cur.getAs[java.sql.Timestamp]("effective_from"))
    assert(cur.getAs[String]("agent_ip") == "::ffff:10.0.0.9")

    // asof: e1 -> old version, e2/e3 -> new version
    val fact = spark.read.parquet(ctx.path("fact_wazuh_events"))
    val byEvent = fact.select("event_id", "agent_key").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byEvent("e1") == old.getAs[Long]("agent_key"))
    assert(byEvent("e2") == cur.getAs[Long]("agent_key"))
    assert(byEvent("e3") == cur.getAs[Long]("agent_key"))

    // SCD2 invariants: exactly one current row per key; no overlap
    assert(dim.filter(col("is_current") === 1).count() == 1)
  }

  test("SCD2 multi-change window + re-run stability (no version oscillation)") {
    val ctx = freshCtx()
    // two ip changes inside ONE window + an unchanged repeat
    ingest(ctx, Seq(
      wazuhEvent("m1", "2026-01-08T01:00:00.000Z", "agentZ", "10.0.0.1"),
      wazuhEvent("m2", "2026-01-08T02:00:00.000Z", "agentZ", "10.0.0.2"),
      wazuhEvent("m3", "2026-01-08T03:00:00.000Z", "agentZ", "10.0.0.2"),
      wazuhEvent("m4", "2026-01-08T04:00:00.000Z", "agentZ", "10.0.0.3")))
    Registry.run(ctx, w1, Some(Set("dim_agent_scd2")))
    val v1 = spark.read.parquet(ctx.path("dim_agent"))
      .orderBy("effective_from").collect()
    assert(v1.length == 3) // .1 -> .2 -> .3 (m3 collapses into m2's version)
    assert(v1.map(_.getAs[Int]("is_current")).toSeq == Seq(0, 0, 1))
    assert(v1(0).getAs[java.sql.Timestamp]("effective_to")
      == v1(1).getAs[java.sql.Timestamp]("effective_from"))
    // re-run: identical chain, stable surrogate keys
    Registry.run(ctx, w1, Some(Set("dim_agent_scd2")))
    val v2 = spark.read.parquet(ctx.path("dim_agent"))
      .orderBy("effective_from").collect()
    assert(v2.map(_.toSeq).toSeq == v1.map(_.toSeq).toSeq)
  }

  test("Jakarta midnight boundary: date_key/time_key from UTC+7 wall clock") {
    val ctx = freshCtx()
    // 2026-01-08T18:30:00Z = 2026-01-09 01:30:00 Jakarta
    ingest(ctx, Seq(wazuhEvent("mid", "2026-01-08T18:30:00.000Z", "aX", "10.0.0.5")))
    Registry.run(ctx, TimeWindow.of("2026-01-08 12:00:00", "2026-01-09 00:00:00"))
    val fact = spark.read.parquet(ctx.path("fact_wazuh_events")).collect().head
    assert(fact.getAs[Int]("date_key") == 20260109)
    assert(fact.getAs[Int]("time_key") == 13000)
    val dimDate = spark.read.parquet(ctx.path("dim_date")).collect().head
    assert(dimDate.getAs[Int]("date_key") == 20260109)
  }

  test("suricata + zeek fixtures flow through their facts and bridges") {
    val ctx = freshCtx()
    import spark.implicits._
    val payloads = Seq("data-suricata-1.json", "data-zeek-3.json").map { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/scripts/$f")), "UTF-8")
      Seq(txt).toDF("raw")
        .select(get_json_object(col("raw"), "$.value.payload"))
        .collect().head.getString(0)
    }
    ingest(ctx, payloads)
    // fixtures are at 2026-01-07 / 2026-01-09 UTC
    Registry.run(ctx, TimeWindow.of("2026-01-01 00:00:00", "2026-01-31 00:00:00"))
    assert(spark.read.parquet(ctx.path("fact_suricata_events")).count() == 1)
    assert(spark.read.parquet(ctx.path("fact_zeek_events")).count() == 1)
    val suriFact = spark.read.parquet(ctx.path("fact_suricata_events")).collect().head
    assert(suriFact.getAs[Long]("sensor_key") != 0)
    assert(suriFact.getAs[Long]("signature_key") != 0)
    // suricata fixture has 1 tag -> 1 bridge row joined to dim_tag
    assert(spark.read.parquet(ctx.path("bridge_suricata_event_tag")).count() == 1)
    val sensors = spark.read.parquet(ctx.path("dim_sensor"))
    assert(sensors.filter(col("sensor_type") === "zeek").count() == 1)
  }
}
