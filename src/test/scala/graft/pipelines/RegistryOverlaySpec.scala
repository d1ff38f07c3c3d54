package graft.pipelines

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.core.PartitionedWriter
import graft.ingest.Bronze

/** Runtime metadata reload (metadata_updater.py:38-56): the overlay file
  * is re-read on every Registry.run, so enable/disable/rewire/window
  * edits take effect on the next cadence tick without redeploy. */
class RegistryOverlaySpec extends SparkSpec {

  private def writeMeta(dir: String, json: String): String = {
    val p = Paths.get(dir, "gold_pipelines.json")
    Files.writeString(p, json)
    p.toString
  }

  private def freshCtx(): GoldContext = {
    val dir = Files.createTempDirectory("graft_overlay").toString
    new GoldContext(spark, dir, "Asia/Jakarta")
  }

  private def ingestWazuh(ctx: GoldContext, ts: String): Unit = {
    import spark.implicits._
    val raw = (s"""{"event":{"hash":"ovl1","provider":"wazuh","dataset":"alert","kind":"alert","module":"audit"},
        "@timestamp":"$ts","agent":{"name":"agentO","ip":"10.9.9.9"},
        "host":{"name":"agentO","ip":"10.9.9.9"},
        "rule":{"id":"900","level":5,"name":"rule-900","ruleset":["a"]},
        "tags":["t9"],"message":"m-ovl"}""").replaceAll("\n\\s*", "")
    Bronze.route(Seq(raw).toDF("raw")).foreach { case (src, df) =>
      if (df.count() > 0)
        PartitionedWriter.append(df, ctx.path(s"bronze_$src"), "event_ts",
          Seq("event_ts", "event_id"))
    }
  }

  test("applyOverlays: disable, rewire, and refuse broken wiring") {
    // disabling drops the pipeline and its declaration-order slot only
    val noBridges = Registry.applyOverlays(Registry.all,
      Seq("bridge_wazuh_event_tag", "bridge_suricata_event_tag",
        "bridge_zeek_event_tag").map(id => Registry.Overlay(id, enabled = false)))
    assert(noBridges.size == 13)
    assert(Registry.topoOrder(noBridges).size == 13)

    // dependsOn override is what topoOrder sees
    val rewired = Registry.applyOverlays(Registry.all,
      Seq(Registry.Overlay("dim_tag", dependsOn = Some(Seq("dim_date")))))
    assert(rewired.find(_.id == "dim_tag").get.dependsOn == Seq("dim_date"))

    // unknown id, enabled->disabled dependency, and overlay cycles all fail
    intercept[IllegalArgumentException] {
      Registry.applyOverlays(Registry.all, Seq(Registry.Overlay("dim_nope")))
    }
    intercept[IllegalArgumentException] {
      Registry.applyOverlays(Registry.all,
        Seq(Registry.Overlay("dim_tag", enabled = false))) // bridges depend on it
    }
    val cyclic = Registry.applyOverlays(Registry.all,
      Seq(Registry.Overlay("dim_date", dependsOn = Some(Seq("dim_time"))),
        Registry.Overlay("dim_time", dependsOn = Some(Seq("dim_date")))))
    intercept[IllegalArgumentException] { Registry.topoOrder(cyclic) }
  }

  test("metadata file is re-read per run: edits apply without redeploy") {
    val ctx = freshCtx()
    ingestWazuh(ctx, "2026-01-08T01:00:00.000Z")
    val w = TimeWindow.of("2026-01-08 00:00:00", "2026-01-08 12:00:00")
    val metaDir = Files.createTempDirectory("graft_meta").toString

    val meta = writeMeta(metaDir,
      """{"pipelines": [
        |  {"pipeline_id": "bridge_wazuh_event_tag", "enabled": false},
        |  {"pipeline_id": "bridge_suricata_event_tag", "enabled": false},
        |  {"pipeline_id": "bridge_zeek_event_tag", "enabled": false}
        |]}""".stripMargin)
    val run1 = Registry.run(ctx, w, metadataPath = Some(meta))
    assert(run1.size == 13)
    assert(!run1.exists(_.pipelineId.startsWith("bridge_")))

    // edit the file; the SAME registry picks it up on the next run
    writeMeta(metaDir, """{"pipelines": []}""")
    val run2 = Registry.run(ctx, w, metadataPath = Some(meta))
    assert(run2.size == 16)
    assert(run2.count(_.pipelineId.startsWith("bridge_")) == 3)
  }

  test("window_minutes overlay widens the lookback for one pipeline") {
    val ctx = freshCtx()
    ingestWazuh(ctx, "2026-01-08T01:00:00.000Z") // UTC; 08:00 Jakarta
    // cadence tick whose 10-minute window misses the event by hours
    val tick = TimeWindow.of("2026-01-08 11:50:00", "2026-01-08 12:00:00")
    val metaDir = Files.createTempDirectory("graft_meta").toString

    val narrow = Registry.run(ctx, tick, only = Some(Set("dim_event")))
    assert(narrow.head.rowsAppended == 0)

    // 12h lookback from the tick end reaches the event — no code change
    val meta = writeMeta(metaDir,
      """{"pipelines": [
        |  {"pipeline_id": "dim_event", "window_minutes": 720}
        |]}""".stripMargin)
    val widened = Registry.run(ctx, tick, only = Some(Set("dim_event")),
      metadataPath = Some(meta))
    assert(widened.head.rowsAppended == 1)
  }
}
