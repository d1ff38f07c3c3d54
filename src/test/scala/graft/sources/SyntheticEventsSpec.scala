package graft.sources

import graft.SparkSpec
import graft.ingest.Bronze
import org.apache.spark.sql.functions._

/** The e2e-bench event stream must route cleanly and land inside the
  * benchmark's fixed 10-minute window — otherwise the timed gold build
  * silently processes zero rows and the SLA number is fiction. */
class SyntheticEventsSpec extends SparkSpec {

  test("generated events route ⅓/⅓/⅓ and parse to in-window timestamps") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_synth_ev").toString
    val n = 300L
    SyntheticEvents.materialize(spark, dir, n)
    val raw = SyntheticEvents.read(spark, dir)
    assert(raw.count() == n)

    val routed = Bronze.route(raw)
    assert(routed.keySet == Set("wazuh", "suricata", "zeek"))
    assert(routed("wazuh").count() == n / 3)
    assert(routed("suricata").count() == n / 3)
    assert(routed("zeek").count() == n / 3)

    // every projected event_ts parses and lies in [start, start + 10 min)
    val lo = new java.sql.Timestamp(SyntheticEvents.windowStartMs)
    val hi = new java.sql.Timestamp(
      SyntheticEvents.windowStartMs + SyntheticEvents.windowMinutes * 60000L)
    routed.foreach { case (src, df) =>
      val bad = df.filter(col("event_ts").isNull ||
        col("event_ts") < lit(lo) || col("event_ts") >= lit(hi)).count()
      assert(bad == 0, s"$src has $bad events with null/out-of-window ts")
      assert(df.filter(col("event_id").isNull).count() == 0)
    }

    // every source feeds its tag bridge: an all-empty tags column would
    // run the bridge pipelines 0-row and hide a projection regression
    routed.foreach { case (src, df) =>
      assert(df.filter(size(col("tags")) > 0).count() > 0,
        s"$src events carry no tags — its bridge pipeline would be dead")
    }

    // wazuh carries the dim-feeding fields the SCD2 pipelines consume
    val w = routed("wazuh")
    assert(w.filter(col("agent_name").isNull).count() == 0)
    assert(w.filter(col("rule_id").isNull).count() == 0)
    assert(w.select(countDistinct("agent_name")).head.getLong(0) == 50)
    assert(w.select(countDistinct("rule_id")).head.getLong(0) == 40)
  }
}
