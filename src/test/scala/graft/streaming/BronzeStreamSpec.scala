package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

class BronzeStreamSpec extends SparkSpec {

  test("file-source stream routes micro-batches into bronze tables") {
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val in = s"$base/in"
    new java.io.File(in).mkdirs()

    def wazuh(h: String, ts: String) =
      s"""{"event":{"hash":"$h","provider":"wazuh"},"@timestamp":"$ts","agent":{"name":"a1","ip":"10.0.0.1"},"rule":{"id":"1","level":2,"name":"r"},"tags":[],"message":"m"}"""
    def suri(h: String, ts: String) =
      s"""{"suricata":{"flow_id":1},"event":{"hash":"$h","provider":"suricata"},"@timestamp":"$ts","agent":{"name":"s1"},"rule":{"id":5,"name":"sig"}}"""

    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/batch1.jsonl"),
      Seq(wazuh("w1", "2026-01-08T01:00:00.000Z"),
        suri("s1", "2026-01-08T01:00:01.000Z"),
        "{broken json", wazuh("", "2026-01-08T01:00:02.000Z")).mkString("\n"))

    val q = BronzeStream.start(
      BronzeStream.fileSource(spark, in), s"$base/wh", s"$base/ckpt",
      Trigger.AvailableNow())
    q.awaitTermination(120000)

    val wz = spark.read.parquet(s"$base/wh/bronze_wazuh")
    val su = spark.read.parquet(s"$base/wh/bronze_suricata")
    assert(wz.count() == 1) // broken + hash-less rows dropped
    assert(su.count() == 1)
    assert(wz.collect().head.getAs[String]("event_id") == "w1")

    // second drop: one duplicate + one new event -> stream appends both
    // (bronze is at-least-once; dedupe is downstream)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/batch2.jsonl"),
      Seq(wazuh("w1", "2026-01-08T01:00:00.000Z"),
        wazuh("w2", "2026-01-08T02:00:00.000Z")).mkString("\n"))
    val q2 = BronzeStream.start(
      BronzeStream.fileSource(spark, in), s"$base/wh", s"$base/ckpt",
      Trigger.AvailableNow())
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$base/wh/bronze_wazuh").count() == 3)
    // checkpoint prevented re-reading batch1
    assert(spark.read.parquet(s"$base/wh/bronze_suricata").count() == 1)
  }

  test("streaming dedupe drops redelivered events inside the watermark") {
    val base = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val in = s"$base/in"
    new java.io.File(in).mkdirs()
    def wazuh(h: String, ts: String) =
      s"""{"event":{"hash":"$h","provider":"wazuh"},"@timestamp":"$ts","agent":{"name":"a1","ip":"10.0.0.1"},"rule":{"id":"1","level":2,"name":"r"},"tags":[],"message":"m"}"""
    // same (event_id, event_ts) delivered twice in one stream + one distinct
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/a.jsonl"),
      Seq(wazuh("d1", "2026-01-08T01:00:00.000Z"),
        wazuh("d1", "2026-01-08T01:00:00.000Z"),
        wazuh("d2", "2026-01-08T01:00:30.000Z")).mkString("\n"))
    val raw = BronzeStream.fileSource(spark, in)
    val typed = graft.ingest.Bronze.wazuh(raw)
    val deduped = BronzeStream.withStreamingDedupe(typed)
    val q = deduped.writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet").option("path", s"$base/out")
      .start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 2)
    assert(out.select("event_id").collect().map(_.getString(0)).sorted
      .toSeq == Seq("d1", "d2"))
  }
}
