package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic SIEM event stream for the end-to-end gold
  * benchmark: raw JSON lines in the three bronze shapes the router
  * understands (wazuh / suricata / zeek, mirroring the reference's
  * captured fixtures at `scripts/data-*.json`), spread evenly over a
  * fixed 10-minute window at a chosen volume.
  *
  * Generation is pure column algebra over `spark.range` — distributed,
  * no driver loop, no RNG (modular arithmetic gives stable cardinality:
  * 50 agents, 40 rules, 30 sensors, 256² ips) — so the BENCH can
  * materialize the stream once and time ingest/gold separately.
  */
object SyntheticEvents {

  /** Window start, UTC: 2026-01-08 00:00:00. */
  val windowStartMs: Long = 1767830400000L

  val windowMinutes: Int = 10

  /** Write `n` raw JSON event lines (⅓ wazuh, ⅓ suricata, ⅓ zeek) as
    * parquet at `outDir` and return the row count. */
  def materialize(spark: SparkSession, outDir: String, n: Long): Long = {
    val ids = spark.range(n)
    // integer-only arithmetic throughout (Column `/` is double division,
    // which both fails %d formatting and can smear millis)
    val isoTs = date_format(
      timestamp_millis(lit(windowStartMs) +
        floor(col("id") * (windowMinutes * 60000L) / lit(n)).cast("long")),
      "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
    def hi8(c: org.apache.spark.sql.Column) =
      shiftright(c.bitwiseAND(lit(65535L)), 8)
    val wazuh = format_string(
      """{"event":{"hash":"w%d","provider":"wazuh","dataset":"alert","kind":"alert","module":"audit"},""" +
        """"@timestamp":"%s","agent":{"name":"agent%d","ip":"10.0.%d.%d"},""" +
        """"host":{"name":"agent%d","ip":"10.0.%d.%d"},""" +
        """"rule":{"id":"%d","level":%d,"name":"rule-%d","ruleset":["a"]},""" +
        """"tags":["t%d","t%d"],"message":"m%d"}""",
      col("id"), isoTs,
      col("id") % 50, lit(0L), col("id") % 50,
      col("id") % 50, lit(0L), col("id") % 50,
      col("id") % 40 + 100, col("id") % 12 + 1, col("id") % 40 + 100,
      col("id") % 7, col("id") % 7 + 1, col("id"))
    val suricata = format_string(
      """{"suricata":{"timestamp":"%s","flow_id":"f%d","alert":{"severity":%d,"signature":"sig-%d","action":"allowed"},"http":{"url":"/u/%d"}},""" +
        """"event":{"hash":"s%d","provider":"suricata","dataset":"alert","kind":"alert","module":"ids"},""" +
        """"@timestamp":"%s","host":{"name":"sensor%d"},""" +
        """"source":{"ip":"10.1.%d.%d","port":%d},"destination":{"ip":"10.2.%d.%d","port":443},""" +
        """"network":{"application":"http","bytes":%d,"packets":%d},""" +
        """"rule":{"id":"%d","name":"sig-%d","category":["c1"]},"tags":["t%d"],"message":"alert %d"}""",
      isoTs, col("id"), col("id") % 5 + 1, col("id") % 40, col("id") % 97,
      col("id"), isoTs, col("id") % 30,
      hi8(col("id")), col("id") % 256, col("id") % 40000 + 1024,
      hi8(col("id")), (col("id") + 7) % 256,
      col("id") % 9000 + 40, col("id") % 60 + 1,
      col("id") % 40 + 2000, col("id") % 40, col("id") % 7, col("id"))
    val zeek = format_string(
      """{"zeek":{"uid":"z%d","ts":"%s"},""" +
        // event.category feeds the zeek tags chain (Bronze.zeek reads
        // tags | event.category | event.severity_tags) so the e2e gold
        // build exercises bridge_zeek_event_tag with real rows instead
        // of a structurally-dead 0-row pipeline
        """"event":{"hash":"z%d","provider":"zeek","dataset":"conn","kind":"event","module":"conn","category":["network"]},""" +
        """"@timestamp":"%s","host":{"name":"sensor%d"},""" +
        """"source":{"ip":"10.3.%d.%d","port":%d},"destination":{"ip":"10.4.%d.%d","port":%d},""" +
        """"network":{"application":"dns","type":"ipv4","direction":"outbound","community_id":"1:x%d","bytes":%d}}""",
      col("id"), isoTs, col("id"), isoTs, col("id") % 30,
      hi8(col("id")), col("id") % 256, col("id") % 40000 + 1024,
      hi8(col("id")), (col("id") + 13) % 256, lit(53L),
      col("id") % 1000, col("id") % 9000 + 40)
    val raw = ids.select(
      when(col("id") % 3 === 0, wazuh)
        .when(col("id") % 3 === 1, suricata)
        .otherwise(zeek).as("raw"))
    raw.write.mode("overwrite").parquet(outDir)
    n
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
