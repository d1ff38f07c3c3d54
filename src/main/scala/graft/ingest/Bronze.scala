package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.IpNorm

/** JSON → typed bronze projections: the Spark re-expression of the three
  * ClickHouse Kafka materialized views
  * (/root/reference/clickhouse/init/02_kafka_ingest.sql.tmpl:13-262).
  *
  * Each projection is a pure `DataFrame => DataFrame` over a single
  * string column `raw`, so the exact same code runs under a static read
  * (tests, backfill) and under `readStream` + `foreachBatch` (live
  * ingest). All extracts are null-on-failure (`...OrNull` semantics):
  * missing JSON paths yield null, failed casts yield null, and rows
  * without a non-empty `$.event.hash` are dropped by the router — the
  * Spark equivalent of `kafka_skip_broken_messages`.
  *
  * Timestamps parse to instants (TimestampType); the reference's
  * `toTimeZone(…, 'Asia/Jakarta')` only changes rendering, not the
  * stored instant, so wall-clock derivations (date_key/time_key) take
  * the zone explicitly downstream (SURVEY.md §1.4).
  */
object Bronze {

  val Raw = "raw"

  // ---- extraction DSL ------------------------------------------------

  /** `$.path` string value; '' normalized to null (jsonb ->> semantics). */
  private def j(path: String): Column =
    nullif(get_json_object(col(Raw), "$." + path), lit(""))

  private def firstOf(paths: String*): Column = coalesce(paths.map(j): _*)

  private def jInt(path: String): Column = j(path).try_cast("int")
  private def jLongOf(paths: String*): Column =
    coalesce(paths.map(p => j(p).try_cast("long")): _*)
  private def jDoubleOf(paths: String*): Column =
    coalesce(paths.map(p => j(p).try_cast("double")): _*)

  /** parseDateTime64BestEffortOrNull over the formats observed in the
    * fixtures: ISO-8601 with 'T'/space, optional fractional seconds and
    * zone. Spark's permissive timestamp cast covers all of them. */
  private def bestEffortTs(c: Column): Column = c.try_cast("timestamp")
  private def jTs(paths: String*): Column =
    coalesce(paths.map(p => bestEffortTs(j(p))): _*)

  /** fromUnixTimestamp64Milli(toInt64OrNull(x)). */
  private def jEpochMs(path: String): Column =
    timestamp_millis(j(path).try_cast("long"))

  private def jStrArray(path: String): Column =
    from_json(get_json_object(col(Raw), "$." + path),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))

  private def tagsOf(paths: String*): Column =
    coalesce((paths.map(jStrArray) :+ array().cast("array<string>")): _*)

  private def ip(path: String): Column = IpNorm.normalizeIp(j(path))

  // ---- routing predicates (02_kafka_ingest.sql.tmpl:83-84,128-129,261-262)

  val hasHash: Column = j("event.hash").isNotNull
  val isSuricata: Column = get_json_object(col(Raw), "$.suricata").isNotNull && hasHash
  val isWazuh: Column = j("event.provider") === "wazuh" && hasHash
  val isZeek: Column = get_json_object(col(Raw), "$.zeek").isNotNull && hasHash

  // ---- shared fragments ----------------------------------------------

  private def sensorName: Column = firstOf("agent.name", "host.name", "node")
  private def protocolCol: Column = firstOf(
    "network.application", "network.transport[0]", "network.protocol[0]", "protocol[0]")

  // ---- projections ---------------------------------------------------

  /** suricata MV (02_kafka_ingest.sql.tmpl:16-82). */
  def suricata(raw: DataFrame): DataFrame =
    raw.filter(isSuricata).select(
      j("event.hash").as("event_id"),
      jTs("@timestamp", "suricata.timestamp").as("event_ts"),
      firstOf("event.provider", "event.module").as("sensor_type"),
      sensorName.as("sensor_name"),
      firstOf("event.dataset", "event.kind").as("event_type"),
      firstOf("suricata.alert.severity", "event.severity").as("severity"),
      ip("source.ip").as("src_ip"),
      ip("destination.ip").as("dest_ip"),
      jInt("source.port").as("src_port"),
      jInt("destination.port").as("dest_port"),
      protocolCol.as("protocol"),
      jLongOf("totDataBytes", "network.bytes", "client.bytes", "server.bytes").as("bytes"),
      jLongOf("network.packets", "client.packets", "server.packets").as("packets"),
      j("suricata.flow_id").as("flow_id"),
      firstOf("rule.name", "suricata.alert.signature").as("signature"),
      jInt("rule.id").as("signature_id"),
      j("rule.category[0]").as("category"),
      j("suricata.alert.action").as("alert_action"),
      j("suricata.http.url").as("http_url"),
      tagsOf("tags", "event.severity_tags").as("tags"),
      firstOf("message", "event.original", "rule.name").as("message"),
      col(Raw).as("raw_data"))

  /** wazuh MV (02_kafka_ingest.sql.tmpl:86-129). */
  def wazuh(raw: DataFrame): DataFrame =
    raw.filter(isWazuh).select(
      j("event.hash").as("event_id"),
      coalesce(jTs("@timestamp", "event.ingested"),
        jEpochMs("event.start"), jEpochMs("event.end")).as("event_ts"),
      jTs("event.ingested").as("event_ingested_ts"),
      jEpochMs("event.start").as("event_start_ts"),
      jEpochMs("event.end").as("event_end_ts"),
      j("event.dataset").as("event_dataset"),
      j("event.kind").as("event_kind"),
      j("event.module").as("event_module"),
      j("event.provider").as("event_provider"),
      j("agent.name").as("agent_name"),
      ip("agent.ip").as("agent_ip"),
      j("host.name").as("host_name"),
      ip("host.ip").as("host_ip"),
      j("rule.id").as("rule_id"),
      jInt("rule.level").as("rule_level"),
      j("rule.name").as("rule_name"),
      get_json_object(col(Raw), "$.rule.ruleset").as("rule_ruleset"),
      tagsOf("tags").as("tags"),
      firstOf("message", "rule.name").as("message"),
      col(Raw).as("raw_data"))

  /** zeek MV (02_kafka_ingest.sql.tmpl:131-262). All zeek.conn numerics
    * arrive as strings — every extract goes through the try-cast path. */
  def zeek(raw: DataFrame): DataFrame =
    raw.filter(isZeek).select(
      j("event.hash").as("event_id"),
      coalesce(jTs("@timestamp", "zeek.ts", "event.ingested"),
        jEpochMs("event.start")).as("event_ts"),
      jTs("event.ingested").as("event_ingested_ts"),
      jEpochMs("event.start").as("event_start_ts"),
      jEpochMs("event.end").as("event_end_ts"),
      j("event.dataset").as("event_dataset"),
      j("event.kind").as("event_kind"),
      j("event.module").as("event_module"),
      j("event.provider").as("event_provider"),
      firstOf("zeek.uid", "event.id[0]").as("zeek_uid"),
      sensorName.as("sensor_name"),
      ip("source.ip").as("src_ip"),
      ip("destination.ip").as("dest_ip"),
      jInt("source.port").as("src_port"),
      jInt("destination.port").as("dest_port"),
      jDoubleOf("source.geo.location.lat", "source.geo.latitude",
        "destination.geo.location.lat", "destination.geo.latitude").as("geo_latitude"),
      jDoubleOf("source.geo.location.lon", "source.geo.longitude",
        "destination.geo.location.lon", "destination.geo.longitude").as("geo_longitude"),
      firstOf("source.geo.country_name", "source.geo.country_iso_code",
        "source.geo.country_code2", "source.geo.country_code3",
        "destination.geo.country_name", "destination.geo.country_iso_code",
        "destination.geo.country_code2", "destination.geo.country_code3").as("geo_country"),
      firstOf("source.geo.city_name", "destination.geo.city_name").as("geo_city_name"),
      firstOf("source.mac[0]", "destination.mac[0]").as("mac_address"),
      protocolCol.as("protocol"),
      j("network.application").as("application"),
      j("network.type").as("network_type"),
      j("network.direction").as("direction"),
      j("network.community_id").as("community_id"),
      jLongOf("totDataBytes", "network.bytes", "source.bytes", "destination.bytes").as("bytes"),
      jLongOf("network.packets", "source.packets", "destination.packets").as("packets"),
      jLongOf("zeek.conn.orig_bytes", "zeek.conn.orig_ip_bytes").as("orig_bytes"),
      jLongOf("zeek.conn.resp_bytes", "zeek.conn.resp_ip_bytes").as("resp_bytes"),
      jLongOf("zeek.conn.orig_pkts").as("orig_pkts"),
      jLongOf("zeek.conn.resp_pkts").as("resp_pkts"),
      j("zeek.conn.conn_state").as("conn_state"),
      j("zeek.conn.conn_state_description").as("conn_state_description"),
      jDoubleOf("zeek.conn.duration").as("duration"),
      j("zeek.conn.history").as("history"),
      firstOf("zeek.conn.vlan", "network.vlan.id[0]").as("vlan_id"),
      tagsOf("tags", "event.category", "event.severity_tags").as("tags"),
      firstOf("message", "event.original", "zeek.conn.conn_state_description").as("message"),
      col(Raw).as("raw_data"))

  /** Route one raw stream into the three typed bronze frames — the MV
    * fan-out (one source, three filtered projections). */
  def route(raw: DataFrame): Map[String, DataFrame] = Map(
    "suricata" -> suricata(raw),
    "wazuh" -> wazuh(raw),
    "zeek" -> zeek(raw))
}
