package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Keys

/** The 3 fact builds + 3 tag bridges
  * (/root/reference/airflow/dags/sql/fact_*.sql, bridge_*_event_tag.sql).
  *
  * Shape (SURVEY.md §2 H): windowed bronze scan → derive calendar keys
  * from the Jakarta wall-clock → resolve dims (asof joins for SCD2,
  * broadcast hash-key equi joins otherwise) → idempotency anti-join on
  * (event_id, event_ts) handled by the writer (GoldContext.appendFact).
  *
  * All dim joins broadcast: dims are bounded by attribute cardinality,
  * facts by event volume — at 100 TB the fact side streams through
  * map-side joins with zero fact shuffles in the whole build.
  */
object Facts {

  private def nz(c: Column): Column = nullif(c, lit(""))

  private def calendarKeys(df: DataFrame, tz: String): DataFrame = df
    .withColumn("__lts", Keys.localTs(col("event_ts"), tz))
    .withColumn("date_key", Keys.dateKey(col("__lts")))
    .withColumn("time_key", Keys.timeKey(col("__lts")))
    .drop("__lts")

  /** dateDiff('second', a, b) — whole seconds (ClickHouse truncation;
    * the PG twin's fractional EXTRACT(EPOCH) loses, SURVEY.md §2 F). */
  private def secondsBetween(a: Column, b: Column): Column =
    (unix_timestamp(b) - unix_timestamp(a)).cast("long")

  /** fact_wazuh_events (fact_wazuh_events.sql): 3 asof SCD2 resolutions
    * + 1 hash equi join + calendar/lag/duration derivations. */
  def wazuh(bronzeWin: DataFrame, dimAgent: DataFrame, dimHost: DataFrame,
      dimRule: DataFrame, dimEvent: DataFrame, tz: String): DataFrame = {
    val base = calendarKeys(bronzeWin, tz)
    val withAgent = Dims.asofResolve(base, dimAgent, Dims.agentSpec,
      coalesce(nz(col("agent_name")), col("agent_ip")), "event_ts")
    val withHost = Dims.asofResolve(withAgent, dimHost, Dims.hostSpec,
      coalesce(nz(col("host_name")), col("host_ip")), "event_ts")
    val withRule = Dims.asofResolve(withHost, dimRule, Dims.ruleSpec,
      nz(col("rule_id")), "event_ts")
    val eventKey = Keys.surrogateKey(
      col("event_dataset"), col("event_kind"), col("event_module"), col("event_provider"))
    val withEvent = withRule.withColumn("event_key_c", eventKey)
      .join(broadcast(dimEvent.select(col("event_key"))),
        col("event_key_c") === col("event_key"), "left")
      .drop("event_key_c")
    withEvent.select(
      col("event_id"), col("event_ts"), col("event_ingested_ts"),
      col("event_start_ts"), col("event_end_ts"),
      col("date_key"), col("time_key"),
      col("agent_key"), col("host_key"), col("rule_key"), col("event_key"),
      when(col("event_ingested_ts").isNull, lit(null).cast("long"))
        .otherwise(secondsBetween(col("event_ts"), col("event_ingested_ts")))
        .as("lag_seconds"),
      when(col("event_start_ts").isNull || col("event_end_ts").isNull,
        lit(null).cast("long"))
        .otherwise(secondsBetween(col("event_start_ts"), col("event_end_ts")))
        .as("duration_seconds"),
      col("message"),
      current_timestamp().as("updated_at"))
  }

  /** fact_suricata_events (fact_suricata_events.sql): 3 recomputed-hash
    * dim lookups, no SCD2. */
  def suricata(bronzeWin: DataFrame, dimSensor: DataFrame,
      dimSignature: DataFrame, dimProtocol: DataFrame, tz: String): DataFrame = {
    val base = calendarKeys(bronzeWin, tz)
      .withColumn("sensor_key_c",
        Keys.surrogateKey(col("sensor_type"), col("sensor_name")))
      .withColumn("signature_key_c", Keys.surrogateKey(
        col("signature_id"), col("signature"), col("category"), col("alert_action")))
      .withColumn("protocol_key_c", Keys.surrogateKey(col("protocol")))
    val resolved = base
      .join(broadcast(dimSensor.select("sensor_key")),
        col("sensor_key_c") === col("sensor_key"), "left")
      .join(broadcast(dimSignature.select("signature_key")),
        col("signature_key_c") === col("signature_key"), "left")
      .join(broadcast(dimProtocol.select("protocol_key")),
        col("protocol_key_c") === col("protocol_key"), "left")
    resolved.select(
      col("event_id"), col("event_ts"), col("date_key"), col("time_key"),
      col("sensor_key"), col("signature_key"), col("protocol_key"),
      col("event_type"), col("severity"), col("src_ip"), col("dest_ip"),
      col("src_port"), col("dest_port"), col("bytes"), col("packets"),
      col("flow_id"), col("http_url"), col("message"),
      current_timestamp().as("updated_at"))
  }

  /** fact_zeek_events (fact_zeek_events.sql): sensor key uses the
    * literal 'zeek' type (matching dim_sensor's zeek branch). */
  def zeek(bronzeWin: DataFrame, dimSensor: DataFrame, dimProtocol: DataFrame,
      dimEvent: DataFrame, tz: String): DataFrame = {
    val base = calendarKeys(bronzeWin, tz)
      .withColumn("sensor_key_c",
        Keys.surrogateKey(lit("zeek"), col("sensor_name")))
      .withColumn("protocol_key_c", Keys.surrogateKey(col("protocol")))
      .withColumn("event_key_c", Keys.surrogateKey(
        col("event_dataset"), col("event_kind"), col("event_module"), col("event_provider")))
    val resolved = base
      .join(broadcast(dimSensor.select("sensor_key")),
        col("sensor_key_c") === col("sensor_key"), "left")
      .join(broadcast(dimProtocol.select("protocol_key")),
        col("protocol_key_c") === col("protocol_key"), "left")
      .join(broadcast(dimEvent.select("event_key")),
        col("event_key_c") === col("event_key"), "left")
    resolved.select(
      col("event_id"), col("event_ts"), col("event_ingested_ts"),
      col("event_start_ts"), col("event_end_ts"), col("date_key"), col("time_key"),
      col("sensor_key"), col("protocol_key"), col("event_key"),
      col("zeek_uid"), col("src_ip"), col("dest_ip"), col("src_port"), col("dest_port"),
      col("geo_latitude"), col("geo_longitude"), col("geo_country"), col("geo_city_name"),
      col("mac_address"), col("application"), col("network_type"), col("direction"),
      col("community_id"), col("bytes"), col("packets"), col("orig_bytes"),
      col("resp_bytes"), col("orig_pkts"), col("resp_pkts"), col("conn_state"),
      col("conn_state_description"), col("duration").as("duration_seconds"),
      col("history"), col("vlan_id"), col("message"),
      current_timestamp().as("updated_at"))
  }

  /** bridge_{src}_event_tag (bridge_*.sql): explode tags → inner join
    * dim_tag on value → (event_id, event_ts, tag_key) rows. */
  def tagBridge(bronzeWin: DataFrame, dimTag: DataFrame): DataFrame =
    bronzeWin
      .select(col("event_id"), col("event_ts"), explode(col("tags")).as("tag_value"))
      .filter(col("tag_value") =!= "")
      .join(broadcast(dimTag.select("tag_key", "tag_value")), Seq("tag_value"))
      .select(col("event_id"), col("event_ts"), col("tag_key"),
        current_timestamp().as("updated_at"))
}
