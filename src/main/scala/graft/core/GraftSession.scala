package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's scale-oriented defaults.
  *
  * The reference delegates physical execution entirely to ClickHouse
  * (SURVEY.md §4); on Spark the equivalent "engine defaults" are AQE
  * (runtime re-plan, skew-join splitting, partition coalescing) and a
  * shuffle-partition count sized to the cluster rather than the 200
  * default. Timezone: the reference pins Asia/Jakarta for stored event
  * time (/root/reference/scripts/alter_bronze_timezone_asia_jakarta.sql);
  * here it is an explicit parameter, defaulting to UTC so nothing
  * depends on ambient machine state.
  */
object GraftSession {

  def builder(
      appName: String = "graft",
      master: Option[String] = None,
      shufflePartitions: Int = 32,
      timeZone: String = "UTC"): SparkSession.Builder = {
    val b = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", timeZone)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Idempotent re-runs overwrite only the partitions they touch
      // (MERGE-emulation per SURVEY.md §4 "MERGE upsert").
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // ns-timestamp parquet (driver events table) reads as long.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // BI endpoint (queries.BiServer): every Thrift JDBC session shares
      // this session's catalog, so the registered gold views are what a
      // BI tool sees — one warehouse, one read surface, same as the
      // reference's single ClickHouse endpoint. Static conf: must be
      // set at build time, not after (BiServer falls back to
      // global_temp views when attached to a foreign session).
      .config("spark.sql.hive.thriftServer.singleSession", "true")
    master.fold(b)(b.master)
  }

  def local(cpus: Int = 4, timeZone: String = "UTC"): SparkSession = {
    // dev/bench knob: decouple shuffle width from the core count (the
    // two are conflated by default) so partitioning experiments don't
    // need a code edit; production callers size shufflePartitions via
    // [[builder]] directly.
    val shuffle = sys.env.get("SPARK_GRAFT_SHUFFLE")
      .map(_.toInt).getOrElse(cpus)
    val s = builder(master = Some(s"local[$cpus]"),
      shufflePartitions = shuffle, timeZone = timeZone)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
