package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Testdata-schema canary: loads every driver-provided table at sf0.001 and
  * asserts the post-`Tables.load` schema. When the driver's parquet format
  * drifts (as `events.ts` did: ns-long -> timestamp[us]), this fails with one
  * clearly-named test instead of breaking 20+ oracle queries downstream.
  */
class TablesSchemaSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every table in Tables.all loads at sf0.001") {
    Tables.all.foreach { name =>
      val df = Tables.load(spark, sfDir, name)
      assert(df.schema.nonEmpty, s"$name has empty schema")
      assert(df.limit(1).count() == 1, s"$name is empty")
    }
  }

  test("events.ts normalizes to TimestampType regardless of parquet dtype") {
    val df = Tables.load(spark, sfDir, "events")
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts must load as TimestampType, got ${df.schema("ts").dataType}")
    // Arithmetic that died in round 3 must analyze: ts is a real timestamp.
    val probed = df.selectExpr("date_trunc('hour', ts) AS h", "unix_timestamp(ts) AS u")
    assert(probed.limit(1).count() == 1)
  }

  test("events.ts time filters still push down to the parquet scan") {
    val df = Tables.load(spark, sfDir, "events")
      .filter(col("ts") >= lit(java.sql.Timestamp.valueOf("2025-01-01 00:00:00")))
      .select("event_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
      s"ts filter did not reach the scan:\n$plan")
  }

  test("key column dtypes hold steady across the suite's assumptions") {
    val events = Tables.load(spark, sfDir, "events")
    val expectEvents = Map(
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType)
    expectEvents.foreach { case (c, t) =>
      assert(events.schema(c).dataType == t, s"events.$c expected $t got ${events.schema(c).dataType}")
    }
    val docs = Tables.load(spark, sfDir, "documents")
    assert(docs.schema.fieldNames.contains("text"), "documents must carry a text column")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val embType = emb.schema("embedding").dataType
    assert(embType.isInstanceOf[ArrayType],
      s"embeddings.embedding expected array type, got $embType")
  }
}
