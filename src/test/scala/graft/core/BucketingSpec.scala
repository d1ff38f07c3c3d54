package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("matching bucketed tables join with zero exchanges") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_buckets")
    sql(s"CREATE DATABASE IF NOT EXISTS bspec LOCATION '$dbDir'")

    val facts = (1L to 10000L).map(i => (i % 500, i, i * 1.5))
      .toDF("key", "fact_id", "amount")
    val other = (1L to 5000L).map(i => (i % 500, i, s"v$i"))
      .toDF("key", "other_id", "attr")
    Bucketing.writeBucketed(facts, "bspec.facts", Seq("key"), 8)
    Bucketing.writeBucketed(other, "bspec.other", Seq("key"), 8)

    // force the join path that would otherwise shuffle both sides
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bspec.facts")
        .join(spark.table("bspec.other"), "key")
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not shuffle either side")
      // correctness: same result as the unbucketed join
      val ref = facts.join(other, "key").count()
      assert(n == ref)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      sql("DROP DATABASE bspec CASCADE")
    }
  }
}
