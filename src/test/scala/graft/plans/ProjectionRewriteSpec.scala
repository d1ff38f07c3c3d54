package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Projection auto-rewrite: the optimizer must swap a matching
  * aggregate's base scan for the registered summary (plan-asserted),
  * answers must equal the base computation bit-for-bit, and every
  * non-matching shape must fall back to the base untouched. */
class ProjectionRewriteSpec extends SparkSpec {

  private def scanPaths(df: DataFrame): Seq[String] = {
    // aggregates get wrapped in AdaptiveSparkPlanExec — collect on
    // the wrapper sees no leaves until execution; use its inner plan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    plan.collect {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
    }.flatten
  }

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_projspec_$tag").toString

  // a small base: 4 sources × 3 langs × many rows, long measure
  private lazy val (basePath, summaryPath): (String, String) = {
    val base = tempDir("base")
    val smry = tempDir("sum")
    spark.range(10000).selectExpr(
        "concat('s', pmod(id, 4)) AS source",
        "concat('l', pmod(id, 3)) AS lang",
        "(id % 97) AS n_chars")
      .write.mode("overwrite").parquet(base)
    spark.read.parquet(base).groupBy("source", "lang")
      .agg(sum(col("n_chars")).as("n_chars"), count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(smry)
    Projections.register(spark, base, smry,
      keys = Seq("source", "lang"), measures = Seq("n_chars"))
    (base, smry)
  }

  private def baseDf = spark.read.parquet(basePath)

  private def assertReadsSummary(df: DataFrame): Unit = {
    val paths = scanPaths(df)
    assert(paths.exists(_.contains(summaryPath)),
      s"must read the summary, read: $paths")
    assert(!paths.exists(_.contains(basePath)),
      s"must not read the base, read: $paths")
  }

  private def assertReadsBase(df: DataFrame): Unit = {
    val paths = scanPaths(df)
    assert(paths.exists(_.contains(basePath)),
      s"must fall back to the base, read: $paths")
  }

  test("exact-key aggregate rewrites to the summary and matches the base") {
    val q = baseDf.groupBy("source", "lang")
      .agg(sum("n_chars").as("chars"), count(lit(1)).as("docs"))
      .orderBy("source", "lang")
    assertReadsSummary(q)
    // ground truth computed WITHOUT the rewrite (unregistered copy)
    val truth = spark.read.parquet(summaryPath)
      .groupBy("source", "lang")
      .agg(sum("n_chars").as("chars"), sum("cnt").as("docs"))
      .orderBy("source", "lang")
    assert(q.collect().toSeq == truth.collect().toSeq)
  }

  test("coarser grain + key filter rewrite; filter pushed to the summary scan") {
    val q = baseDf.filter(col("lang") =!= "l0").groupBy("source")
      .agg(count(lit(1)).as("docs")).orderBy("source")
    assertReadsSummary(q)
    val expected = baseDf.filter(col("lang") =!= "l0").collect()
      .groupBy(_.getString(0)).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      == expected)
  }

  test("global (ungrouped) count rewrites; empty filter gives 0 not null") {
    val q = baseDf.agg(count(lit(1)).as("docs"))
    assertReadsSummary(q)
    assert(q.collect().head.getLong(0) == 10000L)
    val empty = baseDf.filter(col("lang") === "nope")
      .agg(count(lit(1)).as("docs"))
    assertReadsSummary(empty)
    assert(empty.collect().head.getLong(0) == 0L)
  }

  test("non-key filter, expression key, avg, distinct all fall back to base") {
    assertReadsBase(baseDf.filter(col("n_chars") > 50)
      .groupBy("source").agg(count(lit(1)).as("n")))
    assertReadsBase(baseDf.groupBy(upper(col("source")).as("s"))
      .agg(count(lit(1)).as("n")))
    assertReadsBase(baseDf.groupBy("source")
      .agg(avg("n_chars").as("a")))
    assertReadsBase(baseDf.groupBy("source")
      .agg(countDistinct("lang").as("n")))
    // and the fallbacks still answer correctly
    val n = baseDf.filter(col("n_chars") > 50).groupBy("source")
      .agg(count(lit(1)).as("n")).agg(sum("n")).collect().head.getLong(0)
    assert(n == spark.read.parquet(basePath)
      .filter(col("n_chars") > 50).count())
  }

  test("unregistered tables are never touched") {
    val other = tempDir("other")
    spark.range(100).selectExpr("concat('s', pmod(id, 2)) AS source",
      "id AS n_chars").write.mode("overwrite").parquet(other)
    val q = spark.read.parquet(other).groupBy("source")
      .agg(sum("n_chars").as("chars"))
    assert(scanPaths(q).exists(_.contains(other)))
  }

  test("register rejects a mis-built summary loudly (missing key, non-LONG partial)") {
    val base = tempDir("valbase")
    spark.range(100).selectExpr("concat('s', pmod(id, 2)) AS source",
      "id AS n_chars").write.mode("overwrite").parquet(base)
    val noKey = tempDir("valnokey")
    spark.read.parquet(base).groupBy("source")
      .agg(sum("n_chars").as("n_chars"), count(lit(1)).as("cnt"))
      .drop("source").write.mode("overwrite").parquet(noKey)
    val e1 = intercept[IllegalArgumentException](
      Projections.register(spark, base, noKey,
        keys = Seq("source"), measures = Seq("n_chars")))
    assert(e1.getMessage.contains("missing key column"))
    val badType = tempDir("valbadtype")
    spark.read.parquet(base).groupBy("source")
      .agg(sum("n_chars").cast("double").as("n_chars"),
        count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(badType)
    val e2 = intercept[IllegalArgumentException](
      Projections.register(spark, base, badType,
        keys = Seq("source"), measures = Seq("n_chars")))
    assert(e2.getMessage.contains("must be"))
  }

  test("a GROUP-BY-only key with a drifted summary type falls back to the base") {
    val base = tempDir("driftbase")
    spark.range(1000).selectExpr("pmod(id, 4) AS k", "(id % 7) AS m")
      .write.mode("overwrite").parquet(base)
    // summary whose key column drifted to STRING: register passes the
    // shape check (key present, partials LONG) but the rewrite's type
    // guard must bail — including when the key appears ONLY in the
    // GROUP BY, never in the select list
    val drifted = tempDir("driftsum")
    spark.read.parquet(base).groupBy(col("k").cast("string").as("k"))
      .agg(sum(col("m")).as("m"), count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(drifted)
    Projections.register(spark, base, drifted,
      keys = Seq("k"), measures = Seq("m"))
    try {
      spark.read.parquet(base).createOrReplaceTempView("drift_base")
      val q = spark.sql("SELECT sum(m) AS s FROM drift_base GROUP BY k")
      val paths = scanPaths(q)
      assert(paths.exists(_.contains(base)),
        s"must fall back to the base, read: $paths")
      assert(!paths.exists(_.contains(drifted)),
        s"must not read the drifted summary, read: $paths")
      assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
        spark.read.parquet(base).groupBy("k").agg(sum("m"))
          .collect().map(_.getLong(1)).sorted.toSeq)
    } finally Projections.unregister(base)
  }
}
