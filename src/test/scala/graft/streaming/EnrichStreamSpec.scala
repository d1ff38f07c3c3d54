package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stream-stream interval join: matches equal the batch interval join
  * over the same out-of-order deliveries, each emitted exactly once. */
class EnrichStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String, prefix: String,
      rows: Seq[(Long, Long, Long)]): Unit =
    rows.map { case (id, k, sec) =>
      (id, k, new java.sql.Timestamp(sec * 1000L))
    }.toDF(s"${prefix}_id", s"${prefix}_key", s"${prefix}_ts")
      .coalesce(1).write.mode("append").parquet(dir)

  test("stream matches equal the batch interval join, exactly once") {
    val base = java.nio.file.Files.createTempDirectory("graft_enr").toString
    new java.io.File(s"$base/alerts").mkdirs()
    new java.io.File(s"$base/ctx").mkdirs()

    val t0 = 1700000000L
    // alerts (left) and context (right); context qualifies when it
    // lands within [alert - 60 s, alert]
    val alerts1 = Seq[(Long, Long, Long)](
      (100L, 1L, t0 + 100), (101L, 2L, t0 + 100))
    val ctx1 = Seq[(Long, Long, Long)](
      (200L, 1L, t0 + 80),   // in window for alert 100
      (201L, 1L, t0 + 30),   // 70 s before: outside
      (202L, 2L, t0 + 100))  // boundary: inclusive
    // second delivery arrives out of order but inside the watermark
    val alerts2 = Seq[(Long, Long, Long)]((102L, 1L, t0 + 130))
    val ctx2 = Seq[(Long, Long, Long)](
      (203L, 1L, t0 + 90),   // late context: matches alerts 100 AND 102
      (204L, 3L, t0 + 500))  // advances the right watermark
    val alerts3 = Seq[(Long, Long, Long)]((999L, 9L, t0 + 1000))

    def run(): Unit = {
      def src(dir: String, prefix: String) = spark.readStream
        .schema(s"${prefix}_id LONG, ${prefix}_key LONG, ${prefix}_ts TIMESTAMP")
        .parquet(dir)
      val q = EnrichStream.start(
        src(s"$base/alerts", "a"), "a_key", "a_ts",
        src(s"$base/ctx", "c"), "c_key", "c_ts",
        gapSec = 60L, watermarkDelay = "60 seconds",
        s"$base/out", s"$base/ckpt")
      q.awaitTermination(120000)
    }

    writeBatch(s"$base/alerts", "a", alerts1)
    writeBatch(s"$base/ctx", "c", ctx1)
    run()
    writeBatch(s"$base/alerts", "a", alerts2)
    writeBatch(s"$base/ctx", "c", ctx2)
    run()
    writeBatch(s"$base/alerts", "a", alerts3)
    run()

    val got = spark.read.parquet(s"$base/out")
      .select("a_id", "c_id").as[(Long, Long)].collect().sorted.toSeq

    val allA = (alerts1 ++ alerts2 ++ alerts3)
      .map { case (id, k, s) => (id, k, s) }.toDF("a_id", "a_key", "a_s")
    val allC = (ctx1 ++ ctx2)
      .map { case (id, k, s) => (id, k, s) }.toDF("c_id", "c_key", "c_s")
    val twin = allA.join(allC,
        col("a_key") === col("c_key") &&
          col("c_s") >= col("a_s") - 60L && col("c_s") <= col("a_s"))
      .select("a_id", "c_id").as[(Long, Long)].collect().sorted.toSeq

    assert(got == twin, s"stream $got != batch $twin")
    assert(got.distinct == got, "no duplicate emissions")
    assert(got.contains((100L, 203L)) && got.contains((102L, 203L)),
      "late context joined every qualifying alert")
  }
}
