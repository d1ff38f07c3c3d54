package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Watermarked exact dedup: in-horizon duplicates drop, distinct texts
  * survive, restarts resume from the checkpointed state store. */
class ExactDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("in-horizon duplicates collapse; distinct texts all survive") {
    val base = java.nio.file.Files.createTempDirectory("graft_xds").toString
    val in = s"$base/in"
    new java.io.File(in).mkdirs()
    def run(): Unit = {
      val docs = spark.readStream.format("csv")
        .schema("ts TIMESTAMP, text STRING").option("sep", "|").load(in)
      val q = ExactDedupStream.start(docs, "text", "ts", "10 minutes",
        s"$base/out", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/a.csv"),
      Seq("2024-01-01T00:00:00|the cat sat",
        "2024-01-01T00:00:10|the cat sat",       // in-batch duplicate
        "2024-01-01T00:00:20|a different doc").mkString("\n"))
    run()
    // second delivery: one cross-batch in-horizon duplicate + one new
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/b.csv"),
      Seq("2024-01-01T00:01:00|the cat sat",     // dup vs batch 1 state
        "2024-01-01T00:01:10|yet another doc").mkString("\n"))
    run()
    val out = spark.read.parquet(s"$base/out")
      .select("text").as[String].collect().toSeq
    assert(out.sorted == Seq("a different doc", "the cat sat",
      "yet another doc"), s"got $out")
    // only content hashes entered the state store; text column survives
    assert(spark.read.parquet(s"$base/out").columns.toSet ==
      Set("ts", "text"))
  }
}
