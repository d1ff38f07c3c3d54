package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the full query suite against
  * SPARK_GRAFT_SF_DIR (default sf0.1), fully materializing each result
  * through the noop sink (count() alone lets Catalyst skip most of the
  * work), and prints one JSON line for the driver.
  *
  * Load-robust protocol: each query runs SPARK_GRAFT_BENCH_REPS times
  * (default 3) and reports the per-query MEDIAN — a single co-tenant
  * spike on the box inflates one rep, not the recorded number (round-1
  * recordings were 2.6× off from exactly this).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one warm-up action so JVM/codegen startup isn't billed to query 1
    SparkEntry.queries.headOption.foreach { case (_, fn) =>
      try fn(spark, sfDir).limit(1).collect() catch { case _: Throwable => () }
    }

    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      // operators cache intermediates (LSH tables etc.); drop them so
      // rep N+1 / query N+1 isn't taxed by earlier blocks
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }

    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }

    val only = args.headOption // substring filter for isolated timing
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.contains) }
      .map { case (name, fn) =>
        val times = (1 to reps).map(_ => timeOnce(name, fn))
        val med = median(times)
        System.err.println(f"[bench] $name%-28s median $med%8.2f s  " +
          times.map(t => f"$t%.2f").mkString("(", " ", ")"))
        name -> med
      }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"suite_total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
