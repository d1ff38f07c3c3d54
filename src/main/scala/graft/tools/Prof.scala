package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

import graft.core.{GraftSession, Tables}
import graft.operators.Dedup

/** Stage-level profiler for the heavy operators: prints per-stage task
  * time so slow spots are measured instead of guessed.
  * Usage: runMain graft.tools.Prof SF_DIR [l2|l4|...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = args.drop(1).headOption.getOrElse("l2")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.taskMetrics.executorRunTime
        println(f"[stage ${si.stageId}%3d] tasks=${si.numTasks}%4d " +
          f"taskTime=${ms / 1000.0}%8.2f s  ${si.name.take(80)}")
      }
    })

    def run(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"== $label rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val docs = Tables.load(spark, sfDir, "documents")
    what match {
      case "l2sig" =>
        // signature stage only
        run("signatures") {
          import org.apache.spark.sql.functions._
          val par = spark.sparkContext.defaultParallelism
          val sh = docs.repartition(par, col("doc_id"))
            .select(col("doc_id").as("__id"),
              array_distinct(Dedup.shingles(col("text"), 3)).as("__sh"))
          val exploded = sh.select(col("__id"), explode(col("__sh")).as("__s"))
          val minAggs = (0 until 64).map(i =>
            min(xxhash64(lit(i), col("__s"))).as(s"__m$i"))
          exploded.groupBy(col("__id")).agg(minAggs.head, minAggs.tail: _*)
        }
      case "l2" =>
        run("minhashCandidates")(
          Dedup.minhashCandidates(docs, "text", "doc_id"))
      case "l4" =>
        run("ngramJaccard")(
          Dedup.ngramJaccardPairs(docs, "text", "doc_id", "source", 2))
      case "l2plan" =>
        Dedup.minhashCandidates(docs, "text", "doc_id").explain("formatted")
      case _ => sys.error(s"unknown: $what")
    }
    spark.stop()
  }
}
