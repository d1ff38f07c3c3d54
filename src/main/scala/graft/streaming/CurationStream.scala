package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.BatchCompaction
import graft.functions.TextFunctions
import graft.operators.{LshIndex, NgramLm}

/** Streaming quality-filter front door for a training-data pipeline:
  * each arriving micro-batch of documents is language-identified,
  * quality-scored, passed through the Gopher rule bundle, PII-redacted,
  * and split into an accepted and a rejected sink — one call stands up
  * the full text-curation stage over any readStream source.
  *
  * [[curate]] is the BATCH TWIN: a pure `DataFrame => DataFrame` built
  * entirely from codegen'd column expressions
  * ([[graft.functions.TextFunctions]]), so the identical code runs
  * under a static read (the l28 suite entry oracle-checks it against
  * DuckDB) and inside foreachBatch. Rejected rows carry a
  * `reject_reason` so the reject stream doubles as a quality-drift
  * monitor feed.
  *
  * Sink discipline is the same as [[DedupStream]]: foreachBatch is
  * at-least-once, so both sinks are `__batch_id`-partitioned with
  * dynamic partition overwrite — a replayed batch rewrites its own
  * partition in place instead of appending a second copy (the spec
  * replays a batch and asserts both sinks unchanged). Run
  * [[compactSinks]] on a maintenance cadence to bound the partition
  * count.
  *
  * Scale shape: no shuffle at all in the default configuration —
  * scoring is per-row column algebra and the split is two filters of
  * the same enriched frame, so the stage is map-only and scales with
  * input bandwidth (the optional frozen-LM gate adds one narrow
  * (id, bits) exchange — see [[curate]]). (The enriched
  * batch is computed once per sink write; Spark recomputes the lineage
  * per action, which for a map-only stage is cheaper than caching
  * inside a micro-batch — caching there leaks blocks across batches.)
  */
object CurationStream {

  private val BatchCol = LshIndex.BatchCol

  /** Enrich with (lang, quality, gopher signals) + redacted text and
    * mark acceptance: accepted ⇔ gopher pass ∧ quality ≥ minQuality ∧
    * lang ∈ langs (empty `langs` = any language) ∧ LM fluency (when a
    * frozen model is supplied). `reject_reason` names the FIRST failing
    * gate (gopher < quality < lang < perplexity) — one reason per row
    * keeps the reject feed aggregable.
    *
    * `lm` is a [[graft.operators.NgramLm.train]] model (read it from
    * parquet once outside the stream): docs scoring above `maxNllBits`
    * bits/transition are rejected as `perplexity`, the CCNet cut. Docs
    * too short to score (< 2 tokens; null bits) pass the gate — the
    * length rules own that case. The default lm=None path stays
    * map-only; with a model the stage adds one narrow (id, bits)
    * aggregate exchange, still corpus-text-shuffle-free since the
    * vocab-bounded model broadcasts. */
  def curate(docs: DataFrame, textCol: String,
      minQuality: Double = 0.3,
      langs: Set[String] = Set("en"),
      lm: Option[DataFrame] = None,
      maxNllBits: Double = 12.0,
      idCol: String = "doc_id"): DataFrame = {
    val g = TextFunctions.gopherStats(col(textCol))
    val enriched = docs
      .withColumn("lang", TextFunctions.langId(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("n_words", g.getField("n_words"))
      .withColumn("gopher_pass", g.getField("pass"))
      .withColumn("text_redacted", TextFunctions.redactPii(col(textCol)))
    val withLm = lm match {
      case Some(model) => enriched.join(
        NgramLm.score(docs, model, textCol, idCol)
          .select(col(idCol), col("avg_nll_bits")),
        Seq(idCol), "left")
      case None => enriched
        .withColumn("avg_nll_bits", lit(null).cast("double"))
    }
    val langOk =
      if (langs.isEmpty) lit(true) else col("lang").isInCollection(langs)
    withLm
      .withColumn("reject_reason",
        when(!col("gopher_pass"), lit("gopher"))
          .when(col("quality") < minQuality, lit("quality"))
          .when(!langOk, lit("lang"))
          .when(col("avg_nll_bits") > maxNllBits, lit("perplexity"))
          .otherwise(lit(null).cast("string")))
      .withColumn("accepted", col("reject_reason").isNull)
  }

  /** One micro-batch: curate, split, persist both sinks — idempotent
    * on `batchId`. Public so tests (and batch backfills) can drive the
    * exact foreachBatch body. */
  def processBatch(batch: DataFrame, batchId: Long, textCol: String,
      acceptPath: String, rejectPath: String,
      minQuality: Double = 0.3, langs: Set[String] = Set("en"),
      lm: Option[DataFrame] = None, maxNllBits: Double = 12.0): Unit = {
    val curated = curate(batch, textCol, minQuality, langs, lm, maxNllBits)
    def write(df: DataFrame, path: String): Unit =
      df.withColumn(BatchCol, lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BatchCol)
        .parquet(path)
    write(curated.filter(col("accepted"))
      .drop("accepted", "reject_reason", "gopher_pass"), acceptPath)
    write(curated.filter(!col("accepted")).drop("accepted"), rejectPath)
  }

  /** Fold old batch partitions of both sinks — see
    * [[graft.core.BatchCompaction]]. */
  def compactSinks(spark: SparkSession, acceptPath: String,
      rejectPath: String, keepRecent: Int = 2): Unit = {
    BatchCompaction.compact(spark, acceptPath, keepRecent)
    BatchCompaction.compact(spark, rejectPath, keepRecent)
    ()
  }

  def start(docs: DataFrame, textCol: String, acceptPath: String,
      rejectPath: String, checkpointDir: String,
      minQuality: Double = 0.3, langs: Set[String] = Set("en"),
      lm: Option[DataFrame] = None, maxNllBits: Double = 12.0,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds")): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, acceptPath, rejectPath,
          minQuality, langs, lm, maxNllBits)
      }
      .start()
}
