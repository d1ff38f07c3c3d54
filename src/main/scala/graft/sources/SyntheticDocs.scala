package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, seeded document-corpus inflation for scale
  * rehearsals: the driver's testdata caps at sf0.1 (5k docs / 17 MB),
  * which validates correctness but says nothing about the SCALING
  * CURVE of the dedupe/components pipelines. [[inflate]] turns each
  * document into `factor` variants whose ids, mutation positions and
  * suffixes are pure functions of (doc_id, variant) — no RNG state, so
  * every run (and every engine) generates the byte-identical corpus.
  *
  * Variant structure mirrors a real web crawl's duplication mix:
  * variant 0 is the original; variant 1 mutates ~1/45 of words (above
  * a 0.8-Jaccard LSH threshold on 3-gram shingles → a true near-dup);
  * variants 2-3 mutate ~1/24 and ~1/12 (borderline/below threshold);
  * variants ≥4 mutate ~1/5 (distinct documents sharing topical
  * vocabulary — LSH bucket pressure without pair explosions). Every
  * variant also appends one unique token so no two variants are exact
  * duplicates. All pure codegen'd column work — inflating 100× is a
  * map-only job.
  */
object SyntheticDocs {

  private def mutate(text: Column, id: Column, k: Column): Column = {
    val toks = filter(split(text, "\\s+"), t => length(t) > 0)
    val period = when(k === 1, lit(45L)).when(k === 2, lit(24L))
      .when(k === 3, lit(12L)).otherwise(lit(5L))
    val seed = pmod(xxhash64(id, k), lit(1000000L))
    val mutated = transform(toks, (t, i) =>
      when(pmod(seed + i.cast("long"), period) === 0,
        concat(t, lit("v"), k)).otherwise(t))
    concat(concat_ws(" ", mutated), lit(" zsyn"), id, lit("u"), k)
  }

  /** `factor` deterministic variants per document; ids become
    * `doc_id * factor + k` (disjoint, stable, order-free). */
  def inflate(docs: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val hasNChars = docs.columns.contains("n_chars")
    val out = docs
      .withColumn("__k", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("__text", when(col("__k") === 0, col("text"))
        .otherwise(mutate(col("text"), col("doc_id"), col("__k"))))
      .withColumn("doc_id", col("doc_id") * factor + col("__k"))
      .withColumn("text", col("__text"))
      .drop("__k", "__text")
    if (hasNChars) out.withColumn("n_chars", length(col("text")).cast("long"))
    else out
  }

  /** Embedding-corpus inflation, same determinism contract as
    * [[inflate]]: variant 0 is the original vector; variant k ≥ 1 adds
    * a hash-derived per-component jitter that grows with k — variant 1
    * is a genuine near-duplicate (cosine ≈ 0.999 at unit scale),
    * higher variants drift into distinct-but-clustered vectors, so ANN
    * recall and near-dup pipelines see realistic neighborhood pressure
    * at scale. Map-only column algebra, no RNG state. */
  def inflateEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    emb
      .withColumn("__k", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("embedding", when(col("__k") === 0, col("embedding"))
        .otherwise(transform(col("embedding"), (x, i) =>
          (x + (pmod(xxhash64(col("vec_id"), col("__k"), i.cast("long")),
            lit(1000L)).cast("double") / 1000.0 - 0.5) * 0.02 *
            col("__k").cast("double")).cast("float"))))
      .withColumn("vec_id", col("vec_id") * factor + col("__k"))
      .drop("__k")
  }

  /** Materialize inflated documents + embeddings tables under `outDir`
    * in the same layout the testdata uses, so suite queries run
    * against it unchanged. Returns the inflated document count. */
  def materialize(spark: SparkSession, sfDir: String, outDir: String,
      factor: Int = 10): Long = {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    inflate(docs, factor)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
    inflateEmbeddings(emb, factor)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    spark.read.parquet(s"$outDir/documents.parquet").count()
  }
}
