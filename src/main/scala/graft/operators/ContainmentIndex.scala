package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Gram-partitioned persistent home for continuous containment dedupe —
  * the [[LshIndex]] posture applied to [[Dedup.selfContainmentPairs]]:
  * arriving documents probe YEARS of history for doc-inside-doc matches
  * without rescanning the corpus, because the touched-gram predicate
  * moves from the shuffle into the parquet scan.
  *
  *  - `postings/` — one `(__id, __g)` row per (document, distinct gram)
  *    partitioned by `(__batch_id, __pp)` with `__pp = pmod(__g,
  *    numBuckets)`. Every posting of a gram lives in that gram's own
  *    partition, so a probe that collects the batch's distinct `__pp`
  *    prefixes (≤ numBuckets longs, one tiny job) reads ALL postings of
  *    every batch gram and NOTHING else — which also means the
  *    document frequency of each batch gram computed from the pruned
  *    read is EXACT over old ∪ new, not an approximation. That is what
  *    lets the probe replicate the closed-corpus df ≤ maxDf stop-gram
  *    cut bit-for-bit.
  *  - `docs/` — one `(__id, __sh)` row per document (full sorted gram
  *    array) partitioned by `(__batch_id, __dp)` with `__dp =
  *    pmod(xxhash64(__id), numBuckets)`; the verify read prunes to the
  *    partitions owning candidate ids, then a broadcast semi-join cuts
  *    surviving rows to exactly those ids.
  *
  * Probe semantics are DIRECTIONAL-NEW: emitted pairs are
  * (id_a = arriving doc, id_b = any doc, containment = |A∩B| / |A_kept|
  * ≥ t) — "is this arriving doc contained in something already seen
  * (or in this batch)". The old-in-new direction needs the kept-gram
  * size of every OLD document under the global df, which cannot be
  * priced incrementally (it is a property of grams the batch never
  * touches); run the batch operator for retroactive sweeps. Kept-ness
  * is a property of the GRAM (df ≤ maxDf), so A_kept ∩ B_full =
  * A_kept ∩ B_kept and the emitted ratios equal the batch operator's
  * exactly: `probe(new, index-of-old) ≡ selfContainmentPairs(old ∪ new)
  * restricted to id_a ∈ new` (ContainmentIndexSpec asserts it).
  *
  * Candidate generation keeps the directional prefix filter: the df of
  * every batch gram is already on hand, so only each arriving doc's
  * rarest |A| − ⌈t·|A|⌉ + 1 kept grams join the postings — candidates
  * stay O(prefix · maxDf), bounded by the BATCH size, never the corpus.
  *
  * `__batch_id` is the outer partition level for the [[LshIndex]]
  * replay contract: dynamic partition overwrite makes an at-least-once
  * replay rewrite its own partitions in place, and probe-side
  * `(__id, __g)` / `(__id)` collapses make a batch that sits in BOTH
  * the new frame and the index count once. */
object ContainmentIndex {

  val BatchCol = "__batch_id"
  val PostPart = "__pp"
  val DocPart = "__dp"

  private def postingsPath(root: String) = s"$root/postings"
  private def docsPath(root: String) = s"$root/docs"
  private def metaFile(root: String) =
    new Path(s"$root/_containment_index_meta.json")

  private def fileSystem(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  def exists(spark: SparkSession, root: String): Boolean =
    fileSystem(spark, root).exists(new Path(postingsPath(root)))

  private def pp(g: Column, n: Int): Column = pmod(g, lit(n.toLong))
  private def dp(id: Column, n: Int): Column =
    pmod(xxhash64(id), lit(n.toLong))

  private[operators] def readMeta(spark: SparkSession,
      root: String): (Int, Int) = {
    val fs = fileSystem(spark, root)
    val in = fs.open(metaFile(root))
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    def field(k: String): Int =
      (""""""" + k + """"\s*:\s*(\d+)""").r.findFirstMatchIn(txt) match {
        case Some(m) => m.group(1).toInt
        case None => sys.error(s"malformed ${metaFile(root)}: $txt")
      }
    (field("numBuckets"), field("shingleN"))
  }

  private def ensureMeta(spark: SparkSession, root: String, n: Int,
      shingleN: Int): Unit = {
    val fs = fileSystem(spark, root)
    if (fs.exists(metaFile(root))) {
      val (en, es) = readMeta(spark, root)
      require(en == n && es == shingleN,
        s"index at $root has numBuckets=$en/shingleN=$es; appending with " +
          s"$n/$shingleN would break pruning or mix gram spaces")
    } else {
      fs.mkdirs(new Path(root))
      val out = fs.create(metaFile(root), true)
      try out.write(
        s"""{"numBuckets":$n,"shingleN":$shingleN}""".getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** Per-doc distinct hashed-shingle arrays — the one tokenize pass both
    * tables and the probe's new side share. */
  private def shingled(df: DataFrame, textCol: String,
      idCol: String, shingleN: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.repartition(par, col(idCol))
      .select(col(idCol).as("__id"),
        Dedup.hashedShingles(col(textCol), shingleN).as("__sh"))
      .filter(size(col("__sh")) > 0)
  }

  /** Append one batch. Idempotent on `batchId`: dynamic partition
    * overwrite rewrites the batch's own partitions on replay. */
  def append(df: DataFrame, textCol: String, idCol: String, root: String,
      batchId: Long, shingleN: Int = 4, numBuckets: Int = 256): Unit = {
    val spark = df.sparkSession
    ensureMeta(spark, root, numBuckets, shingleN)
    val sh = shingled(df, textCol, idCol, shingleN).localCheckpoint()
    // route rows to their partition BEFORE the write (the d8 summing
    // file discipline): without it every shuffle task writes into every
    // partition dir — numBuckets × parallelism tiny files per batch,
    // and the probe pays the listing/open cost forever after. Routed,
    // each (batch, bucket) dir holds one file
    sh.select(col("__id"), explode(col("__sh")).as("__g"))
      .withColumn(PostPart, pp(col("__g"), numBuckets))
      .withColumn(BatchCol, lit(batchId))
      .repartition(col(PostPart))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol, PostPart)
      .parquet(postingsPath(root))
    sh.select(col("__id"), col("__sh"))
      .withColumn(DocPart, dp(col("__id"), numBuckets))
      .withColumn(BatchCol, lit(batchId))
      .repartition(col(DocPart))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BatchCol, DocPart)
      .parquet(docsPath(root))
  }

  private def prunedPostings(spark: SparkSession, root: String,
      touched: Seq[Long], sinceBatch: Option[Long]): DataFrame = {
    val all = spark.read.parquet(postingsPath(root))
    val horizon = sinceBatch
      .map(b => all.where(col(BatchCol) >= b)).getOrElse(all)
    if (touched.isEmpty) horizon.where(lit(false))
    else horizon.where(col(PostPart).isin(touched: _*))
  }

  private def prunedDocs(spark: SparkSession, root: String,
      touched: Seq[Long], sinceBatch: Option[Long]): DataFrame = {
    val all = spark.read.parquet(docsPath(root))
    val horizon = sinceBatch
      .map(b => all.where(col(BatchCol) >= b)).getOrElse(all)
    if (touched.isEmpty) horizon.where(lit(false))
    else horizon.where(col(DocPart).isin(touched: _*))
  }

  /** Probe arriving documents against the persisted index (plus the
    * batch itself): directional containment pairs
    * (id_a ∈ batch, id_b, containment ≥ threshold). See the object doc
    * for semantics and the equivalence contract. `sinceBatch` applies
    * the dedup-horizon policy on the FIRST partition column — probing a
    * 90-day horizon of a years-deep index reads 90 days of files. */
  def probe(newDocs: DataFrame, textCol: String, idCol: String,
      root: String, threshold: Double = 0.9, maxDf: Int = 64,
      sinceBatch: Option[Long] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0,1]")
    val spark = newDocs.sparkSession
    val (n, shingleN) = readMeta(spark, root)
    val newSh = shingled(newDocs, textCol, idCol, shingleN)
      .localCheckpoint() // two posting derivations + the verify read it
    val newPost = newSh.select(col("__id"), explode(col("__sh")).as("__g"))
    // one tiny job: the batch's touched posting partitions (≤ n longs)
    val touched = newPost.select(pp(col("__g"), n).as("__p")).distinct()
      .collect().map(_.getLong(0)).toSeq
    // every posting of every batch gram lives in a touched partition,
    // so this union carries the EXACT corpus-wide postings of the
    // batch's grams; a replayed batch sits in both sides → collapse
    val allPost = prunedPostings(spark, root, touched, sinceBatch)
      .select(col("__id"), col("__g"))
      .unionByName(newPost).dropDuplicates("__g", "__id")
    val dfc = allPost.groupBy("__g").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf)
    // kept grams of each ARRIVING doc, rarest-first (df is on hand), so
    // the directional prefix filter applies exactly as in the batch
    // operator: only |A| − ⌈t·|A|⌉ + 1 grams per doc join the postings
    val newKept = newPost.join(dfc, "__g")
      .groupBy("__id")
      .agg(array_sort(collect_list(col("__g"))).as("__sha"),
        transform(
          array_sort(collect_list(struct(col("__df"), col("__g")))),
          s => s.getField("__g")).as("__sorted"))
      .localCheckpoint() // candidates + verify both read it
    val prefixes = newKept.select(col("__id"),
      explode(slice(col("__sorted"), lit(1),
        (size(col("__sorted")) -
          ceil(lit(threshold) * size(col("__sorted"))).cast("int") + 1)))
        .as("__g"))
    val candidates = prefixes.as("l")
      .join(allPost.as("r"),
        col("l.__g") === col("r.__g") && col("l.__id") =!= col("r.__id"))
      .select(col("l.__id").as("id_a"), col("r.__id").as("id_b"))
      .distinct()
      .localCheckpoint() // pair ids must be known to plan the doc read
    // verify arrays: batch ids from newSh in memory; history ids from
    // the docs table, partition-pruned then semi-joined to exactly the
    // candidate id_b set
    val touchedDp = candidates.select(dp(col("id_b"), n).as("__p"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val bIds = candidates.select(col("id_b").as("__id")).distinct()
    val oldDocs = prunedDocs(spark, root, touchedDp, sinceBatch)
      .join(broadcast(bIds), Seq("__id"), "left_semi")
      .select(col("__id"), col("__sh"))
    val bSide = newSh.select(col("__id"), col("__sh"))
      .unionByName(oldDocs).dropDuplicates("__id")
    candidates
      .join(newKept.select(col("__id").as("id_a"), col("__sha")), "id_a")
      .join(bSide.select(col("__id").as("id_b"), col("__sh").as("__shb")),
        "id_b")
      .withColumn("containment",
        Dedup.intersectSize(col("__sha"), col("__shb")).cast("double") /
          size(col("__sha")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("containment"))
  }
}
