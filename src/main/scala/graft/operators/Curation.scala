package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-curation operators for training-data pipelines: deterministic
  * sampling, per-group quotas, sequence-length binning, and batch
  * sessionization. All shapes are chosen for the 100 TB posture:
  * sampling is a pure map-side filter (no shuffle, no RNG state),
  * quota capping pre-reduces skewed groups behind a salt before the
  * authoritative per-group sort, and sessionization is one shuffle by
  * key. The streaming twin of [[sessionize]] lives in
  * [[graft.streaming.Sessionize]].
  */
object Curation {

  /** Deterministic, id-stable sample: keep a row iff the seeded 64-bit
    * hash of `key` lands in the first `fraction` of the hash space.
    * Unlike `df.sample` this is reproducible across runs, partitionings
    * and cluster sizes, and the same key always makes the same cut —
    * the property training pipelines need so re-runs and incremental
    * builds select the same corpus slice. Pure codegen'd filter;
    * pushes down past column pruning like any other predicate. */
  def hashSample(df: DataFrame, key: Column, fraction: Double,
      seed: Long = 0L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val buckets = 1000000L
    df.filter(pmod(xxhash64(lit(seed), key), lit(buckets)) <
      lit((fraction * buckets).toLong))
  }

  /** The cut point for [[hashSamplePortable]]: first `fraction` of the
    * 60-bit md5-prefix space. Computed once in Scala so an external
    * engine replaying the sample embeds the identical literal instead of
    * re-deriving it with its own float→int cast rules. */
  def portableCut(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    (fraction * (1L << 60).toDouble).toLong
  }

  /** Engine-portable deterministic sample: keep a row iff the first 15
    * hex digits of `md5(seed || ':' || key)` — a 60-bit integer — fall
    * below [[portableCut]].
    *
    * Same reproducibility contract as [[hashSample]], with one more
    * property: every warehouse engine has md5 + hex→int, so the exact
    * row set is replayable outside Spark (DuckDB
    * `('0x' || substr(md5(...), 1, 15))::BIGINT`, Trino
    * `from_base(substr(to_hex(md5(...)), 1, 15), 16)`) — the audit story
    * for "which corpus slice trained this model" doesn't require a Spark
    * cluster. Costs an md5 per row vs xxhash64's few ns, so default to
    * [[hashSample]] inside Spark-only pipelines and to this one when the
    * sample manifest must be cross-checkable. Null keys are dropped
    * (null hash fails the cut), matching SQL filter semantics. Still a
    * pure codegen'd map-side filter — no shuffle, no RNG state. */
  def hashSamplePortable(df: DataFrame, key: Column, fraction: Double,
      seed: Long = 0L): DataFrame = {
    val h = conv(substring(md5(
      concat(lit(seed.toString), lit(":"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")
    df.filter(h < lit(portableCut(fraction)))
  }

  /** Disjoint deterministic split (train/val/test): returns one DataFrame
    * per weight, partitioning the key-hash space proportionally. Every
    * row lands in exactly one split, stable under re-runs. */
  def hashSplit(df: DataFrame, key: Column, weights: Seq[Double],
      seed: Long = 0L): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0))
    val total = weights.sum
    val buckets = 1000000L
    val cuts = weights.scanLeft(0.0)(_ + _).map(w => (w / total * buckets).toLong)
    val h = pmod(xxhash64(lit(seed), key), lit(buckets))
    cuts.sliding(2).map { case Seq(lo, hi) =>
      df.filter(h >= lit(lo) && h < lit(hi))
    }.toSeq
  }

  /** Corpus snapshot diff — the release-to-release audit every dataset
    * version bump ships: which documents were added, removed, changed
    * (same id, different content), or carried unchanged. One
    * full-outer join on id over (id, content-hash) pairs — text never
    * shuffles, and the hash only mediates equality (statuses are the
    * output), so any engine replays the diff by its own comparison.
    * Output: (id, status ∈ added|removed|changed|unchanged). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), xxhash64(col(textCol)).as("__ho"))
    val n = newDf.select(col(idCol), xxhash64(col(textCol)).as("__hn"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ho").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__ho") === col("__hn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Phrase (collocation) mining — the word2vec phrase-detection score
    * (Mikolov et al. 2013, "Distributed Representations of Words and
    * Phrases…" §4): adjacent token pairs scored
    * (count(ab) − δ)·N / (count(a)·count(b)); high scorers are
    * phrases worth merging into single tokens before embedding
    * training ("new york" → "new_york"). δ discounts rare pairs.
    *
    * Exactness: all counts are map-side-combined LONGs and the score
    * is one integer-numerator division — deterministic, so the top-k
    * replays in SQL. Output: (a, b, pair_count, score) — top `k` by
    * (score desc, a, b).
    *
    * Scale shape: two count aggregations (bigram, unigram) whose
    * shuffles carry (token(s), count); unigram counts join the bigram
    * table twice by token — broadcast when the vocabulary fits,
    * shuffle-hash otherwise, either way never the corpus. Top-k is a
    * TakeOrdered, not a global sort. */
  def minePhrases(df: DataFrame, textCol: String, minCount: Long = 5L,
      delta: Long = 5L, k: Int = 50): DataFrame = {
    import graft.functions.TextFunctions
    // cached fork: the token arrays feed the bigram AND unigram counts
    // (uncached, the corpus tokenizes once per branch); lifetime is the
    // session cache registry, cleared per query by Bench/Verify
    val toks = df.select(TextFunctions.tokens(col(textCol)).as("__t"))
      .cache()
    val bigrams = toks
      .select(explode(when(size(col("__t")) < 2,
          array().cast("array<struct<a:string,b:string>>"))
        .otherwise(transform(sequence(lit(0), size(col("__t")) - 2),
          i => struct(element_at(col("__t"), i + 1).as("a"),
            element_at(col("__t"), i + 2).as("b"))))).as("__p"))
      .select(col("__p.a").as("a"), col("__p.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    val uni = toks.select(explode(col("__t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("__c"))
      .cache()
    // N rides a broadcast 1-row crossJoin (the drift-totals pattern) —
    // no separate driver job, one plan end to end
    val total = uni.agg(sum(col("__c")).as("__n"))
    bigrams
      .join(uni.select(col("tok").as("a"), col("__c").as("__ca")), Seq("a"))
      .join(uni.select(col("tok").as("b"), col("__c").as("__cb")), Seq("b"))
      .crossJoin(broadcast(total))
      .withColumn("score",
        ((col("pair_count") - lit(delta)) * col("__n")).cast("double") /
          (col("__ca") * col("__cb")))
      .select(col("a"), col("b"), col("pair_count"), col("score"))
      .orderBy(col("score").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Sentence-boundary chunking — the RAG/embedding variant of
    * [[chunkDocuments]]: split on sentence enders and group CONSECUTIVE
    * sentences into chunks by token budget, so no chunk cuts a
    * sentence mid-thought. A sentence opens a new chunk when the
    * running pre-sentence token count crosses the budget
    * (chunk = ⌊tokens-before / maxTokens⌋), so a chunk may exceed the
    * budget by at most its last sentence — the standard trade against
    * splitting mid-sentence. Splitting is RE2-safe (ender-marking
    * replace, no lookbehind), so the exact chunking replays in SQL.
    *
    * Output: (id, chunk_id, chunk_text, n_tokens, n_sentences).
    * Scale shape: explode to sentences, one per-doc window cumsum, one
    * reassembly groupBy — a single doc-keyed shuffle; only sentence
    * rows move. */
  def chunkBySentences(df: DataFrame, textCol: String, idCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, "maxTokens >= 1")
    val marked = regexp_replace(col(textCol), "([.!?])\\s+", "$1\n")
    val sents = df.select(col(idCol),
        posexplode(split(marked, "\n")).as(Seq("__sno", "__sent")))
      .filter(trim(col("__sent")) =!= "")
      .withColumn("__n",
        size(graft.functions.TextFunctions.tokens(col("__sent"))).cast("long"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__sno"))
    sents
      .withColumn("__cumb", coalesce(sum(col("__n"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("chunk_id", floor(col("__cumb") / lit(maxTokens)).cast("int"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__sno"), col("__sent")))),
          s => s.getField("__sent")), " ").as("chunk_text"),
        sum(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_sentences"))
  }

  /** Leakage-safe train/val/test assignment: the split unit is the
    * near-duplicate CLUSTER (connected component of `pairs`), not the
    * document — so near-duplicates can never straddle a train/eval
    * boundary (the contamination mechanism Lee et al. 2022 §6 measure:
    * test-set twins in training data inflate eval scores). Documents in
    * no pair are their own singleton cluster. Returns `df` plus
    * (cluster, split) columns; assignment draws the portable md5 hash
    * of the CLUSTER id against proportional cuts, so given the pair
    * list the whole assignment — closure included — replays in SQL and
    * is stable under re-runs, repartitioning, and corpus appends that
    * don't touch the cluster.
    *
    * Scale shape: [[Dedup.components]]' O(log n) star rounds over the
    * pair list, one left join back to the corpus, then a map-side
    * hash-and-case — no extra shuffle beyond the closure itself. */
  def leakageSafeSplit(df: DataFrame, pairs: DataFrame, idCol: String,
      weights: Seq[Double], names: Seq[String],
      seed: Long = 7L): DataFrame = {
    require(weights.length == names.length && weights.forall(_ > 0)
      && names.nonEmpty, "one positive weight per split name")
    val total = weights.sum
    val cuts = weights.scanLeft(0.0)(_ + _).map(c => portableCut(c / total))
    val comp = Dedup.components(pairs)
    val withCluster = df
      .join(comp.select(col("id").as(idCol), col("component")),
        Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("component"), col(idCol)))
      .drop("component")
    val h = conv(substring(md5(concat(lit(seed.toString), lit(":"),
      col("cluster").cast("string"))), 1, 15), 16, 10).cast("long")
    val split = cuts.zip(cuts.tail).zip(names)
      .foldLeft(lit(null).cast("string")) {
        case (acc, ((lo, hi), name)) =>
          when(h >= lit(lo) && h < lit(hi), lit(name)).otherwise(acc)
      }
    withCluster.withColumn("split", split)
  }

  /** Keep at most `k` rows per group (lowest `orderCol` first) — the
    * per-domain quota cap of web-corpus curation.
    *
    * Scale shape: a single `row_number` window over a skewed group (one
    * domain = 40% of the corpus) cannot be split by AQE, so the cap runs
    * in two phases: phase 1 ranks within (group, salt) — `salts`-way
    * parallel even for one giant group — and keeps ≤ k rows per salt;
    * phase 2 ranks the ≤ k×salts survivors per group. The global top-k
    * by `orderCol` is a subset of the union of per-salt top-k, so the
    * result is exact; the heavy shuffle is the salted balanced one. */
  def quotaPerGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
      k: Int, salts: Int = 8): DataFrame = {
    val gcols = groupCols.map(col)
    // salt must spread ties in orderCol (a coarse quality score would
    // otherwise hash every tied row to ONE salt and resurrect the
    // single-partition skew this two-phase pass exists to avoid), and it
    // must be DETERMINISTIC per row: a nondeterministic salt (e.g. from
    // monotonically_increasing_id) is recomputed differently when a
    // fetch failure retries a map stage, so reducers that already
    // fetched see a row in one salt group while the retried partition
    // emits it in another — rows drop or double-keep across attempts
    // (the SPARK-23207 hazard class). Hashing the FULL row is both:
    // distinct rows scatter across salts regardless of orderCol ties,
    // and the assignment is a pure function of row content. Exact
    // duplicate rows do co-locate on one salt — phase 1 still caps that
    // group at k per salt, so the skew bound degrades only for a group
    // made of >k·salts copies of ONE identical row, which phase 2's
    // ≤ k·salts input bound tolerates by construction.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salts.toLong)))
    val w1 = Window.partitionBy(gcols :+ col("__salt"): _*).orderBy(col(orderCol))
    val pre = salted.withColumn("__rn", row_number().over(w1))
      .filter(col("__rn") <= k).drop("__rn", "__salt")
    val w2 = Window.partitionBy(gcols: _*).orderBy(col(orderCol))
    pre.withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Exact global top-k heavy hitters over a key of UNBOUNDED
    * cardinality — top tokens / n-grams / URLs of a web-scale corpus —
    * without ever shuffling the full key space.
    *
    * The one-shuffle `groupBy(key).count().orderBy.limit(k)` form moves
    * every distinct key through the exchange; at 100 TB the token/URL
    * key space is billions of mostly-once strings and the shuffle IS
    * the job. Here pass 1 runs a Misra–Gries summary per partition
    * (`width` counters, classic frequent-items sketch — Misra & Gries
    * 1982) so only ≤ width candidate keys per partition leave the
    * executors; pass 2 recounts ONLY the candidate keys exactly (the
    * broadcast candidate set filters map-side, so the exchange carries
    * candidate keys alone, map-side pre-aggregated).
    *
    * Exactness: MG with `width` counters keeps every key whose
    * partition frequency exceeds n_p/(width+1); summing over partitions,
    * every key with GLOBAL count > N/(width+1) is a candidate. The
    * returned `certified` column says whether that bound PROVES the
    * result (k rows returned and the k-th count clears N/(width+1) — no
    * non-candidate could displace a returned row); size `width` ≥ N/f_k
    * to certify. Counts are exact either way (recount, not sketch
    * estimates). Null keys are ignored. Ties at the cut break by key
    * ascending, so the result is deterministic.
    *
    * `mapPartitions` is deliberate: the per-partition counter table is
    * genuinely imperative state with data-dependent eviction — the
    * carve-out the Dataset API exists for. Driver work is bounded by
    * the ≤ width × partitions summary rows (cached; candidate set
    * broadcasts). */
  def heavyHitters(df: DataFrame, key: Column, k: Int,
      width: Int = 4096): DataFrame = {
    require(k > 0 && width > k, "need width > k > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(key.cast("string").as("k"))
      .filter(col("k").isNotNull).as[String]
    // pass 1: per-partition MG survivors + one (null, n_p) size row —
    // corpus size rides the same pass instead of a third scan
    val summary = keys.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      var np = 0L
      it.foreach { s =>
        np += 1L
        val cur = counts.getOrElse(s, 0L)
        if (cur > 0L || counts.size < width) counts.update(s, cur + 1L)
        else {
          // over capacity: decrement every counter, evict zeros
          // (amortized O(1) per arrival — each decrement is charged
          // against a previous increment)
          counts.mapValuesInPlace((_, v) => v - 1L)
          counts.filterInPlace((_, v) => v > 0L)
        }
      }
      Iterator.single((null: String, np)) ++ counts.keysIterator.map((_, 0L))
    }.toDF("k", "np").cache()
    val n = summary.filter(col("k").isNull)
      .agg(coalesce(sum("np"), lit(0L)).as("n")).as[Long].head()
    val candidates = summary.filter(col("k").isNotNull).select("k").distinct()
    val topk = keys.toDF("k")
      .join(broadcast(candidates), Seq("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("k"))
      .limit(k)
    // certificate over the ≤ k returned rows (integer arithmetic: the
    // k-th count must strictly clear N/(width+1))
    val w = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    topk.withColumn("certified",
      count(lit(1)).over(w) === k &&
        min(col("cnt")).over(w) * (width + 1) > n)
  }

  /** Per-source "data card" — the governance summary a corpus release
    * ships (docs, token/char mass, language mix, mean quality,
    * exact-duplicate rate), one row per source. All masses accumulate
    * as exact LONGs (quality in its native micro-units, language via
    * an en-indicator count) and each output ratio is a single final
    * division — order-free, engine-replayable.
    *
    * Scale shape: one map-side-combined aggregation over the corpus
    * for every metric except the duplicate rate, which needs distinct
    * text hashes per source — a two-level (source, hash) → source
    * aggregation whose first level collapses duplicates map-side, so
    * the second shuffle carries one row per distinct text. Text never
    * shuffles; the card is #sources rows. */
  def dataCard(df: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    import graft.functions.TextFunctions
    val base = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col(textCol)).cast("long"))
          .as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"),
        sum((TextFunctions.langId(col(textCol)) === "en").cast("long"))
          .as("__n_en"),
        sum(round(TextFunctions.qualityScore(col(textCol)) * 1e6)
          .cast("long")).as("__q_micro"))
    val distinctTexts = df
      .select(col(groupCol), xxhash64(col(textCol)).as("__h"))
      .groupBy(col(groupCol), col("__h"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n_distinct"))
    base.join(distinctTexts, Seq(groupCol))
      .select(col(groupCol), col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("n_tokens").cast("double") / col("n_docs")).as("mean_tokens"),
        (col("__n_en").cast("double") / col("n_docs")).as("english_frac"),
        (col("__q_micro").cast("double") / lit(1e6) / col("n_docs"))
          .as("mean_quality"),
        (lit(1.0) - col("__n_distinct").cast("double") / col("n_docs"))
          .as("dup_rate"))
  }

  /** T5-style span corruption (Raffel et al. 2020, JMLR §3.1.4): mask
    * contiguous token spans with numbered sentinels and emit the
    * (corrupted input, target) pair a denoising objective trains on —
    * `"the <extra_id_0> sat on"` / `"<extra_id_0> cat"`.
    *
    * Span placement is PORTABLE pseudo-randomness (the engine-wide
    * md5 trick, seeded per (seed, doc, position)): a position opens a
    * span with probability density/spanLen, the span covers the next
    * `spanLen` tokens, and overlapping spans merge — so the masked
    * fraction approaches `density` and the whole draw replays in any
    * engine, run-to-run identical (reproducible training data by
    * construction). Sentinels number left to right from 0; documents
    * with nothing masked emit an empty target.
    *
    * Scale shape: explode to (doc, pos, token), one hash per position
    * map-side, then per-doc window functions (span widening = a
    * rows-between max, run starts = lag, sentinel ids = running sum)
    * over a single doc-keyed shuffle, and one groupBy to reassemble —
    * no state grows with document count, and only (doc, pos, token)
    * rows move. */
  def spanCorrupt(df: DataFrame, textCol: String, idCol: String,
      density: Double = 0.15, spanLen: Int = 3,
      seed: Long = 7L): DataFrame = {
    import graft.functions.TextFunctions
    require(density > 0 && density < 1, "density in (0,1)")
    require(spanLen >= 1, "spanLen >= 1")
    val cut = portableCut(density / spanLen)
    val toks = df.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val hashed = toks.withColumn("__u",
        conv(substring(md5(concat_ws(":", lit(seed), col(idCol),
          col("__pos"))), 1, 15), 16, 10).cast("long"))
      .withColumn("__start", (col("__u") < lit(cut)).cast("int"))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val wSpan = wDoc.rowsBetween(-(spanLen - 1), 0)
    val runs = hashed
      .withColumn("__m", max(col("__start")).over(wSpan) === 1)
      .withColumn("__rs",
        col("__m") && !coalesce(lag(col("__m"), 1).over(wDoc), lit(false)))
      .withColumn("__sid",
        sum(col("__rs").cast("int"))
          .over(wDoc.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    def assemble(pieces: DataFrame, out: String): DataFrame =
      pieces.groupBy(col(idCol)).agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__piece")))),
          s => s.getField("__piece")), " ").as(out))
    val inputs = assemble(runs.filter(!col("__m") || col("__rs"))
      .select(col(idCol), col("__pos"),
        when(col("__rs"),
          concat(lit("<extra_id_"), col("__sid"), lit(">")))
          .otherwise(col("__tok")).as("__piece")), "corrupted")
    val targets = assemble(runs.filter(col("__m"))
      .select(col(idCol), col("__pos"),
        when(col("__rs"),
          concat(lit("<extra_id_"), col("__sid"), lit("> "), col("__tok")))
          .otherwise(col("__tok")).as("__piece")), "target")
    df.select(col(idCol))
      .join(inputs, Seq(idCol), "left")
      .join(targets, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("corrupted"), lit("")).as("corrupted"),
        coalesce(col("target"), lit("")).as("target"))
  }

  /** Temperature-scaled mixture weights for corpus re-balancing (the
    * multilingual-sampling scheme of e.g. mBERT/XLM-R: raise per-source
    * token mass to `temperature` ∈ (0,1] and renormalize, so small
    * sources are up-weighted without letting any source dominate), plus
    * the per-source keep-rate that hits a global `tokenBudget`.
    *
    * Returns one row per source: (group, n_tokens, weight, rate) with
    * weight = n^T / Σ n^T and rate = min(1, budget·weight / n). Feed
    * `rate` into [[mixSources]] for the actual (shuffle-free) filter
    * pass. Scale shape: one agg to per-source counts (map-side
    * combined), then a window over the per-source rows — cardinality =
    * #sources, negligible by construction. */
  def mixtureWeights(df: DataFrame, groupCol: String, tokenCount: Column,
      temperature: Double, tokenBudget: Long): DataFrame = {
    require(temperature > 0 && temperature <= 1, "temperature in (0,1]")
    val counts = df.groupBy(col(groupCol))
      .agg(sum(tokenCount).cast("double").as("n_tokens"))
    val w = counts.withColumn("__tw", pow(col("n_tokens"), lit(temperature)))
      .withColumn("weight", col("__tw") / sum(col("__tw")).over(Window.partitionBy()))
    w.select(col(groupCol), col("n_tokens").cast("long").as("n_tokens"),
      col("weight"),
      least(lit(1.0), lit(tokenBudget.toDouble) * col("weight") / col("n_tokens"))
        .as("rate"))
  }

  /** Length-grouped batch assembly — the dynamic-batching step a
    * training loader runs so padding doesn't burn FLOPs: order
    * documents by (token count, id) within each group and assign
    * consecutive fixed-size batches; a batch of near-equal lengths
    * pads to its max with minimal waste (the "sorted batching" /
    * bucketed-batch trick every serious trainer ships). Deterministic:
    * the (len, id) order is total, so batch membership replays
    * anywhere.
    *
    * Returns the input plus `batch_id` (0-based within each group).
    * Scale shape: one window sort per group — groups parallelize, ONE
    * group is a single sorted partition, so group by an
    * [[epochShuffle]] shard at corpus scale (the same contract as
    * [[quantileBand]]); the waste audit downstream is a
    * map-side-combined aggregate over (group, batch). */
  def lengthBatches(df: DataFrame, tokensCol: String, idCol: String,
      batchSize: Int, groupCols: Seq[String] = Nil): DataFrame = {
    require(batchSize > 0, "batchSize must be > 0")
    val w0 = if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    val w = w0.orderBy(col(tokensCol).asc, col(idCol).asc)
    // (rn - rn mod b)/b: the division is over an exact multiple, so
    // the IEEE quotient is the true integer — a plain rn/b double
    // division can round UP across an integer boundary at 2^50-row
    // groups and mis-batch one row
    val rn = row_number().over(w) - 1
    df.withColumn("batch_id",
      ((rn - pmod(rn, lit(batchSize))) / batchSize).cast("long"))
  }

  /** Exact integer apportionment of a token budget across sources —
    * the auditable twin of [[mixtureWeights]]' float rates: when the
    * training recipe says "exactly `budget` tokens, split
    * proportionally", the per-source quotas must be integers that SUM
    * EXACTLY to the budget, reproducible in any engine. This is the
    * largest-remainder (Hamilton) method: base quota
    * ⌊budget·nᵢ/N⌋ per source, then the `budget − Σ base` leftover
    * seats go to the largest remainders (ties → source asc).
    *
    * All arithmetic is exact: products ride decimal(38,0) (budget·nᵢ
    * must stay under 10³⁸ — any real budget/corpus does by orders of
    * magnitude), the floor is computed as (p − p mod N)/N so no
    * decimal-division rounding can off-by-one a quota, and remainders
    * compare as exact decimals. Scale shape: one map-side-combined
    * aggregate to #sources rows, then window work over that
    * vocabulary-sized frame — negligible by construction. */
  def apportionTokens(df: DataFrame, groupCol: String,
      tokenCount: Column, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    val dec = "decimal(38,0)"
    val counts = df.groupBy(col(groupCol))
      .agg(sum(tokenCount).cast(dec).as("__n"))
    val all = Window.partitionBy()
    // NB: Spark resolves column names case-insensitively by default,
    // so the total must NOT be spelled "__N" next to "__n"
    val withTot = counts.withColumn("__tot", sum(col("__n")).over(all))
    val prod = lit(budget).cast(dec) * col("__n")
    val rem = prod % col("__tot")
    val base = ((prod - rem) / col("__tot")).cast("long")
    val ranked = withTot
      .withColumn("__base", base)
      .withColumn("__rem", rem)
      .withColumn("__left", lit(budget) - sum(col("__base")).over(all))
      .withColumn("__rk", row_number().over(
        all.orderBy(col("__rem").desc, col(groupCol).asc)))
    ranked.select(col(groupCol),
      col("__n").cast("long").as("n_tokens"),
      (col("__base") +
        when(col("__rk") <= col("__left"), lit(1L)).otherwise(lit(0L)))
        .as("quota"))
  }

  /** Weighted source mixing: keep each group at the given sampling rate
    * (missing groups keep everything). The per-group cut is the same
    * deterministic keyed hash as [[hashSample]], so a mix is stable
    * under re-runs and incremental appends — re-weighting a 100 TB
    * corpus is a metadata change plus one filter pass, no shuffle. */
  def mixSources(df: DataFrame, groupCol: String, key: Column,
      rates: Map[String, Double], seed: Long = 0L): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0))
    val buckets = 1000000L
    val h = pmod(xxhash64(lit(seed), key), lit(buckets))
    val cut = rates.foldLeft(lit(buckets): Column) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit((r * buckets).toLong)).otherwise(acc)
    }
    df.filter(h < cut)
  }

  /** Deterministic epoch shuffle + sharding — the last step of a
    * curation pipeline before training: scatter the corpus into
    * `numShards` shards and give every row a stable 0-based position
    * within its shard, both pure functions of (seed, key). A new epoch
    * is a new seed — a full reshuffle with zero state; re-running any
    * epoch reproduces it bit-for-bit on any cluster layout.
    *
    * The shuffle key is the same portable md5 construction as
    * [[hashSamplePortable]] (`md5(seed || ':' || key)`), so the exact
    * shard assignment and order are replayable in any engine with md5 —
    * the "which examples, in which order, trained step N" audit needs
    * no Spark cluster. Shard = first 32 hash bits mod `numShards`;
    * order within shard = the full hash (key as tie-break for the
    * astronomically-unlikely collision).
    *
    * Scale shape: ONE shuffle, partitioned by shard, plus a per-shard
    * sort — exactly the physical layout a shard writer needs
    * (`partitionBy(shard)`, one sorted file per shard); position is a
    * row_number over that same clustering, so no second exchange. Shard
    * count is the parallelism unit: pick numShards ≈ total size /
    * target shard file size. */
  def epochShuffle(df: DataFrame, key: Column, numShards: Int,
      seed: Long = 0L): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val h = md5(concat(lit(seed.toString), lit(":"), key.cast("string")))
    val shard = pmod(conv(substring(h, 1, 8), 16, 10).cast("long"),
      lit(numShards.toLong)).cast("int")
    val w = Window.partitionBy(col("__shard")).orderBy(col("__h"), key)
    df.withColumn("__h", h).withColumn("__shard", shard)
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1)
      .withColumnRenamed("__shard", "shard").drop("__h")
  }

  /** Fractional-epoch upsampling — the replication step of a data-mix
    * recipe (e.g. "wiki ×2.3, books ×1.7, web ×1.0"): each document in
    * a source weighted `e` epochs is emitted `floor(e)` times in full,
    * and one extra time for a deterministic `e - floor(e)` slice of the
    * source, chosen by the portable md5 cut of [[hashSamplePortable]]
    * so ANY engine can replay which ids got the extra copy. Sources
    * absent from `epochs` default to `defaultEpochs` (1.0 = pass
    * through unchanged; 0.0 = drop). An epoch weight of 0.4 therefore
    * means "a deterministic 40% sample", and 2.0 means "exactly two
    * copies" — the semantics published LLM data recipes use.
    *
    * Output: the input columns plus `copy_no` (0-based replica index),
    * so downstream shuffles ([[epochShuffle]] keyed on (id, copy_no))
    * interleave the replicas instead of clustering them.
    *
    * Scale shape: pure per-row column algebra — a literal-map lookup,
    * one md5, and an explode of a ≤⌈e⌉-element sequence; no shuffle,
    * no UDF, no RNG state. Output size is the recipe's intrinsic
    * Σ n_source·e_source; the explode IS the upsampling. Cut points
    * are computed once in Scala ([[portableCut]]) and embedded as
    * literals, so no float→int cast subtlety leaks into the plan. */
  def epochUpsample(df: DataFrame, idCol: Column, sourceCol: String,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      seed: Long = 0L): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0),
      "epoch weights must be >= 0")
    def full(e: Double): Long = math.floor(e).toLong
    def cut(e: Double): Long = portableCut(e - math.floor(e))
    val fullCol = epochs.foldLeft(lit(full(defaultEpochs))) {
      case (acc, (src, e)) =>
        when(col(sourceCol) === lit(src), lit(full(e))).otherwise(acc)
    }
    val cutCol = epochs.foldLeft(lit(cut(defaultEpochs))) {
      case (acc, (src, e)) =>
        when(col(sourceCol) === lit(src), lit(cut(e))).otherwise(acc)
    }
    val h = conv(substring(md5(
      concat(lit(seed.toString), lit(":"), idCol.cast("string"))), 1, 15),
      16, 10).cast("long")
    val nCopies = fullCol + when(h < cutCol, 1L).otherwise(0L)
    df.withColumn("__nc", nCopies)
      .filter(col("__nc") > 0)
      .withColumn("copy_no",
        explode(sequence(lit(0L), col("__nc") - 1)))
      .drop("__nc")
  }

  /** Token-window chunking — the pre-embedding step of a retrieval /
    * ANN pipeline: split each document into chunks of `chunkTokens`
    * whitespace tokens, consecutive chunks overlapping by `overlap`
    * tokens so no semantic span is cut without context. Chunk ids are
    * (doc, 0-based index), deterministic, so embedding jobs and
    * [[IvfIndex]] appends are replayable per chunk.
    *
    * Output: (`idCol`, chunk_idx, chunk_text, n_tokens). Documents with
    * no tokens produce no chunks; a document shorter than one chunk
    * produces exactly one.
    *
    * Scale shape: pure per-row column algebra (split → slice windows →
    * posexplode) — no shuffle, no UDF; the explode multiplies rows by
    * ~len/stride, which is the output's intrinsic size. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
      chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val toks = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    // ceil((size - overlap) / stride) starts, at least 1 for any tokens
    // (floor of the int-column `/` — which is true division — is exact
    // here: token counts sit far inside double precision)
    val n = greatest(lit(1), floor(
      (size(col("__toks")) - overlap + stride - 1) / stride).cast("int"))
    df.select(col(idCol), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), n - 1),
          i => slice(col("__toks"), i * stride + 1, lit(chunkTokens))))
        .as(Seq("chunk_idx", "__chunk")))
      .select(col(idCol), col("chunk_idx"),
        array_join(col("__chunk"), " ").as("chunk_text"),
        size(col("__chunk")).as("n_tokens"))
  }

  /** Token-length bucket index for sequence-length binning (packing
    * batches of similar length): bucket i ⇔ tokenCount < boundaries(i),
    * else boundaries.size. Boundaries must be ascending. */
  def lengthBucket(text: Column, boundaries: Seq[Int]): Column = {
    require(boundaries == boundaries.sorted, "boundaries must be ascending")
    val n = graft.functions.TextFunctions.tokenCount(text)
    boundaries.zipWithIndex.foldRight(lit(boundaries.size): Column) {
      case ((b, i), acc) => when(n < b, lit(i)).otherwise(acc)
    }
  }

  /** Greedy contiguous sequence packing: assign documents (ordered by
    * `orderCol` within each group) to fixed-token-budget training bins —
    * a new pack starts when the exclusive running token total crosses a
    * budget multiple, so packs fill to ≥ budget only on the document
    * that overflows them (the standard contiguous-fill approximation;
    * optimal packing is sequential and not worth a distributed exact
    * pass). One window shuffle per group set; at scale, group by a
    * corpus shard so packs never span shards. */
  def packSequences(df: DataFrame, tokensCol: String, orderCol: String,
      budget: Int, groupCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0)
    val w0 = if (groupCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(groupCols.map(col): _*)
    val w = w0.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("pack_id",
        floor((sum(col(tokensCol)).over(w) - col(tokensCol)) /
          budget).cast("long"))
  }

  /** Per-stratum quantile band filter — keep rows whose score sits
    * between the `loQ` and `hiQ` quantiles of their stratum (cut the
    * gibberish tail AND the boilerplate head of a quality distribution,
    * per source). Membership is decided on `percent_rank` =
    * (rank−1)/(n−1), a pure integer-derived ratio with one IEEE
    * division — every engine computes the identical value, so the band
    * is exact and replayable (no interpolated-percentile boundary to
    * disagree about). Ties share a rank and land on the same side of
    * the cut together.
    *
    * Scale shape: one window per stratum — strata parallelize, but ONE
    * stratum's ranking is a single sorted partition, so this is the
    * exact path for per-source bands (thousands of sources, each
    * comfortably sortable); for a single 100 TB stratum use
    * [[quantileBandApprox]], which trades the exact rank for a
    * two-pass approx-percentile boundary at fixed memory. */
  def quantileBand(df: DataFrame, strataCols: Seq[String], scoreCol: Column,
      loQ: Double, hiQ: Double): DataFrame = {
    require(loQ >= 0 && loQ <= hiQ && hiQ <= 1, "need 0 <= loQ <= hiQ <= 1")
    val w0 = if (strataCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(strataCols.map(col): _*)
    df.withColumn("__pr", percent_rank().over(w0.orderBy(scoreCol)))
      .filter(col("__pr") >= loQ && col("__pr") <= hiQ)
      .drop("__pr")
  }

  /** Fixed-memory approximate twin of [[quantileBand]]: per-stratum
    * `approx_percentile` boundaries (one map-side-combined aggregate,
    * no global sort), broadcast back, inclusive filter. At `accuracy`
    * a the rank error is ≤ 1/a of the stratum — the shape that holds
    * when one stratum is the whole corpus. */
  def quantileBandApprox(df: DataFrame, strataCols: Seq[String],
      scoreCol: Column, loQ: Double, hiQ: Double,
      accuracy: Int = 10000): DataFrame = {
    require(loQ >= 0 && loQ <= hiQ && hiQ <= 1, "need 0 <= loQ <= hiQ <= 1")
    val bounds =
      (if (strataCols.isEmpty) df.groupBy() else df.groupBy(strataCols.map(col): _*))
        .agg(approx_percentile(scoreCol, array(lit(loQ), lit(hiQ)),
          lit(accuracy)).as("__qb"))
    val joined = if (strataCols.isEmpty) df.crossJoin(broadcast(bounds))
      else df.join(broadcast(bounds), strataCols)
    joined
      .filter(scoreCol >= element_at(col("__qb"), 1) &&
        scoreCol <= element_at(col("__qb"), 2))
      .drop("__qb")
  }

  /** Within-document repeated-line removal (the Dolma/RefinedWeb
    * cleanup step): keep the FIRST occurrence of every distinct line,
    * preserve order, drop the rest — boilerplate navigation/footer
    * lines repeated inside one page die here, cross-document dedup is
    * [[Dedup]]'s job. Pure per-row column algebra: no shuffle, no UDF.
    *
    * First occurrences resolve by sort, not scan: (line, index) pairs
    * sort lexicographically, a run's head (the minimum index of its
    * line) survives an adjacent-difference filter, and survivors
    * re-sort by index to restore document order — O(L log L) per doc.
    * The round-4 `array_position == own index` test was O(L²) per row:
    * fine for web pages, a single-task stall on a pathological
    * million-line document (a dumped log, a concatenated corpus file);
    * CurationPropertySpec pins a 50k-line doc to the fast path and the
    * sort path's equivalence to the quadratic definition. */
  def dedupLinesWithinDoc(df: DataFrame, textCol: String): DataFrame = {
    // let-bind the split: higher-order fns run without CSE, so an
    // unbound `lines` inside the lambda re-splits per element
    def letBind(value: Column)(body: Column => Column): Column =
      element_at(transform(array(value), body), 1)
    val kept = letBind(split(col(textCol), "\n")) { lines =>
      letBind(array_sort(transform(lines,
          (x, i) => struct(x.as("x"), i.as("i"))))) { sorted =>
        array_join(
          transform(
            array_sort(transform(
              // keep a (line, idx) pair iff it heads its run of equal
              // lines — within a run the sort put the smallest idx
              // first, so the head IS the first occurrence
              filter(sorted, (s, j) => j === 0 ||
                element_at(sorted, j).getField("x") =!= s.getField("x")),
              // flip to (idx, line) so the re-sort restores doc order
              s => struct(s.getField("i").as("i"), s.getField("x").as("x")))),
            s => s.getField("x")),
          "\n")
      }
    }
    df.withColumn(textCol, kept)
  }

  /** Corpus drift between two snapshots: unigram Jensen–Shannon
    * divergence in bits, the standard freshness/shift monitor for a
    * training-data pipeline (0 = identical distributions, 1 = disjoint
    * vocabularies). Per-term contributions use only EXACT integer
    * ratios inside the log — p/m = 2·cₐ·T_b / (cₐ·T_b + c_b·Tₐ) — and
    * land in micro-bit longs before the sum (the same fixed-point
    * discipline as [[NgramLm]]), so the result is bit-reproducible
    * across engines, partitionings and re-runs.
    *
    * Output: one row (js_bits, n_terms, total_a, total_b).
    *
    * Scale shape: two map-side-combined unigram aggregates, one
    * term-keyed full-outer join, totals broadcast back — nothing
    * corpus-sized ever shuffles except (term, count) pairs. */
  def unigramDrift(a: DataFrame, b: DataFrame,
      textCol: String = "text"): DataFrame =
    unigramDriftVsCounts(a, unigramCounts(b, textCol), textCol)

  /** The (term, n) unigram table for [[unigramDriftVsCounts]] —
    * compute the reference snapshot's counts ONCE, persist, and reuse
    * across monitor ticks / stream batches instead of re-scanning the
    * reference corpus per comparison. */
  def unigramCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))

  /** [[unigramDrift]] against a precomputed reference unigram table —
    * the streaming/monitoring shape (frozen reference, moving corpus).
    *
    * Degenerate input, stated plainly: if either side has ZERO tokens
    * (empty frame, or all-blank text), its total is 0 and `js_bits`
    * comes back NULL — there is no distribution to compare, and no
    * value in [0, 1] would be honest. Callers alerting on `js_bits`
    * must either null-guard or skip the comparison up front
    * ([[graft.streaming.DriftStream.processBatch]] skips). */
  def unigramDriftVsCounts(a: DataFrame, refCounts: DataFrame,
      textCol: String = "text"): DataFrame = {
    val joined = unigramCounts(a, textCol)
      .select(col("term").as("__t"), col("n").as("__ca"))
      .join(refCounts.select(col("term").as("__t"), col("n").as("__cb")),
        Seq("__t"), "full_outer")
      .na.fill(0L, Seq("__ca", "__cb"))
    val totals = joined.agg(sum(col("__ca")).as("__ta"),
      sum(col("__cb")).as("__tb"))
    val withT = joined.crossJoin(broadcast(totals))
    def side(c: Column, t: Column, oc: Column, ot: Column): Column = {
      // Σ c·round(1e6·log2(2·c·T_other / (c·T_other + c_other·T_own)))
      val ratio = lit(2d) * c.cast("double") * ot.cast("double") /
        (c.cast("double") * ot.cast("double") +
          oc.cast("double") * t.cast("double"))
      // the ot > 0 guard keeps the degenerate empty-side case (T_other
      // = 0 → 0/0) out of the codegen'd division, which THROWS under
      // ANSI mode rather than yielding NULL; the final select turns a
      // zero total into a NULL js_bits explicitly
      sum(when(c > 0 && ot > 0,
          c * round(log2(ratio) * 1000000).cast("long"))
        .otherwise(lit(0L)))
    }
    withT
      .agg(
        side(col("__ca"), col("__ta"), col("__cb"), col("__tb")).as("__sa"),
        side(col("__cb"), col("__tb"), col("__ca"), col("__ta")).as("__sb"),
        count(lit(1)).as("n_terms"),
        first(col("__ta")).as("total_a"), first(col("__tb")).as("total_b"))
      .select(
        when(col("total_a") > 0 && col("total_b") > 0,
          round((col("__sa").cast("double") / col("total_a") +
            col("__sb").cast("double") / col("total_b")) / 2d / 1000000d, 6))
          .as("js_bits"),
        col("n_terms"), col("total_a"), col("total_b"))
  }

  /** Batch sessionization (gaps-and-islands): assigns a per-key
    * `session_seq` (1-based) that increments whenever the gap to the
    * previous event exceeds `gapSeconds`. Gap arithmetic is on
    * whole-second epochs (ClickHouse `dateDiff` truncation semantics,
    * SURVEY.md §2 F). The lag → running-sum dependency chains two Window
    * nodes, but they share clustering: one shuffle by key, one sort. */
  def sessionize(df: DataFrame, keyCols: Seq[String], tsCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val s = unix_timestamp(col(tsCol))
    df.withColumn("__new",
        when(lag(s, 1).over(w).isNull || s - lag(s, 1).over(w) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** Structural validation of chat-format (SFT / instruction) rows —
    * the screen every instruction-tuning pipeline runs before a
    * single token is trained on: each row's `jsonCol` must parse as a
    * `[{role, content}, …]` conversation with known roles, non-empty
    * contents, an optional leading system turn followed by strictly
    * alternating user/assistant, ending on assistant. Returns the
    * input plus a `chat_status` column — "ok" or the FIRST violation
    * in a fixed precedence (parse_error > bad_role > empty_content >
    * bad_turn_order > bad_end), so a row never reports a downstream
    * symptom of an upstream defect.
    *
    * Map-only: one from_json parse per row (null on malformed — the
    * parse_error signal), then array-lambda checks over the roles;
    * nothing shuffles. Deterministic and SQL-replayable (the l89
    * oracle walks the same checks with DuckDB's JSON functions). */
  def validateChat(df: DataFrame, jsonCol: String): DataFrame = {
    val msgs = from_json(col(jsonCol),
      org.apache.spark.sql.types.DataTypes.createArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("role",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("content",
            org.apache.spark.sql.types.StringType)))))
    def letBind(value: Column)(body: Column => Column): Column =
      element_at(transform(array(value), body), 1)
    val status = letBind(msgs) { m =>
      letBind(transform(m, x => x.getField("role"))) { roles =>
        // strip one leading system turn, then demand user/assistant
        // alternation from user — covers assistant-starts, doubled
        // turns, and stray system turns in one check. Sequential
        // when-guards (never && / element_at on a possibly-empty
        // array): CaseWhen conditions evaluate lazily in order, so
        // ANSI mode can't throw on the empty-conversation row
        letBind(when(size(roles) === 0, roles)
          .when(element_at(roles, 1) === "system",
            slice(roles, lit(2), greatest(size(roles) - 1, lit(0))))
          .otherwise(roles)) { turns =>
          when(m.isNull, "parse_error")
            .when(exists(m, x => coalesce(
              !x.getField("role").isin("system", "user", "assistant"),
              lit(true))), "bad_role")
            .when(exists(m, x => coalesce(x.getField("content") === "",
              lit(true))), "empty_content")
            .when(!forall(transform(turns, (r, i) =>
              r === when(pmod(i, lit(2)) === 0, "user")
                .otherwise("assistant")), c => c), "bad_turn_order")
            .when(size(m) === 0, "bad_end")
            .when(element_at(roles, size(roles)) =!= "assistant", "bad_end")
            .otherwise("ok")
        }
      }
    }
    df.withColumn("chat_status", status)
  }

  /** Zipf-law fit over the corpus token-frequency curve — a
    * one-number naturalness probe for a training corpus (natural
    * language sits near slope −1 in log-rank/log-frequency space;
    * boilerplate-heavy or templated corpora bend away from it; cf.
    * the frequency diagnostics in Gopher-style curation, Rae et al.
    * 2021). Returns one row
    * (n_ranks, total_tokens, slope, intercept) with the least-squares
    * line fitted through (ln rank, ln freq) of the top `topRanks`
    * terms.
    *
    * Exactness: each point is micro-rounded to LONGs —
    * (round(10⁶·ln r), round(10⁶·ln f)) — and the fit reuses
    * [[Stats.linFit]]'s exact long moments, so slope/intercept replay
    * to the digit. Units: ln·10⁻⁶, which CANCEL in the slope (it is
    * dimensionless); the intercept is reported in micro-ln units.
    *
    * At 100 TB: term counts map-side combine; the top-R cut is a
    * distributed TakeOrdered (orderBy+limit — never a global window
    * over the vocabulary); ranks are then assigned on R rows. Ties
    * on frequency break by term string, so ranks are deterministic.
    */
  /** Multi-turn conversation assembly from a message/event log — the
    * SFT-data shape every instruction-tuning pipeline builds before
    * [[validateChat]] screens it: group by `sessionCol`, order turns
    * by (tsCol, orderCol) INSIDE each group's collected array (an
    * array_sort, never a global sort), cap at `maxTurns` (the
    * long-session guard: a runaway bot session cannot blow up a
    * group), and emit per-conversation statistics plus an
    * engine-replayable content fingerprint:
    * (session, n_turns, n_turns_kept, n_tokens, alternation_ok,
    * first_role, last_role, convo_md5).
    *
    * One shuffle on the session key; every derived value is exact
    * integers, array folds in fixed order, or md5 — so the whole
    * assembly replays in SQL (list_sort + list_transform + md5).
    * `orderCol` must be unique per row (the deterministic tie-break
    * under equal timestamps). */
  def assembleConversations(df: DataFrame, sessionCol: String,
      tsCol: String, orderCol: String, roleCol: String, textCol: String,
      maxTurns: Int = 512): DataFrame = {
    require(maxTurns >= 1, "maxTurns must be positive")
    val grouped = df.groupBy(col(sessionCol).as("session"))
      .agg(count(lit(1)).as("n_turns"),
        array_sort(collect_list(struct(
          col(tsCol).as("ts"), col(orderCol).as("o"),
          col(roleCol).as("role"), col(textCol).as("text"))))
          .as("__turns"))
      .withColumn("__kept", slice(col("__turns"), 1, maxTurns))
    val kept = col("__kept")
    val sameAdjacent = size(filter(
      transform(sequence(lit(2), size(kept)), i =>
        element_at(kept, i).getField("role") ===
          element_at(kept, i - 1).getField("role")),
      x => x))
    grouped.select(
      col("session"), col("n_turns"),
      size(kept).cast("long").as("n_turns_kept"),
      aggregate(kept, lit(0L), (acc, t) =>
        acc + size(graft.functions.TextFunctions.tokens(
          t.getField("text"))).cast("long")).as("n_tokens"),
      when(size(kept) < 2, lit(true))
        .otherwise(sameAdjacent === 0).as("alternation_ok"),
      element_at(kept, 1).getField("role").as("first_role"),
      element_at(kept, size(kept)).getField("role").as("last_role"),
      md5(concat_ws("\u0001", transform(kept, t =>
        concat(t.getField("role"), lit("|"), t.getField("text")))))
        .as("convo_md5"))
  }

  /** Context-window truncation audit — the decision
    * [[assembleConversations]] feeds: under the keep-LATEST-suffix
    * policy (drop oldest turns first, the standard chat-SFT cut), how
    * much of each conversation survives a `contextTokens` budget? Per
    * session: total turns/tokens, the turns and tokens of the longest
    * suffix of (ts, orderCol)-ordered turns whose token sum fits the
    * budget, the tokens lost, and a truncated flag. A latest turn that
    * ALONE overflows the budget keeps zero turns — the audit reports
    * it honestly instead of silently clipping inside a turn.
    *
    * Scale shape: one token count per turn map-side, one window
    * cumulative sum per session (descending recency — turns
    * co-locate by the session shuffle, nothing global), one aggregate
    * back to the session key. */
  def truncationAudit(df: DataFrame, sessionCol: String, tsCol: String,
      orderCol: String, textCol: String,
      contextTokens: Long): DataFrame = {
    require(contextTokens >= 1L, "contextTokens must be positive")
    import graft.functions.TextFunctions
    val turns = df.select(col(sessionCol).as("session"), col(tsCol),
        col(orderCol),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__tok"))
      .withColumn("__cum", sum("__tok").over(
        Window.partitionBy(col("session"))
          .orderBy(col(tsCol).desc, col(orderCol).desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__keep", col("__cum") <= lit(contextTokens))
    turns.groupBy("session")
      .agg(count(lit(1)).as("n_turns"), sum("__tok").as("n_tokens"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_turns_kept"),
        sum(when(col("__keep"), col("__tok")).otherwise(0L))
          .as("n_tokens_kept"))
      .select(col("session"), col("n_turns"), col("n_tokens"),
        col("n_turns_kept"), col("n_tokens_kept"),
        (col("n_tokens") - col("n_tokens_kept")).as("tokens_lost"),
        (col("n_turns_kept") < col("n_turns")).as("truncated"))
  }

  /** Repetition value — the data-constrained-scaling audit of an
    * UN-deduplicated source (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models": repeated tokens decay in value
    * with effective-repetition constant R* ≈ 15.4; the published
    * fit). Treats each source's raw corpus as its effective (deduped)
    * corpus repeated e = tokens_raw / tokens_effective times, and
    * prices it: value = U·(1 + R*·(1 − exp(−(e−1)/R*))) capped at the
    * raw count (an epoch fraction below 1 is worth exactly what it
    * is), efficiency = value / tokens_raw. "Training on this source
    * without dedup buys you data worth only X of its size."
    *
    * Input: the [[graft.operators.Dedup.effectiveTokenCensus]] frame.
    * Map-only column algebra over the #sources-sized census — the
    * corpus itself is never touched again. */
  def repetitionValue(census: DataFrame,
      rStar: Double = 15.4): DataFrame = {
    val u = col("tokens_effective").cast("double")
    val raw = col("tokens_raw").cast("double")
    val e = raw / u
    val decayed = u * (lit(1.0) + lit(rStar) *
      (lit(1.0) - exp((lit(1.0) - e) / lit(rStar))))
    census.select(col("source"), col("tokens_raw"),
      col("tokens_effective"),
      when(col("tokens_effective") === 0L, lit(0.0))
        .otherwise(round(e, 6)).as("epochs"),
      when(col("tokens_effective") === 0L, lit(0.0))
        .otherwise(round(least(decayed, raw), 6)).as("value_tokens"),
      when(col("tokens_raw") === 0L ||
          col("tokens_effective") === 0L, lit(0.0))
        .otherwise(round(least(decayed, raw) / raw, 6)).as("efficiency"))
  }

  /** Loss-mask construction — the collator contract an SFT trainer
    * actually consumes: per conversation turn, the token SPAN
    * [tok_start, tok_end) it occupies in the (ts, orderCol)-ordered
    * concatenation, and whether the span trains (role ∈ `trainRoles`
    * — typically assistant turns train, user/system turns mask).
    * Emitting spans instead of per-token rows keeps the output
    * turn-sized; the trainer expands them against its own tokenizer
    * offsets.
    *
    * Output: (session, turn_idx 1-based, role, tok_start, tok_end,
    * trainable), whitespace-token units — the same canonical
    * tokenization every operator here uses.
    *
    * Scale shape: one token count per turn map-side, one window pair
    * (row_number + running sum) over the session partition, no join,
    * nothing global. */
  def lossMask(df: DataFrame, sessionCol: String, tsCol: String,
      orderCol: String, roleCol: String, textCol: String,
      trainRoles: Seq[String]): DataFrame = {
    require(trainRoles.nonEmpty, "need at least one trainable role")
    import graft.functions.TextFunctions
    val w = Window.partitionBy(col(sessionCol))
      .orderBy(col(tsCol).asc, col(orderCol).asc)
    df.select(col(sessionCol).as("session"), col(tsCol), col(orderCol),
        col(roleCol).as("role"),
        TextFunctions.tokenCount(col(textCol)).cast("long").as("__tok"))
      .withColumn("turn_idx", row_number().over(w))
      .withColumn("tok_end", sum("__tok").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("session"), col("turn_idx"), col("role"),
        (col("tok_end") - col("__tok")).as("tok_start"), col("tok_end"),
        col("role").isInCollection(trainRoles).as("trainable"))
  }

  /** Fill-in-the-middle transform — the FIM data prep a code-model
    * pipeline runs (Bavarian et al. 2022): split each document at two
    * DETERMINISTIC portable-md5 cut points into (prefix, middle,
    * suffix) and emit the PSM-ordered training text
    * `<PRE> prefix <SUF> suffix <MID> middle`. Cut positions derive
    * from the doc key (two independent md5 draws, sorted), so the
    * manifest (cut_a, cut_b, n_tokens) is the replayable answer key —
    * no RNG to disagree on — and a different `seed` re-cuts the whole
    * corpus. Sentinels are plain tokens here; a trainer maps them to
    * its special ids. Rebuilt text is whitespace-canonical.
    *
    * Map-only: two md5s, one split, three slices per row. */
  def fimTransform(df: DataFrame, idCol: String, textCol: String,
      seed: Long = 0L): DataFrame = {
    import graft.functions.TextFunctions
    def draw(tag: String) = pmod(
      conv(substring(md5(concat(lit(seed.toString), lit(tag),
        col(idCol).cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(1000000L))
    val h1 = draw(":a:"); val h2 = draw(":b:")
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks).cast("long")
    df.select(col(idCol), col(textCol))
      .withColumn("n_tokens", n)
      .withColumn("__h1", h1).withColumn("__h2", h2)
      .withColumn("cut_a",
        expr("(least(__h1, __h2) * n_tokens) div 1000000"))
      .withColumn("cut_b",
        expr("(greatest(__h1, __h2) * n_tokens) div 1000000"))
      .drop("__h1", "__h2")
      .withColumn(textCol, concat_ws(" ",
        concat(array(lit("<PRE>")),
          slice(toks, lit(1), col("cut_a").cast("int")),
          array(lit("<SUF>")),
          slice(toks, col("cut_b").cast("int") + lit(1),
            greatest((n - col("cut_b")).cast("int"), lit(0))),
          array(lit("<MID>")),
          slice(toks, col("cut_a").cast("int") + lit(1),
            greatest((col("cut_b") - col("cut_a")).cast("int"),
              lit(0))))))
  }

  /** Inter-source vocabulary overlap — the mixture-planning view of
    * the corpus: for every unordered pair of sources, the exact
    * token-TYPE Jaccard between their vocabularies (how much would
    * dropping source B lose that source A doesn't already cover?).
    *
    * Scale shape: the corpus reduces to DISTINCT (source, token)
    * pairs in one map-side-combined pass; the pair matrix comes from
    * a self-equi-join ON THE TOKEN (per-token fan-out ≤ sources², a
    * small constant — never doc×doc), and per-source type counts are
    * one more aggregation over the same distinct frame. All exact
    * integers; jaccard is one rounded division. */
  def sourceOverlap(df: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val st = df.select(col(sourceCol).as("__src"),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .as("__tok"))
      .filter(col("__src").isNotNull)
      .distinct()
    val types = st.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
    val a = st.as("a"); val b = st.as("b")
    val common = a.join(b, col("a.__tok") === col("b.__tok") &&
        col("a.__src") < col("b.__src"))
      .groupBy(col("a.__src").as("src_a"), col("b.__src").as("src_b"))
      .agg(count(lit(1)).as("common_types"))
    common
      .join(types.select(col("__src").as("src_a"),
        col("__n").as("types_a")), Seq("src_a"))
      .join(types.select(col("__src").as("src_b"),
        col("__n").as("types_b")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("types_a"),
        col("types_b"), col("common_types"),
        round(col("common_types").cast("double") /
          (col("types_a") + col("types_b") - col("common_types"))
            .cast("double"), 6).as("jaccard"))
  }

  /** Heaps-law vocabulary-growth fit — the corpus-planning companion to
    * [[zipfFit]]: how fast does the vocabulary grow as the corpus
    * grows? Measures distinct token TYPES at `points` nested
    * deterministic corpus prefixes (portable-md5 cuts at fractions
    * 2^-(points-1) … 1, the [[hashSamplePortable]] discipline — each
    * prefix is a subset of the next, so the points are one growth
    * curve, not independent samples), then fits log V = log k +
    * β·log N by least squares over the valid points.
    *
    * Scale shape: ONE pass over the corpus tokens — per-token MINIMUM
    * doc-hash (map-side-combined), then every cut's type count is
    * "tokens whose min-hash clears the cut", a single conditional-sum
    * aggregation; never `points` corpus scans. The fit folds a
    * ≤points-element sorted array in fixed order (exact integer
    * counts, ln/round at the very end), so any engine replays the β.
    * Returns one row per point: (point, docs_n, types_n, beta,
    * log_k) — β ≈ 0.4-0.6 on natural language (Heaps 1978). */
  def heapsFit(df: DataFrame, textCol: String, idCol: String,
      points: Int = 8, seed: Long = 7L): DataFrame = {
    require(points >= 2 && points <= 20, "points must be in [2, 20]")
    val cuts: Seq[Long] = (0 until points)
      .map(k => portableCut(math.pow(2.0, -(points - 1 - k).toDouble)))
    val docs = df.select(col(idCol).cast("string").as("__id"),
        col(textCol).as("__t"))
      .withColumn("__h", conv(substring(md5(concat(lit(seed.toString),
        lit(":"), col("__id"))), 1, 15), 16, 10).cast("long"))
    // per-cut doc counts: one row of `points` conditional sums
    val docSums = cuts.zipWithIndex.map { case (c, i) =>
      sum(when(col("__h") < c, 1L).otherwise(0L)).as(s"d$i")
    }
    val docRow = docs.agg(docSums.head, docSums.tail: _*)
    // per-token min doc-hash → per-cut type counts, same shape
    val typeSums = cuts.zipWithIndex.map { case (c, i) =>
      sum(when(col("__mh") < c, 1L).otherwise(0L)).as(s"t$i")
    }
    val typeRow = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("__t")))
        .as("__tok"), col("__h"))
      .groupBy("__tok").agg(min(col("__h")).as("__mh"))
      .agg(typeSums.head, typeSums.tail: _*)
    val pts = docRow.crossJoin(typeRow).select(
      posexplode(array((0 until points).map(i =>
        struct(col(s"d$i").as("docs_n"), col(s"t$i").as("types_n"))): _*))
        .as(Seq("point", "p")))
      .select(col("point"), col("p.docs_n").as("docs_n"),
        col("p.types_n").as("types_n"))
    // least squares over ln pairs, valid points only, fixed fold order
    val valid = filter(col("__arr"), p =>
      p.getField("docs_n") > 0 && p.getField("types_n") > 0)
    def fold(f: Column => Column) = aggregate(col("__v"), lit(0.0),
      (acc, p) => acc + f(p))
    val x = (p: Column) => log(p.getField("docs_n").cast("double"))
    val y = (p: Column) => log(p.getField("types_n").cast("double"))
    val fit = pts
      .agg(array_sort(collect_list(struct(col("point"), col("docs_n"),
        col("types_n")))).as("__arr"))
      .withColumn("__v", valid)
      .select(size(col("__v")).cast("double").as("__n"),
        fold(x).as("__sx"), fold(y).as("__sy"),
        fold(p => x(p) * x(p)).as("__sxx"),
        fold(p => x(p) * y(p)).as("__sxy"))
      .select(
        round((col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")), 6)
          .as("beta"),
        round((col("__sy") - ((col("__n") * col("__sxy") -
          col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx"))) *
          col("__sx")) / col("__n"), 6).as("log_k"))
    pts.crossJoin(broadcast(fit))
  }

  def zipfFit(df: DataFrame, textCol: String,
      topRanks: Int = 500): DataFrame = {
    val counts = df
      .select(explode(Retrieval.termsOf(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("f"))
    val top = counts.orderBy(col("f").desc, col("term").asc)
      .limit(topRanks)
    val ranked = top.withColumn("r", row_number().over(
      Window.orderBy(col("f").desc, col("term").asc))) // ≤ R rows
    val pts = ranked.select(
      round(lit(1e6) * log(col("r").cast("double"))).cast("long").as("x"),
      round(lit(1e6) * log(col("f").cast("double"))).cast("long").as("y"),
      col("f"), lit("corpus").as("g"))
    val fit = Stats.linFit(pts, col("x"), col("y"), col("g"))
    val tot = pts.agg(sum(col("f")).as("total_tokens"))
    fit.crossJoin(broadcast(tot)).select(col("n").as("n_ranks"),
      col("total_tokens"), col("slope"), col("intercept"))
  }

  /** chrF between paired texts (Popović 2015) — the
    * character-n-gram F-score that complements [[bleu2Pairs]]'s
    * word-level view (robust to tokenization and morphology, the
    * standard second metric an MT/paraphrase eval reports). Char
    * 1..3-grams over the WHITESPACE-STRIPPED texts (chrF's
    * convention), clipped matches exactly as in BLEU, per-order
    * precision AND recall, F_β with β = 2 (recall-weighted), final
    * score = the uniform average over the n orders that have any
    * reference n-gram. Returns (id, chrf3) plus the six exact
    * integer (match, candTotal, refTotal) counts per order.
    *
    * Exactness: every count is an exact long; the F algebra is one
    * fixed double expression over them, rounded to 6. Scale: texts
    * cap at `maxChars` before gram explosion (bounded per-row work),
    * and only (pair, gram, count) rows cross the co-partitioned
    * shuffles — the [[bleu2Pairs]] shape with three orders fused in
    * one explode (gram strings carry their order prefix, so one
    * groupBy serves all three). */
  def chrFPairs(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxChars: Int = 500): DataFrame = {
    val beta2 = 4.0 // β = 2
    def stripped(c: Column): Column =
      substring(regexp_replace(c, "\\s+", ""), 1, maxChars)
    // explicit-width repartition before the checkpoint: the gram
    // explosion below is the CPU-heavy stage (3 orders × maxChars
    // grams × both sides per pair), and an AQE-coalesced upstream join
    // would otherwise hand the checkpoint ONE partition to explode on
    val par = graft.core.Par.widthFor(pairs, factor = 64.0)
    val base = pairs.select(col(idCol),
      stripped(col(candCol)).as("__c"), stripped(col(refCol)).as("__r"))
      .repartition(par, col(idCol))
      .localCheckpoint() // both gram passes read one strip+cap
    // all three orders in ONE array: "<n>:<gram>" keys
    def grams(s: String): Column = expr(
      s"""flatten(transform(array(1, 2, 3), n ->
         |  case when length($s) >= n then
         |    transform(sequence(1, length($s) - n + 1),
         |      i -> concat(cast(n as string), ':', substring($s, i, n)))
         |  else array() end))""".stripMargin)
    def counts(side: String, out: String): DataFrame = base
      .select(col(idCol), explode(grams(side)).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as(out))
    val byOrder = counts("__c", "cc")
      .join(counts("__r", "rc"), Seq(idCol, "g"), "full")
      .withColumn("n", substring(col("g"), 1, 1).cast("int"))
      .groupBy(idCol, "n")
      .agg(sum(least(coalesce(col("cc"), lit(0L)),
        coalesce(col("rc"), lit(0L)))).as("m"),
        sum(coalesce(col("cc"), lit(0L))).as("ct"),
        sum(coalesce(col("rc"), lit(0L))).as("rt"))
    // F_β per order (0 when either side has no n-gram), then the
    // uniform average over orders with rt > 0
    val p = col("m").cast("double") / col("ct").cast("double")
    val r = col("m").cast("double") / col("rt").cast("double")
    val fb = when(col("ct") > 0 && col("rt") > 0 && col("m") > 0,
      (lit(1.0) + beta2) * p * r / (lit(beta2) * p + r))
      .otherwise(lit(0.0))
    // micro-round each order's F BEFORE averaging — a 3-addend
    // double sum is still summation-order dependent; longs are not
    val perOrder = byOrder
      .withColumn("__fm", round(lit(1e6) * fb).cast("long"))
    def cnt(n: Int, c: String) =
      sum(when(col("n") === n, col(c))).as(s"$c$n")
    perOrder.groupBy(idCol)
      .agg(round(sum(when(col("rt") > 0, col("__fm"))).cast("double") /
        (sum(when(col("rt") > 0, 1)).cast("double") * lit(1e6)), 6)
        .as("chrf3"),
        cnt(1, "m"), cnt(1, "ct"), cnt(1, "rt"),
        cnt(2, "m"), cnt(2, "ct"), cnt(2, "rt"),
        cnt(3, "m"), cnt(3, "ct"), cnt(3, "rt"))
  }

  /** Corpus-free BLEU-2 between paired texts (candidate vs
    * reference) — the n-gram-overlap eval a distillation or
    * paraphrase-augmentation pipeline runs over (candidate,
    * reference) pairs (Papineni et al. 2002): modified (clipped)
    * unigram and bigram precisions, geometric mean, brevity penalty.
    * Input: one row per pair with the two text columns; output one
    * row per pair — (id, cand_len, ref_len, clip1, tot1, clip2,
    * tot2, bleu2) where clipN/totN are the EXACT integer clipped and
    * total n-gram counts and bleu2 = BP·√(p₁·p₂) rounded to 6
    * (null when the candidate has no bigram).
    *
    * Exactness: the precisions are ratios of exact longs; √ and the
    * BP exponential are one fixed double expression over them (the
    * ksTest precedent). Shapes at 100 TB: n-grams explode to
    * (pair, gram, count) rows — counts, never text, cross the two
    * co-partitioned shuffles (groupBy and the cand→ref left join are
    * all keyed by the pair id + gram). */
  def bleu2Pairs(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame = {
    val base = pairs.select(col(idCol),
      Retrieval.termsOf(col(candCol)).as("__ctk"),
      Retrieval.termsOf(col(refCol)).as("__rtk"))
      .localCheckpoint() // both n-gram passes read one tokenize
    def grams(tk: String, n: Int): Column =
      if (n == 1) col(tk)
      // size guard: sequence(2, 1) would DESCEND, not come back empty
      else expr(s"case when size($tk) >= 2 then " +
        s"transform(sequence(2, size($tk)), " +
        s"i -> concat($tk[i-2], ' ', $tk[i-1])) " +
        "else array() end")
    def clipped(n: Int): DataFrame = {
      val c = base.select(col(idCol), explode(grams("__ctk", n)).as("g"))
        .groupBy(idCol, "g").agg(count(lit(1)).as("cc"))
      val r = base.select(col(idCol), explode(grams("__rtk", n)).as("g"))
        .groupBy(idCol, "g").agg(count(lit(1)).as("rc"))
      c.join(r, Seq(idCol, "g"), "left")
        .groupBy(idCol)
        .agg(sum(least(col("cc"), coalesce(col("rc"), lit(0L))))
          .as(s"clip$n"), sum(col("cc")).as(s"tot$n"))
    }
    val lens = base.select(col(idCol), size(col("__ctk")).as("cand_len"),
      size(col("__rtk")).as("ref_len"))
    val j = lens
      .join(clipped(1), Seq(idCol), "left")
      .join(clipped(2), Seq(idCol), "left")
    val p1 = col("clip1").cast("double") / col("tot1").cast("double")
    val p2 = col("clip2").cast("double") / col("tot2").cast("double")
    val bp = when(col("cand_len") >= col("ref_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("ref_len").cast("double") /
        col("cand_len").cast("double")))
    j.select(col(idCol), col("cand_len"), col("ref_len"),
      coalesce(col("clip1"), lit(0L)).as("clip1"),
      coalesce(col("tot1"), lit(0L)).as("tot1"),
      coalesce(col("clip2"), lit(0L)).as("clip2"),
      coalesce(col("tot2"), lit(0L)).as("tot2"),
      round(when(col("tot1") > 0 && col("tot2") > 0,
        bp * sqrt(p1 * p2)), 6).as("bleu2"))
  }

  // ---- license / provenance screening --------------------------------

  /** Permissive-license allowlist for [[licenseScreen]]'s `license_ok`
    * verdict — the code-corpus inclusion policy every permissively-
    * licensed-code pipeline ships (SPDX identifiers). Public so the
    * oracle and downstream policy tables embed the same literal set. */
  val permissiveLicenses: Seq[String] = Seq(
    "MIT", "Apache-2.0", "BSD-2-Clause", "BSD-3-Clause", "ISC",
    "Unlicense", "CC0-1.0")

  /** License screening for code/document corpora: classify each row by
    * its detected license and flag whether it clears the permissive
    * allowlist. Detection order is deliberate — a machine-readable
    * `SPDX-License-Identifier:` tag wins outright; otherwise the three
    * highest-precision header phrases (MIT grant clause, Apache header,
    * GPL preamble) are tried; anything else is `unknown` (a compliance
    * pipeline treats unknown as NOT ok, which `license_ok` encodes).
    *
    * Scale shape: pure codegen'd per-row regex work — no shuffle, no
    * UDF; the regexes anchor on rare literal substrings so RE2/Java
    * regex both scan in one pass. Adds `license` and `license_ok`. */
  def licenseScreen(df: DataFrame, textCol: String): DataFrame = {
    val spdx = regexp_extract(col(textCol),
      "(?i)spdx-license-identifier:[ \\t]*([A-Za-z0-9.+-]+)", 1)
    val heur =
      when(col(textCol).rlike("(?i)permission is hereby granted, free of charge"), "MIT")
        .when(col(textCol).rlike("(?i)licensed under the apache license"), "Apache-2.0")
        .when(col(textCol).rlike("(?i)gnu general public license"), "GPL-3.0")
    df.withColumn("license",
        when(spdx =!= "", spdx).otherwise(coalesce(heur, lit("unknown"))))
      .withColumn("license_ok",
        col("license").isInCollection(permissiveLicenses))
  }

  /** License contagion over near-duplicate clusters — the governance
    * rule a code-corpus release runs AFTER near-dup detection: if ANY
    * member of a near-dup cluster carries a known copyleft license, a
    * near-identical copy stripped of its header is almost certainly
    * the same work, so the WHOLE cluster inherits the flag. `unknown`
    * licenses never contaminate (absence of evidence is handled by
    * the per-doc `license_ok` gate, not by contagion).
    *
    * Output per doc: (idCol, license, license_ok, component,
    * cluster_size, copyleft_contagion). Scale shape: the license
    * screen is map-only, the candidate path is banded LSH (never
    * all-pairs), components is large-star/small-star O(log n), and
    * the flag fold is one aggregate over cluster keys joined back by
    * an equi-join. */
  def licenseContagion(df: DataFrame, textCol: String, idCol: String,
      minJaccard: Double = 0.8, shingleN: Int = 3, k: Int = 64,
      nBands: Int = 16): DataFrame =
    licenseContagionFromPairs(
      licenseScreen(df, textCol)
        .select(col(idCol), col("license"), col("license_ok")),
      graft.operators.Dedup.minhashCandidates(df, textCol, idCol,
        shingleN, k, nBands).filter(col("jaccard") >= minJaccard),
      idCol)

  /** [[licenseContagion]] from an already-screened flag frame
    * `(idCol, license, license_ok)` and a verified near-dup pair
    * frame `(id_a, id_b, …)` — the seam for an exact similarity join
    * ([[graft.operators.Dedup.prefixJaccardPairs]]) or a pre-built
    * incremental index's edges. Docs in no pair form singleton
    * clusters; their flag is their own. */
  def licenseContagionFromPairs(flags: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val comp = graft.operators.Dedup.components(pairs)
      .withColumnRenamed("id", idCol)
    val withComp = flags.join(comp, Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    val copyleft = col("license") =!= "unknown" && !col("license_ok")
    val clusters = withComp.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"),
        max(when(copyleft, 1L).otherwise(0L)).as("__bad"))
    withComp.join(clusters, Seq("component"))
      .select(col(idCol), col("license"), col("license_ok"),
        col("component"), col("cluster_size"),
        (col("__bad") === 1L).as("copyleft_contagion"))
  }

  /** Prompt-injection screening — the SFT/RAG-data hygiene gate: flag
    * documents carrying instruction-override phrasing ("ignore all
    * previous instructions"), system-prompt exfiltration probes,
    * jailbreak-persona markers, or zero-width-character smuggling
    * (invisible text that survives a copy-paste but steers a model).
    * Patterns are plain alternations — no lookarounds — so the SAME
    * literal regex runs under Java regex here and RE2 in a replaying
    * engine.
    *
    * Output per row: the input columns + `override_instr`, `exfil`,
    * `persona`, booleans; `zero_width` count; `injection_score`
    * (families hit, 0-3); `flagged` (any family, or ≥ `zwThreshold`
    * invisible characters). Pure map-side column algebra — at 100 TB
    * this fuses into the scan. */
  def injectionScreen(df: DataFrame, textCol: String,
      zwThreshold: Int = 3): DataFrame = {
    val t = col(textCol)
    val over = t.rlike("(?i)(ignore|disregard|forget) (all |any )?" +
      "(previous|prior|above|earlier) " +
      "(instructions|prompts|directions|rules)")
    val exfil = t.rlike("(?i)(reveal|print|show|repeat|output) " +
      "(your |the )?(system prompt|hidden instructions|" +
      "initial instructions)")
    val persona = t.rlike("(?i)(you are now|pretend to be|jailbreak|" +
      "dan mode|do anything now)")
    val zw = regexp_count(t,
      lit("[\\x{200B}\\x{200C}\\x{200D}\\x{2060}\\x{FEFF}]"))
    df.withColumn("override_instr", over)
      .withColumn("exfil", exfil)
      .withColumn("persona", persona)
      .withColumn("zero_width", zw.cast("long"))
      .withColumn("injection_score",
        over.cast("long") + exfil.cast("long") + persona.cast("long"))
      .withColumn("flagged",
        col("injection_score") >= 1L ||
          col("zero_width") >= lit(zwThreshold.toLong))
  }

  /** Needle insertion — the long-context eval-data builder (the
    * needle-in-a-haystack shape): plant `needle` into each document at
    * a DETERMINISTIC per-doc depth derived from the portable md5 of
    * the doc key (depth_ppm = hash-prefix mod 1e6, uniform over the
    * doc), splicing between tokens at position
    * floor(depth_ppm · n_tokens / 1e6). The manifest (id, depth_ppm,
    * position, n_tokens) IS the answer key, and any engine re-derives
    * the same placements from the same ids — no RNG to disagree on.
    * The rebuilt text is whitespace-canonical (single spaces), the
    * tokenizer-equivalent form every text operator here consumes.
    *
    * Map-only: one md5, one split, one splice per row. */
  def insertNeedles(df: DataFrame, idCol: String, textCol: String,
      needle: String, seed: Long = 0L): DataFrame = {
    import graft.functions.TextFunctions
    val h = conv(substring(md5(concat(lit(seed.toString), lit(":"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val depth = pmod(h, lit(1000000L))
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks).cast("long")
    df.select(col(idCol), col(textCol))
      .withColumn("depth_ppm", depth)
      .withColumn("n_tokens", n)
      .withColumn("position", expr("(depth_ppm * n_tokens) div 1000000"))
      .withColumn(textCol, concat_ws(" ",
        concat(slice(toks, lit(1), col("position").cast("int")),
          array(lit(needle)),
          slice(toks, col("position").cast("int") + lit(1),
            greatest((n - col("position")).cast("int"), lit(0))))))
  }

  // ---- code-quality filters (StarCoder-style) -------------------------

  /** Per-document code-quality statistics + keep verdict — the
    * StarCoder/StackV2-style structural screen for code corpora: a file
    * with kilobyte-long lines is minified/generated, a file whose mean
    * line is very long is data-not-code, and a file that is mostly
    * non-alphanumeric is binary junk. Emits `n_lines`, `max_line_len`,
    * `avg_line_len`, `alnum_frac`, and `keep` (max ≤ maxLineLen AND
    * avg ≤ maxAvgLineLen AND alnum ≥ minAlnumFrac).
    *
    * Scale shape: one codegen'd pass — split on newline, a single
    * higher-order reduce for the two line stats (the lines array is
    * let-bound so the split runs once), one regex strip for the
    * alphanumeric count. No shuffle, no UDF; at 100 TB this is a pure
    * map stage fused into the scan. */
  def codeFilters(df: DataFrame, textCol: String, idCol: String,
      maxLineLen: Int = 1000, maxAvgLineLen: Int = 100,
      minAlnumFrac: Double = 0.25): DataFrame = {
    def letBind(value: Column)(body: Column => Column): Column =
      element_at(transform(array(value), body), 1)
    val stats = letBind(split(col(textCol), "\n")) { lines =>
      struct(
        size(lines).as("n_lines"),
        array_max(transform(lines, l => length(l))).as("max_line_len"),
        (aggregate(lines, lit(0L), (acc, l) => acc + length(l))
          .cast("double") / size(lines)).as("avg_line_len"))
    }
    val alnum = length(regexp_replace(col(textCol), "[^A-Za-z0-9]", ""))
      .cast("double") / greatest(length(col(textCol)), lit(1)).cast("double")
    df.withColumn("__cs", stats)
      .withColumn("alnum_frac", alnum)
      .select(df.columns.map(col) ++ Seq(
        col("__cs.n_lines").as("n_lines"),
        col("__cs.max_line_len").as("max_line_len"),
        col("__cs.avg_line_len").as("avg_line_len"),
        col("alnum_frac")): _*)
      .withColumn("keep",
        col("max_line_len") <= maxLineLen &&
          col("avg_line_len") <= maxAvgLineLen &&
          col("alnum_frac") >= minAlnumFrac)
  }

  /** Engine-portable twin of [[mixSources]]: materialize a source
    * mixture at fixed per-source rates with the md5 hash-cut of
    * [[hashSamplePortable]]. Each cut is computed once in Scala via
    * [[portableCut]] so any engine replaying the sample embeds the
    * identical integer literal — this is the step that turns
    * [[mixtureWeights]]'s planned `rate` column into the actual
    * training corpus, auditable outside Spark. Sources absent from
    * `rates` fall back to `defaultRate`. Pure map-side filter: the
    * per-source cut is a CASE chain over a small literal map, the hash
    * is one md5 per row, no shuffle. */
  def mixSourcesPortable(df: DataFrame, groupCol: String, key: Column,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      seed: Long = 0L): DataFrame = {
    require((rates.values.toSeq :+ defaultRate)
      .forall(r => r >= 0.0 && r <= 1.0), "rates must be in [0,1]")
    val h = conv(substring(md5(
      concat(lit(seed.toString), lit(":"), key.cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val cut = rates.toSeq.sortBy(_._1).foldLeft(
        lit(portableCut(defaultRate)): Column) { case (acc, (g, r)) =>
      when(col(groupCol) === g, lit(portableCut(r))).otherwise(acc)
    }
    df.filter(h < cut)
  }

  /** Group-level quality gate — domain/source-tier curation (the
    * FineWeb/RefinedWeb move of judging whole hosts, not single
    * documents): aggregate a per-doc score in [0,1] by `groupCol`,
    * classify each group into a tier — `drop` when the group mean
    * score falls below `dropBelow`, `keep` when it reaches `keepAbove`
    * AND the group has at least `minDocs` documents (small groups
    * can't earn a blanket pass), `review` otherwise — then attach the
    * tier and group stats back to every document.
    *
    * All comparisons run in exact micro-units: each score is snapped
    * to round(score·1e6) (exact for scores that are themselves
    * micro-grained, e.g. [[graft.functions.TextFunctions.qualityScore]]),
    * summed as Long, and the group mean is the INTEGER division
    * sum/n — so tier boundaries cannot flip on float rounding in a
    * cross-engine replay.
    *
    * Output: one row per input doc — (groupCol, tier, n_docs,
    * mean_score_micro, plus all input columns). Scale shape: one
    * map-side-combined aggregate over the group key, then the
    * groups-sized stats frame (tiny: #domains, not #docs) broadcasts
    * back onto the corpus — no second shuffle of document rows. */
  def groupGate(df: DataFrame, groupCol: String, scoreCol: Column,
      minDocs: Long = 3L, dropBelow: Double = 0.3,
      keepAbove: Double = 0.5,
      broadcastTiers: Boolean = true): DataFrame = {
    val micro = round(scoreCol * lit(1e6)).cast("long")
    val partials = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(micro).as("sum_micro"))
    val tiers = groupGateTiers(partials, groupCol, minDocs,
      dropBelow, keepAbove)
    // broadcastTiers=true is right up to a few million groups (a
    // #groups-sized frame of one string + three scalars); past that —
    // e.g. gating on full host names over a web-scale crawl — pass
    // false and pay one shuffle of the doc side instead of shipping a
    // multi-GB broadcast to every executor
    df.join(if (broadcastTiers) broadcast(tiers) else tiers,
      Seq(groupCol))
  }

  /** [[groupGate]]'s tier table from pre-aggregated
    * `(groupCol, n_docs, sum_micro)` partial moment rows — the seam a
    * streaming counter store feeds: partials FOLD BY ADDITION, so the
    * tier computed over summed micro-batch partials equals the batch
    * gate over the concatenated log exactly (integer mean, integer
    * thresholds — nothing to drift). */
  def groupGateTiers(partials: DataFrame, groupCol: String,
      minDocs: Long = 3L, dropBelow: Double = 0.3,
      keepAbove: Double = 0.5): DataFrame = {
    require(dropBelow <= keepAbove, "dropBelow must be <= keepAbove")
    val stats = partials.groupBy(col(groupCol))
      .agg(sum("n_docs").as("n_docs"), sum("sum_micro").as("__sum"))
      .select(col(groupCol), col("n_docs"),
        expr("__sum div n_docs").as("mean_score_micro"))
    stats.withColumn("tier",
      when(col("mean_score_micro") < lit(math.round(dropBelow * 1e6)),
        lit("drop"))
      .when(col("mean_score_micro") >= lit(math.round(keepAbove * 1e6)) &&
        col("n_docs") >= lit(minDocs), lit("keep"))
      .otherwise(lit("review")))
  }

  /** Paragraph-level quality pruning — the trafilatura-style boilerplate
    * cut that judges each paragraph, not the whole page: split `textCol`
    * on `sep`, score every non-blank paragraph with
    * [[graft.functions.TextFunctions.qualityScore]], drop paragraphs
    * scoring below `minScore`, and reassemble each document from its
    * survivors in original order. The comparison runs on exact
    * micro-units (round(score·1e6) ≥ round(minScore·1e6)) so a
    * cross-engine replay cannot flip at a float boundary.
    *
    * Output: (idCol, textCol rebuilt — "" when nothing survives,
    * n_kept, n_dropped) — one row per input doc, auditable either way.
    *
    * Scale shape: posexplode + a map-side score, then ONE aggregate
    * back to the doc key (collect_list skips the nulls the dropped
    * paragraphs become; sort_array restores document order without a
    * window). Text bodies shuffle once, already filtered. */
  def paragraphQualityPrune(df: DataFrame, textCol: String,
      idCol: String, sep: String = "\n\n",
      minScore: Double = 0.5): DataFrame = {
    import graft.functions.TextFunctions
    val cut = math.round(minScore * 1e6)
    val paras = df.select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__p")))
      .filter(trim(col("__p")) =!= "")
      .withColumn("__keep",
        round(TextFunctions.qualityScore(col("__p")) * lit(1e6))
          .cast("long") >= lit(cut))
    paras.groupBy(col(idCol))
      .agg(
        array_join(transform(
          sort_array(collect_list(when(col("__keep"),
            struct(col("__pos"), col("__p"))))),
          s => s.getField("__p")), sep).as(textCol),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_dropped"))
  }

  /** Out-of-vocabulary planning curve — the "what vocab size do we
    * need" companion to [[zipfFit]]/[[heapsFit]]: for each candidate
    * vocabulary size k in `ks`, the fraction of corpus token
    * OCCURRENCES that fall outside the top-k most frequent types
    * (ties broken by token text, so the ranking is a total order any
    * engine replays). Output per k: (k, oov_tokens, total_tokens,
    * oov_rate rounded 6dp), ordered by k.
    *
    * Scale shape: the corpus collapses to one map-side-combined token
    * count (vocab-sized, Heaps-bounded — far smaller than the corpus);
    * the global rank window runs over THAT frame only, and the k-curve
    * is a small-literal explode + one more aggregate. Token text never
    * shuffles twice. */
  def oovCurve(df: DataFrame, textCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty, "ks must be non-empty")
    import graft.functions.TextFunctions
    val counts = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy("__tok").agg(count(lit(1)).as("__n"))
      .withColumn("__rank", row_number().over(Window.orderBy(
        col("__n").desc, col("__tok").asc)))
    val ksDf = df.sparkSession.range(1).select(
      explode(array(ks.sorted.map(k => lit(k)): _*)).as("k"))
    counts.crossJoin(broadcast(ksDf))
      .groupBy("k")
      .agg(sum(when(col("__rank") > col("k"), col("__n"))
          .otherwise(0L)).as("oov_tokens"),
        sum("__n").as("total_tokens"))
      .select(col("k"), col("oov_tokens"), col("total_tokens"),
        round(col("oov_tokens").cast("double") /
          greatest(col("total_tokens"), lit(1L)).cast("double"), 6)
          .as("oov_rate"))
  }
}
