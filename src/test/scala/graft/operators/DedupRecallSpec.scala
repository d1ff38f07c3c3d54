package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantifies the hot-band star-edge cap's recall (the caveat stated at
  * [[Dedup.minhashCandidates]]): on a boilerplate-heavy corpus that
  * trips `maxBandBucket`, direct pair recall inside the hot cluster
  * drops by design (O(n) star edges instead of O(n²) all-pairs), but
  * COLD-path recall stays exact and component membership — the thing
  * dedupe semantics depend on — is unchanged vs the exhaustive graph. */
class DedupRecallSpec extends SparkSpec {

  private val threshold = 0.8

  // 40 near-identical docs: a 60-word template + 2 doc-unique words →
  // pairwise Jaccard ≈ 0.935, and every band bucket is dominated by
  // template-won minhash slots → hot at maxBandBucket = 16
  private def corpus: DataFrame = {
    import spark.implicits._
    val template = (0 until 60).map(j => s"base$j").mkString(" ")
    val mega = (0L until 40L).map(i =>
      (i, s"$template uniq${i}a uniq${i}b"))
    // 40 distinct docs with disjoint vocabularies; for the first ten,
    // a planted near-dup copy (one word changed → Jaccard ≈ 0.854)
    val distinct = (0 until 40).map { i =>
      (100L + i, (0 until 40).map(j => s"tok${i}x$j").mkString(" "))
    }
    val planted = (0 until 10).map { i =>
      (200L + i, (0 until 40).map(j =>
        if (j == 20) s"changed$i" else s"tok${i}x$j").mkString(" "))
    }
    (mega ++ distinct ++ planted).toDF("doc_id", "text")
  }

  private def pairKeys(df: DataFrame): Set[(Long, Long)] =
    df.filter(col("jaccard") >= threshold).select("id_a", "id_b")
      .collect().map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }.toSet

  private def partitionOf(pairs: Set[(Long, Long)]): Set[Set[Long]] = {
    import spark.implicits._
    Dedup.components(pairs.toSeq.toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
  }

  test("hot-band cap: measured star-edge recall, exact cold recall, " +
      "identical components") {
    val docs = corpus
    // ground truth: exhaustive exact Jaccard over every pair
    val truth = pairKeys(Dedup.ngramJaccardPairs(
      docs.withColumn("blk", lit(1)), "text", "doc_id", "blk", n = 3))
    val megaTruth = truth.filter { case (a, b) => a < 40L && b < 40L }
    val coldTruth = truth -- megaTruth
    assert(megaTruth.size == (40 * 39) / 2, "mega cluster is all-similar")
    assert(coldTruth == (0L until 10L).map(i => (100L + i, 200L + i)).toSet)

    val capped = pairKeys(Dedup.minhashCandidates(
      docs, "text", "doc_id", maxBandBucket = 16))
    // the cap visibly tripped: hot-cluster pairs are O(n) star edges
    // (≤ a few bucket-min roots × members), nowhere near the 780
    // all-pairs — and every emitted pair is a true pair
    val megaCapped = capped.filter { case (a, b) => a < 40L && b < 40L }
    assert(megaCapped.size >= 39 && megaCapped.size <= 120,
      s"expected O(n) star edges, got ${megaCapped.size}")
    assert(capped.subsetOf(truth))

    // measured recall numbers (fixed fixture + seeded hashing → stable):
    // direct-pair recall inside the hot cluster ≈ 39/780 ≈ 5-15% BY
    // DESIGN; cold-path recall is exactly 1.0 — the cap never loses a
    // pair outside a hot bucket
    val directRecall = capped.size.toDouble / truth.size
    val coldRecall =
      (capped & coldTruth).size.toDouble / coldTruth.size
    info(f"direct recall ${directRecall * 100}%.1f%% " +
      f"(${capped.size}/${truth.size}); cold recall $coldRecall%.2f")
    assert(coldRecall == 1.0)
    assert(directRecall >= 0.05)

    // the guarantee the cap trades pairs for: component membership is
    // IDENTICAL to the exhaustive graph's, so dedupe keeps/drops the
    // same documents
    assert(partitionOf(capped) == partitionOf(truth))

    // and with the default (untripped) cap the generator is lossless
    // on this corpus — capping is the only source of pair loss
    val uncapped = pairKeys(Dedup.minhashCandidates(docs, "text", "doc_id"))
    assert(uncapped == truth)
  }

  private def rawKeys(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("simhash hot-block cap: star edges, exact cold recall, " +
      "identical components") {
    import spark.implicits._
    // 40 IDENTICAL docs: every one of their 4 block buckets holds all
    // 40 members → hot at maxBlockBucket = 16. Plus 10 planted pairs of
    // identical vocab-disjoint docs (Hamming 0) that stay cold.
    val template = (0 until 50).map(j => s"base$j").mkString(" ")
    val mega = (0L until 40L).map(i => (i, template))
    val planted = (0 until 10).flatMap { i =>
      val text = (0 until 30).map(j => s"tok${i}y$j").mkString(" ")
      Seq((100L + i, text), (200L + i, text))
    }
    val docs = (mega ++ planted).toDF("doc_id", "text")
    val coldTruth = (0L until 10L).map(i => (100L + i, 200L + i)).toSet

    // ground truth = the uncapped generator (block scheme is complete
    // to Hamming ≤ 3); identical docs pair via every block
    val truth = rawKeys(Dedup.simhashPairs(docs, "text", "doc_id"))
    assert(truth.count { case (a, b) => a < 40L && b < 40L } == (40 * 39) / 2)
    assert(coldTruth.subsetOf(truth))

    val capped = rawKeys(Dedup.simhashPairs(docs, "text", "doc_id",
      maxBlockBucket = 16))
    val megaCapped = capped.filter { case (a, b) => a < 40L && b < 40L }
    // hub=min id, identical sigs → exactly the 39 star edges survive
    assert(megaCapped == (1L until 40L).map(i => (0L, i)).toSet)
    assert(capped.subsetOf(truth))
    // cold recall exactly 1.0: the cap never loses a pair outside a
    // hot bucket
    assert(coldTruth.subsetOf(capped))
    // component membership identical to the exhaustive graph's
    assert(partitionOf(capped) == partitionOf(truth))

    // portable twin trips the same machinery (shared helper)
    val cappedP = rawKeys(Dedup.simhashPairsPortable(docs, "text", "doc_id",
      maxBlockBucket = 16))
    val truthP = rawKeys(Dedup.simhashPairsPortable(docs, "text", "doc_id"))
    assert(cappedP.filter { case (a, b) => a < 40L && b < 40L } ==
      (1L until 40L).map(i => (0L, i)).toSet)
    assert(coldTruth.subsetOf(cappedP) && cappedP.subsetOf(truthP))
    assert(partitionOf(cappedP) == partitionOf(truthP))
  }

  test("embedding hot-bucket cap: star edges, exact cold recall, " +
      "identical components") {
    import spark.implicits._
    val dim = 8
    def unit(d: Int): Array[Float] =
      Array.tabulate(dim)(i => if (i == d) 1.0f else 0.0f)
    // 40 identical vectors share one LSH bucket → hot at maxBucket=16;
    // 3 planted identical pairs on orthogonal axes stay cold (their
    // cross-cosine is 0, so bucket collisions can't create false pairs)
    val mega = (0L until 40L).map(i => (i, unit(0)))
    val planted = (0 until 3).flatMap { i =>
      Seq((100L + i, unit(i + 1)), (200L + i, unit(i + 1)))
    }
    val vecs = (mega ++ planted).toDF("vec_id", "embedding")
    val coldTruth = (0L until 3L).map(i => (100L + i, 200L + i)).toSet

    val truth = rawKeys(Dedup.embeddingNearDupPairs(vecs, "vec_id",
      "embedding", dim, threshold = 0.99))
    assert(truth == (for {
      a <- 0L until 40L; b <- (a + 1) until 40L
    } yield (a, b)).toSet ++ coldTruth)

    val capped = rawKeys(Dedup.embeddingNearDupPairs(vecs, "vec_id",
      "embedding", dim, threshold = 0.99, maxBucket = 16))
    assert(capped == (1L until 40L).map(i => (0L, i)).toSet ++ coldTruth)
    assert(partitionOf(capped) == partitionOf(truth))
  }
}
