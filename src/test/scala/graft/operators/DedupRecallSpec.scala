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
}
