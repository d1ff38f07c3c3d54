package graft.sources

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The scale-rehearsal corpus generator: deterministic, exact factor,
  * original preserved, and the documented similarity spectrum. */
class SyntheticDocsSpec extends SparkSpec {

  private lazy val docs =
    graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("inflation is deterministic and exactly factor-times larger") {
    val a = SyntheticDocs.inflate(docs, 10)
    val b = SyntheticDocs.inflate(docs, 10)
    assert(a.count() == docs.count() * 10)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.select("doc_id").distinct().count() == a.count())
  }

  test("embedding inflation: originals intact, k=1 near-dup, ids disjoint") {
    val emb =
      graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = SyntheticDocs.inflateEmbeddings(emb, 5)
    val b = SyntheticDocs.inflateEmbeddings(emb, 5)
    assert(a.count() == emb.count() * 5)
    assert(a.select("vec_id").distinct().count() == a.count())
    assert(a.exceptAll(b).isEmpty) // deterministic
    val originals = a.filter(pmod(col("vec_id"), lit(5)) === 0)
      .select((col("vec_id") / 5).cast("long").as("vec_id"), col("embedding"))
    assert(originals.exceptAll(emb.select("vec_id", "embedding")).isEmpty)
    // variant 1 sits close to its original; variant 4 strictly farther
    val pairs = a.select((col("vec_id") / 5).cast("long").as("base"),
        pmod(col("vec_id"), lit(5)).as("k"), col("embedding"))
    val cos = pairs.filter(col("k") === 0).as("o")
      .join(pairs.filter(col("k") =!= 0).as("v"), "base")
      .select(col("v.k").as("k"), graft.operators.Similarity.cosine(
        col("o.embedding"), col("v.embedding")).as("c"))
      .groupBy("k").agg(avg(col("c")).as("c")).collect()
      .map(r => r.getLong(0).toInt -> r.getDouble(1)).toMap
    assert(cos(1) > 0.99, s"k=1 mean cosine ${cos(1)}")
    assert(cos(4) < cos(1), s"spectrum broken: $cos")
  }

  test("variant 0 is the original; variants form a similarity spectrum") {
    val inflated = SyntheticDocs.inflate(docs, 6).cache()
    try {
      val originals = inflated.filter(pmod(col("doc_id"), lit(6)) === 0)
        .select((col("doc_id") / 6).cast("long").as("doc_id"), col("text"))
      assert(originals.exceptAll(docs.select("doc_id", "text")).isEmpty)

      // per original doc: jaccard(variant 0, variant k) on the same
      // 3-gram shingles the dedupe pipeline uses
      val sh = inflated.select(col("doc_id"),
        (col("doc_id") % 6).as("k"), (col("doc_id") / 6).cast("long").as("base"),
        Dedup.hashedShingles(col("text"), 3).as("g"))
      val v0 = sh.filter(col("k") === 0)
        .select(col("base"), col("g").as("g0"))
      val j = sh.filter(col("k") =!= 0).join(v0, "base")
        .select(col("k"),
          (size(array_intersect(col("g"), col("g0"))).cast("double") /
            size(array_union(col("g"), col("g0")))).as("jac"))
        .groupBy("k").agg(avg(col("jac")).as("mean_jac"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      // k=1 near-dup above the 0.8 LSH threshold; k>=4 well below —
      // bucket pressure without a pair explosion
      assert(j(1L) > 0.8, s"k=1 mean jaccard ${j(1L)}")
      assert(j(1L) > j(2L) && j(2L) > j(3L) && j(3L) > j(4L))
      assert(j(4L) < 0.5, s"k=4 mean jaccard ${j(4L)}")
      // no exact duplicates anywhere (unique suffix token per variant)
      assert(inflated.groupBy("text").count()
        .filter(col("count") > 1).count() == 0)
    } finally { inflated.unpersist(); () }
  }
}
