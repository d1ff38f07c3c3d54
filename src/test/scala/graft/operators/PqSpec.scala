package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011): train/encode/ADC-query. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def emb = graft.core.Tables.load(spark, sf, "embeddings")

  test("codebook shape: m sub-codebooks of ksub centroids of dim/m") {
    val cb = Similarity.pqTrain(emb, m = 4, ksub = 16, dim = 64)
    val rows = cb.select(col("j"), col("c"), size(col("__cb")).as("n"))
      .as[(Int, Int, Int)].collect()
    assert(rows.length == 64)
    assert(rows.forall(_._3 == 16))
    assert(rows.map(_._1).toSet == (0 until 4).toSet)
    assert(rows.map(_._2).toSet == (0 until 16).toSet)
  }

  test("codes are m-length, in [0, ksub), deterministic") {
    val cb = Similarity.pqTrain(emb, m = 4, ksub = 16, dim = 64)
    val enc = Similarity.pqEncode(emb, cb, m = 4, dim = 64)
      .as[(Long, Seq[Int])].collect()
    assert(enc.length == emb.count())
    assert(enc.forall(_._2.length == 4))
    assert(enc.forall(_._2.forall(c => c >= 0 && c < 16)))
    val again = Similarity.pqEncode(emb, cb, m = 4, dim = 64)
      .as[(Long, Seq[Int])].collect()
    assert(enc.toMap == again.toMap)
    // a seed row quantizes to itself in every subspace: seed i's slice
    // IS centroid i of each sub-codebook, so its distance there is 0
    val n = emb.count()
    val stride = math.max(1L, n / 16)
    val seedIds = emb.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy("vec_id").limit(16).select("vec_id").as[Long].collect()
    val byId = enc.toMap
    seedIds.zipWithIndex.foreach { case (id, c) =>
      assert(byId(id).forall(_ == c), s"seed $id should code to $c")
    }
  }

  test("ADC with a full rerank pool reproduces brute force exactly") {
    val n = emb.count().toInt
    val cb = Similarity.pqTrain(emb, m = 4, ksub = 16, dim = 64)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val pq = Similarity.pqTopK(emb, cb, queries, 10, rerank = n,
        m = 4, dim = 64)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(pq == exact)
  }

  test("ADC served from persisted codes is identical") {
    val cb = Similarity.pqTrain(emb, m = 4, ksub = 16, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq")
      .toString + "/codes"
    Similarity.pqEncode(emb, cb, m = 4, dim = 64).write.parquet(dir)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val inline = Similarity.pqTopK(emb, cb, queries, 10, rerank = 30,
      m = 4, dim = 64)
    val served = Similarity.pqTopK(emb, cb, queries, 10, rerank = 30,
      m = 4, dim = 64, codes = Some(spark.read.parquet(dir)))
    assert(key(served) == key(inline))
  }

  test("IVF-PQ at full probe and full pool reproduces brute force exactly") {
    val n = emb.count().toInt
    val cents = Similarity.seedCentroids(emb, 16)
    val cells = Similarity.assignCells(emb, cents)
    val cb = Similarity.pqTrain(emb, m = 4, ksub = 16, dim = 64)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val got = Similarity.ivfPqTopK(cells, cents, cb, queries, 10,
        rerank = n, nprobe = 16, m = 4, dim = 64)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == exact)
  }

  test("IVF-PQ served from a persisted coded index is identical") {
    val cents = Similarity.seedCentroids(emb, 16)
    val cells = Similarity.assignCells(emb, cents)
    val cb = Similarity.pqTrain(emb, m = 4, ksub = 16, dim = 64)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq")
      .toString + "/index"
    // the serving layout: codes + cell assignment, partitioned by cell
    Similarity.pqEncode(emb, cb, m = 4, dim = 64)
      .join(cells.select(col("vec_id"), col("centroid_id")), Seq("vec_id"))
      .write.partitionBy("centroid_id").parquet(dir)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val inline = Similarity.ivfPqTopK(cells, cents, cb, queries, 10,
      rerank = 30, nprobe = 4, m = 4, dim = 64)
    val served = Similarity.ivfPqTopK(cells, cents, cb, queries, 10,
      rerank = 30, nprobe = 4, m = 4, dim = 64,
      codedCells = Some(spark.read.parquet(dir)))
    assert(key(served) == key(inline))
  }

  test("embeddingCard flags ragged dims and zero vectors") {
    val vecs = Seq(
      (0, Array(3.0f, 4.0f)),             // norm 5
      (0, Array(0.0f, 0.0f)),             // zero vector
      (1, Array(1.0f, 0.0f, 0.0f))        // ragged dim in group 1
    ).toDF("label", "embedding")
    val card = Similarity.embeddingCard(vecs, "label")
      .collect().map(r => r.getInt(0) -> r).toMap
    val g0 = card(0)
    assert(g0.getAs[Long]("n_vecs") == 2)
    assert(g0.getAs[Int]("dim_min") == 2 && g0.getAs[Int]("dim_max") == 2)
    assert(g0.getAs[Long]("zero_vecs") == 1)
    assert(math.abs(g0.getAs[Double]("mean_norm") - 2.5) < 1e-6)
    val g1 = card(1)
    assert(g1.getAs[Int]("dim_min") == 3)
    assert(g1.getAs[Long]("zero_vecs") == 0)
    assert(math.abs(g1.getAs[Double]("p50_norm") - 1.0) < 1e-6)
  }

  test("k-means refinement lowers quantization distortion, keeps recall sane") {
    def distortion(cb: org.apache.spark.sql.DataFrame): Double = {
      // total L2² of each subvector to its assigned centroid: the
      // k-means objective. reducedL2 omits the constant ‖a‖² term, so
      // compare the SAME reduced objective across codebooks.
      val dsub = 16
      val subs = emb.select(col("vec_id"),
          explode(transform(sequence(lit(0), lit(3)), j =>
            struct(j.cast("int").as("j"),
              slice(transform(col("embedding"), x =>
                x / sqrt(Similarity.dot(col("embedding"), col("embedding")))),
                j * dsub + 1, lit(dsub)).as("s")))).as("__e"))
        .select(col("vec_id"), col("__e.j").as("j"), col("__e.s").as("s"))
      subs.join(broadcast(cb), Seq("j"))
        .withColumn("rd", Similarity.dot(col("__cb"), col("__cb")) -
          lit(2) * Similarity.dot(col("s"), col("__cb")))
        .groupBy("vec_id", "j").agg(min("rd").as("best"))
        .agg(sum("best")).as[Double].head()
    }
    val cb0 = Similarity.pqTrain(emb, m = 4, ksub = 16, dim = 64, iters = 0)
    val cb3 = Similarity.pqTrain(emb, m = 4, ksub = 16, dim = 64, iters = 3)
    val (d0, d3) = (distortion(cb0), distortion(cb3))
    assert(d3 <= d0 + 1e-9, s"refined distortion $d3 should not exceed $d0")

    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(Similarity.bruteForceTopK(emb, queries, 10))
    val pq = topSets(Similarity.pqTopK(emb, cb3, queries, 10, rerank = 60,
      m = 4, dim = 64))
    val rs = exact.map { case (q, ex) =>
      pq.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
    val recall = rs.sum / rs.size
    // 16-bit PQ codes on near-uniform synthetic data are coarse; the
    // floor mirrors binaryTopK's — the self row always survives and the
    // 20% pool holds a meaningful share of true neighbors
    assert(recall >= 0.4, s"PQ recall@10 with 60/300 reranked: $recall")
  }
}
