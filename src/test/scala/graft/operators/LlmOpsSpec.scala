package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class LlmOpsSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
      (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near-dup of 0
      (3L, "completely different content about databases and distributed query engines"),
      (4L, "der hund und die katze sind nicht mit der maus zu hause und das ist gut"),
      (5L, "le chat est dans la maison et les enfants sont pour le jardin dans une heure"),
      (6L, "数据库 引擎 分布式 查询"),
      (7L, "")
    ).toDF("doc_id", "text")
  }

  test("exact dedupe keeps first occurrence") {
    val out = Dedup.exact(docs, "text", "doc_id")
    val ids = out.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(!ids.contains(1L)) // dup of 0 dropped
    assert(ids.contains(0L) && ids.contains(2L))
    assert(out.count() == 7)
  }

  test("paragraph dedup: first occurrence wins, docs rebuild in order") {
    import spark.implicits._
    val pdocs = Seq(
      (0L, "shared boilerplate header\n\nunique body of doc zero\n\nshared footer"),
      (1L, "shared boilerplate header\n\nunique body of doc one\n\nshared footer"),
      (2L, "shared boilerplate header\n\nshared footer"), // nothing unique
      (3L, "repeat me\n\nrepeat me\n\nthen something else"), // intra-doc repeat
      (4L, "\n\n  \n\nonly real paragraph") // blanks are dropped
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(pdocs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

    // doc 0 saw every paragraph first: intact
    assert(out(0L) == ("shared boilerplate header\n\nunique body of doc zero" +
      "\n\nshared footer", 3L))
    // doc 1 loses both shared paragraphs, keeps its unique body
    assert(out(1L) == ("unique body of doc one", 1L))
    // doc 2 had nothing unique: vanishes
    assert(!out.contains(2L))
    // intra-doc repeat collapses to its first position
    assert(out(3L) == ("repeat me\n\nthen something else", 2L))
    // blank paragraphs never survive
    assert(out(4L) == ("only real paragraph", 1L))
  }

  test("minhash LSH finds the near-dup pair and dedupes it") {
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id", shingleN = 2)
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L))) // exact dup: jaccard 1.0
    assert(pairs.exists(p => p == ((0L, 2L)) || p == ((1L, 2L)))) // near-dup
    val kept = Dedup.minhashLsh(docs, "text", "doc_id", threshold = 0.5)
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(1L) && !ids.contains(2L) && ids.contains(0L))
    assert(ids.contains(3L) && ids.contains(4L))
  }

  test("connected components merge similarity chains transitively") {
    import spark.implicits._
    // chain 1-2-3 (no direct 1-3 edge), pair 7-9, singleton edges only
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comp = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(7L) == 7L && comp(9L) == 7L)
  }

  test("components: deep chain converges in O(log) star rounds") {
    import spark.implicits._
    // a 300-node path has diameter 299 — label propagation at maxIter
    // 20 could never close it; star alternation must
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // localFinishEdges = 0 forces the distributed star rounds (the
    // default would collect this tiny graph and finish on the driver)
    val comp = Dedup.components(chain, localFinishEdges = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(comp.length == 300)
    assert(comp.forall(_._2 == 0L))
  }

  test("components: random graph matches union-find; self-pairs keep membership") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val edges = (0 until 400).map(_ =>
      (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
    val got = Dedup.components(edges.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the distributed star rounds and the driver union-find finish are
    // interchangeable — same labels either way
    val distributed = Dedup.components(edges.toDF("id_a", "id_b"),
        localFinishEdges = 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == got)
    // local union-find reference, component = min id of the set
    val parent = Array.tabulate(150)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      .map(id => id -> find(id.toInt).toLong).toMap
    assert(got == want)
    // an id appearing only as a self-pair is still a (singleton) member
    val solo = Dedup.components(Seq((42L, 42L)).toDF("id_a", "id_b")).collect()
    assert(solo.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((42L, 42L)))
  }

  test("keepBestPerCluster keeps the argmax member, ties to lowest id") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b c d"), (3L, "a b"),
      (4L, "lonely doc")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBestPerCluster(docs, pairs, "doc_id",
        size(TextFunctions.tokens(col("text"))))
      .orderBy("doc_id")
      .select("doc_id", "dup_group_size").as[(Long, Long)].collect()
    // cluster {1,2,3}: doc 2 is longest -> representative, size 3
    assert(kept.toSeq == Seq((2L, 3L), (4L, 1L)))
    // score tie (docs 1 and 3 both "a b") -> lowest id wins
    val tiePairs = Seq((1L, 3L)).toDF("id_a", "id_b")
    val tied = Dedup.keepBestPerCluster(docs, tiePairs, "doc_id",
        size(TextFunctions.tokens(col("text"))))
      .orderBy("doc_id").select("doc_id").as[Long].collect()
    assert(tied.toSeq == Seq(1L, 2L, 4L))
  }

  test("simhash pairs: identical texts at distance 0, near-dups close") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxDistance = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 0))
  }

  test("ngram jaccard within blocking key") {
    val blocked = docs.withColumn("blk", lit(1))
    val out = Dedup.ngramJaccardPairs(blocked, "text", "doc_id", "blk", n = 2)
      .filter(col("id_a") === 0 && col("id_b") === 1).collect()
    assert(out.head.getDouble(2) == 1.0)
  }

  test("containment flags a leaked benchmark item inside a longer doc") {
    import spark.implicits._
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // inside doc 0
      (101L, "nothing like any corpus document at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, bench, "text", "doc_id",
        n = 3, minContainment = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // docs 0/1/2 all contain the benchmark sentence verbatim
    assert(out.count { case (_, b, c) => b == 100L && c == 1.0 } >= 3)
    assert(!out.exists(_._2 == 101L))
  }

  test("bloom decontamination is exact: sketch noise never reaches output") {
    import spark.implicits._
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // inside docs 0/1/2
      (101L, "nothing like any corpus document at all whatsoever")
    ).toDF("doc_id", "text")
    // brute-force expected: distinct shared hashed 3-grams per doc
    val docGrams = docs.select(col("doc_id"),
      explode(Dedup.hashedShingles(col("text"), 3)).as("g"))
    val benchGrams = bench
      .select(explode(Dedup.hashedShingles(col("text"), 3)).as("g")).distinct()
    val expected = docGrams.join(benchGrams, Seq("g"))
      .groupBy("doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // a deliberately noisy sketch (fpp 0.5) floods the candidate set
    // with false positives; the exact confirm must erase them all
    for (fpp <- Seq(1e-3, 0.5)) {
      val out = Dedup.bloomDecontaminate(docs, bench, "text", "doc_id",
          n = 3, fpp = fpp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      assert(out.length == 8, s"one verdict per corpus doc (fpp=$fpp)")
      out.foreach { case (id, matched, contaminated) =>
        assert(matched == expected.getOrElse(id, 0L),
          s"doc $id matched_grams (fpp=$fpp)")
        assert(contaminated == (matched > 0))
      }
      // the leaked sentence flags docs 0/1/2; doc 3 is clean
      val flagged = out.filter(_._3).map(_._1).toSet
      assert(Set(0L, 1L, 2L).subsetOf(flagged))
      assert(!flagged.contains(3L))
    }
  }

  test("incremental index dedupe == batch pairs involving new docs") {
    import spark.implicits._
    val newDocs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank today"), // dup of 0/1
      (11L, "an entirely novel document unlike anything else in the corpus"),
      (12L, "an entirely novel document unlike anything else in the corpus too") // near-dup of 11
    ).toDF("doc_id", "text")
    val oldIdx = Dedup.buildIndex(docs, "text", "doc_id")
    val newIdx = Dedup.buildIndex(newDocs, "text", "doc_id")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("jaccard") >= 0.5)
      .select("id_a", "id_b")
      .collect().map(r => {
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b))
      }).toSet
    val inc = pairSet(Dedup.incrementalCandidates(newIdx, oldIdx))
    val full = pairSet(Dedup.minhashCandidates(
      docs.unionByName(newDocs), "text", "doc_id"))
    val touchingNew = full.filter { case (a, b) => a >= 10L || b >= 10L }
    assert(inc == touchingNew)
    assert(inc.contains((0L, 10L)) && inc.contains((11L, 12L)))
  }

  test("hot LSH bands cap to star edges; mega-duplicate cluster still dedupes") {
    import spark.implicits._
    // pathological corpus: one 60-doc exact-duplicate cluster (every
    // band bucket is hot) + distinct docs + a small near-dup pair that
    // must keep its direct (all-pairs) edge on the cold path
    val mega = (0L until 60L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog near the river bank"))
    val rest = Seq(
      (100L, "an entirely novel document unlike anything else in the corpus"),
      (101L, "an entirely novel document unlike anything else in the corpus too"),
      (102L, "completely different content about databases and query engines"))
    val corpus = (mega ++ rest).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(corpus, "text", "doc_id",
        maxBandBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val megaPairs = pairs.filter { case (a, b, _) => a < 60L && b < 60L }
    // star, not all-pairs: 59 edges from doc 0, not C(60,2) = 1770
    assert(megaPairs.length == 59)
    assert(megaPairs.forall { case (a, b, j) => a == 0L && b > 0L && j == 1.0 })
    // cold path unaffected: the small near-dup pair keeps its edge
    assert(pairs.exists { case (a, b, j) => a == 100L && b == 101L && j >= 0.5 })
    // end-to-end: one survivor from the cluster, near-dup collapsed
    val kept = Dedup.minhashLsh(corpus, "text", "doc_id", threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 100L, 102L))
    // uncapped (default 1024) behavior is unchanged on the same corpus
    val full = Dedup.minhashCandidates(corpus, "text", "doc_id")
      .filter(col("jaccard") >= 0.999).count()
    assert(full == 1770L)
  }

  test("incremental hot buckets honor the ≥1-new-doc contract") {
    import spark.implicits._
    val dupText = "the quick brown fox jumps over the lazy dog near the river bank"
    val oldDocs = (0L until 30L).map(i => (i, dupText)).toDF("doc_id", "text")
    val newDocs = ((30L until 60L).map(i => (i, dupText)) ++
      Seq((200L, "an entirely novel document unlike anything else here")))
      .toDF("doc_id", "text")
    val inc = Dedup.incrementalCandidates(
        Dedup.buildIndex(newDocs, "text", "doc_id"),
        Dedup.buildIndex(oldDocs, "text", "doc_id"),
        maxBandBucket = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // star edges: bucket min (old doc 0) links every NEW member; no
    // old↔old re-emission, nothing quadratic
    assert(inc.toSet == (30L until 60L).map(i => (0L, i)).toSet)
    // re-delivered id (in both indexes) never pairs with itself
    val redelivered = Dedup.incrementalCandidates(
      Dedup.buildIndex(newDocs, "text", "doc_id"),
      Dedup.buildIndex(newDocs, "text", "doc_id"))
    assert(redelivered.filter(col("id_a") === col("id_b")).count() == 0)
  }

  test("prefix-filtered similarity join matches blocked all-pairs exactly") {
    val t = 0.4
    val got = Dedup.prefixJaccardPairs(docs, "text", "doc_id", t, shingleN = 2)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // reference: exhaustive pairs within one block, same threshold
    val want = Dedup.ngramJaccardPairs(
        docs.withColumn("blk", lit(1)), "text", "doc_id", "blk", n = 2)
      .filter(col("jaccard") >= t)
      .select("id_a", "id_b", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want)
    assert(got.contains((0L, 1L, 1.0))) // the exact dup survives end-to-end
  }

  test("brute-force cosine top-k is exact and self-ranked first") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    val top = Similarity.bruteForceTopK(vecs, queries, 2)
      .orderBy("rank").collect()
    assert(top(0).getLong(1) == 0L) // self first (cos=1)
    assert(top(1).getLong(1) == 1L) // nearest neighbor
    assert(top.length == 2)
  }

  test("kmeansIntAssign: splits planted clusters; equals a driver-side replication") {
    import spark.implicits._
    // planted: ids 0,1 are the seeds — one in each tight group
    val groupA = Seq(0L -> 0.0f, 2L -> 0.1f, 4L -> -0.1f)
    val groupB = Seq(1L -> 10.0f, 3L -> 10.1f, 5L -> 9.9f)
    val vecs = (groupA ++ groupB).map { case (id, base) =>
      (id, Array(base, base + 0.05f, base - 0.05f, base))
    }.toDF("vec_id", "embedding")
    val got = Similarity.kmeansIntAssign(vecs, k = 2, iters = 3)
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(Set(0L, 2L, 4L).map(got) == Set(0L), got.toString)
    assert(Set(1L, 3L, 5L).map(got) == Set(1L), got.toString)

    // random data: the operator must equal an independent driver-side
    // replication of the exact integer algorithm (seeds, quantize,
    // d2 argmin with id ties, truncating-div means, empty-keeps-old)
    val rnd = new scala.util.Random(8L)
    val dim = 8
    val n = 60
    val data = (0L until n).map(i =>
      (i, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
    val k = 3
    val iters = 4
    val lastAssign = lloydReplica(data, k, iters, dim)
    val gotR = Similarity.kmeansIntAssign(data.toDF("vec_id", "embedding"),
        k, iters)
      .select("vec_id", "cluster", "d2").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotR == lastAssign,
      s"diff: ${gotR.toSet.diff(lastAssign.toSet).take(3)} vs " +
        s"${lastAssign.toSet.diff(gotR.toSet).take(3)}")
  }

  // the independent driver-side Lloyd replication both kmeans tests
  // compare against (seeds = k lowest ids, quantize once, d2 argmin
  // with id ties, truncating-div means, empty cluster keeps centroid)
  private def lloydReplica(data: Seq[(Long, Array[Float])], k: Int,
      iters: Int, dim: Int): Map[Long, (Long, Long)] = {
    val micro = data.map { case (id, v) =>
      (id, v.map(x => math.round(x.toDouble * 1e6)))
    }
    var cents = micro.sortBy(_._1).take(k).zipWithIndex
      .map { case ((_, m), i) => (i.toLong, m.clone()) }
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var lastAssign: Map[Long, (Long, Long)] = Map.empty
    for (it <- 1 to iters) {
      lastAssign = micro.map { case (id, m) =>
        val (cd, cid) = cents.map { case (c, arr) => (d2(m, arr), c) }.min
        id -> ((cid, cd))
      }.toMap
      if (it < iters) {
        cents = cents.map { case (cid, old) =>
          val members = micro.filter(v => lastAssign(v._1)._1 == cid)
          if (members.isEmpty) (cid, old)
          else (cid, Array.tabulate(dim)(p =>
            members.map(_._2(p)).sum / members.size))
        }
      }
    }
    lastAssign
  }

  test("kmeansIntAssign large-k broadcast-join fallback equals the literal algorithm") {
    import spark.implicits._
    // k*dim = 70*64 = 4480 > MaxLiteralCentroidCells (4096): this run
    // takes the broadcast-join assignment path; answers must still
    // match the driver-side replication bit-for-bit
    val rnd = new scala.util.Random(19L)
    val dim = 64
    val n = 140
    val k = 70
    val iters = 2
    assert(k.toLong * dim > Similarity.MaxLiteralCentroidCells)
    val data = (0L until n.toLong).map(i =>
      (i, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))
    val expect = lloydReplica(data, k, iters, dim)
    val got = Similarity.kmeansIntAssign(data.toDF("vec_id", "embedding"),
        k, iters)
      .select("vec_id", "cluster", "d2").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect,
      s"diff: ${got.toSet.diff(expect.toSet).take(3)} vs " +
        s"${expect.toSet.diff(got.toSet).take(3)}")
  }

  test("truncatedRecall: full dims give recall 1; a truncation-confusable pair drops it") {
    import spark.implicits._
    // vectors whose FIRST two dims are identical for 1 and 2 but whose
    // tails diverge: under dims=2 the ranking cannot tell them apart
    // from the query's true neighbor, under full dims it can
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 1.0f, 0.0f)),   // query
      (1L, Array(1.0f, 0.0f, 0.9f, 0.1f)),   // true #2 (tail agrees)
      (2L, Array(1.0f, 0.0f, -1.0f, 0.0f)),  // tail OPPOSES — full rank last
      (3L, Array(0.0f, 1.0f, 0.0f, 1.0f))    // orthogonal everywhere
    ).toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"embedding")
    // full dims: recall must be exactly 1 (identical rankings)
    val full = Similarity.truncatedRecall(vecs, qs, k = 2, dims = 4)
      .collect().head
    assert(full.getLong(1) == 2L && full.getDouble(2) == 1.0, full.toString)
    // dims=2: truncated top-2 = {0, then min-id of the 1/2 cos tie} =
    // {0, 1}; full top-2 = {0, 1} too — overlap 2. Make the tie
    // resolve AGAINST the true neighbor by id: swap ids 1 and 2
    val swapped = vecs.withColumn("vec_id",
      when($"vec_id" === 1, 2L).when($"vec_id" === 2, 1L)
        .otherwise($"vec_id"))
    val tr = Similarity.truncatedRecall(swapped, qs, k = 2, dims = 2)
      .collect().head
    // truncated picks {0, 1(=opposing tail)}, full picks {0, 2(=true)}
    assert(tr.getLong(1) == 1L && tr.getDouble(2) == 0.5, tr.toString)
    // a query with an empty corpus-overlap still appears (left join)
    val out = Similarity.truncatedRecall(vecs, qs, k = 2, dims = 2)
    assert(out.count() == 1)
  }

  test("sign-bit signatures pack components into the expected halves") {
    import spark.implicits._
    // bits 0 and 2 positive -> lo = 0b101; component 32 positive -> hi bit 0
    val v = Array.fill(64)(-1f)
      .updated(0, 0.5f).updated(2, 0.25f).updated(32, 1f).updated(63, 2f)
    val sig = Similarity.signBits(Seq((7L, v)).toDF("vec_id", "embedding"))
      .collect().head
    assert(sig.getLong(1) == 5L)
    assert(sig.getLong(2) == (1L | (1L << 31)))
  }

  test("binary ANN with a full rerank pool reproduces brute force exactly") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count().toInt
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val bq = Similarity.binaryTopK(emb, queries, 10, rerank = n)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(bq == exact)
  }

  test("binary ANN served from a persisted signature table is identical") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_bsig")
      .toString + "/sigs"
    Similarity.signBits(emb).write.parquet(dir)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val inline = Similarity.binaryTopK(emb, queries, 10, rerank = 30)
    val served = Similarity.binaryTopK(emb, queries, 10, rerank = 30,
      sigs = Some(spark.read.parquet(dir)))
    assert(key(served) == key(inline))
  }

  test("binary ANN recall at a 10% rerank pool stays high") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val bq = Similarity.binaryTopK(emb, queries, 10, rerank = 30)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val rs = exact.map { case (q, ex) =>
      bq.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
    val recall = rs.sum / rs.size
    // near-uniform synthetic embeddings are the worst case for 1-bit
    // quantization; the self row always survives, and the pool holds a
    // meaningful share of the true neighbors
    assert(recall >= 0.4, s"recall@10 with 30/300 reranked: $recall")
  }

  test("bigram LM self-perplexity: hand-checked add-one smoothing") {
    import spark.implicits._
    // corpus: "a b a b" and "a". c(a,b)=2, c(b,a)=1, c(a·)=2, c(b·)=1,
    // |V|=2 -> P(b|a)=3/4, P(a|b)=2/3; micro-bits 415037/584963
    val docs = Seq((0L, "a b a b"), (1L, "a")).toDF("doc_id", "text")
    val out = NgramLm.perplexity(docs).orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 3L)
    assert(math.abs(out(0).getDouble(2) - 0.471679) < 1e-9)
    assert(out(1).getLong(1) == 0L)
    assert(out(1).isNullAt(2))
  }

  test("mean pooling averages chunk vectors per key, position-aligned") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, -2.0f)), (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.5f, 0.5f))
    ).toDF("doc_id", "embedding")
    val out = Similarity.meanPool(vecs, "doc_id").orderBy("doc_id").collect()
    assert(out(0).getSeq[Float](1) == Seq(2.0f, 1.0f))
    assert(out(1).getSeq[Float](1) == Seq(0.5f, 0.5f))
  }

  test("knnGraph at full probe equals brute force; partial probe recalls most") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val emb = (0L until 120L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
    val cents = Similarity.seedCentroids(emb, nlist = 6)
    val cells = Similarity.assignCells(emb, cents)
    val exact = Similarity.knnGraph(cells, cents, k = 4, nprobe = 6)
      .select("src_id", "nbr_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    // ground truth via the independent brute-force path (self filtered
    // out of its k+1 because bruteForceTopK scores the self-pair at 1.0)
    val bf = Similarity.bruteForceTopK(emb,
        emb.select(col("vec_id").as("query_id"), col("embedding")), k = 5)
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rank") <= 4)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(exact == bf)
    // partial probing is a subset-quality approximation, not garbage
    val approx = Similarity.knnGraph(cells, cents, k = 4, nprobe = 2)
      .select("src_id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = approx.count(p => bf.exists(b => (b._1, b._2) == p)).toDouble /
      bf.size
    assert(recall > 0.5, s"recall $recall")
  }

  test("dsirTopK draws target-domain docs; identical LMs degrade to pure hash") {
    import spark.implicits._
    // two stylistic families: "code" (ids 1-40) and "prose" (ids 41-80)
    val code = (1L to 40L).map(i =>
      (i, s"def fn$i ( x ) : return x + $i end def"))
    val prose = (41L to 80L).map(i =>
      (i, s"the quiet morning number $i drifted over the harbor town"))
    val docs = (code ++ prose).toDF("doc_id", "text")
    val target = NgramLm.train(docs.filter($"doc_id" <= 40)).cache()
    val raw = NgramLm.train(docs).cache()
    val picked = NgramLm.dsirTopK(docs, target, raw, k = 20, seed = 1)
      .select("doc_id", "rank").as[(Long, Int)].collect()
    assert(picked.map(_._2).sorted.toSeq == (1 to 20))
    // ∝ 2^λ with λ strongly favoring code docs -> draw is nearly all code
    assert(picked.count(_._1 <= 40) >= 18, picked.mkString(","))
    // λ = 0 everywhere when target == raw: ranking is the seeded hash,
    // still deterministic and layout-independent
    val flat = NgramLm.dsirTopK(docs, raw, raw, k = 10, seed = 5)
      .select("doc_id", "log2_ratio", "rank")
      .as[(Long, Double, Int)].collect()
    assert(flat.forall(_._2 == 0.0))
    val flat2 = NgramLm.dsirTopK(docs.repartition(7), raw, raw, k = 10,
      seed = 5).select("doc_id", "log2_ratio", "rank")
      .as[(Long, Double, Int)].collect()
    assert(flat.sortBy(_._3).toSeq == flat2.sortBy(_._3).toSeq)
  }

  test("dsirGate is the threshold twin: τ=-inf keeps all scored, gate ≡ topK set") {
    import spark.implicits._
    val code = (1L to 40L).map(i =>
      (i, s"def fn$i ( x ) : return x + $i end def"))
    val prose = (41L to 80L).map(i =>
      (i, s"the quiet morning number $i drifted over the harbor town"))
    val docs = (code ++ prose).toDF("doc_id", "text")
    val target = NgramLm.train(docs.filter($"doc_id" <= 40)).cache()
    val raw = NgramLm.train(docs).cache()
    // a huge positive τ keeps nothing; τ=0 keeps exactly the docs the
    // target model prefers — here that separates code from prose
    assert(NgramLm.dsirGate(docs, target, raw, 1e9).count() == 0)
    val kept = NgramLm.dsirGate(docs, target, raw, 0.0)
      .select("doc_id", "log2_ratio").as[(Long, Double)].collect()
    assert(kept.forall(_._2 >= 0.0))
    assert(kept.map(_._1).forall(_ <= 40L), kept.mkString(","))
    assert(kept.length == 40)
    // gate carries the doc row through (schema = docs + log2_ratio)
    val cols = NgramLm.dsirGate(docs, target, raw, 0.0).columns.toSeq
    assert(cols == Seq("doc_id", "text", "log2_ratio"))
  }

  test("trigram LM: hand-checked two-token contexts") {
    import spark.implicits._
    // "a b c a b c": c(ab,c)=2, c(bc,a)=1, c(ca,b)=1, |V|=3 ->
    // P(c|ab)=3/5, P(a|bc)=P(b|ca)=1/2; grams (ab c)(bc a)(ca b)(ab c)
    val docs = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    val out = NgramLm.perplexity(docs, order = 3).collect().head
    assert(out.getLong(1) == 4L)
    assert(math.abs(out.getDouble(2) - 0.868483) < 1e-9)
  }

  test("frozen LM cross-scoring: unseen transitions pay the smoothing floor") {
    import spark.implicits._
    // LM trained on "a b": vocab 2, c(a,b)=1. Scoring "c d": the unseen
    // transition costs exactly -log2(1/(0+2)) = 1 bit; "a b" costs
    // -log2(2/3)
    val lm = NgramLm.train(Seq((0L, "a b")).toDF("doc_id", "text"))
    val out = NgramLm.score(
        Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text"), lm)
      .orderBy("doc_id").collect()
    assert(math.abs(out(0).getDouble(2) - 0.584963) < 1e-9)
    assert(math.abs(out(1).getDouble(2) - 1.0) < 1e-9)
  }

  test("perplexity ranks corpus-typical transitions as more fluent") {
    import spark.implicits._
    val docs = ((0L until 50L).map(i => (i, "swift river swift river"))
      :+ (50L, "zxq vbn")).toDF("doc_id", "text")
    val bits = NgramLm.perplexity(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(bits(50L) > bits(0L),
      s"rare transitions ${bits(50L)} must cost more than typical ${bits(0L)}")
  }

  test("semantic dedup keeps one representative per cosine group, with size") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f, 0f)),
      (5L, Array(0.7f, 0.7f, 0f, 0f)) // ~0.707 to both groups: kept
    ).toDF("vec_id", "embedding")
    val cents = Similarity.seedCentroids(vecs, 2) // ids 0 and 3 seed
    val kept = Dedup.semanticDedup(vecs, "vec_id", "embedding", cents, 0.85)
      .select($"vec_id", $"dup_group_size").orderBy("vec_id").collect()
    assert(kept.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 3L), (3L, 2L), (5L, 1L)))
  }

  test("semantic dedup hot-cell star cap preserves group membership") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0f, 1f, 0f, 0f)),
      (5L, Array(0.7f, 0.7f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.seedCentroids(vecs, 2)
    // maxCell = 2 trips the first cell (members 0,1,2,5): only star
    // edges 0-1, 0-2, 0-5 are scored; 0-5 fails the threshold but the
    // component {0,1,2} and the kept set are unchanged
    val kept = Dedup.semanticDedup(vecs, "vec_id", "embedding", cents, 0.85,
        maxCell = 2)
      .select($"vec_id", $"dup_group_size").orderBy("vec_id").collect()
    assert(kept.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 3L), (3L, 2L), (5L, 1L)))
  }

  test("IVF ANN recalls the exact top-1 on clustered data") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    // 3 well-separated clusters in 8d
    val base = Seq(Array.fill(8)(0f), Array.fill(8)(0f), Array.fill(8)(0f))
      .zipWithIndex.map { case (a, i) => a.updated(i, 10f) }
    val vecs = (0L until 90L).map { i =>
      val c = (i % 3).toInt
      (i, base(c).map(x => x + rnd.nextFloat() * 0.1f))
    }.toDF("vec_id", "embedding")
    val centroids = Similarity.seedCentroids(vecs, 3)
    val cells = Similarity.assignCells(vecs, centroids)
    val queries = vecs.filter($"vec_id" === 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = Similarity.ivfTopK(cells, centroids, queries, 5, nprobe = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ann == exact) // same cluster -> full recall with nprobe=1
  }

  test("IVF recall on real embeddings: monotone in nprobe, exact at full probe") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = Similarity.kmeansRefine(emb,
      Similarity.seedCentroids(emb, 16), iters = 3)
    val cells = Similarity.assignCells(emb, centroids).cache()
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    def meanRecall(nprobe: Int): Double = {
      val ann = Similarity.ivfTopK(cells, centroids, queries, 10, nprobe)
        .select("query_id", "vec_id")
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val rs = exact.map { case (q, ex) =>
        ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
      rs.sum / rs.size
    }
    val r4 = meanRecall(4); val r8 = meanRecall(8); val r16 = meanRecall(16)
    // the driver's embeddings are near-uniform (worst case for IVF):
    // the contract is recall rising in nprobe, not a fixed bar
    assert(r4 >= 0.5, s"recall@10 with 1/4 of cells probed: $r4")
    assert(r8 >= r4 - 1e-9)
    assert(r16 == 1.0, "probing every cell must reproduce brute force exactly")
    cells.unpersist()
  }

  test("k-means refinement converges to cluster means and keeps recall") {
    import spark.implicits._
    val rnd = new scala.util.Random(2)
    val base = Seq(Array.fill(8)(0f), Array.fill(8)(0f), Array.fill(8)(0f))
      .zipWithIndex.map { case (a, i) => a.updated(i, 10f) }
    val vecs = (0L until 90L).map { i =>
      (i, base((i % 3).toInt).map(x => x + rnd.nextFloat() * 0.5f))
    }.toDF("vec_id", "embedding")
    // bad seed: first 3 vectors (all cluster 0/1/2 though; stride seeds)
    val seeded = Similarity.seedCentroids(vecs, 3)
    val refined = Similarity.kmeansRefine(vecs, seeded, iters = 3)
    assert(refined.count() <= 3)
    // refined centroids sit near the true cluster means: each base axis
    // dominates exactly one centroid
    val cents = refined.collect()
      .map(_.getAs[scala.collection.Seq[Float]]("__centroid"))
    val axes = cents.map(c => c.zipWithIndex.maxBy(_._1)._2).toSet
    assert(axes.size == cents.length)
    // recall with refined cells matches brute force
    val cells = Similarity.assignCells(vecs, refined)
    val queries = vecs.filter($"vec_id" === 7)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(vecs, queries, 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = Similarity.ivfTopK(cells, refined, queries, 5, nprobe = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ann == exact)
  }

  test("language ID: stopword + CJK heuristics") {
    val out = docs.select(col("doc_id"), TextFunctions.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "en")
    assert(out(4L) == "de")
    assert(out(5L) == "fr")
    assert(out(6L) == "zh")
    assert(out(7L) == "unknown")
  }

  test("gopher rules: clean prose passes, spam/empty/short docs fail the right rule") {
    import spark.implicits._
    val clean = ("the quick brown fox jumps over the lazy dog and runs to " +
      "the river in the morning light for it is a fine day ") * 3
    val cases = Seq(
      (1L, clean),                         // passes everything
      (2L, ""),                            // empty: words_ok false
      (3L, "buy now " * 60),               // no stopword signal, short words
      (4L, ("#### @@@@ %%%% " * 40) + "the a of and to in is that it for")
    ).toDF("doc_id", "text")
    val g = cases.select(col("doc_id"),
        TextFunctions.gopherStats(col("text")).as("g"))
      .select(col("doc_id"), col("g.*"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(g(1L).getAs[Boolean]("pass"))
    assert(!g(2L).getAs[Boolean]("words_ok") && !g(2L).getAs[Boolean]("pass"))
    assert(g(2L).getAs[Int]("n_words") == 0)
    assert(!g(3L).getAs[Boolean]("stopword_ok"))
    assert(!g(4L).getAs[Boolean]("symbol_ok") && !g(4L).getAs[Boolean]("pass"))
  }

  test("token counts, quality score bounds, fingerprints") {
    val r = docs.select(
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.subwordCount(col("text")).as("sw"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.contentFingerprint(col("text")).as("fp"),
      TextFunctions.rollingFingerprint(col("text")).as("rfp"))
      .collect()
    assert(r(0).getInt(0) == 14)
    assert(r(7).getInt(0) == 0) // empty text
    assert(r.forall(x => x.getDouble(2) >= 0.0 && x.getDouble(2) <= 1.0))
    assert(r(0).getLong(3) == r(1).getLong(3)) // same text, same fingerprint
    assert(r(0).getLong(3) != r(2).getLong(3))
  }

  test("readability: hand-counted sentences/syllables, floors, exact grade") {
    import spark.implicits._
    // "See the cat. It sat!" → 5 words, 2 sentences, 5 vowel groups
    // (ee, e, a, i, a); grade = 0.39*5/2 + 11.8*5/5 - 15.59 = -2.815
    val df = Seq(
      (1L, "See the cat. It sat!"),
      (2L, "no terminal punctuation here"),
      (3L, "")).toDF("id", "text")
    val out = df.select(col("id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("w"),
        TextFunctions.sentenceCount(col("text")).as("s"),
        TextFunctions.syllableCount(col("text")).as("y"),
        TextFunctions.fleschKincaidMicro(col("text")).as("g"))
      .orderBy("id").as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(out(0) == ((1L, 5L, 2L, 5L, -2815000L)))
    // floors: no [.!?] → 1 sentence; empty text → everything floored,
    // grade defined (0.39*1/1 + 11.8*1/1 - 15.59 = -3.4)
    assert(out(1)._3 == 1L)
    assert(out(2) == ((3L, 0L, 1L, 1L, -3400000L)))
  }

  test("media dedup manifest: identical bytes collapse to the lowest id") {
    import spark.implicits._
    val bin = Seq(
      (10L, Array[Byte](1, 2, 3)), (4L, Array[Byte](1, 2, 3)),
      (7L, Array[Byte](1, 2, 3)), (2L, Array[Byte](9, 9))
    ).toDF("id", "data")
    val m = Multimodal.mediaDedupManifest(
      Multimodal.attachMedia(bin, "data", "image/jpeg"), "id")
      .select("id", "dup_count").as[(Long, Long)].collect().sortBy(_._1)
    assert(m.toSeq == Seq((2L, 1L), (4L, 3L)))
  }

  test("multimodal: media struct, batch features, frame explode") {
    import spark.implicits._
    val bin = Seq((1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
      (2L, Array[Byte]()), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "data")
    val media = Multimodal.attachMedia(bin, "data", "image/jpeg")
    val actual = media.schema("media").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(actual.fields.map(f => (f.name, f.dataType)).toSeq
      == Multimodal.mediaType.fields.map(f => (f.name, f.dataType)).toSeq)
    val feats = Multimodal.extractImageFeatures(media)
    val byId = feats.select(col("id"), col("features.n_bytes"), col("features.mean_luma"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(byId(1L)._1 == 8 && byId(1L)._2 > 0)
    assert(byId(3L)._1 == 0)
    // deterministic: same input, same features
    val again = Multimodal.extractImageFeatures(media)
      .select(col("id"), col("features.mean_luma"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId.view.mapValues(_._2).toMap == again)
    val frames = Multimodal.explodeFrames(media, everyN = 4, "id")
    assert(frames.filter(col("id") === 1).count() == 4)
    assert(frames.filter(col("id") === 3).count() == 0)
  }

  test("stripMarkup: tags/script/style/comments out, entities decoded once") {
    import spark.implicits._
    val cases = Seq(
      ("<html><body><p>Hello <b>world</b></p></body></html>", "Hello world"),
      ("<script>var x = '<p>not text</p>';</script>after", "after"),
      ("<style type=\"text/css\">p { color: red }</style>styled", "styled"),
      ("before<!-- a > comment -->after", "before after"),
      ("fish &amp; chips &lt;cheap&gt;", "fish & chips <cheap>"),
      // &amp;lt; denotes the literal string "&lt;" — amp decodes LAST,
      // and the result must NOT be decoded again
      ("literal &amp;lt; stays", "literal &lt; stays"),
      ("a\n\n  b\t c", "a b c"),
      ("it&#39;s &quot;quoted&quot;&nbsp;here", "it's \"quoted\" here"))
    val got = cases.map(_._1).zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "t")
      .select(col("i"), graft.functions.TextFunctions.stripMarkup(col("t")))
      .as[(Int, String)].collect().sortBy(_._1).map(_._2).toSeq
    assert(got == cases.map(_._2))
  }

  test("canonicalizeUrl: equivalent spellings collapse, distinct stay apart") {
    import spark.implicits._
    val cases = Seq(
      // case, default port, tracking params, param order, fragment,
      // trailing slash — one canonical form
      ("HTTPS://Www.Ex.COM:443/a/?utm_source=x&b=2&a=1#frag",
        "https://www.ex.com/a?a=1&b=2"),
      ("https://www.ex.com/a?a=1&b=2", "https://www.ex.com/a?a=1&b=2"),
      ("http://ex.com:80/", "http://ex.com/"),
      ("http://ex.com", "http://ex.com/"),
      // NON-default port survives; so does an https :80
      ("http://ex.com:8080/x", "http://ex.com:8080/x"),
      ("https://ex.com:80/x", "https://ex.com:80/x"),
      // path CASE is significant; utm-only query drops entirely
      ("https://ex.com/CaseSensitive?gclid=1&utm_medium=m",
        "https://ex.com/CaseSensitive"),
      // a param NAMED utmost is not a tracking param
      ("https://ex.com/p?utmost=1", "https://ex.com/p?utmost=1"),
      // malformed: no scheme -> null
      ("www.ex.com/path", null),
      ("not a url", null))
    val got = cases.map(_._1).zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("i", "u")
      .select(col("i"), graft.functions.TextFunctions.canonicalizeUrl(col("u")))
      .as[(Int, Option[String])].collect().sortBy(_._1)
      .map(_._2.orNull).toSeq
    assert(got == cases.map(_._2), got.mkString("\n"))
  }

  test("int8 codes are byte-ranged and unit-norm scaled; zero vec guarded") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(3.0f, 4.0f, 0.0f)),          // norm 5 -> codes (76, 102, 0)
      (1L, Array(0.0f, 0.0f, 0.0f)),          // zero vector -> zero codes
      (2L, Array(-1.0f, 1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val codes = Similarity.int8Codes(vecs)
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) == Seq(76, 102, 0)) // round(127*3/5), round(127*4/5)
    assert(codes(1L) == Seq(0, 0, 0))
    assert(codes.values.forall(_.forall(c => c >= -127 && c <= 127)))
  }

  test("int8 ANN with a full rerank pool reproduces brute force exactly") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count().toInt
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val exact = Similarity.bruteForceTopK(emb, queries, 10)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val q8 = Similarity.int8TopK(emb, queries, 10, rerank = n)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(q8 == exact)
  }

  test("int8 ANN served from a persisted code table is identical") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_i8")
      .toString + "/codes"
    Similarity.int8Codes(emb).write.parquet(dir)
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val inline = Similarity.int8TopK(emb, queries, 10, rerank = 30)
    val served = Similarity.int8TopK(emb, queries, 10, rerank = 30,
      codes = Some(spark.read.parquet(dir)))
    assert(key(served) == key(inline))
  }

  test("int8 ANN recall beats 1-bit at the same 10% rerank pool") {
    import spark.implicits._
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding")
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(Similarity.bruteForceTopK(emb, queries, 10))
    val q8 = topSets(Similarity.int8TopK(emb, queries, 10, rerank = 30))
    val rs = exact.map { case (q, ex) =>
      q8.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size }
    val recall = rs.sum / rs.size
    // 8-bit codes keep ~7 bits of per-component signal — the candidate
    // order is near-exact, unlike the 1-bit floor of 0.4 on this data
    assert(recall >= 0.9, s"int8 recall@10 with 30/300 reranked: $recall")
  }

  test("label propagation: majority vote, tie to smallest, seeds immutable") {
    import spark.implicits._
    // path 1-2-3-4-5, seeds at the ends
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src_id", "nbr_id")
    val seeds = Seq((1L, 0), (5L, 1)).toDF("id", "label")
    def labs(iters: Int) =
      Similarity.labelPropagate(edges, seeds, iters)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    val one = labs(1)
    assert(one(2L).contains(0) && one(4L).contains(1))
    assert(one(3L).isEmpty, "center is 2 hops from any seed")
    val two = labs(2)
    // round 2: node 3 sees 0 (from 2) and 1 (from 4) — tie → smallest
    assert(two(3L).contains(0))
    assert(two(1L).contains(0) && two(5L).contains(1), "seeds never move")

    // majority beats minority; mutual (duplicated-direction) edges
    // vote once
    val star = Seq((10L, 11L), (11L, 10L), (10L, 12L), (10L, 13L))
      .toDF("src_id", "nbr_id")
    val sSeeds = Seq((11L, 1), (12L, 1), (13L, 0)).toDF("id", "label")
    val got = Similarity.labelPropagate(star, sSeeds, 1)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(got(10L).contains(1), s"2:1 majority must win, got $got")

    // isolated nodes: an edge-less seed keeps its label; with allNodes
    // every isolated corpus doc comes back (label null), none vanish
    val iso = Similarity.labelPropagate(edges,
        seeds.union(Seq((99L, 7)).toDF("id", "label")), 1)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(iso(99L).contains(7), s"isolated seed must keep its label: $iso")
    val full = Similarity.labelPropagate(edges, seeds, 1,
        allNodes = Some(Seq(1L, 2L, 3L, 4L, 5L, 42L).toDF("id")))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(full.contains(42L) && full(42L).isEmpty,
      s"isolated corpus node present with null label: $full")
  }

  test("media near-dup pairs: identical assets at hamming 0, no false pairs") {
    import spark.implicits._
    val bin = Seq(
      (1L, "same payload bytes"), (2L, "same payload bytes"),
      (3L, "a different asset"), (4L, "same payload bytes"),
      (5L, "yet another one")
    ).map { case (id, s) => (id, s.getBytes("UTF-8")) }.toDF("id", "data")
    val pairs = Multimodal.mediaNearDupPairs(
        Multimodal.attachMedia(bin, "data", "image/jpeg"), "id")
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 4L, 0), (2L, 4L, 0)))
  }

  test("softDedupWeights: cluster members share weight, singletons at 1e6") {
    import spark.implicits._
    // docs 0/1/2 form one near-dup cluster (exact + near), 3/4/5/6/7
    // are singletons
    val out = Dedup.softDedupWeights(docs, "text", "doc_id",
        minJaccard = 0.5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == (0L to 7L))
    val byId = out.map(r => r._1 -> r).toMap
    // the cluster: same component, size 3, weight round(1e6/3)
    assert(Seq(0L, 1L, 2L).map(byId(_)._2).distinct.size == 1)
    assert(Seq(0L, 1L, 2L).forall(id =>
      byId(id)._3 == 3L && byId(id)._4 == 333333L))
    // singletons: own component, full weight
    assert(Seq(3L, 4L, 5L, 6L, 7L).forall(id =>
      byId(id)._2 == id && byId(id)._3 == 1L && byId(id)._4 == 1000000L))
    // weights conserve mass: Σ weight ≈ distinct-cluster count × 1e6
    val mass = out.map(_._4).sum
    assert(math.abs(mass - 6L * 1000000L) <= 6)
  }

  test("softDedupWeightsFromPairs: pre-built graph seam, full-corpus singletons") {
    import spark.implicits._
    val ids = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.softDedupWeightsFromPairs(ids, pairs, "id")
      .orderBy("id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.filter(r => Seq(1L, 2L, 3L).contains(r._1))
      .forall(r => r._2 == 1L && r._3 == 3L && r._4 == 333333L))
    assert(out.filter(r => r._1 > 3L)
      .forall(r => r._2 == r._1 && r._3 == 1L && r._4 == 1000000L))
  }

  test("crossSourceDupFlow: planted inter-source duplicate matrix") {
    import spark.implicits._
    // A: {t1, t2, t3}; B: {t1, t1, t4}; C: {t2, t5}; D: {u} disjoint
    val docs = Seq(
      ("A", "t1"), ("A", "t2"), ("A", "t3"),
      ("B", "t1"), ("B", "t1"), ("B", "t4"),
      ("C", "t2"), ("C", "t5"),
      ("D", "u")).toDF("source", "text")
    val out = Dedup.crossSourceDupFlow(docs, "text", "source")
      .orderBy("src_a", "src_b")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    // A∩B share t1: 1 shared text, 1 doc of A, 2 docs of B (dup count!),
    // shares 1/3 and 2/3; A∩C share t2: 1/3 and 1/2. D never appears.
    assert(out == Seq(
      ("A", "B", 1L, 1L, 2L, 0.333333, 0.666667),
      ("A", "C", 1L, 1L, 1L, 0.333333, 0.5)))
    // layout-independent exact integers
    val again = Dedup.crossSourceDupFlow(docs.repartition(7), "text",
        "source").orderBy("src_a", "src_b")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(again == out)
  }

  test("effectiveTokenCensus: survivors attribute to the min-id source") {
    import spark.implicits._
    // "x y" appears in A twice and B once -> one survivor, owned by A
    val docs = Seq(
      (1L, "x y", "A"), (2L, "x y", "A"), (3L, "z", "A"),
      (4L, "x y", "B"), (5L, "w w w", "B")).toDF("doc_id", "text", "source")
    val out = Dedup.effectiveTokenCensus(docs, "text", "doc_id", "source")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("A", 3L, 5L, 2L, 3L, 0.4),  // doc 2 erased: 2 of 5 tokens gone
      ("B", 2L, 5L, 1L, 3L, 0.4))) // doc 4 erased (doc 1 won globally)
    val again = Dedup.effectiveTokenCensus(docs.repartition(5), "text",
        "doc_id", "source").orderBy("source")
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(again == out)
    // a source of pure duplicates collapses to zero effective tokens
    assert(Dedup.effectiveTokenCensus(
      docs.union(Seq((9L, "x y", "C")).toDF("doc_id", "text", "source")),
      "text", "doc_id", "source")
      .filter(col("source") === "C")
      .as[(String, Long, Long, Long, Long, Double)].collect().head ==
      (("C", 1L, 2L, 0L, 0L, 1.0)))
  }

  test("exactDedupTrail: every doc maps to its min-id winner") {
    import spark.implicits._
    val docs = Seq((5L, "x"), (2L, "x"), (9L, "x"), (7L, "y"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedupTrail(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((2L, 2L, true), (5L, 2L, false), (7L, 7L, true),
      (9L, 2L, false)))
    // the trail's survivor set IS Dedup.exact's survivor set
    val survivors = out.filter(_._3).map(_._1).toSet
    val exact = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == exact)
  }

  test("contaminationBySource: leaks attribute to the right source") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "a b c d e f", "crawl1"),  // contains the benchmark
      (2L, "z y x w v u", "crawl1"),
      (3L, "a b c d q r", "crawl2"),  // also contains it
      (4L, "m n o p q r", "clean"))
      .toDF("doc_id", "text", "source")
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.contaminationBySource(corpus, bench, "text",
        "doc_id", "source", n = 3, minContainment = 0.5)
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("clean", 0L, 1L, 0.0),
      ("crawl1", 1L, 2L, 0.5),
      ("crawl2", 1L, 1L, 1.0)))
  }

  test("contaminationCurve: planted overlap thins as n grows; short bench caps out") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d e"), (2L, "a x y z w"),
      (3L, "p q r s t")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.contaminationCurve(corpus, bench, "text", "doc_id",
        ns = Seq(2, 3, 5))
      .orderBy("n").as[(Int, Long, Long, Double)].collect().toSeq
    // n=2: doc 1 shares "a b"; n=3: doc 1 shares "a b c"; n=5: the
    // 3-token benchmark has no 5-grams -> every n still gets its row
    assert(out == Seq(
      (2, 1L, 3L, 0.333333),
      (3, 1L, 3L, 0.333333),
      (5, 0L, 3L, 0.0)))
    val again = Dedup.contaminationCurve(corpus.repartition(5), bench,
        "text", "doc_id", ns = Seq(2, 3, 5))
      .orderBy("n").as[(Int, Long, Long, Double)].collect().toSeq
    assert(again == out)
  }
}
