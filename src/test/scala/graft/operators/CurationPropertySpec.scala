package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property tests for the curation operators: the invariants that make
  * them safe to run incrementally at corpus scale — exhaustive/disjoint
  * splits, quota exactness under salting, packing bounds.
  */
class CurationPropertySpec extends SparkSpec {

  /** Raw-ScalaCheck sampling (the scalatest bridge isn't in the offline
    * cache): run the body over n deterministic samples. */
  private def forSamples[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit = {
    val params = Gen.Parameters.default
    (0 until n).foreach { i =>
      gen.apply(params, org.scalacheck.rng.Seed(7L + i)).foreach(body)
    }
  }

  import spark.implicits._

  test("unigramDrift is symmetric and bounded in [0, 1] for arbitrary corpora") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val doc = Gen.listOfN(6, word).map(_.mkString(" "))
    val corpus = Gen.listOfN(4, doc)
    forSamples(Gen.zip(corpus, corpus), n = 6) { case (as, bs) =>
      val a = as.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val b = bs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val ab = Curation.unigramDrift(a, b).head.getDouble(0)
      val ba = Curation.unigramDrift(b, a).head.getDouble(0)
      assert(ab == ba, s"JS not symmetric: $ab vs $ba")
      assert(ab >= 0.0 && ab <= 1.0, s"JS out of range: $ab")
    }
  }

  test("leakageSafeSplit: no pair straddles a split on random graphs") {
    val edge = for {
      a <- Gen.choose(1L, 30L); b <- Gen.choose(1L, 30L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val graph = Gen.choose(0, 15).flatMap(n => Gen.listOfN(n, edge))
    forSamples(graph, n = 6) { edges =>
      val docs = (1L to 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      val pairs = (if (edges.isEmpty) Seq((1L, 1L)) else edges)
        .toDF("id_a", "id_b")
      val split = Curation.leakageSafeSplit(docs, pairs, "doc_id",
          Seq(0.6, 0.2, 0.2), Seq("train", "val", "test"))
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(split.size == 30 && split.values.forall(_ != null))
      edges.foreach { case (a, b) =>
        assert(split(a) == split(b),
          s"pair ($a,$b) straddles ${split(a)}/${split(b)}")
      }
    }
  }

  test("snapshotDiff: self-diff is all unchanged; statuses partition both id sets") {
    val doc = Gen.zip(Gen.choose(1L, 40L), Gen.oneOf("a", "b", "c", "dd"))
    val corpus = Gen.choose(1, 20).flatMap(n => Gen.listOfN(n, doc))
      .map(_.distinctBy(_._1))
    forSamples(Gen.zip(corpus, corpus), n = 6) { case (o, nn) =>
      val od = o.toDF("doc_id", "text")
      val nd = nn.toDF("doc_id", "text")
      val self = Curation.snapshotDiff(od, od, "doc_id", "text")
        .select("status").distinct().as[String].collect().toSet
      assert(self.subsetOf(Set("unchanged")))
      val diff = Curation.snapshotDiff(od, nd, "doc_id", "text")
        .as[(Long, String)].collect()
      assert(diff.map(_._1).distinct.length == diff.length, "one row per id")
      val byId = diff.toMap
      val (oIds, nIds) = (o.map(_._1).toSet, nn.map(_._1).toSet)
      assert(byId.keySet == oIds ++ nIds)
      oIds.diff(nIds).foreach(i => assert(byId(i) == "removed"))
      nIds.diff(oIds).foreach(i => assert(byId(i) == "added"))
      val (om, nm) = (o.toMap, nn.toMap)
      oIds.intersect(nIds).foreach { i =>
        assert(byId(i) == (if (om(i) == nm(i)) "unchanged" else "changed"))
      }
    }
  }

  test("chunkBySentences reassembles the sentence stream on arbitrary docs") {
    val sentence = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 99).map(i => s"w$i")))
      .map(_.mkString(" ") + ".")
    val doc = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, sentence))
      .map(_.mkString(" "))
    forSamples(Gen.listOfN(3, doc), n = 6) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Curation.chunkBySentences(df, "text", "doc_id", 7)
        .orderBy("doc_id", "chunk_id")
        .select("doc_id", "chunk_text")
        .as[(Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).mkString(" ")).toMap
      docs.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == t, s"doc $i must reassemble exactly")
      }
    }
  }

  test("winnowing guarantee holds on arbitrary docs with planted shared runs") {
    import graft.functions.TextFunctions
    // random word soup around a shared run of exactly w+k-1 tokens
    // planted at a random position in both docs — the paper's theorem:
    // the run must produce >= 1 shared fingerprint, whatever surrounds it
    val (k, w) = (3, 4)
    val word = Gen.choose(0, 9999).map(i => s"w$i")
    val run = (1 to (w + k - 1)).map(i => s"run$i").mkString(" ")
    val pad = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))
    val docPair = for {
      a1 <- pad; a2 <- pad; b1 <- pad; b2 <- pad
    } yield ((a1 :+ run) ++ a2).mkString(" ") ->
      ((b1 :+ run) ++ b2).mkString(" ")
    forSamples(docPair, n = 8) { case (da, db) =>
      val fps = Seq((1L, da), (2L, db)).toDF("doc_id", "text")
        .select(col("doc_id"),
          TextFunctions.winnowFingerprints(col("text"), k, w).as("fp"))
        .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2.toSet).toMap
      assert((fps(1L) & fps(2L)).nonEmpty,
        s"planted ${w + k - 1}-token run produced no shared fingerprint:\n$da\n$db")
    }
  }

  test("dedupLinesWithinDoc == quadratic first-occurrence definition; " +
      "50k-line doc stays in the fast path") {
    // equivalence: the sort-based plan must match the direct O(L²)
    // definition (keep first occurrence, preserve order) on arbitrary
    // docs with heavy duplication and empty lines
    val line = Gen.oneOf("nav", "footer", "", "body text", "a", "b b", "c")
    val doc = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, line))
    forSamples(Gen.listOfN(5, doc), n = 8) { docs =>
      val df = docs.zipWithIndex.map { case (ls, i) =>
        (i.toLong, ls.mkString("\n")) }.toDF("doc_id", "text")
      val got = Curation.dedupLinesWithinDoc(df, "text")
        .orderBy("doc_id").select("text").as[String].collect()
      val want = docs.map(_.foldLeft(Vector.empty[String]) { (acc, l) =>
        if (acc.contains(l)) acc else acc :+ l
      }.mkString("\n"))
      assert(got.toSeq == want.toSeq)
    }
    // scale guard: a pathological 50k-line doc (a dumped log) completes
    // in bounded time — the round-4 array_position formulation was
    // O(L²) ≈ 2.5e9 string compares in ONE task and would stall here
    val big = (0 until 50000).map(i => s"line ${i % 1000}").mkString("\n")
    val t0 = System.nanoTime()
    val out = Curation.dedupLinesWithinDoc(
      Seq((1L, big)).toDF("doc_id", "text"), "text")
      .select("text").as[String].head()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out == (0 until 1000).map(i => s"line $i").mkString("\n"))
    assert(sec < 30.0, f"50k-line doc took $sec%.1f s — quadratic path?")
  }

  test("hashSplit is an exact partition for arbitrary weights") {
    val weightsGen = Gen.listOfN(Gen.choose(2, 5).sample.get,
      Gen.choose(1, 10).map(_.toDouble))
    forSamples(Gen.zip(weightsGen, Gen.choose(1L, 99999L))) {
      case (ws, seed) if ws.nonEmpty =>
        val ids = (1L to 500L).toDF("id")
        val splits = Curation.hashSplit(ids, col("id"), ws, seed)
        val collected = splits.map(_.as[Long].collect().toSet)
        assert(collected.map(_.size).sum == 500) // exhaustive
        collected.combinations(2).foreach { case Seq(a, b) =>
          assert(a.intersect(b).isEmpty) // pairwise disjoint
        }
      case _ => ()
    }
  }

  test("chunkDocuments reconstructs every token stream exactly, any geometry") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").limit(120).cache()
    val want = docs
      .select(col("doc_id"), filter(split(col("text"), "\\s+"),
        t => length(t) > 0).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    forSamples(Gen.zip(Gen.choose(2, 64), Gen.choose(0, 40)), n = 6) {
      case (chunk, rawOverlap) =>
        val overlap = rawOverlap % chunk
        val got = Curation.chunkDocuments(docs, "text", "doc_id",
            chunk, overlap)
          .orderBy("doc_id", "chunk_idx")
          .collect()
          .groupBy(_.getLong(0))
          .map { case (id, rows) =>
            // chunk 0 whole, later chunks minus their `overlap` head,
            // concatenated, must be the original token stream
            id -> rows.sortBy(_.getInt(1)).zipWithIndex.flatMap {
              case (r, 0) => r.getString(2).split(" ").toList
              case (r, _) => r.getString(2).split(" ").drop(overlap).toList
            }.toList
          }
        val nonEmpty = want.filter(_._2.nonEmpty)
        assert(got.keySet == nonEmpty.keySet)
        nonEmpty.foreach { case (id, toks) =>
          assert(got(id) == toks, s"doc $id chunk=$chunk overlap=$overlap")
        }
    }
  }

  test("quotaPerGroup == naive global rank for arbitrary data and salt counts") {
    val rowsGen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 100000L)))
    forSamples(Gen.zip(rowsGen, Gen.choose(1, 16), Gen.choose(1, 7))) {
      case (rows, salts, k) =>
        val distinctRows = rows.distinct // orderCol must be unique per use
        val df = distinctRows.map { case (g, o) => (s"g$g", o) }
          .toDF("grp", "ord").distinct()
        val got = Curation.quotaPerGroup(df, Seq("grp"), "ord", k, salts)
          .as[(String, Long)].collect().toSet
        val want = df.as[(String, Long)].collect()
          .groupBy(_._1).values.flatMap(_.sortBy(_._2).take(k)).toSet
        assert(got == want)
    }
  }

  test("mixtureWeights: weights normalize; expected kept tokens never exceed budget") {
    val srcGen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 5), Gen.choose(1, 50)))
    forSamples(Gen.zip(srcGen, Gen.choose(0.1, 1.0), Gen.choose(50L, 5000L))) {
      case (rows, temp, budget) =>
        val df = rows.zipWithIndex
          .map { case ((s, n), i) => (i.toLong, Seq.fill(n)("w").mkString(" "), s"s$s") }
          .toDF("doc_id", "text", "source")
        val w = Curation.mixtureWeights(df, "source",
            graft.functions.TextFunctions.tokenCount(col("text")), temp, budget)
          .as[(String, Long, Double, Double)].collect()
        assert(math.abs(w.map(_._3).sum - 1.0) < 1e-9)
        assert(w.forall { case (_, _, wt, r) => wt > 0 && r > 0 && r <= 1.0 })
        // E[kept tokens] = Σ rate·n = Σ min(budget·w, n) ≤ Σ budget·w = budget
        val expectedKept = w.map { case (_, n, _, r) => r * n }.sum
        assert(expectedKept <= budget + 1e-6)
        // smaller temperature ⇒ small sources get a weakly larger share
        val w2 = Curation.mixtureWeights(df, "source",
            graft.functions.TextFunctions.tokenCount(col("text")),
            math.max(0.05, temp / 2), budget)
          .as[(String, Long, Double, Double)].collect()
        val (minSrc, _, minW, _) = w.minBy(_._2)
        val minW2 = w2.find(_._1 == minSrc).get._3
        assert(minW2 >= minW - 1e-9)
    }
  }

  test("lengthBatches: contiguous length ranges, full batches, beats id-order waste") {
    val tokGen = Gen.listOfN(70, Gen.choose(1, 800))
    forSamples(Gen.zip(tokGen, Gen.choose(2, 16))) { case (toks, bs) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t.toLong) }
        .toDF("doc_id", "n_tok")
      val got = Curation.lengthBatches(df, "n_tok", "doc_id", bs)
        .as[(Long, Long, Long)].collect()
      val byBatch = got.groupBy(_._3)
      val last = byBatch.keys.max
      // every batch full except the last; ids partition exactly
      byBatch.foreach { case (b, rs) =>
        assert(rs.length == bs || b == last, s"batch $b size ${rs.length}")
      }
      assert(got.map(_._1).toSet == toks.indices.map(_.toLong).toSet)
      // batches are contiguous length ranges: max(batch b) <= min(b+1)
      val ordered = byBatch.toSeq.sortBy(_._1)
      ordered.sliding(2).foreach {
        case Seq((_, a), (_, c)) =>
          assert(a.map(_._2).max <= c.map(_._2).min)
        case _ => ()
      }
      // the whole point: length-sorted batching never wastes more
      // padding than naive id-order batching
      def waste(batches: Seq[Seq[Long]]): Long =
        batches.map(b => b.length * b.max - b.sum).sum
      val sortedWaste = waste(ordered.map(_._2.map(_._2).toSeq))
      val naiveWaste = waste(
        toks.map(_.toLong).grouped(bs).toSeq)
      assert(sortedWaste <= naiveWaste,
        s"sorted $sortedWaste > naive $naiveWaste")
    }
  }

  test("apportionTokens == driver-side Hamilton; quotas sum EXACTLY to budget") {
    val rowGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0, 11), Gen.choose(1, 5000)))
    forSamples(Gen.zip(rowGen, Gen.choose(0L, 3000000L))) {
      case (rows, budget) =>
        val df = rows.zipWithIndex.map { case ((g, n), i) =>
          (i.toLong, s"src$g", n.toLong) }.toDF("id", "source", "n_tok")
        val got = Curation.apportionTokens(df, "source", col("n_tok"), budget)
          .as[(String, Long, Long)].collect().sortBy(_._1)
        // independent replication with BigInt arithmetic
        val counts = rows.groupBy(_._1).map { case (g, rs) =>
          (s"src$g", rs.map(_._2.toLong).sum) }.toSeq.sortBy(_._1)
        val tot = counts.map(_._2).sum
        val base = counts.map { case (g, n) =>
          (g, n, (BigInt(budget) * n / tot).toLong,
            (BigInt(budget) * n % tot)) }
        val leftover = budget - base.map(_._3).sum
        val winners = base.sortBy { case (g, _, _, r) => (-r, g) }
          .take(leftover.toInt).map(_._1).toSet
        val want = base.map { case (g, n, b, _) =>
          (g, n, b + (if (winners(g)) 1L else 0L)) }.sortBy(_._1)
        assert(got.toSeq == want, s"budget=$budget\n got=${got.toSeq}\nwant=$want")
        assert(got.map(_._3).sum == budget, "quotas must sum exactly to budget")
    }
    // decimal headroom: a 10^15-token budget over 10^12-token sources
    // (products ~10^27, inside decimal(38,0)) still sums exactly and
    // matches the BigInt replication — the long path would overflow
    val big = Seq((1L, "a", 999999999999L), (2L, "b", 123456789012L),
      (3L, "c", 1L)).toDF("id", "source", "n_tok")
    val B = 1000000000000000L
    val gotBig = Curation.apportionTokens(big, "source", col("n_tok"), B)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(gotBig.map(_._3).sum == B, gotBig.toSeq.toString)
    val tot = BigInt(999999999999L) + BigInt(123456789012L) + 1
    val base = Seq(("a", BigInt(999999999999L)), ("b", BigInt(123456789012L)),
      ("c", BigInt(1))).map { case (g, n) =>
      (g, n, (BigInt(B) * n / tot).toLong, BigInt(B) * n % tot) }
    val left = B - base.map(_._3).sum
    val win = base.sortBy { case (g, _, _, r) => (-r, g) }
      .take(left.toInt).map(_._1).toSet
    val wantBig = base.map { case (g, n, b, _) =>
      (g, n.toLong, b + (if (win(g)) 1L else 0L)) }.sortBy(_._1)
    assert(gotBig.toSeq == wantBig, s"got=${gotBig.toSeq}\nwant=$wantBig")
  }

  test("packSequences: every pack except a group's last starts under budget") {
    val tokGen = Gen.listOfN(60, Gen.choose(1, 900))
    forSamples(Gen.zip(tokGen, Gen.choose(100, 1000))) { case (toks, budget) =>
      val df = toks.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "n_tok")
      val packed = Curation.packSequences(df, "n_tok", "doc_id", budget)
        .groupBy("pack_id")
        .agg(sum("n_tok").cast("long").as("tot"), max("n_tok").as("mx"))
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      // first pack starts at 0 (ids may skip when one doc spans several
      // budget units — bins are indexed by budget offset, not ordinal)
      assert(packed.head._1 == 0L)
      // each pack's total minus its last-added overflow doc is < budget:
      // equivalently total < budget + its largest doc
      packed.foreach { case (_, tot, mx) => assert(tot < budget + mx) }
      // no tokens lost
      assert(packed.map(_._2).sum == toks.map(_.toLong).sum)
    }
  }

  test("epochUpsample's extra-copy slice IS hashSamplePortable at the fraction") {
    import org.apache.spark.sql.functions._
    val docs = (1L to 600L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    forSamples(Gen.choose(0, 29), n = 6) { tenths =>
      val e = 1.0 + tenths / 10.0 // 1.0 to 3.9 epochs
      val out = Curation.epochUpsample(docs, col("doc_id"), "source",
        Map("src1" -> e), seed = 11)
        .filter(col("source") === "src1")
        .groupBy("doc_id").agg(count(lit(1)).as("copies"))
        .as[(Long, Long)].collect().toMap
      val src1 = docs.filter(col("source") === "src1")
      val extra = Curation.hashSamplePortable(src1, col("doc_id"),
        e - math.floor(e), seed = 11)
        .select("doc_id").as[Long].collect().toSet
      // every src1 doc appears floor(e) times, plus once iff the
      // portable cut selects it — the exact recipe contract
      src1.select("doc_id").as[Long].collect().foreach { id =>
        val expected = math.floor(e).toLong + (if (extra(id)) 1L else 0L)
        assert(out.getOrElse(id, 0L) == expected,
          s"e=$e id=$id: got ${out.getOrElse(id, 0L)}, want $expected")
      }
    }
  }
}
