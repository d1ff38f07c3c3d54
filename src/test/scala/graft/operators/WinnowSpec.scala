package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Full-winnowing fingerprints (Schleimer et al., SIGMOD'03) and the
  * overlap-pair detector built on them. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = 3
  private val w = 4

  /** Driver-side reference winnow over a precomputed gram-hash stream —
    * the algorithm restated independently of the column-algebra form. */
  private def refWinnow(grams: Seq[Long]): Set[Long] =
    if (grams.isEmpty) Set.empty
    else if (grams.size <= w) Set(grams.min)
    else grams.sliding(w).map(_.min).toSet

  test("fingerprint set equals a driver-side winnow of the gram stream") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "tiny"),
      (3L, "exactly three tokens here"),
      (4L, "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    ).toDF("doc_id", "text")
    // gram hashes via the same xxhash64 the operator uses, collected in
    // token order, then winnowed in plain Scala
    val gramRows = docs.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0),
          greatest(size(TextFunctions.tokens(col("text"))) - k, lit(0))),
        i => when(size(TextFunctions.tokens(col("text"))) < k,
            xxhash64(concat_ws(" ", TextFunctions.tokens(col("text")))))
          .otherwise(xxhash64((0 until k).map(j =>
            element_at(TextFunctions.tokens(col("text")), i + j + 1)): _*))))
        .as(Seq("pos", "h")))
      .orderBy("doc_id", "pos")
      .as[(Long, Int, Long)].collect()
    val expect = gramRows.groupBy(_._1).view
      .mapValues(rs => refWinnow(rs.sortBy(_._2).map(_._3).toSeq)).toMap
    val got = docs.select(col("doc_id"),
        TextFunctions.winnowFingerprints(col("text"), k, w).as("fp"))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, fp) => id -> fp.toSet }.toMap
    assert(got == expect)
  }

  test("guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    // the copied passage is w+k-1 = 6 tokens long, embedded in
    // otherwise-disjoint documents
    val passage = "galaxies rotate faster than visible matter allows"
    val docs = Seq(
      (1L, s"alpha beta gamma $passage delta epsilon zeta"),
      (2L, s"one two three four five $passage six seven eight nine"),
      (3L, "entirely different text with no overlap whatsoever at all")
    ).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        TextFunctions.winnowFingerprints(col("text"), k, w).as("fp"))
      .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2.toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "copied passage must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty, "disjoint docs share nothing")
  }

  test("density: far fewer fingerprints than grams, never zero") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val n = df.select(size(TextFunctions.winnowFingerprints(col("text"), k, w)))
      .as[Int].head()
    val grams = 200 - k + 1
    // expected density 2/(w+1) = 0.4; allow generous slack both ways
    assert(n > 0 && n < grams,
      s"$n fingerprints from $grams grams should be a strict subset")
    assert(n <= (grams * 0.7).toInt, s"density too high: $n of $grams")
  }

  test("portable twin follows the same selection on md5 gram hashes") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "short doc")
    ).toDF("doc_id", "text")
    def md560(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expect = docs.as[(Long, String)].collect().map { case (id, text) =>
      val toks = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val grams =
        if (toks.size < k) Seq(md560(toks.mkString(" ")))
        else toks.sliding(k).map(g => md560(g.mkString(" "))).toSeq
      id -> refWinnow(grams)
    }.toMap
    val got = docs.select(col("doc_id"),
        TextFunctions.winnowFingerprintsPortable(col("text"), k, w).as("fp"))
      .as[(Long, Seq[Long])].collect()
      .map { case (id, fp) => id -> fp.toSet }.toMap
    assert(got == expect)
  }

  test("overlap pairs find the copied passage; boilerplate df-cap suppresses noise") {
    val passage = "galaxies rotate faster than visible matter allows tonight"
    val header = "site navigation home about contact terms privacy policy"
    // 12 docs all carry the boilerplate header (df = 12 > maxDf = 8);
    // only docs 1 and 2 share a real copied passage
    val docs = (1L to 12L).map { i =>
      val body =
        if (i == 1L) s"$passage plus original commentary alpha beta gamma delta"
        else if (i == 2L) s"totally different intro then $passage and an outro"
        else s"unique body number $i " +
          (1 to 8).map(j => s"u${i}x$j").mkString(" ")
      (i, s"$header $body")
    }.toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, "text", "doc_id",
        k = k, w = w, minShared = 1, maxDf = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "copied passage pair must surface")
    // header fingerprints are corpus-wide boilerplate — dropped, so no
    // all-pairs explosion among the other 10 docs
    assert(pairs.forall { case (a, b) => (a, b) == ((1L, 2L)) },
      s"boilerplate must not pair unrelated docs, got $pairs")
  }

  test("overlap pairs: fast and portable paths agree on the pair set") {
    val passage = "shared reused paragraph with enough tokens to fingerprint"
    val docs = Seq(
      (1L, s"intro text $passage closing remarks"),
      (2L, s"other document body $passage different ending entirely"),
      (3L, "unrelated filler content about gardening and soil quality")
    ).toDF("doc_id", "text")
    def pairsOf(portable: Boolean) =
      Dedup.winnowOverlapPairs(docs, "text", "doc_id", k = k, w = w,
          minShared = 1, maxDf = 64, portable = portable)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairsOf(false) == pairsOf(true))
  }
}
