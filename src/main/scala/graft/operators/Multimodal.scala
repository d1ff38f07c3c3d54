package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BINARY
  * columns + typed metadata struct, with batch-oriented per-partition
  * processing (the Scala analogue of `mapInPandas`).
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED — the container ships no media libraries — behind
  * [[Codecs]], a single seam whose implementations here produce
  * deterministic fake outputs with the real shapes. Everything Spark
  * cares about (schema, nullability, partition-wise batching, column
  * pruning of heavy binary columns) is real and tested.
  */
object Multimodal {

  val MediaCol = "media"

  /** media struct: raw bytes + mime + declared dims/duration. */
  val mediaType: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType)))

  /** Wrap a binary column (+ mime) into the canonical media struct. */
  def attachMedia(df: DataFrame, bytesCol: String, mime: String): DataFrame =
    df.withColumn(MediaCol, struct(
      col(bytesCol).as("bytes"),
      lit(mime).as("mime"),
      lit(null).cast(IntegerType).as("width"),
      lit(null).cast(IntegerType).as("height"),
      lit(null).cast(IntegerType).as("duration_ms")))

  /** Exact content dedup over raw media assets: one row per DISTINCT
    * byte content — the keeper (lowest id), its md5, and how many
    * assets shared those bytes. This is the manifest a 100 TB asset
    * store persists; filtering the store is then a semi-join on the
    * keeper ids. The md5 runs map-side next to the scan, so the only
    * thing that ever shuffles is (hash, id) — ~50 bytes per asset, the
    * raw bytes themselves never cross the wire (same discipline as the
    * text exact-dedup path, `Dedup.scala`). */
  def mediaDedupManifest(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol), md5(col(s"$MediaCol.bytes")).as("media_md5"))
      .groupBy(col("media_md5"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .select(col(idCol), col("media_md5"), col("dup_count"))

  /** NEAR-duplicate media pairs by 60-bit perceptual-hash Hamming
    * distance — re-encoded/resized variants of one asset land within a
    * few bits where [[mediaDedupManifest]]'s exact content hash only
    * catches byte-identical copies. The pairing machinery is the real
    * part and is shared verbatim with the text SimHash path
    * ([[Dedup.blockedHammingPairs]]): 4×15-bit pigeonhole blocks
    * (complete to Hamming ≤ 3), hot-bucket census → star-edge degrade,
    * only (id, sig, block) longs ever shuffle — the bytes stay at the
    * scan. The HASH is the codec seam: here a deterministic 60-bit
    * content hash (first 15 md5 hex chars — engine-replayable, so the
    * whole pipeline oracles in SQL); a real deployment swaps a DCT
    * pHash / chromaprint per mime at decode time without touching the
    * join. Output: (id_a, id_b, hamming), id_a < id_b. */
  def mediaNearDupPairs(df: DataFrame, idCol: String, maxDistance: Int = 3,
      maxBlockBucket: Int = 1024): DataFrame = {
    require(maxDistance <= 3, "block scheme guarantees completeness only to 3")
    val sigs = df.select(col(idCol).as("__id"),
      conv(substring(md5(col(s"$MediaCol.bytes")), 1, 15), 16, 10)
        .cast("long").as("__sig"))
    Dedup.blockedHammingPairs(Dedup.blockMembers(sigs, 4, 15),
      maxDistance, maxBlockBucket)
  }

  // ---- codec seam (STUBS — deterministic fakes, real signatures) -----

  /** The decode seam. Real deployments swap in imageio/ffmpeg-backed
    * implementations; these fakes derive stable pseudo-features from the
    * bytes so tests exercise the full pipeline deterministically. */
  object Codecs {
    /** STUB image decode: (width, height, meanLuma) pseudo-derived. */
    def decodeImage(bytes: Array[Byte]): (Int, Int, Double) = {
      val n = if (bytes == null) 0 else bytes.length
      val w = 16 + (math.abs(n * 2654435761L) % 1024).toInt
      val h = 16 + (math.abs(n * 40503L) % 1024).toInt
      val luma = if (n == 0) 0.0
        else bytes.iterator.map(b => (b & 0xff).toDouble).sum / n / 255.0
      (w, h, luma)
    }

    /** STUB resize: returns a deterministic re-hash of the input sized
      * proportionally to the target area. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.max(1, (w * h) / 64))
      var i = 0
      while (i < out.length) {
        out(i) = (if (bytes == null || bytes.isEmpty) i
          else bytes(i % bytes.length) + i).toByte
        i += 1
      }
      out
    }

    /** STUB frame sampling: byte-range slices standing in for frames. */
    def sampleFrames(bytes: Array[Byte], everyN: Int): Seq[Array[Byte]] = {
      if (bytes == null || bytes.isEmpty) Seq.empty
      else bytes.grouped(math.max(1, bytes.length / everyN)).take(everyN).toSeq
    }
  }

  private val featureSchema = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_luma", DoubleType),
    StructField("n_bytes", IntegerType)))

  /** Batch feature extraction over the media column — per-partition
    * iterator processing (constant memory, no driver collection), the
    * shape a vectorized decode needs. Appends a `features` struct. */
  def extractImageFeatures(df: DataFrame): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("features", featureSchema))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val media = r.getAs[Row](MediaCol)
        val bytes = if (media == null) null else media.getAs[Array[Byte]]("bytes")
        val (w, h, luma) = Codecs.decodeImage(bytes)
        val n = if (bytes == null) 0 else bytes.length
        Row.fromSeq(r.toSeq :+ Row(w, h, luma, n))
      }
    }(enc)
  }

  /** Frame-sample a video media column into one row per frame
    * (generator shape: explode after per-partition decode). */
  def explodeFrames(df: DataFrame, everyN: Int, idCol: String): DataFrame = {
    val schema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_no", IntegerType),
      StructField("frame_bytes", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.select(col(idCol), col(MediaCol)).mapPartitions { rows =>
      rows.flatMap { r =>
        val media = r.getAs[Row](MediaCol)
        val bytes = if (media == null) null else media.getAs[Array[Byte]]("bytes")
        Codecs.sampleFrames(bytes, everyN).zipWithIndex.map {
          case (f, i) => Row(r.get(0), i, f)
        }
      }
    }(enc)
  }
}
