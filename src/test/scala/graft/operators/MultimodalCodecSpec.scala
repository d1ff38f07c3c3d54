package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The real image codec path: the hand-rolled BMP encoder must
  * round-trip through the JDK's independent ImageIO BMP reader
  * pixel-exactly (padding, bottom-up rows, channel order), and the
  * feature/hash layers must compute from those real pixels. */
class MultimodalCodecSpec extends SparkSpec {
  import Multimodal.Codecs

  private def fmt(seed: Long, x: Int, y: Int, brighten: Int): (Int, Int, Int) = (
    math.min(255, ((seed * 7 + x * 13 + y * 31) % 256).toInt + brighten),
    math.min(255, ((seed * 11 + x * 3 + y * 17) % 256).toInt + brighten),
    math.min(255, ((seed * 5 + x * 29 + y * 7) % 256).toInt + brighten))

  test("encodeBmp round-trips through ImageIO pixel-exactly, padded widths included") {
    // w=3 exercises 3-byte row padding, w=4 none, w=5 1-byte padding
    for (w <- Seq(3, 4, 5, 16); h <- Seq(1, 2, 7)) {
      val bytes = Multimodal.encodeBmp(w, h,
        (x, y) => ((x * 40 + y) % 256, (y * 70 + x) % 256, (x + y * 3) % 256))
      val img = Codecs.readImage(bytes).getOrElse(
        fail(s"ImageIO rejected the ${w}x$h BMP"))
      assert(img.getWidth == w && img.getHeight == h)
      for (x <- 0 until w; y <- 0 until h) {
        val rgb = img.getRGB(x, y)
        assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) ==
          ((x * 40 + y) % 256, (y * 70 + x) % 256, (x + y * 3) % 256),
          s"pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  test("decodeImagePixels returns the exact integer luma sum") {
    val (w, h, seed) = (11, 9, 42L)
    val expect = (for (x <- 0 until w; y <- 0 until h) yield {
      val (r, g, b) = fmt(seed, x, y, 0)
      (r + g + b).toLong
    }).sum
    val got = Codecs.decodeImagePixels(Multimodal.syntheticBmp(seed, w, h))
    assert(got.contains((w, h, expect)))
  }

  test("pixelHash60: saturated extremes, analytic parity, brightness flips few bits") {
    val white = Codecs.readImage(
      Multimodal.encodeBmp(8, 8, (_, _) => (255, 255, 255))).get
    assert(Codecs.pixelHash60(white) == (1L << 60) - 1)
    val black = Codecs.readImage(
      Multimodal.encodeBmp(8, 8, (_, _) => (0, 0, 0))).get
    assert(Codecs.pixelHash60(black) == 0L)

    def analytic(seed: Long, w: Int, h: Int, brighten: Int): Long =
      (0 until 60).foldLeft(0L) { (sig, i) =>
        val (r, g, b) = fmt(seed, (i * 7) % w, (i * 11) % h, brighten)
        if (r + g + b >= 384) sig | (1L << i) else sig
      }
    for (seed <- 0L until 20L) {
      val (w, h) = (8 + (seed % 9).toInt, 8 + (seed % 7).toInt)
      val base = Codecs.pixelHash60(
        Codecs.readImage(Multimodal.syntheticBmp(seed, w, h)).get)
      assert(base == analytic(seed, w, h, 0), s"seed $seed analytic parity")
      val bright = Codecs.pixelHash60(
        Codecs.readImage(Multimodal.syntheticBmp(seed, w, h, brighten = 1)).get)
      assert(java.lang.Long.bitCount(base ^ bright) <= 3,
        s"seed $seed: +1 brightness flipped more than the near-threshold bits")
    }
  }

  test("undecodable and non-image mimes fall to the stub path (null luma_sum)") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticBmp(1L, 9, 8), "image/bmp"),
      (2L, "not an image at all".getBytes("UTF-8"), "image/bmp"),
      (3L, Multimodal.syntheticBmp(3L, 9, 8), "text/plain"))
      .toDF("id", "data", "mime")
    val media = df.withColumn(Multimodal.MediaCol, struct(
      col("data").as("bytes"), col("mime").as("mime"),
      lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
      lit(null).cast("int").as("duration_ms")))
    val out = Multimodal.extractImageFeatures(media)
      .select(col("id"), col("features.luma_sum"), col("features.width"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).isDefined, "real decode must fill luma_sum")
    assert(out(2L).isEmpty, "garbage bytes must fall to the stub, not throw")
    assert(out(3L).isEmpty, "non-image mime must skip the real decode")
  }

  test("resizeImageFeatures: identity resize reproduces the decode's exact sums; non-image null") {
    import spark.implicits._
    val w = 9
    val h = 6
    val media = Multimodal.attachMedia(
      Seq((1L, Multimodal.syntheticBmp(1L, w, h)),
        (2L, "not an image".getBytes("UTF-8")))
        .toDF("id", "data"), "data", "image/bmp")
    // identity dims: src = (x·w) div w = x — rgb_sum must equal the
    // decoder's luma_sum over the SAME pixels, and phase_sum the
    // hand-replayed formula
    val got = Multimodal.resizeImageFeatures(media, w, h)
      .select(col("id"), col("resized")).collect()
      .map(r => r.getLong(0) -> Option(r.getStruct(1))).toMap
    val expRgb = (for (x <- 0 until w; y <- 0 until h) yield {
      val (r, g, b) = fmt(1L, x, y, 0); (r + g + b).toLong
    }).sum
    val expPhase = (for (x <- 0 until w; y <- 0 until h) yield {
      val (r, g, _) = fmt(1L, x, y, 0); x.toLong * r + y.toLong * g
    }).sum
    val s1 = got(1L).getOrElse(fail("image row must resize"))
    assert(s1.getInt(0) == w && s1.getInt(1) == h)
    assert(s1.getLong(2) == expRgb, s"rgb_sum ${s1.getLong(2)} != $expRgb")
    assert(s1.getLong(3) == expPhase, s"phase_sum ${s1.getLong(3)} != $expPhase")
    assert(got(2L).isEmpty, "non-image must carry a null resized struct")
    // downscale to 3x2 samples exactly the formula at (x*w div 3, y*h div 2)
    val down = Multimodal.resizeImageFeatures(media, 3, 2)
      .filter(col("id") === 1L).select("resized.rgb_sum")
      .as[Long].collect().head
    val expDown = (for (x <- 0 until 3; y <- 0 until 2) yield {
      val (r, g, b) = fmt(1L, x * w / 3, y * h / 2, 0); (r + g + b).toLong
    }).sum
    assert(down == expDown, s"downscale rgb_sum $down != $expDown")
  }

  test("encodeWav round-trips through javax.sound sample-exactly; garbage is None") {
    // hand-rolled RIFF writer vs the JDK's independent WAV reader —
    // decoded samples must match the formula the writer used
    def sample(seed: Long, i: Int): Int =
      (((seed * 31 + i.toLong * 17) % 4096) - 2048).toInt
    for (seed <- Seq(0L, 3L, 19L); n <- Seq(1, 64, 301)) {
      val got = Multimodal.Codecs.decodeAudioPcm(
        Multimodal.syntheticWav(seed, n))
      val expAmp = (0 until n).map(i => sample(seed, i).toLong).sum
      val expPhase = (0 until n).map(i => i.toLong * sample(seed, i)).sum
      assert(got.contains((n.toLong, 8000, expAmp, expPhase)),
        s"seed=$seed n=$n got=$got")
    }
    // garbage / empty bytes: None, never a throw
    assert(Multimodal.Codecs.decodeAudioPcm(Array.fill(64)(0x5A.toByte)).isEmpty)
    assert(Multimodal.Codecs.decodeAudioPcm(Array.emptyByteArray).isEmpty)
    assert(Multimodal.Codecs.decodeAudioPcm(null).isEmpty)
  }

  test("extractAudioFeatures: audio mime decodes, others and corrupt get null struct") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticWav(1L, 64)),
      (2L, Array.fill(32)(0x42.toByte)),          // corrupt audio
      (3L, Multimodal.syntheticWav(3L, 10))
    ).toDF("id", "data")
    val audio = Multimodal.extractAudioFeatures(
      Multimodal.attachMedia(df, "data", "audio/wav"))
    val rows = audio.select(col("id"), col("audio")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(rows(1L).isDefined && rows(3L).isDefined && rows(2L).isEmpty)
    // a non-audio mime never enters the decoder
    val txt = Multimodal.extractAudioFeatures(
      Multimodal.attachMedia(Seq((9L, "abc".getBytes("UTF-8")))
        .toDF("id", "data"), "data", "text/plain"))
    assert(txt.filter(col("audio").isNotNull).isEmpty)
  }

  test("audioNearDupPairs finds amplitude-shifted re-encodes from real samples") {
    import spark.implicits._
    def wav(id: Long, shift: Int): Array[Byte] = {
      val sd = id * 1103515245L + 12345L
      Multimodal.encodeWav((64 + id % 57).toInt, 8000, j => math.min(
        ((sd * (j.toLong * j + 7) + j.toLong * 17) % 4096 - 2048).toInt
          + shift, 2047))
    }
    val base = (0L until 30L).map(i => (i, wav(i, 0)))
    val reups = (0L until 8L).map(i => (i + 1000L, wav(i, 64)))
    val media = Multimodal.attachMedia(
      (base ++ reups).toDF("id", "data"), "data", "audio/wav")
    val pairs = Multimodal.audioNearDupPairs(media, "id")
      .as[(Long, Long, Int)].collect().toSet
    for (i <- 0L until 8L)
      assert(pairs.exists(p => p._1 == i && p._2 == i + 1000L),
        s"re-encode of $i not found; pairs=$pairs")
    // unrelated clips (quadratic per-seed waveforms) never pair
    assert(pairs.forall(p => p._2 == p._1 + 1000L), pairs.toString)
    // and the fingerprint itself: a shifted re-encode stays within 3
    // bits of its base while unrelated clips sit far apart
    val s0 = Multimodal.Codecs.audioHash60(wav(0L, 0)).get
    val s0r = Multimodal.Codecs.audioHash60(wav(0L, 64)).get
    val s1 = Multimodal.Codecs.audioHash60(wav(1L, 0)).get
    assert(java.lang.Long.bitCount(s0 ^ s0r) <= 3)
    assert(java.lang.Long.bitCount(s0 ^ s1) > 10)
  }

  test("mediaPixelNearDupPairs finds brightened re-uploads from real pixels") {
    import spark.implicits._
    val base = (0L until 40L).map(i =>
      (i, Multimodal.syntheticBmp(i, 8 + (i % 9).toInt, 8 + (i % 7).toInt)))
    val reups = (0L until 10L).map(i =>
      (i + 1000L, Multimodal.syntheticBmp(i, 8 + (i % 9).toInt,
        8 + (i % 7).toInt, brighten = 1)))
    val df = (base ++ reups).toDF("id", "data")
    val media = Multimodal.attachMedia(df, "data", "image/bmp")
    val pairs = Multimodal.mediaPixelNearDupPairs(media, "id")
      .as[(Long, Long, Int)].collect().toSet
    // every re-upload pairs with its original (≤3 near-threshold flips)
    for (i <- 0L until 10L)
      assert(pairs.exists(p => p._1 == i && p._2 == i + 1000L),
        s"re-upload of $i not found; pairs=$pairs")
  }

  test("encodeAvi round-trips through the RIFF walk byte-exactly, odd sizes padded") {
    // odd-length frames exercise even-byte chunk padding
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5, 6, 7),
      Array.tabulate(257)(i => (i * 3).toByte))
    val avi = Codecs.encodeAvi(frames, 8, 8, fourcc = "MPNG")
    val got = Codecs.aviFrames(avi).getOrElse(fail("walker rejected the AVI"))
    assert(got.size == 3)
    got.zip(frames).foreach { case (g, f) => assert(g.sameElements(f)) }
  }

  test("aviFrames: non-AVI bytes are None; truncated container stops cleanly") {
    assert(Codecs.aviFrames(null).isEmpty)
    assert(Codecs.aviFrames("just some text bytes".getBytes).isEmpty)
    assert(Codecs.aviFrames(Multimodal.syntheticBmp(1L, 8, 8)).isEmpty)
    val avi = Codecs.encodeAvi(
      Seq(Array[Byte](1, 2, 3, 4), Array[Byte](5, 6, 7, 8)), 4, 4)
    // cut mid-chunk: the walk returns what it can, never throws
    val cut = java.util.Arrays.copyOf(avi, avi.length - 6)
    assert(Codecs.aviFrames(cut).exists(_.size <= 2))
  }

  test("syntheticAvi frames decode to the analytic pixel formula (Motion-PNG)") {
    val (id, w, h, nf) = (42L, 9, 10, 4)
    val frames = Codecs.aviFrames(Multimodal.syntheticAvi(id, w, h, nf)).get
    assert(frames.size == nf)
    for (f <- 0 until nf) {
      val (gw, gh, luma) = Codecs.decodeImagePixels(frames(f)).getOrElse(
        fail(s"PNG frame $f undecodable"))
      val expect = (for (x <- 0 until w; y <- 0 until h) yield
        ((id * 7 + f * 19 + x * 13 + y * 31) % 256) +
          ((id * 11 + f * 23 + x * 3 + y * 17) % 256) +
          ((id * 5 + f * 29 + x * 29 + y * 7) % 256)).sum
      assert((gw, gh, luma) == (w, h, expect), s"frame $f")
    }
  }

  test("Motion-JPEG leg: JPEG frames walk out and decode to the right dimensions") {
    // JPEG is lossy, so the pixel witness is dims-exact only — the
    // container walk and the JDK decode path are identical to MPNG
    val img = new java.awt.image.BufferedImage(
      12, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val avi = Codecs.encodeAvi(Seq(bos.toByteArray, bos.toByteArray),
      12, 7, fourcc = "MJPG")
    val frames = Codecs.aviFrames(avi).get
    assert(frames.size == 2)
    frames.foreach { f =>
      val (w, h, _) = Codecs.decodeImagePixels(f).getOrElse(
        fail("JPEG frame undecodable"))
      assert((w, h) == (12, 7))
    }
  }

  test("JDK μ-law expansion matches the analytic G.711 formula for all 256 codes") {
    // one WAV carrying every μ-law code byte 0..255 in order; the JDK
    // ULAW converter inside decodeAudioPcm must produce exactly the
    // CCITT expansion: u = ~code & 0xff, mag = ((u&15)·8+132)·2^((u>>4)&7) − 132
    def g711(code: Int): Long = {
      val u = ~code & 0xff
      val mag = (((u & 0xf) << 3) + 0x84 << ((u >> 4) & 7)) - 0x84
      if ((u & 0x80) != 0) -mag.toLong else mag.toLong
    }
    val wav = Multimodal.encodeWavUlaw(256, 8000, i => i)
    val (n, sr, amp, phase) = Codecs.decodeAudioPcm(wav).getOrElse(
      fail("JDK rejected the μ-law WAV"))
    val expAmp = (0 until 256).map(g711).sum
    val expPhase = (0 until 256).map(i => i * g711(i)).sum
    assert((n, sr, amp, phase) == (256L, 8000, expAmp, expPhase))
    // the sign fingerprint rides the same expansion
    assert(Codecs.audioHash60(wav).isDefined)
    // non-expandable compressed bytes still fall to None, never throw
    assert(Codecs.decodeAudioPcm("not audio at all".getBytes).isEmpty)
  }

  test("JDK A-law expansion matches the analytic G.711 formula for all 256 codes") {
    def g711a(code: Int): Long = {
      val u = code ^ 0x55
      val exp = (u >> 4) & 7
      val mant = u & 0xf
      val mag = if (exp == 0) (mant << 4) + 8
        else ((mant << 4) + 0x108) << (exp - 1)
      if ((u & 0x80) != 0) mag.toLong else -mag.toLong
    }
    val wav = Multimodal.encodeWavAlaw(256, 8000, i => i)
    val (n, sr, amp, phase) = Codecs.decodeAudioPcm(wav).getOrElse(
      fail("JDK rejected the A-law WAV"))
    val expAmp = (0 until 256).map(g711a).sum
    val expPhase = (0 until 256).map(i => i * g711a(i)).sum
    assert((n, sr, amp, phase) == (256L, 8000, expAmp, expPhase))
  }

  test("extractVideoFrames: every-2nd sampling keeps original frame indexes") {
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("doc_id")
      .withColumn("data", udf((id: Long) =>
        Multimodal.syntheticAvi(id, 8, 8, 5)).apply(col("doc_id")))
    val media = Multimodal.attachMedia(df, "data", "video/avi")
    val rows = Multimodal.extractVideoFrames(media, everyN = 2, "doc_id")
      .select("doc_id", "frame_no").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(rows == Set((1L, 0), (1L, 2), (1L, 4), (2L, 0), (2L, 2), (2L, 4)))
    // explodeFrames takes the SAME container walk for AVI bytes
    val exploded = Multimodal.explodeFrames(media, everyN = 2, "doc_id")
      .select("doc_id", "frame_no").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(exploded == rows)
  }

  test("videoHash60 matches the analytic replay and clamped re-encodes stay near") {
    def params(id: Long) =
      ((8 + id % 5).toInt, (8 + id % 3).toInt, (2 + id % 4).toInt)
    def analytic(id: Long, shift: Long): Long = {
      val (w, h, nf) = params(id)
      (0 until 60).foldLeft(0L) { (sig, i) =>
        val f = i % nf; val x = (i * 7) % w; val y = (i * 13) % h
        val lum =
          math.min((id * 7 + f * 19 + x * 13 + y * 31) % 256 + shift, 255) +
          math.min((id * 11 + f * 23 + x * 3 + y * 17) % 256 + shift, 255) +
          math.min((id * 5 + f * 29 + x * 29 + y * 7) % 256 + shift, 255)
        if (lum >= 384) sig | (1L << i) else sig
      }
    }
    for (id <- 0L until 12L; shift <- Seq(0, 4)) {
      val (w, h, nf) = params(id)
      val got = Codecs.videoHash60(
        Multimodal.syntheticAvi(id, w, h, nf, shift)).get
      assert(got == analytic(id, shift.toLong),
        s"id=$id shift=$shift: walk/decode/fingerprint disagree with formula")
    }
    // the near-dup contract: a +4-clamped re-encode flips only the
    // bits whose luma sits within 12 of the threshold — most copies
    // land inside the ≤3-bit pairing radius (the pairing set itself is
    // whatever the signature predicts; the m13 oracle replays exactly
    // that, so outliers are consistent on both sides, not misses)
    val flips = (0L until 12L).map(id =>
      java.lang.Long.bitCount(analytic(id, 0) ^ analytic(id, 4)))
    assert(flips.count(_ <= 3) >= 8, flips.toString)
    assert(java.lang.Long.bitCount(analytic(0, 0) ^ analytic(1, 0)) > 10)
    // corrupt container / non-AVI bytes must not kill a scan
    assert(Codecs.videoHash60(Array[Byte](1, 2, 3)).isEmpty)
    assert(Codecs.videoHash60("RIFFxxxxAVI LIST".getBytes).isEmpty)
  }

  test("pngTextChunks round-trips spliced captions; the spliced PNG still decodes") {
    val texts = Seq("alt" -> "a red square", "source_url" -> "https://x/1",
      "note" -> "") // empty value is legal tEXt
    val png = Multimodal.syntheticPngText(5L, 9, 8, texts)
    // the walker recovers the planted pairs, in stream order
    assert(Codecs.pngTextChunks(png) == texts)
    // the splice is spec-compliant: the JDK still decodes the image,
    // and to the exact synthetic pixel formula (luma replay)
    val (w, h, luma) = Codecs.decodeImagePixels(png).getOrElse(
      fail("ImageIO rejected the spliced PNG"))
    val expected = (for { x <- 0 until 9; y <- 0 until 8 } yield
      ((5L * 7 + x * 13 + y * 31) % 256) + ((5L * 11 + x * 3 + y * 17) % 256) +
        ((5L * 5 + x * 29 + y * 7) % 256)).sum
    assert((w, h, luma) == ((9, 8, expected)))
    // non-PNG and truncated bytes never throw
    assert(Codecs.pngTextChunks(null) == Nil)
    assert(Codecs.pngTextChunks("BM not a png".getBytes) == Nil)
    assert(Codecs.pngTextChunks(png.take(30)) == Nil) // cut inside IHDR
    val cutMid = png.take(png.length - 6) // cut inside IEND's crc
    assert(Codecs.pngTextChunks(cutMid) == texts,
      "pairs before the truncation point still harvest")
    // a corrupt chunk declaring ~2^31 bytes must not wrap the Int
    // bounds math and crash the walk
    val bomb = png.take(8) ++
      Array(0x7f, 0xff, 0xff, 0xf0).map(_.toByte) ++ "tEXt".getBytes ++
      Array.fill(8)(0.toByte)
    assert(Codecs.pngTextChunks(bomb) == Nil)
    // a PNG with no tEXt yields no rows
    val bare = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(Codecs.pngTextChunks(bare) == Nil)
  }

  test("extractImageText harvests one row per tEXt pair, skips non-PNG assets") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticPngText(1L, 8, 8,
        Seq("alt" -> "one", "lang" -> "en"))),
      (2L, Multimodal.syntheticBmp(2L, 8, 8)), // BMP: no text chunks
      (3L, "garbage".getBytes)).toDF("doc_id", "data")
    val out = Multimodal.extractImageText(
        Multimodal.attachMedia(df, "data", "image/png"), "doc_id")
      .as[(Long, String, String)].collect().toSet
    assert(out == Set((1L, "alt", "one"), (1L, "lang", "en")))
  }

  test("syntheticMjpegAvi: real lossy JPEG frames, bright-count witness exact") {
    import spark.implicits._
    var anyLossy = false
    for (id <- 0L until 12L) {
      val w = (16 + 8 * (id % 3)).toInt
      val h = (16 + 8 * (id % 2)).toInt
      val nf = (2 + id % 4).toInt
      val avi = Multimodal.syntheticMjpegAvi(id, w, h, nf)
      val frames = Multimodal.Codecs.aviFrames(avi).get
      assert(frames.size == nf)
      // frames are REAL JPEG streams (SOI marker), not the PNG path
      assert(frames.forall(f =>
        (f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8))
      def lightCells(f: Int): Long =
        (for (cx <- 0 until w / 8; cy <- 0 until h / 8
          if (cx + cy + id + f) % 2 == 0) yield 1L).sum
      frames.zipWithIndex.foreach { case (fb, f) =>
        val (dw, dh, bright) = Multimodal.Codecs.decodeImageBright(fb).get
        assert(dw == w && dh == h)
        assert(bright == 64L * lightCells(f),
          s"id=$id f=$f: bright=$bright expected=${64L * lightCells(f)}")
        // lossiness probe PER PIXEL (the luma SUM can cancel: the
        // ramp's block mean is integral, so AC-zeroing decodes to a
        // uniform block with the identical sum): any decoded pixel
        // differing from its pre-encode value proves the quantizer
        // actually lost the AC content
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(fb))
        var x = 0
        while (x < w && !anyLossy) {
          var y = 0
          while (y < h && !anyLossy) {
            val ramp = (x % 8) + (y % 8)
            val light = (x / 8 + y / 8 + id + f) % 2 == 0
            val v = if (light) 255 - ramp else ramp
            if ((img.getRGB(x, y) & 0xff) != v) anyLossy = true
            y += 1
          }
          x += 1
        }
      }
    }
    assert(anyLossy, "every JPEG round-trip was pixel-exact — fixture " +
      "has no AC content for the quantizer to lose?")
    // the operator path: witness rows bind to original stream indexes
    val media = Multimodal.attachMedia(
      Seq((5L, Multimodal.syntheticMjpegAvi(5L, 16, 16, 4)))
        .toDF("id", "data"), "data", "video/avi")
    val rows = Multimodal.extractFrameBrightness(media, everyN = 2, "id")
      .as[(Long, Int, Int, Int, Long)].collect().sortBy(_._2)
    assert(rows.map(_._2).toSeq == Seq(0, 2))
  }

  test("videoNearDupPairs finds brightness-bumped re-encodes from real frames") {
    import spark.implicits._
    def avi(id: Long, shift: Int) = Multimodal.syntheticAvi(
      id, (8 + id % 5).toInt, (8 + id % 3).toInt, (2 + id % 4).toInt, shift)
    val base = (0L until 24L).map(i => (i, avi(i, 0)))
    val reups = (0L until 8L).map(i => (i + 1000L, avi(i, 4)))
    val media = Multimodal.attachMedia(
      (base ++ reups).toDF("id", "data"), "data", "video/avi")
    val pairs = Multimodal.videoNearDupPairs(media, "id")
      .as[(Long, Long, Int)].collect().toSet
    // every re-encode within 3 fingerprint bits of its base is found —
    // exactly the pairs the analytic signature predicts
    def sig(id: Long, shift: Int) =
      Multimodal.Codecs.videoHash60(avi(id, shift)).get
    for (i <- 0L until 8L
        if java.lang.Long.bitCount(sig(i, 0) ^ sig(i, 4)) <= 3)
      assert(pairs.exists(p => p._1 == i && p._2 == i + 1000L),
        s"re-encode of $i not found; pairs=$pairs")
    // and nothing outside the predicted ≤3-bit set appears
    val all = (base.map(b => (b._1, sig(b._1, 0))) ++
      reups.map(r => (r._1, sig((r._1 - 1000L), 4))))
    val expected = (for {
      (ia, sa) <- all; (ib, sb) <- all
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(pairs.map(p => (p._1, p._2)) == expected)
  }
}
