package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Binary-column plumbing: the header decoder must agree with the native
  * (codegen'd) path on the features both can compute, parse pinned
  * public-format fixtures correctly, and round-trip its own builders.
  */
class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.synthesizeMediaTable(Tables.documents(spark, sfDir))
  lazy val images = Multimodal.synthesizeImageTable(spark, Tables.documents(spark, sfDir))

  test("decoder-path md5/n_bytes match the native binaryStats path") {
    val native = Multimodal.binaryStats(media)
      .select("media_id", "n_bytes", "content_md5")
    val decoded = Multimodal
      .extractFeatures(spark, media, Multimodal.HeaderDecoder)
      .select("media_id", "n_bytes", "content_md5")
    assert(native.exceptAll(decoded).count() == 0)
    assert(decoded.exceptAll(native).count() == 0)
  }

  // Pinned fixtures written byte-by-byte from the public specs — NOT via
  // the builders — so a mirrored builder/parser bug cannot self-certify.
  test("parses a hand-pinned 1x1 transparent PNG (public fixture)") {
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(Multimodal.parseImageDimensions(png).contains((1, 1)))
  }

  test("parses a hand-pinned JPEG SOF0 (640x480) with preceding segments") {
    val hex =
      "ffd8" +                                   // SOI
        "ffe000104a46494600010100000100010000" + // APP0 JFIF, len 16
        "fffe0007636f6d6d74" +                   // COM len 7 "commt"
        "ffc0001108" + "01e0" + "0280" +         // SOF0 len 17, 8-bit, h=480, w=640
        "03012200021101031101" +                 // 3 components
        "ffd9"                                   // EOI
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(Multimodal.parseImageDimensions(bytes).contains((640, 480)))
  }

  test("parses a hand-pinned GIF89a logical screen descriptor (10x20)") {
    val bytes = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x0a, 0x00, 0x14, 0x00, 0x70, 0, 0, 0x3b)
    assert(Multimodal.parseImageDimensions(bytes).contains((10, 20)))
  }

  test("non-image payloads parse to None / decode to 0x0") {
    assert(Multimodal.parseImageDimensions("just text".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.parseImageDimensions(Array.empty[Byte]).isEmpty)
    // JPEG with no SOF before EOI
    val noSof = Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)
    assert(Multimodal.parseImageDimensions(noSof).isEmpty)
  }

  test("build → parse round-trips across formats and dimensions") {
    val dims = Seq((1, 1), (16, 16), (640, 480), (2063, 17), (65535, 65535))
    dims.foreach { case (w, h) =>
      assert(Multimodal.parseImageDimensions(Multimodal.buildPng(w, h)).contains((w, h)))
      assert(Multimodal.parseImageDimensions(Multimodal.buildJpeg(w, h)).contains((w, h)))
      assert(Multimodal.parseImageDimensions(Multimodal.buildGif(w, h)).contains((w, h)))
    }
    // PNG can exceed u16
    assert(Multimodal.parseImageDimensions(
      Multimodal.buildPng(1 << 20, 3)).contains((1 << 20, 3)))
  }

  test("image table dimensions follow the synth formula for every format") {
    val rows = Multimodal
      .extractFeatures(spark, images, Multimodal.HeaderDecoder)
      .select("media_id", "media_type", "width", "height")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("width") == (16 + id % 2048).toInt)
      assert(r.getAs[Int]("height") == (16 + (id * 7) % 2048).toInt)
    }
  }

  test("frame sampling reassembles to the original payload length") {
    import spark.implicits._
    val one = Seq((1L, "text/plain", ("x" * 700).getBytes("UTF-8")))
      .toDF("media_id", "media_type", "content")
    // every=1 keeps all frames: 700 bytes at 256/frame → 256+256+188
    val frames = Multimodal.frameSample(one, frameBytes = 256, every = 1).collect()
    assert(frames.map(_.getAs[Long]("frame_bytes")).toSeq == Seq(256L, 256L, 188L))
    // every=2 keeps frames 0 and 2
    val sampled = Multimodal.frameSample(one, frameBytes = 256, every = 2).collect()
    assert(sampled.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
  }

  test("resize preserves bounds: never exceeds maxSide, never upscales") {
    val features = Multimodal.extractFeatures(spark, images, Multimodal.HeaderDecoder)
    val resized = Multimodal.resizeMeta(features, maxSide = 256)
      .join(features, "media_id").collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (rw, rh) = (r.getAs[Int]("resized_w"), r.getAs[Int]("resized_h"))
      assert(math.max(rw, rh) <= 256)
      assert(rw <= w && rh <= h) // never upscale (w,h >= 16 here)
      assert(rw >= 1 && rh >= 1)
      if (math.max(w, h) <= 256) assert(rw == w && rh == h) // no-op under the cap
    }
  }

  // ---- real pixel decode (inflate + unfilter) ----------------------------

  /** Independent per-pixel reference: a plain double loop over the synth
    * formulas, sharing no code with builder or decoder.
    */
  private def referencePixelStats(
      id: Long, w: Int, h: Int): Multimodal.PngPixelStats = {
    var rS = 0L; var gS = 0L; var bS = 0L
    var rMn = 255; var rMx = 0; var gMn = 255; var gMx = 0
    var bMn = 255; var bMx = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((id + x) % 256).toInt
      val g = ((3 * id + 17 + y) % 256).toInt
      val b = ((5 * id + 31 + x) % 256).toInt
      rS += r; gS += g; bS += b
      rMn = math.min(rMn, r); rMx = math.max(rMx, r)
      gMn = math.min(gMn, g); gMx = math.max(gMx, g)
      bMn = math.min(bMn, b); bMx = math.max(bMx, b)
    }
    Multimodal.PngPixelStats(w, h, w.toLong * h, rS, gS, bS,
      rMn, rMx, gMn, gMx, bMn, bMx, 255, 255)
  }

  test("decodes the hand-pinned PUBLIC 1x1 PNG's pixels (independent encoder)") {
    // the same public fixture the dimension test pins — produced by a
    // real external encoder, so a mirrored builder/decoder bug cannot
    // self-certify. Its IDAT inflates to scanline [filter=Sub, 00 00 ff 7f]:
    // one semi-transparent blue pixel (0, 0, 255, 127).
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val s = Multimodal.decodePngPixelStats(png).get
    assert(s == Multimodal.PngPixelStats(1, 1, 1L, 0L, 0L, 255L,
      0, 0, 0, 0, 255, 255, 127, 127))
  }

  test("pixel PNG build → decode round-trips against an independent reference") {
    // heights ≥ 5 so all five scanline filters (y % 5) are exercised
    for ((id, w, h) <- Seq((0L, 16, 16), (7L, 1, 7), (123L, 63, 5),
        (999999L, 48, 33), (250L, 300, 300))) {
      val got = Multimodal.decodePngPixelStats(Multimodal.buildPngPixels(id, w, h))
      assert(got.contains(referencePixelStats(id, w, h)), s"id=$id $w x $h")
    }
  }

  test("gray and RGB pixel PNGs decode with the documented channel semantics") {
    val id = 42L
    // RGB (color type 2): same stats as RGBA minus the alpha channel
    val rgb = Multimodal.decodePngPixelStats(
      Multimodal.buildPngPixels(id, 20, 11, colorType = 2)).get
    assert(rgb == referencePixelStats(id, 20, 11))
    // gray (color type 0): r = g = b = the r formula
    val gray = Multimodal.decodePngPixelStats(
      Multimodal.buildPngPixels(id, 20, 11, colorType = 0)).get
    assert(gray.rSum == gray.gSum && gray.gSum == gray.bSum)
    assert(gray.rSum == referencePixelStats(id, 20, 11).rSum)
    assert(gray.aMin == 255 && gray.aMax == 255)
  }

  test("Adam7-interlaced PNGs decode to the same statistics as their twins") {
    // the seven passes only permute pixel positions — stats must equal
    // the non-interlaced closed form; odd/small dims exercise empty and
    // single-pixel passes
    for ((id, w, h, ct) <- Seq((11L, 20, 10, 6), (3L, 7, 5, 2),
        (42L, 16, 16, 6), (5L, 3, 2, 2), (9L, 1, 1, 6))) {
      val bytes = Multimodal.buildPngPixels(id, w, h, ct, interlace = true)
      val got = Multimodal.decodePngPixelStats(bytes)
      assert(got.contains(referencePixelStats(id, w, h)),
        s"id=$id $w x $h ct=$ct")
      // and the stream really declares Adam7 in IHDR
      assert(bytes(28) == 1, "interlace byte not set")
    }
    // gray: r = g = b = the r formula, across the pass permutation
    val g = Multimodal.decodePngPixelStats(
      Multimodal.buildPngPixels(77L, 9, 23, colorType = 0, interlace = true)).get
    val grayRef = (0 until 9).map(x => ((77L + x) % 256).toInt)
    assert(g.rSum == 23L * grayRef.sum && g.rSum == g.gSum && g.gSum == g.bSum)
    assert(g.rMin == grayRef.min && g.rMax == grayRef.max)
  }

  test("ImageIO (independent codec) reads our Adam7 streams pixel-exactly") {
    // PNG is lossless: the JDK decoder must reproduce the closed-form
    // pixels EXACTLY from our interlaced stream — a pass-layout or
    // filter mistake in the encoder cannot self-certify past this
    val (id, w, h) = (13L, 21, 11)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      Multimodal.buildPngPixels(id, w, h, colorType = 2, interlace = true)))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == ((id + x) % 256).toInt, s"r($x,$y)")
      assert(((rgb >> 8) & 0xff) == ((3 * id + 17 + y) % 256).toInt, s"g($x,$y)")
      assert((rgb & 0xff) == ((5 * id + 31 + x) % 256).toInt, s"b($x,$y)")
    }
  }

  test("pixel PNGs carry two IDAT chunks and decode concatenates them") {
    val png = Multimodal.buildPngPixels(5L, 24, 24)
    var off = 8; var idats = 0
    while (off + 8 <= png.length) {
      val len = ((png(off) & 0xff) << 24) | ((png(off + 1) & 0xff) << 16) |
        ((png(off + 2) & 0xff) << 8) | (png(off + 3) & 0xff)
      val t = new String(png, off + 4, 4, "US-ASCII")
      if (t == "IDAT") idats += 1
      off += 12 + len
    }
    assert(idats == 2)
    assert(Multimodal.decodePngPixelStats(png).isDefined)
  }

  test("pixel decode quarantines: no IDAT, bombs, bad filters, truncated zlib") {
    // header-only PNG (the dimension fixture) has no pixel data
    assert(Multimodal.decodePngPixelStats(Multimodal.buildPng(8, 8)).isEmpty)
    // declared dimensions over the decode ceiling must reject BEFORE
    // allocating (decompression-bomb guard): 1M x 1M RGBA ≈ 4 TB
    assert(Multimodal.decodePngPixelStats(
      Multimodal.buildPng(1 << 20, 1 << 20)).isEmpty)
    // a stream whose first scanline declares filter type 9
    val bad = {
      val raw = Array[Byte](9) ++ new Array[Byte](4) // 1x1 RGBA, bad filter
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](64)
      val n = d.deflate(buf); d.end()
      val sig = Multimodal.buildPngPixels(0L, 1, 1).take(8)
      val ihdrData = Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 6, 0, 0, 0)
      sig ++ pngChunkForTest("IHDR", ihdrData) ++
        pngChunkForTest("IDAT", buf.take(n)) ++
        pngChunkForTest("IEND", Array.empty[Byte])
    }
    assert(Multimodal.decodePngPixelStats(bad).isEmpty)
    // declared height SMALLER than the encoded scanlines: the zlib
    // stream carrying MORE data than IHDR declares is corruption (e.g.
    // bit-rot in the height field), not a smaller valid image
    val shrunk = Multimodal.buildPngPixels(2L, 8, 4)
    shrunk(20) = 0; shrunk(21) = 0; shrunk(22) = 0; shrunk(23) = 2 // h 4 → 2
    assert(Multimodal.decodePngPixelStats(shrunk).isEmpty)
    // truncated zlib stream: drop the final IDAT chunk entirely
    val full = Multimodal.buildPngPixels(3L, 32, 32)
    val iendLen = 12
    var off = 8; var secondIdatStart = -1; var seen = 0
    while (off + 8 <= full.length && secondIdatStart < 0) {
      val len = ((full(off) & 0xff) << 24) | ((full(off + 1) & 0xff) << 16) |
        ((full(off + 2) & 0xff) << 8) | (full(off + 3) & 0xff)
      if (new String(full, off + 4, 4, "US-ASCII") == "IDAT") {
        seen += 1
        if (seen == 2) secondIdatStart = off
      }
      off += 12 + len
    }
    val withoutSecond = full.take(secondIdatStart) ++ full.takeRight(iendLen)
    assert(Multimodal.decodePngPixelStats(withoutSecond).isEmpty)
  }

  private def pngChunkForTest(t: String, data: Array[Byte]): Array[Byte] = {
    val tb = t.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(tb); crc.update(data)
    val len = data.length
    Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte) ++
      tb ++ data ++ {
        val v = crc.getValue.toInt
        Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      }
  }

  test("pixel-stats operator face matches the closed forms at fixture scale") {
    val face = Multimodal.extractPixelStats(
      spark, Multimodal.synthesizePixelImageTable(spark, Tables.documents(spark, sfDir)))
      .collect()
    assert(face.nonEmpty)
    face.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val w = (16 + id % 48).toInt
      val h = (16 + (id * 7) % 48).toInt
      val ref = referencePixelStats(id, w, h)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Long]("n_pixels") == w.toLong * h)
      assert(r.getAs[Double]("r_mean") ==
        BigDecimal(ref.rSum.toDouble / (w.toLong * h))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Long]("lum_milli") ==
        (299 * ref.rSum + 587 * ref.gSum + 114 * ref.bSum) / (w.toLong * h))
      assert(r.getAs[Int]("r_min") == ref.rMin && r.getAs[Int]("r_max") == ref.rMax)
      assert(r.getAs[Int]("g_min") == ref.gMin && r.getAs[Int]("g_max") == ref.gMax)
      assert(r.getAs[Int]("b_min") == ref.bMin && r.getAs[Int]("b_max") == ref.bMax)
      assert(r.getAs[Int]("a_min") == 255 && r.getAs[Int]("a_max") == 255)
    }
  }

  test("PixelFeatureDecoder: pixel-derived embedding for PNGs, digest only past the codec boundary") {
    import spark.implicits._
    val png = Multimodal.buildPngPixels(11L, 20, 10)
    val jpeg = Multimodal.buildJpeg(64, 64)
    val rows = Seq((1L, "image/png", png), (2L, "image/jpeg", jpeg))
      .toDF("media_id", "media_type", "content")
    val feats = Multimodal.extractFeatures(spark, rows, Multimodal.PixelFeatureDecoder)
      .collect().map(r => r.getAs[Long]("media_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")).toMap
    val ref = referencePixelStats(11L, 20, 10)
    val n = 200.0
    val expected = Seq(
      (ref.rSum / n / 255.0).toFloat, (ref.gSum / n / 255.0).toFloat,
      (ref.bSum / n / 255.0).toFloat,
      (((299.0 * ref.rSum + 587.0 * ref.gSum + 114.0 * ref.bSum) / 1000.0) / n / 255.0).toFloat,
      ((ref.rMax - ref.rMin) / 255.0).toFloat,
      ((ref.gMax - ref.gMin) / 255.0).toFloat,
      ((ref.bMax - ref.bMin) / 255.0).toFloat,
      ((math.log(200.0) / math.log(2.0)) / 32.0).toFloat)
    assert(feats(1L).toSeq == expected)
    // a header-only JPEG has no pixels at all: digest stand-in
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(jpeg)
    assert(feats(2L).toSeq ==
      Seq.tabulate(8)(i => java.lang.Byte.toUnsignedInt(md5(i)) / 255.0f))
    // a pixel-bearing baseline JPEG decodes for real (r8): pixel-derived
    val pj = Multimodal.buildJpegPixels(4L, 16, 16)
    val jfeats = Multimodal.extractFeatures(
      spark, Seq((4L, "image/jpeg", pj)).toDF("media_id", "media_type", "content"),
      Multimodal.PixelFeatureDecoder).collect().head
      .getAs[scala.collection.Seq[Float]]("embedding")
    val jref = referenceJpegStats(4L, 16, 16)
    assert(jfeats.head == (jref.rSum / 256.0 / 255.0).toFloat)
    val jmd5 = java.security.MessageDigest.getInstance("MD5").digest(pj)
    assert(jfeats.toSeq !=
      Seq.tabulate(8)(i => java.lang.Byte.toUnsignedInt(jmd5(i)) / 255.0f))
    // GIF is decodable (LZW): pixel-derived, not digest
    val gif = Multimodal.buildGifPixels(3L, 10, 10)
    val gfeats = Multimodal.extractFeatures(
      spark, Seq((3L, "image/gif", gif)).toDF("media_id", "media_type", "content"),
      Multimodal.PixelFeatureDecoder).collect().head
      .getAs[scala.collection.Seq[Float]]("embedding")
    val gref = referenceGifStats(3L, 10, 10)
    assert(gfeats.head == (gref.rSum / 100.0 / 255.0).toFloat)
    val gmd5 = java.security.MessageDigest.getInstance("MD5").digest(gif)
    assert(gfeats.toSeq !=
      Seq.tabulate(8)(i => java.lang.Byte.toUnsignedInt(gmd5(i)) / 255.0f))
  }

  test("media profile counts planted corruption and aspect outliers") {
    import spark.implicits._
    val rows = Seq(
      (1L, "image/png", Multimodal.buildPng(100, 300)), // 3:1 → outlier
      (2L, "image/png", Multimodal.buildPng(100, 299)), // just under
      (3L, "image/png", Array[Byte](1, 2, 3)),          // corrupt
      (4L, "image/gif", Multimodal.buildGif(50, 50)),
      (5L, "image/gif", Multimodal.buildGif(400, 100))  // 4:1 → outlier
    ).toDF("media_id", "media_type", "content")
    val prof = Multimodal.mediaProfile(spark, rows).collect()
      .map(r => r.getAs[String]("media_type") -> r).toMap
    val png = prof("image/png")
    assert(png.getAs[Long]("n_media") == 3 && png.getAs[Long]("n_parsed") == 2 &&
      png.getAs[Long]("n_corrupt") == 1)
    assert(png.getAs[Int]("w_min") == 100 && png.getAs[Int]("w_max") == 100)
    assert(png.getAs[Int]("h_min") == 299 && png.getAs[Int]("h_max") == 300)
    assert(png.getAs[Long]("avg_w_milli") == 100000L)
    assert(png.getAs[Long]("avg_h_milli") == 299500L)
    assert(png.getAs[Long]("n_aspect_outliers") == 1)
    val gif = prof("image/gif")
    assert(gif.getAs[Long]("n_media") == 2 && gif.getAs[Long]("n_corrupt") == 0)
    assert(gif.getAs[Long]("avg_w_milli") == 225000L)
    assert(gif.getAs[Long]("n_aspect_outliers") == 1)
  }

  test("audio/video profile counts planted corruption and duration outliers") {
    import spark.implicits._
    val rows = Seq(
      (1L, "audio/wav", Multimodal.buildWav(1, 8000, 16, 8000)),   // 1000 ms
      (2L, "audio/wav", Multimodal.buildWav(2, 8000, 16, 248000)), // 31 s → outlier
      (3L, "audio/wav", Array[Byte](1, 2, 3)),                     // corrupt
      (4L, "video/mp4", Multimodal.buildMp4(1000, 5000)),          // 5 s
      (5L, "video/mp4", Multimodal.buildMp4(1000, 30000))          // 30 s → outlier
    ).toDF("media_id", "media_type", "content")
    val prof = Multimodal.avMediaProfile(spark, rows).collect()
      .map(r => r.getAs[String]("media_type") -> r).toMap
    val wav = prof("audio/wav")
    assert(wav.getAs[Long]("n_media") == 3 && wav.getAs[Long]("n_parsed") == 2 &&
      wav.getAs[Long]("n_corrupt") == 1)
    assert(wav.getAs[Long]("dur_min_ms") == 1000L &&
      wav.getAs[Long]("dur_max_ms") == 31000L)
    assert(wav.getAs[Long]("avg_dur_milli") == 1000L * 32000 / 2)
    assert(wav.getAs[Long]("n_long_outliers") == 1)
    val mp4 = prof("video/mp4")
    assert(mp4.getAs[Long]("n_media") == 2 && mp4.getAs[Long]("n_corrupt") == 0)
    assert(mp4.getAs[Long]("dur_min_ms") == 5000L &&
      mp4.getAs[Long]("dur_max_ms") == 30000L)
    assert(mp4.getAs[Long]("n_long_outliers") == 1) // >= 30 s inclusive
    // the oracle fixture's planted population at fixture scale: every
    // doc_id % 13 == 0 payload lands in the corrupt channel
    val mixed = Multimodal.avMediaProfile(spark,
      Multimodal.synthesizeMixedAvTable(spark, Tables.documents(spark, sfDir)))
      .collect()
    val nCorrupt = mixed.map(_.getAs[Long]("n_corrupt")).sum
    val nAll = mixed.map(_.getAs[Long]("n_media")).sum
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"))
      .collect().map(_.getLong(0))
    assert(nAll == docs.length)
    assert(nCorrupt == docs.count(_ % 13 == 0))
  }

  // ---- GIF LZW pixel decode ----------------------------------------------

  /** Independent per-pixel reference for the GIF fixture formulas. */
  private def referenceGifStats(
      id: Long, w: Int, h: Int): Multimodal.PngPixelStats = {
    var rS = 0L; var gS = 0L; var bS = 0L
    var rMn = 255; var rMx = 0; var gMn = 255; var gMx = 0
    var bMn = 255; var bMx = 0
    for (y <- 0 until h; x <- 0 until w) {
      val c = (x + y) % 8
      val r = ((id + 29 * c) % 256).toInt
      val g = ((3 * id + 17 + 41 * c) % 256).toInt
      val b = ((5 * id + 31 + 53 * c) % 256).toInt
      rS += r; gS += g; bS += b
      rMn = math.min(rMn, r); rMx = math.max(rMx, r)
      gMn = math.min(gMn, g); gMx = math.max(gMx, g)
      bMn = math.min(bMn, b); bMx = math.max(bMx, b)
    }
    Multimodal.PngPixelStats(w, h, w.toLong * h, rS, gS, bS,
      rMn, rMx, gMn, gMx, bMn, bMx, 255, 255)
  }

  test("pixel GIF build → decode round-trips against an independent reference") {
    for ((id, w, h) <- Seq((0L, 16, 16), (7L, 1, 9), (123L, 63, 5),
        (999999L, 48, 33), (42L, 200, 300))) {
      val got = Multimodal.decodeGifPixelStats(Multimodal.buildGifPixels(id, w, h))
      assert(got.contains(referenceGifStats(id, w, h)), s"id=$id $w x $h")
    }
    // large enough to force LZW width growth through 12 bits and a
    // mid-stream dictionary reset
    val big = Multimodal.decodeGifPixelStats(Multimodal.buildGifPixels(5L, 500, 400))
    assert(big.contains(referenceGifStats(5L, 500, 400)))
  }

  test("decodes REAL third-party GIF files (independent encoder conformance)") {
    // distro documentation images — produced by real external encoders,
    // so an LZW width-discipline deviation (which a mirrored
    // encoder/decoder pair could self-certify past) breaks the decode
    // (wrong codes → wrong pixel count → None)
    val candidates = Seq(
      "/usr/share/doc/libxslt1-dev/html/smallfootonly.gif",
      "/usr/share/doc/libxslt1-dev/html/processing.gif",
      "/usr/share/doc/libxslt1-dev/html/node.gif")
      .map(new java.io.File(_)).filter(_.exists())
    assume(candidates.nonEmpty, "no third-party GIFs available in this image")
    var decoded = 0
    candidates.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val dims = Multimodal.parseImageDimensions(bytes)
      Multimodal.decodeGifPixelStats(bytes) match {
        case Some(s) =>
          decoded += 1
          assert(dims.contains((s.width, s.height)), f.getName)
          assert(s.nPixels == s.width.toLong * s.height, f.getName)
          assert(s.rMax <= 255 && s.rMin >= 0, f.getName)
        case None => () // partial-frame/local-quirk files quarantine by contract
      }
    }
    assert(decoded > 0,
      "no third-party GIF decoded — LZW discipline likely non-conformant")
  }

  test("LZW encode → decode round-trips across code sizes, lengths and alphabets") {
    val rnd = new scala.util.Random(77L)
    for (minCode <- 2 to 8; trial <- 1 to 8) {
      val alphabet = 1 << minCode
      val n = rnd.nextInt(5000) + 1
      // mix regimes: uniform random (dictionary churn), heavy repeats
      // (deep chains + width growth), constant runs (cScSc case)
      val indices = trial % 3 match {
        case 0 => Array.fill(n)(rnd.nextInt(alphabet).toByte)
        case 1 => Array.tabulate(n)(i => (i % 2).toByte)
        case _ => Array.fill(n)((rnd.nextInt(2) * (alphabet - 1)).toByte)
      }
      val decoded = Multimodal.lzwDecode(
        Multimodal.lzwEncode(indices, minCode), minCode, n)
      assert(decoded.exists(_.sameElements(indices)),
        s"minCode=$minCode trial=$trial n=$n")
    }
    // a stream long enough to exercise the 4096-entry reset repeatedly
    val big = Array.tabulate(300000)(i => ((i * 7919) % 256).toByte)
    val dec = Multimodal.lzwDecode(Multimodal.lzwEncode(big, 8), 8, big.length)
    assert(dec.exists(_.sameElements(big)))
    // random garbage into the decoder never throws
    for (_ <- 1 to 500) {
      val g = Array.fill(rnd.nextInt(100))(rnd.nextInt().toByte)
      Multimodal.lzwDecode(g, 2 + rnd.nextInt(7), 10000)
    }
  }

  test("GIF pixel decode quarantines malformed streams") {
    // header-only GIF (the dimension fixture) has no image data
    assert(Multimodal.decodeGifPixelStats(Multimodal.buildGif(8, 8)).isEmpty)
    // bomb guard
    val bomb = Multimodal.buildGif(60000, 60000)
    assert(Multimodal.decodeGifPixelStats(bomb).isEmpty)
    // truncations and corruption must never throw
    val valid = Multimodal.buildGifPixels(9L, 24, 19)
    (0 to valid.length).foreach { i =>
      Multimodal.decodeGifPixelStats(valid.take(i))
    }
    valid.indices.foreach { i =>
      val m = valid.clone(); m(i) = (m(i) ^ 0xff).toByte
      Multimodal.decodeGifPixelStats(m)
    }
    // non-GIF payloads
    assert(Multimodal.decodeGifPixelStats(Multimodal.buildPngPixels(1L, 4, 4)).isEmpty)
    assert(Multimodal.decodeGifPixelStats(Array.empty[Byte]).isEmpty)
  }

  // ---- JPEG baseline pixel decode (Huffman + dequant + IDCT + YCbCr) -----

  /** Independent per-pixel reference for the JPEG fixture formulas —
    * restated from the documented contract (constant DC-only blocks with
    * q(DC) = 8 reconstruct exactly; decoded RGB = floor(x+0.5)-rounded
    * JFIF conversion of the YCbCr constants), sharing no code with the
    * codec.
    */
  private def refJpegRgb(id: Long, bx: Int, by: Int): (Int, Int, Int) = {
    def cl(v: Double): Int =
      math.max(0, math.min(255, math.floor(v + 0.5).toInt))
    val y = ((id + 7L * bx + 13L * by) % 256L).toDouble
    val cb = ((3L * id + 17L + 29L * bx) % 256L).toDouble
    val cr = ((5L * id + 31L + 37L * by) % 256L).toDouble
    (cl(y + 1.402 * (cr - 128.0)),
      cl(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)),
      cl(y + 1.772 * (cb - 128.0)))
  }

  private def referenceJpegStats(
      id: Long, w: Int, h: Int): Multimodal.PngPixelStats = {
    var rS = 0L; var gS = 0L; var bS = 0L
    var rMn = 255; var rMx = 0; var gMn = 255; var gMx = 0
    var bMn = 255; var bMx = 0
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = refJpegRgb(id, x / 8, y / 8)
      rS += r; gS += g; bS += b
      rMn = math.min(rMn, r); rMx = math.max(rMx, r)
      gMn = math.min(gMn, g); gMx = math.max(gMx, g)
      bMn = math.min(bMn, b); bMx = math.max(bMx, b)
    }
    Multimodal.PngPixelStats(w, h, w.toLong * h, rS, gS, bS,
      rMn, rMx, gMn, gMx, bMn, bMx, 255, 255)
  }

  test("pixel JPEG build → decode round-trips against an independent reference") {
    for ((id, w, h) <- Seq((0L, 16, 16), (7L, 8, 40), (123L, 56, 8),
        (999999L, 48, 32), (42L, 40, 56))) {
      val got = Multimodal.decodeJpegPixelStats(Multimodal.buildJpegPixels(id, w, h))
      assert(got.contains(referenceJpegStats(id, w, h)), s"id=$id $w x $h")
    }
    // restart markers: DRI + cycling RSTn reset DC prediction mid-scan —
    // identical statistics at every interval
    for (dri <- Seq(1, 3, 7)) {
      val got = Multimodal.decodeJpegPixelStats(
        Multimodal.buildJpegPixels(11L, 48, 40, restartInterval = dri))
      assert(got.contains(referenceJpegStats(11L, 48, 40)), s"dri=$dri")
    }
    // non-8-multiple dimensions: encoder emits padded edge blocks, the
    // decoder crops to the SOF dimensions
    val got = Multimodal.decodeJpegPixelStats(Multimodal.buildJpegPixels(5L, 20, 13))
    assert(got.contains(referenceJpegStats(5L, 20, 13)))
  }

  test("ImageIO (independent JDK codec) decodes our baseline JPEGs to the closed forms") {
    // a mirrored encoder/decoder pair could self-certify past a Huffman
    // or marker-layout deviation; the JDK's own JPEG plugin cannot
    for ((id, w, h) <- Seq((3L, 24, 16), (77L, 56, 48))) {
      val bytes = Multimodal.buildJpegPixels(id, w, h)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our stream")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val (er, eg, eb) = refJpegRgb(id, x / 8, y / 8)
        // ±1: ImageIO's fixed-point IDCT/conversion rounding vs ours
        assert(math.abs(((rgb >> 16) & 0xff) - er) <= 1, s"r($x,$y) id=$id")
        assert(math.abs(((rgb >> 8) & 0xff) - eg) <= 1, s"g($x,$y) id=$id")
        assert(math.abs((rgb & 0xff) - eb) <= 1, s"b($x,$y) id=$id")
      }
    }
  }

  test("our decoder reproduces ImageIO-encoded JPEGs within the T.83 tolerance") {
    import java.awt.image.BufferedImage
    // gray gradient: single component — the pure Huffman+IDCT path with
    // no chroma upsampling or color-conversion ambiguity
    val w = 40; val h = 32
    val gimg = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gimg.getRaster.setSample(x, y, 0, (x * 5 + y * 3) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gimg, "jpg", bos))
    val bytes = bos.toByteArray
    val ours = Multimodal.decodeJpegPixelStats(bytes)
    assert(ours.nonEmpty, "our decoder rejected an ImageIO baseline stream")
    val s = ours.get
    assert(s.width == w && s.height == h)
    assert(s.rSum == s.gSum && s.gSum == s.bSum) // gray: r = g = b
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var refSum = 0L; var refMin = 255; var refMax = 0
    for (y <- 0 until h; x <- 0 until w) {
      val v = ref.getRaster.getSample(x, y, 0)
      refSum += v
      refMin = math.min(refMin, v); refMax = math.max(refMax, v)
    }
    // per-pixel drift vs the JDK decoder is bounded by the T.83-style ±1
    assert(math.abs(s.rSum - refSum) <= s.nPixels, s"sum ${s.rSum} vs $refSum")
    assert(math.abs(s.rMin - refMin) <= 1 && math.abs(s.rMax - refMax) <= 1)

    // constant-color RGB (ImageIO subsamples chroma 4:2:0 by default):
    // constancy is upsampling-invariant, and min == max pins EVERY pixel
    for ((r0, g0, b0) <- Seq((200, 30, 90), (12, 250, 128))) {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      val rgb = (r0 << 16) | (g0 << 8) | b0
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      val os = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", os))
      val cb = os.toByteArray
      val got = Multimodal.decodeJpegPixelStats(cb)
      assert(got.nonEmpty, "our decoder rejected an ImageIO RGB stream")
      val c = got.get
      assert(c.rMin == c.rMax && c.gMin == c.gMax && c.bMin == c.bMax,
        "constant image decoded non-constant")
      val rimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cb))
      val rrgb = rimg.getRGB(0, 0)
      assert(math.abs(c.rMin - ((rrgb >> 16) & 0xff)) <= 1, s"($r0,$g0,$b0) r")
      assert(math.abs(c.gMin - ((rrgb >> 8) & 0xff)) <= 1, s"($r0,$g0,$b0) g")
      assert(math.abs(c.bMin - (rrgb & 0xff)) <= 1, s"($r0,$g0,$b0) b")
    }
  }

  test("decodes REAL third-party progressive JPEGs (conformance vs ImageIO)") {
    // distro documentation images written by a real external encoder —
    // SOF2 progressive with successive approximation, the exact shape a
    // crawl corpus carries; conformance = agreement with the JDK's
    // independent decoder within the T.83-style per-pixel ±1
    val files = Seq("/usr/share/doc/nodejs/thin-white-stripe.jpg",
      "/usr/share/doc/nodejs/full-white-stripe.jpg")
      .map(new java.io.File(_)).filter(_.exists())
    assume(files.nonEmpty, "no third-party progressive JPEGs in this image")
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val ours = Multimodal.decodeJpegPixelStats(bytes)
      assert(ours.nonEmpty, s"${f.getName}: progressive decode failed")
      val s = ours.get
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(s.width == ref.getWidth && s.height == ref.getHeight, f.getName)
      var rS = 0L; var gS = 0L; var bS = 0L
      var rMn = 255; var rMx = 0; var gMn = 255; var gMx = 0
      var bMn = 255; var bMx = 0
      for (y <- 0 until s.height; x <- 0 until s.width) {
        val rgb = ref.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        rS += r; gS += g; bS += b
        rMn = math.min(rMn, r); rMx = math.max(rMx, r)
        gMn = math.min(gMn, g); gMx = math.max(gMx, g)
        bMn = math.min(bMn, b); bMx = math.max(bMx, b)
      }
      // these files are 4:4:4 (no upsampling ambiguity): drift is IDCT +
      // conversion rounding only — sums within ±1/pixel, extrema within 1
      assert(math.abs(s.rSum - rS) <= s.nPixels, s"${f.getName} rSum")
      assert(math.abs(s.gSum - gS) <= s.nPixels, s"${f.getName} gSum")
      assert(math.abs(s.bSum - bS) <= s.nPixels, s"${f.getName} bSum")
      assert(math.abs(s.rMin - rMn) <= 1 && math.abs(s.rMax - rMx) <= 1, f.getName)
      assert(math.abs(s.gMin - gMn) <= 1 && math.abs(s.gMax - gMx) <= 1, f.getName)
      assert(math.abs(s.bMin - bMn) <= 1 && math.abs(s.bMax - bMx) <= 1, f.getName)
    }
  }

  test("decodes ImageIO-written progressive JPEGs (DC/AC refinement path)") {
    import java.awt.image.BufferedImage
    val w = 48; val h = 40
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 5) % 256)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    // it must really be progressive (SOF2 marker present)
    assert(bytes.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "ImageIO did not write SOF2")
    val ours = Multimodal.decodeJpegPixelStats(bytes)
    assert(ours.nonEmpty, "progressive decode failed")
    val s = ours.get
    assert(s.width == w && s.height == h)
    assert(s.rSum == s.gSum && s.gSum == s.bSum) // gray
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var refSum = 0L; var refMin = 255; var refMax = 0
    for (y <- 0 until h; x <- 0 until w) {
      val v = ref.getRaster.getSample(x, y, 0)
      refSum += v; refMin = math.min(refMin, v); refMax = math.max(refMax, v)
    }
    assert(math.abs(s.rSum - refSum) <= s.nPixels, s"sum ${s.rSum} vs $refSum")
    assert(math.abs(s.rMin - refMin) <= 1 && math.abs(s.rMax - refMax) <= 1)
    // truncations and bit corruption of a progressive stream never throw
    (0 to bytes.length by 7).foreach(i =>
      Multimodal.decodeJpegPixelStats(bytes.take(i)))
    bytes.indices.foreach { i =>
      val m = bytes.clone(); m(i) = (m(i) ^ 0xff).toByte
      Multimodal.decodeJpegPixelStats(m)
    }
  }

  test("JPEG pixel decode quarantines out-of-scope and malformed streams") {
    // header-only fixture: markers but no scan
    assert(Multimodal.decodeJpegPixelStats(Multimodal.buildJpeg(32, 32)).isEmpty)
    val valid = Multimodal.buildJpegPixels(9L, 24, 16)
    // bomb guard: SOF dims patched to 65535×65535 quarantine before any
    // allocation (height/width sit at fixed offsets 94–97 of the fixture)
    val bomb = valid.clone()
    bomb(94) = 0xff.toByte; bomb(95) = 0xff.toByte
    bomb(96) = 0xff.toByte; bomb(97) = 0xff.toByte
    assert(Multimodal.decodeJpegPixelStats(bomb).isEmpty)
    // every truncation and single-byte corruption returns, never throws —
    // the Huffman/IDCT-path fuzz the round-7 verdict asked for
    (0 to valid.length).foreach(i => Multimodal.decodeJpegPixelStats(valid.take(i)))
    valid.indices.foreach { i =>
      val m = valid.clone(); m(i) = (m(i) ^ 0xff).toByte
      Multimodal.decodeJpegPixelStats(m)
    }
    // strict tail: bytes after EOI are garbage (the GIF trailer discipline)
    assert(Multimodal.decodeJpegPixelStats(valid :+ 0.toByte).isEmpty)
    // non-JPEG payloads
    assert(Multimodal.decodeJpegPixelStats(Multimodal.buildPngPixels(1L, 4, 4)).isEmpty)
    assert(Multimodal.decodeJpegPixelStats(Array.empty[Byte]).isEmpty)
  }

  test("a ZRL run overrunning the coefficient band quarantines; one fitting exactly decodes") {
    // hand-crafted minimal 8x8 grayscale baseline JPEG: DC table =
    // categories 0..11 at 4 bits (code i = i), AC table = EOB '0' (1 bit)
    // + ZRL '10' (2 bits). Scan bits: DC cat0 then n ZRLs (+ EOB for the
    // fitting case). Three ZRLs reach k = 49 (legal); a fourth claims 16
    // zeros where only 15 slots remain — nonconformant, must quarantine.
    def craft(scanBytes: Array[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def be16(v: Int): Unit = { out.write(v >>> 8); out.write(v & 0xff) }
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      marker(0xd8)
      marker(0xdb); be16(2 + 65); out.write(0x00)
      (0 until 64).foreach(_ => out.write(16))
      marker(0xc0); be16(8 + 3); out.write(8); be16(8); be16(8)
      out.write(1); out.write(1); out.write(0x11); out.write(0)
      marker(0xc4); be16(2 + 17 + 12); out.write(0x00)
      (1 to 16).foreach(i => out.write(if (i == 4) 12 else 0))
      (0 until 12).foreach(out.write)
      marker(0xc4); be16(2 + 17 + 2); out.write(0x10)
      (1 to 16).foreach(i => out.write(if (i <= 2) 1 else 0))
      out.write(0x00); out.write(0xf0) // EOB len 1, ZRL len 2
      marker(0xda); be16(6 + 2); out.write(1); out.write(1); out.write(0x00)
      out.write(0); out.write(63); out.write(0)
      scanBytes.foreach(out.write)
      marker(0xd9)
      out.toByteArray
    }
    // '0000' + '10'*4 = 000010101010 + pad 1111 → 0x0A 0xAF: k 1→65, overrun
    assert(Multimodal.decodeJpegPixelStats(craft(Array(0x0a, 0xaf))).isEmpty,
      "band-overrunning ZRL was accepted")
    // '0000' + '10'*3 + EOB '0' = 00001010100 + pad → 0x0A 0x9F: k 1→49, EOB
    val ok = Multimodal.decodeJpegPixelStats(craft(Array(0x0a, 0x9f)))
    assert(ok.exists(s => s.width == 8 && s.rSum == 64L * 128),
      s"fitting ZRL stream failed: $ok") // DC 0 → flat 128 gray
  }

  test("JPEG pixel-stats operator face matches the closed forms at fixture scale") {
    val face = Multimodal.extractJpegPixelStats(
      spark, Multimodal.synthesizePixelJpegTable(spark, Tables.documents(spark, sfDir)))
      .collect()
    assert(face.nonEmpty)
    face.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val w = 8 * (2 + (id % 6)).toInt
      val h = 8 * (2 + ((id * 5) % 6)).toInt
      val ref = referenceJpegStats(id, w, h)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Long]("n_pixels") == w.toLong * h)
      assert(r.getAs[Double]("r_mean") ==
        BigDecimal(ref.rSum.toDouble / (w.toLong * h))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getAs[Long]("lum_milli") ==
        (299 * ref.rSum + 587 * ref.gSum + 114 * ref.bSum) / (w.toLong * h))
      assert(r.getAs[Int]("r_min") == ref.rMin && r.getAs[Int]("r_max") == ref.rMax)
      assert(r.getAs[Int]("g_min") == ref.gMin && r.getAs[Int]("g_max") == ref.gMax)
      assert(r.getAs[Int]("b_min") == ref.bMin && r.getAs[Int]("b_max") == ref.bMax)
    }
  }

  test("parses a hand-pinned PCM WAV header (2ch 44100Hz 16-bit)") {
    // written byte-by-byte from the RIFF spec, not via buildWav
    val hex =
      "52494646" + "28000000" + "57415645" +      // RIFF, size 40, WAVE
        "666d7420" + "10000000" +                 // "fmt ", size 16
        "0100" + "0200" + "44ac0000" +            // PCM, 2ch, 44100
        "10b10200" + "0400" + "1000" +            // byte rate, align 4, 16-bit
        "64617461" + "04000000" + "00000000"      // "data", 4 bytes payload
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(Multimodal.parseWavMeta(bytes).contains((2, 44100, 16, 4L)))
  }

  test("WAV build → parse round-trips and walks extra RIFF chunks") {
    assert(Multimodal.parseWavMeta(Multimodal.buildWav(1, 8000, 16, 100))
      .contains((1, 8000, 16, 200L)))
    assert(Multimodal.parseWavMeta(Multimodal.buildWav(2, 48000, 16, 999))
      .contains((2, 48000, 16, 3996L)))
    // inject a LIST chunk between fmt and data: the subchunk walk must
    // skip it (with odd-size word alignment) and still find both
    val base = Multimodal.buildWav(1, 16000, 16, 10)
    val fmtEnd = 12 + 8 + 16
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOx".getBytes("US-ASCII") ++
      Array[Byte](0) // pad to even
    val withList = base.take(fmtEnd) ++ list ++ base.drop(fmtEnd)
    assert(Multimodal.parseWavMeta(withList).contains((1, 16000, 16, 20L)))
    // non-audio payloads are rejected
    assert(Multimodal.parseWavMeta("RIFFxxxxJUNK".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.parseWavMeta(Multimodal.buildPng(4, 4)).isEmpty)
  }

  test("WAV tone build → sample decode matches an independent per-sample reference") {
    // independent restatement of the sawtooth + statistics, sharing no
    // code with the decoder (recomputes from the documented formula)
    def refStats(id: Long, channels: Int, n: Int): Seq[(Int, Long, Int, Long, Long)] =
      (0 until channels).map { ch =>
        val vs = (0 until n).map(i =>
          (((id + i.toLong * (17L + 2L * (id % 500L)) + 7919L * ch) % 65536L)
            - 32768L).toInt)
        val peak = vs.map(math.abs).max
        val sumSq = vs.map(v => v.toLong * v).sum
        val cross = vs.sliding(2).count {
          case Seq(a, b) => a.toLong * b < 0
          case _ => false
        }
        (ch, n.toLong, peak, sumSq, cross.toLong)
      }
    for ((id, ch, n) <- Seq((1L, 1, 100), (2L, 2, 777), (999L, 2, 1099))) {
      val got = Multimodal.decodeWavSampleStats(
        Multimodal.buildWavTone(id, ch, 8000, n))
      assert(got.isDefined, s"id=$id")
      assert(got.get.map(s =>
        (s.channel, s.nSamples, s.peak, s.sumSq, s.zeroCrossings)) ==
        refStats(id, ch, n), s"id=$id ch=$ch n=$n")
    }
    // quarantine: truncated sample data (header claims more than present),
    // zeroed payload decodes but with all-zero stats, non-WAV rejects
    val tone = Multimodal.buildWavTone(5L, 1, 8000, 100)
    assert(Multimodal.decodeWavSampleStats(tone.dropRight(10)).isEmpty)
    val zeroed = Multimodal.decodeWavSampleStats(Multimodal.buildWav(1, 8000, 16, 50))
    assert(zeroed.exists(s => s.head.peak == 0 && s.head.sumSq == 0L))
    assert(Multimodal.decodeWavSampleStats(Multimodal.buildPng(4, 4)).isEmpty)
    // 8-bit PCM (unsigned, midpoint-relative): zeroed bytes = constant −128
    val eight = Multimodal.decodeWavSampleStats(Multimodal.buildWav(1, 8000, 8, 50))
    assert(eight.exists(s => s.head.peak == 128 &&
      s.head.sumSq == 50L * 128 * 128 && s.head.zeroCrossings == 0))
    // 24-bit PCM: hand-written LE words exercise sign extension
    val w24 = Multimodal.buildWav(1, 8000, 24, 3)
    val words24 = Array( // +1, −1, −2^23
      0x01, 0x00, 0x00, 0xff, 0xff, 0xff, 0x00, 0x00, 0x80)
    words24.zipWithIndex.foreach { case (v, i) => w24(44 + i) = v.toByte }
    val s24 = Multimodal.decodeWavSampleStats(w24).get.head
    assert(s24.nSamples == 3 && s24.peak == (1 << 23))
    assert(s24.sumSq == 1L + 1L + (1L << 46))
    assert(s24.zeroCrossings == 1) // +1 → −1 crosses; −1 → −2^23 does not
    // unsupported widths quarantine (32-bit int PCM / 12-bit)
    assert(Multimodal.decodeWavSampleStats(Multimodal.buildWav(1, 8000, 12, 50)).isEmpty)
    // an EMPTY data chunk quarantines (zero frames would emit a row with
    // every statistic undefined — NULL rms downstream of the face)
    assert(Multimodal.decodeWavSampleStats(Multimodal.buildWav(1, 8000, 16, 0)).isEmpty)
  }

  test("audio sample-stats operator face matches the closed forms at fixture scale") {
    val face = Multimodal.extractAudioSampleStats(
      spark, Multimodal.synthesizeToneAudioTable(spark, Tables.documents(spark, sfDir)))
      .collect()
    assert(face.nonEmpty)
    face.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val ch = r.getAs[Int]("channel")
      val n = 100 + (id % 1000).toInt
      val vs = (0 until n).map(i =>
        (((id + i.toLong * (17L + 2L * (id % 500L)) + 7919L * ch) % 65536L)
          - 32768L).toInt)
      assert(r.getAs[Long]("n_samples") == n.toLong)
      assert(r.getAs[Int]("peak") == vs.map(math.abs).max)
      val sumSq = vs.map(v => v.toLong * v).sum
      assert(r.getAs[Long]("sum_sq") == sumSq)
      assert(r.getAs[Long]("rms_milli") ==
        math.floor(math.sqrt(sumSq.toDouble / n) * 1000).toLong)
    }
    // stereo docs produce two channel rows
    val chCounts = face.groupBy(_.getAs[Long]("media_id")).view
      .mapValues(_.length).toMap
    assert(chCounts.forall { case (id, c) => c == 1 + (id % 2).toInt })
  }

  test("audio table fields follow the synth formula") {
    val audio = Multimodal.synthesizeAudioTable(spark, Tables.documents(spark, sfDir))
    val rows = Multimodal.extractAudioFeatures(spark, audio).collect()
    assert(rows.length == audio.count())
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      assert(r.getAs[Int]("channels") == (1 + id % 2).toInt)
      assert(r.getAs[Int]("sample_rate") == (8000 * (1 + id % 4)).toInt)
      assert(r.getAs[Long]("n_samples") == 100 + id % 1000)
      assert(r.getAs[Long]("duration_ms") ==
        (100 + id % 1000) * 1000 / (8000 * (1 + id % 4)))
    }
  }

  test("parses a hand-pinned minimal MP4 (mvhd timescale/duration)") {
    // ftyp(16) then moov containing only a v0 mvhd, written from the
    // ISO BMFF spec — timescale 600, duration 1800 (3 s)
    val hex =
      "00000010" + "66747970" + "69736f6d" + "00000200" + // ftyp isom
        "00000077" + "6d6f6f76" +                          // moov (8+108+3? no)
        "0000006c" + "6d766864" +                          // mvhd size 108
        "00" + "000000" +                                  // v0 + flags
        "00000000" + "00000000" +                          // ctime mtime
        "00000258" + "00000708" +                          // 600, 1800
        "00010000" + "0100" + "0000" +                     // rate, volume, res
        "0000000000000000" +                               // reserved
        "000100000000000000000000" +                       // matrix rows
        "000000000001000000000000" +
        "000000000000000040000000" +
        "000000000000000000000000" +                       // pre_defined
        "000000000000000000000000" +
        "00000002"                                         // next_track_ID
    val bytes = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // fix the moov size to the actual remaining length (8 + mvhd size)
    val moovSize = 8 + 0x6c
    bytes(16) = ((moovSize >>> 24) & 0xff).toByte
    bytes(17) = ((moovSize >>> 16) & 0xff).toByte
    bytes(18) = ((moovSize >>> 8) & 0xff).toByte
    bytes(19) = (moovSize & 0xff).toByte
    assert(Multimodal.parseMp4Meta(bytes).contains((600, 1800)))
  }

  test("MP4 build → parse round-trips; non-BMFF payloads reject") {
    assert(Multimodal.parseMp4Meta(Multimodal.buildMp4(1000, 5000))
      .contains((1000, 5000)))
    assert(Multimodal.parseMp4Meta(Multimodal.buildMp4(90000, 270000))
      .contains((90000, 270000)))
    assert(Multimodal.parseMp4Meta(Multimodal.buildWav(1, 8000, 16, 10)).isEmpty)
    assert(Multimodal.parseMp4Meta(Multimodal.buildPng(2, 2)).isEmpty)
    assert(Multimodal.parseMp4Meta(Array.empty[Byte]).isEmpty)
  }

  test("video table fields follow the synth formula") {
    val video = Multimodal.synthesizeVideoTable(spark, Tables.documents(spark, sfDir))
    val rows = Multimodal.extractVideoFeatures(spark, video).collect()
    assert(rows.length == video.count())
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val scale = 1000 * (1 + id % 3)
      val ticks = 1000 + id % 60000
      assert(r.getAs[Int]("timescale") == scale.toInt)
      assert(r.getAs[Int]("duration_ticks") == ticks.toInt)
      assert(r.getAs[Long]("duration_ms") == ticks * 1000 / scale)
    }
  }

  test("parsers never throw: random bytes, truncations, single-byte corruption") {
    val parsers: Seq[Array[Byte] => Any] = Seq(
      Multimodal.parseImageDimensions _,
      Multimodal.parseWavMeta _,
      Multimodal.parseMp4Meta _,
      Multimodal.decodePngPixelStats _,
      Multimodal.decodeJpegPixelStats _,
      Multimodal.decodeWavSampleStats _)
    // arbitrary garbage
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000) {
      val b = Array.fill(rnd.nextInt(200))(rnd.nextInt().toByte)
      parsers.foreach(p => p(b))
    }
    // every truncation prefix and every single-byte corruption of every
    // valid stream must return (not throw) for every parser — a corrupt
    // object store file must quarantine, never kill the scan task
    val valid = Seq(
      Multimodal.buildPng(64, 64), Multimodal.buildJpeg(64, 64),
      Multimodal.buildGif(64, 64), Multimodal.buildWav(2, 44100, 16, 50),
      Multimodal.buildMp4(1000, 5000),
      Multimodal.buildPngPixels(9L, 24, 19), // covers the inflate path
      Multimodal.buildJpegPixels(9L, 24, 16)) // covers the Huffman path
    valid.foreach { v =>
      (0 to v.length).foreach { i =>
        val t = v.take(i)
        parsers.foreach(p => p(t))
      }
      v.indices.foreach { i =>
        val m = v.clone()
        m(i) = (m(i) ^ 0xff).toByte
        parsers.foreach(p => p(m))
      }
    }
    // hostile near-MaxInt chunk/box/segment lengths behind VALID
    // signatures: an Int-overflowing `off += size` would index negative
    // (the class of bug random fuzz can't reach — lengths must be huge
    // AND the magic intact)
    val big = Array(0x7f, 0xff, 0xff, 0xf5).map(_.toByte)
    val pngHostile = Multimodal.buildPng(1, 1).take(8) ++ // signature only
      big ++ "tEXt".getBytes("US-ASCII") ++ new Array[Byte](32)
    assert(Multimodal.parseImageDimensions(pngHostile).isEmpty)
    val wavHostile = Multimodal.buildWav(1, 8000, 16, 1).take(12) ++
      "LIST".getBytes("US-ASCII") ++
      Array(0xf0, 0xff, 0xff, 0x7f).map(_.toByte) ++ new Array[Byte](32)
    assert(Multimodal.parseWavMeta(wavHostile).isEmpty)
    val mp4Hostile = big ++ "ftyp".getBytes("US-ASCII") ++ new Array[Byte](32)
    assert(Multimodal.parseMp4Meta(mp4Hostile).isEmpty)
    val jpegHostile = Array(0xff, 0xd8, 0xff, 0xe0, 0xff, 0xff)
      .map(_.toByte) ++ new Array[Byte](16)
    assert(Multimodal.parseImageDimensions(jpegHostile).isEmpty)
  }

  test("header decode is deterministic") {
    val f1 = Multimodal.extractFeatures(spark, images, Multimodal.HeaderDecoder)
    val f2 = Multimodal.extractFeatures(spark, images, Multimodal.HeaderDecoder)
    assert(f1.exceptAll(f2).count() == 0)
  }
}
