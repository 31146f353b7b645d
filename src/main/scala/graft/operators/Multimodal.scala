package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) plumbing for a training-data pipeline:
  * image/audio/video content as opaque BINARY columns with typed metadata,
  * batched per-partition feature extraction, and oracle-checkable
  * native-function features (byte length, md5) where no decoder is needed.
  *
  * The decode is REAL for every image format: `HeaderDecoder` parses
  * PNG IHDR, JPEG SOFn markers and the GIF logical screen descriptor
  * straight from the byte layouts in the public format specs (PNG: RFC
  * 2083 §3; JPEG: ITU-T T.81 §B.2.2; GIF: GIF89a spec §18), and PIXELS
  * decode for PNG (`decodePngPixelStats`: zlib-inflate + unfiltering,
  * incl. Adam7), GIF (`decodeGifPixelStats`: LZW + palette), and JPEG
  * (`decodeJpegPixelStats` → [[Jpeg]]: Huffman + dequant + IDCT +
  * YCbCr, sequential AND progressive); WAV decodes to real PCM sample
  * statistics (`decodeWavSampleStats`). The digest-derived embedding
  * stand-in remains only past the remaining codec boundary (video
  * codecs — `PixelFeatureDecoder` documents the line); model-embedding
  * columns stay excluded from oracle faces.
  */
object Multimodal {

  /** Extracted feature row. width/height come from real header parsing
    * (0 when the payload is not a recognized image format); embedding is
    * the documented model-less stand-in.
    */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      content_md5: String,
      width: Int,
      height: Int,
      embedding: Array[Float])

  /** Decoder contract: one batch of (id, type, bytes) per call — the same
    * batch shape a Pandas-UDF/mapInPandas implementation would see, so a
    * vectorized decoder drops in without plan changes.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaFeatures]
  }

  // ---------------------------------------------------------------------
  // Real image-header construction and parsing (public byte formats).
  // ---------------------------------------------------------------------

  private val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private[operators] def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private[operators] def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  private[operators] def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private[operators] def readBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def pngChunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val typeBytes = chunkType.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32
    crc.update(typeBytes)
    crc.update(data)
    be32(data.length) ++ typeBytes ++ data ++ be32(crc.getValue.toInt)
  }

  /** Minimal valid PNG: signature + IHDR (8-bit RGBA) + empty IEND, with
    * real CRC32s. 45 bytes total.
    */
  def buildPng(width: Int, height: Int): Array[Byte] = {
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, 6, 0, 0, 0) // depth 8, color 6 (RGBA), deflate, none, no interlace
    PngSignature ++ pngChunk("IHDR", ihdr) ++ pngChunk("IEND", Array.empty[Byte])
  }

  /** Adam7 interlace passes (PNG spec §8.2): (x0, y0, dx, dy) sub-grids
    * in transmission order — together they partition the pixel grid.
    */
  private val Adam7: Seq[(Int, Int, Int, Int)] = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** PNG Paeth predictor (PNG spec §9.4 / RFC 2083): nearest of
    * left/up/up-left to the linear estimate p = a + b - c, ties broken
    * left, up, up-left.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Complete PNG with REAL pixel data: 8-bit gray / RGB / RGBA
    * scanlines, every scanline filtered with filter type `row % 5` (so
    * all five PNG filters — None/Sub/Up/Average/Paeth — are exercised in
    * any image at least 5 rows tall), deflated with
    * `java.util.zip.Deflater` and split across TWO IDAT chunks (decoders
    * must concatenate IDAT payloads). `interlace = true` writes a REAL
    * Adam7 stream: the seven §8.2 sub-grid passes in transmission order,
    * each filtered independently (ImageIO-conformance-checked in the
    * spec). Pixel values derive from `id` in closed form so a DuckDB
    * oracle can state per-channel statistics without decoding:
    *   r(x, y) = (id + x)          % 256   — varies along x
    *   g(x, y) = (3*id + 17 + y)   % 256   — varies along y
    *   b(x, y) = (5*id + 31 + x)   % 256   — varies along x
    *   a(x, y) = 255
    * (gray uses the r formula; RGB drops alpha).
    */
  def buildPngPixels(
      id: Long, width: Int, height: Int, colorType: Int = 6,
      interlace: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, "pixel PNG needs positive dimensions")
    val bpp = colorType match {
      case 6 => 4
      case 2 => 3
      case 0 => 1
      case other => throw new IllegalArgumentException(s"unsupported color type $other")
    }
    // non-interlaced = one full-frame pass; Adam7 writes the seven §8.2
    // sub-grids, each filtered independently (filter type cycles per
    // PASS row, so all five filters appear inside passes too)
    val passes = if (interlace) Adam7 else Seq((0, 0, 1, 1))
    val rawOut = new java.io.ByteArrayOutputStream()
    passes.foreach { case (x0, y0, dx, dy) =>
      val pw = (width - x0 + dx - 1) / dx
      val ph = (height - y0 + dy - 1) / dy
      if (pw > 0 && ph > 0) {
        val stride = pw * bpp
        val cur = new Array[Byte](stride)
        val prevRow = new Array[Byte](stride)
        var py = 0
        while (py < ph) {
          val y = y0 + py * dy
          var px = 0; var i = 0
          while (px < pw) {
            val x = x0 + px * dx
            val r = ((id + x) % 256).toInt
            if (bpp == 1) { cur(i) = r.toByte }
            else {
              cur(i) = r.toByte
              cur(i + 1) = ((3 * id + 17 + y) % 256).toByte
              cur(i + 2) = ((5 * id + 31 + x) % 256).toByte
              if (bpp == 4) cur(i + 3) = 255.toByte
            }
            px += 1; i += bpp
          }
          val f = py % 5
          rawOut.write(f)
          var j = 0
          while (j < stride) {
            val v = cur(j) & 0xff
            val left = if (j >= bpp) cur(j - bpp) & 0xff else 0
            val up = prevRow(j) & 0xff
            val ul = if (j >= bpp) prevRow(j - bpp) & 0xff else 0
            val filtered = f match {
              case 0 => v
              case 1 => v - left
              case 2 => v - up
              case 3 => v - ((left + up) >> 1)
              case _ => v - paeth(left, up, ul)
            }
            rawOut.write(filtered & 0xff)
            j += 1
          }
          System.arraycopy(cur, 0, prevRow, 0, stride)
          py += 1
        }
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(rawOut.toByteArray)
    deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = zipped.toByteArray
    val split = math.max(1, idat.length / 2) // two IDATs: concat is mandatory
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, colorType.toByte, 0, 0, if (interlace) 1 else 0)
    PngSignature ++ pngChunk("IHDR", ihdr) ++
      pngChunk("IDAT", idat.slice(0, split)) ++
      pngChunk("IDAT", idat.slice(split, idat.length)) ++
      pngChunk("IEND", Array.empty[Byte])
  }

  /** Aggregated per-image pixel statistics from a real decode: exact
    * integer channel sums (so downstream means are reproducible rationals,
    * not float-accumulation-order artifacts) plus per-channel min/max.
    * Gray images report r=g=b; images without an alpha channel report the
    * opaque 255/255.
    */
  case class PngPixelStats(
      width: Int, height: Int, nPixels: Long,
      rSum: Long, gSum: Long, bSum: Long,
      rMin: Int, rMax: Int, gMin: Int, gMax: Int, bMin: Int, bMax: Int,
      aMin: Int, aMax: Int)

  /** Hard ceiling on decoded pixel count (2^24 ≈ 16.7M px ≈ 64 MB RGBA):
    * a hostile IHDR declaring a huge image must be quarantined before any
    * allocation — the decompression-bomb guard.
    */
  private[operators] val MaxDecodedPixels = 1L << 24

  /** REAL PNG pixel decode — no image library: walks chunks, concatenates
    * IDAT payloads, inflates with `java.util.zip.Inflater`, reverses the
    * per-scanline filter (PNG spec §9: None/Sub/Up/Average/Paeth) and
    * accumulates channel statistics scanline by scanline (only two rows
    * ever resident). Supports 8-bit gray (color type 0), RGB (2) and RGBA
    * (6), non-interlaced AND Adam7-interlaced (r8: the seven passes only
    * permute pixel positions, so the statistics equal the non-interlaced
    * twin's — each pass unfilters independently per §8.2);
    * palette/16-bit and any malformed stream (bad filter byte,
    * truncated or trailing-garbage zlib data, over-limit dimensions)
    * return None, the quarantine convention. Chunk CRCs are not verified:
    * a metadata scan tolerates bit-rot that zlib will catch anyway.
    */
  def decodePngPixelStats(b: Array[Byte]): Option[PngPixelStats] = try {
    if (b.length < 8 || !PngSignature.indices.forall(i => b(i) == PngSignature(i)))
      return None
    var w = -1; var h = -1; var depth = -1; var colorType = -1
    var interlace = -1
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8L
    var done = false
    while (!done && off + 8 <= b.length) {
      val o = off.toInt
      val len = readBe32(b, o)
      if (len < 0) return None
      val t = new String(b, o + 4, 4, "US-ASCII")
      if (t == "IHDR") {
        if (len < 13 || off + 8 + 13 > b.length) return None
        w = readBe32(b, o + 8); h = readBe32(b, o + 12)
        depth = b(o + 16) & 0xff; colorType = b(o + 17) & 0xff
        interlace = b(o + 20) & 0xff
      } else if (t == "IDAT") {
        if (off + 8 + len > b.length) return None
        idat.write(b, o + 8, len)
      } else if (t == "IEND") {
        done = true
      }
      off += 12L + len
    }
    if (w <= 0 || h <= 0 || depth != 8 || (interlace != 0 && interlace != 1))
      return None
    val bpp = colorType match {
      case 6 => 4
      case 2 => 3
      case 0 => 1
      case _ => return None
    }
    if (w.toLong * h > MaxDecodedPixels) return None
    // pass geometry: non-interlaced is one full-frame pass; Adam7
    // (interlace 1) is the seven sub-grid passes of PNG spec §8.2, each
    // independently filtered — empty passes are omitted from the stream.
    // The statistics this face computes are pass-order invariant (the
    // schedule only permutes pixel positions), so interlaced images
    // yield the SAME row as their non-interlaced twins.
    val passes: Seq[(Int, Int)] =
      if (interlace == 0) Seq((w, h))
      else Adam7.flatMap { case (x0, y0, dx, dy) =>
        val pw = (w - x0 + dx - 1) / dx
        val ph = (h - y0 + dy - 1) / dy
        if (pw > 0 && ph > 0) Some((pw, ph)) else None
      }
    val expected = passes.map { case (pw, ph) => (pw.toLong * bpp + 1) * ph }.sum
    if (expected > Int.MaxValue) return None
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    val out = new Array[Byte](expected.toInt)
    var got = 0
    try {
      while (got < out.length && !inflater.finished()) {
        val n = inflater.inflate(out, got, out.length - got)
        if (n == 0 && (inflater.needsInput() || inflater.needsDictionary()))
          return None // truncated or preset-dictionary stream
        got += n
      }
      if (got < out.length) return None
      // the stream must END here: a zlib payload carrying MORE scanlines
      // than IHDR declares (bit-rotted height, crafted file) is corrupt,
      // not a smaller valid image — quarantine, don't truncate silently
      if (!inflater.finished()) {
        val probe = new Array[Byte](1)
        if (inflater.inflate(probe, 0, 1) > 0 || !inflater.finished())
          return None
      }
    } finally inflater.end()
    val maxStride = passes.map(_._1).max * bpp
    val prevRow = new Array[Byte](maxStride)
    val cur = new Array[Byte](maxStride)
    var rSum = 0L; var gSum = 0L; var bSum = 0L
    var rMin = 255; var rMax = 0; var gMin = 255; var gMax = 0
    var bMin = 255; var bMax = 0; var aMin = 255; var aMax = if (bpp == 4) 0 else 255
    var pos = 0
    passes.foreach { case (pw, ph) =>
      val stride = pw * bpp
      java.util.Arrays.fill(prevRow, 0.toByte) // each pass filters fresh
      var y = 0
      while (y < ph) {
        val f = out(pos) & 0xff; pos += 1
        if (f > 4) return None
        var j = 0
        while (j < stride) {
          val raw = out(pos + j) & 0xff
          val left = if (j >= bpp) cur(j - bpp) & 0xff else 0
          val up = prevRow(j) & 0xff
          val ul = if (j >= bpp) prevRow(j - bpp) & 0xff else 0
          val recon = f match {
            case 0 => raw
            case 1 => raw + left
            case 2 => raw + up
            case 3 => raw + ((left + up) >> 1)
            case _ => raw + paeth(left, up, ul)
          }
          cur(j) = (recon & 0xff).toByte
          j += 1
        }
        pos += stride
        var i = 0
        while (i < stride) {
          val r = cur(i) & 0xff
          val g = if (bpp == 1) r else cur(i + 1) & 0xff
          val bl = if (bpp == 1) r else cur(i + 2) & 0xff
          rSum += r; gSum += g; bSum += bl
          if (r < rMin) rMin = r; if (r > rMax) rMax = r
          if (g < gMin) gMin = g; if (g > gMax) gMax = g
          if (bl < bMin) bMin = bl; if (bl > bMax) bMax = bl
          if (bpp == 4) {
            val a = cur(i + 3) & 0xff
            if (a < aMin) aMin = a; if (a > aMax) aMax = a
          }
          i += bpp
        }
        System.arraycopy(cur, 0, prevRow, 0, stride)
        y += 1
      }
    }
    Some(PngPixelStats(w, h, w.toLong * h, rSum, gSum, bSum,
      rMin, rMax, gMin, gMax, bMin, bMax, aMin, aMax))
  } catch {
    case scala.util.control.NonFatal(_) => None
  }

  /** Minimal JPEG header stream: SOI, JFIF APP0, a COM segment (so the
    * parser must genuinely scan variable-length segments), SOF0 with the
    * dimensions, EOI. 50 bytes total.
    */
  def buildJpeg(width: Int, height: Int): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF\u0000".getBytes("US-ASCII") ++
      Array[Byte](1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val comment = "graft".getBytes("US-ASCII")
    val com = Array(0xff, 0xfe).map(_.toByte) ++ be16(2 + comment.length) ++ comment
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(height) ++ be16(width) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val eoi = Array(0xff, 0xd9).map(_.toByte)
    soi ++ app0 ++ com ++ sof0 ++ eoi
  }

  /** Minimal GIF89a: header + logical screen descriptor + trailer.
    * 14 bytes total; dimensions are little-endian u16 at offsets 6/8.
    */
  def buildGif(width: Int, height: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(width) ++ le16(height) ++
      Array[Byte](0x70, 0, 0, 0x3b)

  /** Parse (width, height) from PNG/JPEG/GIF bytes; None for anything
    * else. Pure public-format byte offsets — no image library.
    */
  def parseImageDimensions(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length >= 24 && PngSignature.indices.forall(i => b(i) == PngSignature(i))) {
      // PNG: walk chunks (IHDR is required first, but walk anyway).
      // LONG offsets: a hostile 0x7FFFxxxx chunk length must advance
      // past the end, never wrap an Int into negative indexing
      var off = 8L
      while (off + 8 <= b.length) {
        val o = off.toInt
        val len = readBe32(b, o)
        if (len < 0) return None
        val isIhdr = b(o + 4) == 'I' && b(o + 5) == 'H' &&
          b(o + 6) == 'D' && b(o + 7) == 'R'
        if (isIhdr && off + 16 <= b.length)
          return Some((readBe32(b, o + 8), readBe32(b, o + 12)))
        off += 12L + len // len + type + data + crc
      }
      None
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: scan markers for a start-of-frame (C0-CF except C4/C8/CC).
      // LONG cursor for the same overflow-immunity as the other walkers
      var i = 2L
      while (i + 3 < b.length) {
        if ((b(i.toInt) & 0xff) != 0xff) return None // desynced
        var j = i.toInt + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
        if (j >= b.length) return None
        val marker = b(j) & 0xff
        if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (j + 8 < b.length)
            return Some((readBe16(b, j + 6), readBe16(b, j + 4)))
          return None
        } else if (marker == 0xd9 || marker == 0xda) {
          return None // hit EOI / scan data without a SOF
        } else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
          i = j + 1L // standalone marker, no length field
        } else {
          if (j + 2 >= b.length) return None
          i = j + 1L + readBe16(b, j + 1)
        }
      }
      None
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      Some((readLe16(b, 6), readLe16(b, 8)))
    } else None
  }

  /** Real header decoder: dimensions parsed from the bytes (0 when the
    * payload is not a recognized image); md5 + byte count native. The
    * embedding is the one remaining stub — a deterministic digest-derived
    * stand-in for model inference, excluded from oracle-checked faces.
    */
  object HeaderDecoder extends MediaDecoder {
    def decodeBatch(rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaFeatures] =
      rows.map { case (id, mtype, bytes) =>
        val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        val hex = md5.map("%02x".format(_)).mkString
        val (w, h) = parseImageDimensions(bytes).getOrElse((0, 0))
        val emb = Array.tabulate(8)(i =>
          (java.lang.Byte.toUnsignedInt(md5(i % md5.length)) / 255.0f))
        MediaFeatures(id, mtype, bytes.length.toLong, hex, w, h, emb)
      }
  }

  // ---------------------------------------------------------------------
  // GIF pixel decode — LZW is fully specified in the public GIF89a spec
  // (appendix: variable-width codes, LSB-first packing, clear/EOI,
  // deferred width growth, 12-bit cap), so GIF sits on OUR side of the
  // codec boundary after all: dictionary coding needs no entropy tables
  // or transforms, just the spec.
  // ---------------------------------------------------------------------

  /** GIF-flavor LZW decode: `minCodeSize`-based variable-width codes read
    * LSB-first from the concatenated sub-block data. Returns None on any
    * malformed stream (code beyond dictionary+1, missing EOI before data
    * runs out with over/underfull output, width overflow) — quarantine,
    * never throw. `maxOut` caps output (bomb guard).
    */
  private[graft] def lzwDecode(
      data: Array[Byte], minCodeSize: Int, maxOut: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    // dictionary as parent-pointer table: entry = (prefix code, last byte)
    val maxDict = 4096
    val prefix = new Array[Int](maxDict)
    val suffix = new Array[Byte](maxDict)
    val first = new Array[Byte](maxDict) // first byte of each sequence
    var dictSize = eoi + 1
    var codeWidth = minCodeSize + 1
    var i = 0
    while (i < clear) {
      prefix(i) = -1; suffix(i) = i.toByte; first(i) = i.toByte
      i += 1
    }
    var bitPos = 0L
    val nBits = data.length.toLong * 8
    def nextCode(): Int = {
      if (bitPos + codeWidth > nBits) return -1
      var v = 0; var j = 0
      while (j < codeWidth) {
        val p = bitPos + j
        if ((data((p >> 3).toInt) >> (p & 7).toInt & 1) != 0) v |= 1 << j
        j += 1
      }
      bitPos += codeWidth
      v
    }
    val scratch = new Array[Byte](maxDict)
    def emit(code: Int): Boolean = { // writes sequence; false on overflow
      // sequences are stored as parent chains; write by walking to the
      // scratch then reversing
      var n = 0; var c = code
      while (c >= 0) {
        if (n >= maxDict) return false
        scratch(n) = suffix(c); n += 1; c = prefix(c)
      }
      if (out.size() + n > maxOut) return false
      var j = n - 1
      while (j >= 0) { out.write(scratch(j)); j -= 1 }
      true
    }
    var prev = -1
    var done = false
    while (!done) {
      val code = nextCode()
      if (code < 0) return None // ran out of bits before EOI
      else if (code == clear) {
        dictSize = eoi + 1; codeWidth = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        if (code >= dictSize || code >= clear) return None
        if (!emit(code)) return None
        prev = code
      } else {
        val known = code < dictSize
        if (!known && code != dictSize) return None
        val firstByte = if (known) first(code) else first(prev)
        if (dictSize < maxDict) {
          prefix(dictSize) = prev; suffix(dictSize) = firstByte
          first(dictSize) = first(prev)
          dictSize += 1
          // deferred width growth, 12-bit cap (GIF89a appendix)
          if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        if (!emit(code)) return None
        prev = code
      }
    }
    Some(out.toByteArray)
  }

  /** GIF-flavor LZW encode, the exact mirror of [[lzwDecode]]'s width
    * discipline (verified by round-trip specs AND by [[lzwDecode]]
    * reading real third-party GIF files). Emits CLEAR up front, resets
    * the dictionary at 4096 entries, EOI at the end.
    */
  private[graft] def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var nBuf = 0
    var codeWidth = minCodeSize + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << nBuf
      nBuf += codeWidth
      while (nBuf >= 8) { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; nBuf -= 8 }
    }
    // phrases keyed as (prefix code, next byte) — O(1) per input byte,
    // the mirror of the decoder's parent-pointer table (string keys
    // would cost the phrase length in copy+hash at every step)
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var dictSize = eoi + 1
    def reset(): Unit = { dict = scala.collection.mutable.HashMap.empty; dictSize = eoi + 1; codeWidth = minCodeSize + 1 }
    put(clear)
    var wCode = -1
    for (b <- indices) {
      val k = b & 0xff
      if (wCode == -1) wCode = k
      else dict.get((wCode, k)) match {
        case Some(c) => wCode = c
        case None =>
          put(wCode)
          if (dictSize < 4096) {
            dict((wCode, k)) = dictSize
            dictSize += 1
            // ONE ENTRY LATER than the decoder's growth rule: the
            // decoder's add for this entry happens only while processing
            // the NEXT code, so its read width trails the encoder's
            // dictionary by one — growing at (1<<W)+1 keeps the widths
            // aligned code for code (the classic LZW off-by-one)
            if (dictSize == (1 << codeWidth) + 1 && codeWidth < 12) codeWidth += 1
          } else {
            put(clear); reset()
          }
          wCode = k
      }
    }
    if (wCode != -1) put(wCode)
    put(eoi)
    if (nBuf > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** Complete GIF89a with REAL pixel data: an 8-color global table whose
    * palette entries derive from `id` in closed form, pixel index
    * (x + y) % 8 (row-varying, so the LZW stream is non-trivial), the
    * index stream LZW-compressed by [[lzwEncode]] and split into
    * 255-byte sub-blocks. Palette entry c:
    *   r(c) = (id + 29·c) % 256
    *   g(c) = (3·id + 17 + 41·c) % 256
    *   b(c) = (5·id + 31 + 53·c) % 256
    */
  def buildGifPixels(id: Long, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, "pixel GIF needs positive dimensions")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(width)); out.write(le16(height))
    out.write(0xf2) // GCT present, 3 bpp → 8 entries
    out.write(0); out.write(0) // background, aspect
    var c = 0
    while (c < 8) {
      out.write(((id + 29 * c) % 256).toInt)
      out.write(((3 * id + 17 + 41 * c) % 256).toInt)
      out.write(((5 * id + 31 + 53 * c) % 256).toInt)
      c += 1
    }
    out.write(0x2c) // image descriptor: full frame, no local table
    out.write(le16(0)); out.write(le16(0))
    out.write(le16(width)); out.write(le16(height))
    out.write(0)
    val indices = new Array[Byte](width * height)
    var y = 0; var i = 0
    while (y < height) {
      var x = 0
      while (x < width) { indices(i) = ((x + y) % 8).toByte; x += 1; i += 1 }
      y += 1
    }
    out.write(3) // LZW minimum code size
    val lzw = lzwEncode(indices, 3)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** REAL GIF pixel decode: LSD + global color table, extension blocks
    * skipped, single full-frame non-interlaced image block, sub-blocks
    * concatenated and LZW-decompressed by [[lzwDecode]], palette lookup,
    * channel statistics. Interlaced images are accepted (the four-pass
    * schedule only permutes rows; these statistics are row-permutation-
    * invariant); partial frames, multi-frame animations, streams missing
    * the 0x3B trailer or carrying bytes past it, or any other malformed
    * stream return None (quarantine — the same strictness as the PNG
    * decoder's trailing-data check). GIF has no alpha channel
    * in the raster (transparency is a GCE attribute, a rendering hint) —
    * alpha reports opaque 255/255. Returns the same statistics row as
    * the PNG decode.
    */
  def decodeGifPixelStats(b: Array[Byte]): Option[PngPixelStats] = try {
    if (b.length < 14 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F' ||
        b(3) != '8' || (b(4) != '7' && b(4) != '9') || b(5) != 'a') return None
    val w = readLe16(b, 6); val h = readLe16(b, 8)
    if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodedPixels) return None
    val flags = b(10) & 0xff
    var off = 13L
    var palR: Array[Int] = null; var palG: Array[Int] = null; var palB: Array[Int] = null
    def readPalette(size: Int): Boolean = {
      if (off + 3L * size > b.length) return false
      palR = new Array[Int](size); palG = new Array[Int](size); palB = new Array[Int](size)
      var c = 0
      while (c < size) {
        val o = (off + 3L * c).toInt
        palR(c) = b(o) & 0xff; palG(c) = b(o + 1) & 0xff; palB(c) = b(o + 2) & 0xff
        c += 1
      }
      off += 3L * size
      true
    }
    if ((flags & 0x80) != 0) { if (!readPalette(1 << ((flags & 7) + 1))) return None }
    // skip one extension block (label + sub-blocks); false = truncated
    def skipExtension(): Boolean = {
      off += 1 // label
      var len = if (off < b.length) b(off.toInt) & 0xff else return false
      while (len != 0) {
        off += 1 + len
        if (off >= b.length) return false
        len = b(off.toInt) & 0xff
      }
      off += 1 // terminator
      true
    }
    while (off < b.length) {
      val block = b(off.toInt) & 0xff
      off += 1
      if (block == 0x21) {
        if (!skipExtension()) return None
      } else if (block == 0x2c) { // image descriptor
        if (off + 9 > b.length) return None
        val o = off.toInt
        val left = readLe16(b, o); val top = readLe16(b, o + 2)
        val iw = readLe16(b, o + 4); val ih = readLe16(b, o + 6)
        val iflags = b(o + 8) & 0xff
        off += 9
        // interlacing (iflags bit 6) is accepted WITHOUT deinterlacing:
        // the four-pass schedule only PERMUTES rows, and every statistic
        // this face computes is row-permutation-invariant — a decoder
        // that emitted spatial pixels would need the reorder, this one
        // does not
        if (left != 0 || top != 0 || iw != w || ih != h) return None // partial frame
        if ((iflags & 0x80) != 0) { if (!readPalette(1 << ((iflags & 7) + 1))) return None }
        if (palR == null) return None // no palette at all
        if (off >= b.length) return None
        val minCodeSize = b(off.toInt) & 0xff
        off += 1
        val lzw = new java.io.ByteArrayOutputStream()
        var len = if (off < b.length) b(off.toInt) & 0xff else return None
        while (len != 0) {
          if (off + 1 + len > b.length) return None
          lzw.write(b, off.toInt + 1, len)
          off += 1 + len
          if (off >= b.length) return None
          len = b(off.toInt) & 0xff
        }
        off += 1 // consume the image block's 0x00 sub-block terminator
        val nPixels = w * h
        val indices = lzwDecode(lzw.toByteArray, minCodeSize, nPixels) match {
          case Some(ix) if ix.length == nPixels => ix
          case _ => return None
        }
        var rSum = 0L; var gSum = 0L; var bSum = 0L
        var rMin = 255; var rMax = 0; var gMin = 255; var gMax = 0
        var bMin = 255; var bMax = 0
        var i = 0
        while (i < nPixels) {
          val ix = indices(i) & 0xff
          if (ix >= palR.length) return None
          val r = palR(ix); val g = palG(ix); val bl = palB(ix)
          rSum += r; gSum += g; bSum += bl
          if (r < rMin) rMin = r; if (r > rMax) rMax = r
          if (g < gMin) gMin = g; if (g > gMax) gMax = g
          if (bl < bMin) bMin = bl; if (bl > bMax) bMax = bl
          i += 1
        }
        val stats = PngPixelStats(w, h, nPixels.toLong, rSum, gSum, bSum,
          rMin, rMax, gMin, gMax, bMin, bMax, 255, 255)
        // accept only a WELL-FORMED continuation to the 0x3B trailer
        // (the PNG decoder's strictness — it quarantines trailing zlib
        // data — applied here, closing the r7 asymmetry): trailing
        // extensions are skipped, a second image descriptor means a
        // multi-frame GIF this single-frame face must not summarize,
        // and bytes after the trailer are garbage — all → None
        while (off < b.length) {
          val blk = b(off.toInt) & 0xff
          off += 1
          if (blk == 0x21) { if (!skipExtension()) return None }
          else if (blk == 0x3b) {
            return if (off == b.length) Some(stats) else None
          } else return None // second frame or unknown block type
        }
        return None // ran off the end without a trailer
      } else if (block == 0x3b) {
        return None // trailer before any image data
      } else return None
    }
    None
  } catch {
    case scala.util.control.NonFatal(_) => None
  }

  // ---------------------------------------------------------------------
  // JPEG pixel decode — the from-scratch baseline codec lives in Jpeg
  // (ITU-T T.81: Huffman + dequant + IDCT + YCbCr); these are its
  // operator-facing faces, mirroring the PNG/GIF pair.
  // ---------------------------------------------------------------------

  /** REAL baseline JPEG pixel decode → the same statistics row as the
    * PNG/GIF faces; see [[Jpeg]] for scope and quarantine contract.
    */
  def decodeJpegPixelStats(b: Array[Byte]): Option[PngPixelStats] =
    Jpeg.decodePixelStats(b)

  /** Complete baseline JPEG with real entropy-coded scan data and
    * closed-form decodable pixels; see [[Jpeg.buildJpegPixels]].
    */
  def buildJpegPixels(
      id: Long, width: Int, height: Int, restartInterval: Int = 0): Array[Byte] =
    Jpeg.buildJpegPixels(id, width, height, restartInterval)

  /** Pixel-bearing JPEG fixture table: every doc becomes a complete
    * baseline JPEG (real Huffman scan, 4:4:4, constant 8×8 blocks) whose
    * DECODED channel statistics derive from doc_id in closed form — see
    * [[Jpeg.buildJpegPixels]]. Dimensions are 8-aligned (16–56 px per
    * side) so the block grid tiles exactly.
    */
  def synthesizePixelJpegTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // fanOut before the build map — see synthesizePixelImageTable
    graft.Tables.fanOut(docs.select(col("doc_id").cast("long"))).as[Long].map { id =>
      val w = 8 * (2 + (id % 6)).toInt
      val h = 8 * (2 + ((id * 5) % 6)).toInt
      (id, "image/jpeg", buildJpegPixels(id, w, h))
    }.toDF("media_id", "media_type", "content")
  }

  /** [[extractPixelStats]] for JPEG payloads — the same statistics face
    * over [[decodeJpegPixelStats]] (real Huffman + IDCT decoding).
    */
  def extractJpegPixelStats(spark: SparkSession, media: DataFrame): DataFrame =
    pixelStatsFace(spark, media, decodeJpegPixelStats)

  /** Decoder whose embedding IS pixel-derived wherever the pixels are
    * decodable from scratch off the public specs: for PNG (zlib inflate +
    * unfilter), GIF (LZW + palette) and baseline JPEG (Huffman + dequant
    * + IDCT + YCbCr) the 8-d feature vector is computed from decoded
    * pixels — [r_mean, g_mean, b_mean, luminance_mean, r_range, g_range,
    * b_range, log2(n_pixels)/32], each scaled to [0, 1] — a real (if
    * simple) visual descriptor: channel statistics separate images the
    * way a color histogram would. JPEG covers BOTH sequential and
    * progressive (SOF2) streams; the digest stand-in remains ONLY for
    * payloads whose pixel decode needs machinery still outside the repo
    * (video codecs).
    */
  object PixelFeatureDecoder extends MediaDecoder {
    def decodeBatch(rows: Iterator[(Long, String, Array[Byte])]): Iterator[MediaFeatures] =
      rows.map { case (id, mtype, bytes) =>
        val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        val hex = md5.map("%02x".format(_)).mkString
        val (w, h) = parseImageDimensions(bytes).getOrElse((0, 0))
        val emb = decodePngPixelStats(bytes)
          .orElse(decodeGifPixelStats(bytes))
          .orElse(decodeJpegPixelStats(bytes)) match {
          case Some(s) =>
            val n = s.nPixels.toDouble
            Array(
              (s.rSum / n / 255.0).toFloat,
              (s.gSum / n / 255.0).toFloat,
              (s.bSum / n / 255.0).toFloat,
              (((299.0 * s.rSum + 587.0 * s.gSum + 114.0 * s.bSum) / 1000.0)
                / n / 255.0).toFloat,
              ((s.rMax - s.rMin) / 255.0).toFloat,
              ((s.gMax - s.gMin) / 255.0).toFloat,
              ((s.bMax - s.bMin) / 255.0).toFloat,
              ((math.log(n.max(1.0)) / math.log(2.0)) / 32.0).toFloat)
          case None =>
            Array.tabulate(8)(i =>
              java.lang.Byte.toUnsignedInt(md5(i % md5.length)) / 255.0f)
        }
        MediaFeatures(id, mtype, bytes.length.toLong, hex, w, h, emb)
      }
  }

  // ---------------------------------------------------------------------
  // Audio: RIFF/WAVE header construction and parsing (public format —
  // RIFF chunks, PCM fmt subchunk layout).
  // ---------------------------------------------------------------------

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Minimal valid PCM WAV: RIFF header + "fmt " subchunk + "data"
    * subchunk with a zeroed payload. 44 bytes + payload.
    */
  def buildWav(
      channels: Int, sampleRate: Int, bitsPerSample: Int, nSamples: Int): Array[Byte] = {
    val bytesPerFrame = channels * (bitsPerSample / 8)
    val dataSize = nSamples * bytesPerFrame
    val byteRate = sampleRate * bytesPerFrame
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataSize) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(channels) ++ le32(sampleRate) ++ le32(byteRate) ++
      le16(bytesPerFrame) ++ le16(bitsPerSample) ++
      "data".getBytes("US-ASCII") ++ le32(dataSize) ++
      new Array[Byte](dataSize)
  }

  /** 16-bit PCM sample value of frame `i`, channel `ch` for the tone
    * fixture — a modular sawtooth whose value is closed-form in
    * (id, i, ch), so a DuckDB oracle can state per-sample statistics
    * while the Spark side must genuinely parse the little-endian words:
    *   s(i, ch) = ((id + i·(17 + 2·(id % 500)) + 7919·ch) % 65536) − 32768
    */
  private[operators] def toneSample(id: Long, i: Int, ch: Int): Int =
    (((id + i.toLong * (17L + 2L * (id % 500L)) + 7919L * ch) % 65536L)
      - 32768L).toInt

  /** [[buildWav]] with REAL sample words: the closed-form [[toneSample]]
    * sawtooth, 16-bit little-endian, channels interleaved per frame.
    */
  def buildWavTone(
      id: Long, channels: Int, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val header = buildWav(channels, sampleRate, 16, nSamples)
    val out = header.clone()
    var i = 0
    while (i < nSamples) {
      var ch = 0
      while (ch < channels) {
        val v = toneSample(id, i, ch)
        val o = 44 + 2 * (i * channels + ch)
        out(o) = (v & 0xff).toByte
        out(o + 1) = ((v >> 8) & 0xff).toByte
        ch += 1
      }
      i += 1
    }
    out
  }

  /** Parse (channels, sampleRate, bitsPerSample, dataBytes) from WAV bytes
    * by walking RIFF subchunks (so an extra LIST/INFO chunk before "data"
    * parses fine); None for non-WAV payloads.
    */
  def parseWavMeta(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def tag(off: Int, s: String): Boolean =
      off + s.length <= b.length &&
        s.indices.forall(i => b(off + i) == s.charAt(i).toByte)
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var channels = -1; var rate = -1; var bits = -1; var dataBytes = -1L
    // LONG offset: a hostile 0x7FFFxxxx chunk size must walk off the
    // end, never wrap an Int into negative indexing
    var off = 12L
    while (off + 8 <= b.length && (channels < 0 || dataBytes < 0)) {
      val o = off.toInt
      val size = readLe32(b, o + 4)
      if (size < 0) return None
      if (tag(o, "fmt ") && off + 24 <= b.length) {
        channels = readLe16(b, o + 10)
        rate = readLe32(b, o + 12)
        bits = readLe16(b, o + 22)
      } else if (tag(o, "data")) {
        dataBytes = size.toLong
      }
      off += 8L + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (channels > 0 && rate > 0 && bits > 0 && dataBytes >= 0)
      Some((channels, rate, bits, dataBytes))
    else None
  }

  /** Per-channel exact sample statistics from a REAL PCM decode. */
  case class WavChannelStats(
      channel: Int, nSamples: Long, peak: Int, sumSq: Long, zeroCrossings: Long)

  /** REAL sample-level WAV decode — past the header into the PCM words
    * themselves: RIFF walk to fmt + data, then every sample word,
    * accumulated per channel into exact integer statistics (peak =
    * max |v|, sum of squares — RMS is derived downstream — and strict
    * sign-change zero crossings). Sample formats (WAVE PCM spec): 8-bit
    * is UNSIGNED with midpoint 128 (reported relative to the midpoint so
    * silence is 0 like the wider widths); 16- and 24-bit are
    * little-endian signed two's complement. Quarantine (None): non-PCM
    * format tags (float32 WAV is format tag 3, not PCM), other bit
    * widths (32-bit integer PCM's energy can exceed the exact-Long
    * range), a data chunk extending past the payload (truncation), an
    * EMPTY data chunk (zero frames would make every statistic undefined
    * — NULL rms downstream), a frame count beyond the bomb ceiling, or
    * a 24-bit stream whose exact energy overflows a Long (addExact —
    * the face promises EXACT integers, so an unrepresentable sum
    * quarantines rather than wrapping silently).
    */
  /** RIFF→PCM layout walk shared by the sample-level decoders:
    * (channels, bytesPerSample, dataOff, nFrames, frameBytes). Carries
    * every quarantine rule the sample faces share: non-PCM format tags,
    * unsupported widths, a data chunk past the payload (truncation), an
    * empty data chunk, and the frame-count bomb ceiling.
    */
  private def wavPcmLayout(b: Array[Byte]): Option[(Int, Int, Long, Long, Int)] = {
    def tag(off: Int, s: String): Boolean =
      off + s.length <= b.length &&
        s.indices.forall(i => b(off + i) == s.charAt(i).toByte)
    if (b.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var channels = -1; var bits = -1; var dataOff = -1L; var dataBytes = -1L
    var off = 12L
    while (off + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val o = off.toInt
      val size = readLe32(b, o + 4)
      if (size < 0) return None
      if (tag(o, "fmt ") && off + 24 <= b.length) {
        if (readLe16(b, o + 8) != 1) return None // PCM only
        channels = readLe16(b, o + 10)
        bits = readLe16(b, o + 22)
      } else if (tag(o, "data")) {
        dataOff = off + 8; dataBytes = size.toLong
      }
      off += 8L + size + (size & 1)
    }
    if (channels <= 0 || channels > 64 || dataOff < 0) return None
    if (bits != 8 && bits != 16 && bits != 24) return None
    val bytesPer = bits / 8
    if (dataOff + dataBytes > b.length) return None // truncated sample data
    val frameBytes = channels * bytesPer
    val nFrames = dataBytes / frameBytes
    if (nFrames == 0) return None // no samples to characterize: quarantine
    if (nFrames > MaxDecodedPixels) return None // bomb ceiling
    Some((channels, bytesPer, dataOff, nFrames, frameBytes))
  }

  /** One PCM sample word at byte offset `o` (WAVE PCM spec): 8-bit is
    * UNSIGNED with midpoint 128 (reported midpoint-relative so silence
    * is 0 like the wider widths); 16/24-bit are little-endian signed
    * two's complement.
    */
  @inline private def pcmSample(b: Array[Byte], o: Int, bytesPer: Int): Int =
    bytesPer match {
      case 1 => (b(o) & 0xff) - 128
      case 2 => ((b(o) & 0xff) | (b(o + 1) << 8)).toShort.toInt
      case _ => // sign-extend the 24-bit LE word
        (((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
          ((b(o + 2) & 0xff) << 16)) << 8) >> 8
    }

  def decodeWavSampleStats(b: Array[Byte]): Option[Seq[WavChannelStats]] = try {
    wavPcmLayout(b).map { case (channels, bytesPer, dataOff, nFrames, frameBytes) =>
      val peak = new Array[Int](channels)
      val sumSq = new Array[Long](channels)
      val cross = new Array[Long](channels)
      val prev = new Array[Int](channels)
      var i = 0L
      while (i < nFrames) {
        var c = 0
        while (c < channels) {
          val v = pcmSample(b, (dataOff + i * frameBytes + bytesPer * c).toInt, bytesPer)
          val a = math.abs(v)
          if (a > peak(c)) peak(c) = a
          // addExact: a 24-bit stream can exceed the exact-Long energy
          // range after ~2^17 full-scale frames — quarantine, never wrap
          sumSq(c) = Math.addExact(sumSq(c), v.toLong * v)
          if (i > 0 && prev(c).toLong * v < 0) cross(c) += 1
          prev(c) = v
          c += 1
        }
        i += 1
      }
      (0 until channels).map(c =>
        WavChannelStats(c, nFrames, peak(c), sumSq(c), cross(c)))
    }
  } catch {
    case scala.util.control.NonFatal(_) => None
  }

  /** Per-channel Walsh–Hadamard sequency coefficients over one block. */
  case class WavWalshCoeffs(channel: Int, wDc: Long, w1: Long, w2: Long, w4: Long)

  /** Sequency-domain analysis over the decoded PCM words: Walsh–Hadamard
    * coefficients W_k = Σ_{n<blockSize} s(n)·(−1)^popcount(n AND k) for
    * k ∈ {0 (DC), 1, 2, 4} over the first `blockSize` frames of each
    * channel. The Walsh basis is ±1, so unlike a Fourier transform the
    * whole analysis is EXACT integer arithmetic — no libm trig whose
    * last-ulp behavior differs between engines — which is what makes a
    * frequency(sequency)-domain audio face oracle-checkable at all.
    * Rising k selects rising sequency (sign-change rate): W_1 flips
    * every frame (Nyquist-like), W_4 every 4th — together with DC they
    * profile where a clip's energy sits, the cheap spectral-shape
    * signal an audio-curation pass filters on.
    *
    * Quarantine: everything [[wavPcmLayout]] rejects, plus clips shorter
    * than one full block (a partial block would silently change the
    * basis — exactness over coverage, same discipline as the 24-bit
    * energy overflow rule).
    */
  def decodeWavWalsh(
      b: Array[Byte], blockSize: Int = 64): Option[Seq[WavWalshCoeffs]] = try {
    require(blockSize >= 1, "blockSize must be >= 1")
    wavPcmLayout(b).flatMap { case (channels, bytesPer, dataOff, nFrames, frameBytes) =>
      if (nFrames < blockSize) None
      else {
        val masks = Array(0L, 1L, 2L, 4L)
        val acc = Array.ofDim[Long](channels, masks.length)
        var i = 0
        while (i < blockSize) {
          var c = 0
          while (c < channels) {
            val v = pcmSample(
              b, (dataOff + i.toLong * frameBytes + bytesPer * c).toInt, bytesPer).toLong
            var m = 0
            while (m < masks.length) {
              if (java.lang.Long.bitCount(i & masks(m)) % 2 == 0) acc(c)(m) += v
              else acc(c)(m) -= v
              m += 1
            }
            c += 1
          }
          i += 1
        }
        Some((0 until channels).map(c =>
          WavWalshCoeffs(c, acc(c)(0), acc(c)(1), acc(c)(2), acc(c)(3))))
      }
    }
  } catch {
    case scala.util.control.NonFatal(_) => None
  }

  /** Per-channel aggregate of windowed Walsh sequency energies. */
  case class WavWalshWindowStats(
      channel: Int, nWindows: Long,
      eDcSum: Long, eDcMax: Long, e1Sum: Long, e1Max: Long,
      e2Sum: Long, e2Max: Long, e4Sum: Long, e4Max: Long)

  /** WINDOWED sequency analysis over the WHOLE clip — [[decodeWavWalsh]]
    * hops a `blockSize`-frame window across every full block of the PCM
    * stream (the single-block face reads only the first 64 frames) and
    * aggregates per (channel, sequency bin): the sum and max of the
    * absolute Walsh coefficient across windows. |W_k| summed over
    * windows is the clip's total energy at that sequency; the max flags
    * transient concentration — together the music/speech/silence
    * separation signal an audio-curation pass buckets by, still EXACT
    * integer arithmetic end to end (±1 basis, abs, sum, max), so the
    * whole face stays oracle-checkable.
    *
    * Trailing frames short of a full block are dropped (a partial block
    * would change the basis — exactness over coverage, the single-block
    * face's rule applied per window). Quarantine: [[wavPcmLayout]]'s
    * rejections plus clips under one full block.
    */
  def decodeWavWalshWindows(
      b: Array[Byte], blockSize: Int = 64): Option[Seq[WavWalshWindowStats]] = try {
    require(blockSize >= 1, "blockSize must be >= 1")
    wavPcmLayout(b).flatMap { case (channels, bytesPer, dataOff, nFrames, frameBytes) =>
      val nWin = (nFrames / blockSize).toInt
      if (nWin < 1) None
      else {
        val masks = Array(0L, 1L, 2L, 4L)
        val sums = Array.ofDim[Long](channels, masks.length)
        val maxs = Array.ofDim[Long](channels, masks.length)
        var w = 0
        while (w < nWin) {
          val acc = Array.ofDim[Long](channels, masks.length)
          var i = 0
          while (i < blockSize) {
            val frame = w.toLong * blockSize + i
            var c = 0
            while (c < channels) {
              val v = pcmSample(
                b, (dataOff + frame * frameBytes + bytesPer * c).toInt,
                bytesPer).toLong
              var m = 0
              while (m < masks.length) {
                if (java.lang.Long.bitCount(i & masks(m)) % 2 == 0) acc(c)(m) += v
                else acc(c)(m) -= v
                m += 1
              }
              c += 1
            }
            i += 1
          }
          var c = 0
          while (c < channels) {
            var m = 0
            while (m < masks.length) {
              val e = math.abs(acc(c)(m))
              sums(c)(m) += e
              if (e > maxs(c)(m)) maxs(c)(m) = e
              m += 1
            }
            c += 1
          }
          w += 1
        }
        Some((0 until channels).map(c => WavWalshWindowStats(c, nWin.toLong,
          sums(c)(0), maxs(c)(0), sums(c)(1), maxs(c)(1),
          sums(c)(2), maxs(c)(2), sums(c)(3), maxs(c)(3))))
      }
    }
  } catch {
    case scala.util.control.NonFatal(_) => None
  }

  /** Audio fixture table: real PCM WAV byte streams whose header fields
    * derive from doc_id — same closed-form-oracle construction as
    * [[synthesizeImageTable]].
    */
  def synthesizeAudioTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val channels = 1 + (id % 2).toInt
      val rate = 8000 * (1 + (id % 4).toInt)
      val nSamples = 100 + (id % 1000).toInt
      (id, "audio/wav", buildWav(channels, rate, 16, nSamples))
    }.toDF("media_id", "media_type", "content")
  }

  /** Tone-bearing audio fixture table: [[synthesizeAudioTable]]'s header
    * formulas with REAL sample words from the [[toneSample]] sawtooth —
    * the decoder must read actual PCM data while a DuckDB oracle states
    * per-sample statistics from the closed form.
    */
  def synthesizeToneAudioTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val channels = 1 + (id % 2).toInt
      val rate = 8000 * (1 + (id % 4)).toInt
      val nSamples = 100 + (id % 1000).toInt
      (id, "audio/wav", buildWavTone(id, channels, rate, nSamples))
    }.toDF("media_id", "media_type", "content")
  }

  /** Sample-level audio statistics face over [[decodeWavSampleStats]]:
    * one row per (media_id, channel) with exact integer peak / sum of
    * squares / strict zero crossings, plus the derived RMS in integer
    * milli-units (floor(sqrt(sum_sq / n) · 1000) — the same IEEE double
    * expression the oracle states, so the value is engine-exact).
    * Undecodable payloads are omitted (quarantine convention).
    */
  def extractAudioSampleStats(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWavSampleStats(bytes).toSeq.flatten.map(s =>
          (id, s.channel, s.nSamples, s.peak, s.sumSq, s.zeroCrossings))
      })
      .toDF("media_id", "channel", "n_samples", "peak", "sum_sq",
        "zero_crossings")
      .select(
        col("media_id"), col("channel"), col("n_samples"), col("peak"),
        col("sum_sq"),
        floor(sqrt(col("sum_sq") / col("n_samples")) * 1000).cast("long")
          .as("rms_milli"),
        col("zero_crossings"))
      .orderBy(col("media_id"), col("channel"))
  }

  /** Sequency-spectrum face over [[decodeWavWalsh]]: one row per
    * (media_id, channel) with the four exact Walsh coefficients plus the
    * dominant non-DC sequency (largest |W_k|, ties to the SMALLER k —
    * the `>=` chain below states that rule identically in both engines).
    * Map-only over the payload column; undecodable or short clips are
    * omitted (quarantine convention).
    */
  def extractAudioWalsh(
      spark: SparkSession, media: DataFrame, blockSize: Int = 64): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWavWalsh(bytes, blockSize).toSeq.flatten.map(w =>
          (id, w.channel, w.wDc, w.w1, w.w2, w.w4))
      })
      .toDF("media_id", "channel", "w_dc", "w1", "w2", "w4")
      .withColumn("dominant_k",
        when(abs(col("w1")) >= abs(col("w2")) &&
          abs(col("w1")) >= abs(col("w4")), lit(1L))
          .when(abs(col("w2")) >= abs(col("w4")), lit(2L))
          .otherwise(lit(4L)))
      .orderBy(col("media_id"), col("channel"))
  }

  /** Full-clip sequency-energy face over [[decodeWavWalshWindows]]: one
    * row per (media_id, channel) with per-bin windowed energy sums and
    * maxima — exact integers, quarantine by absence. Map-only.
    */
  def extractAudioWalshWindows(
      spark: SparkSession, media: DataFrame, blockSize: Int = 64): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeWavWalshWindows(bytes, blockSize).toSeq.flatten.map(s =>
          (id, s.channel, s.nWindows, s.eDcSum, s.eDcMax,
            s.e1Sum, s.e1Max, s.e2Sum, s.e2Max, s.e4Sum, s.e4Max))
      })
      .toDF("media_id", "channel", "n_windows", "e_dc_sum", "e_dc_max",
        "e1_sum", "e1_max", "e2_sum", "e2_max", "e4_sum", "e4_max")
      .orderBy(col("media_id"), col("channel"))
  }

  /** Audio feature extraction through the same partition-batched decoder
    * shape as [[extractFeatures]]: (media_id, channels, sample_rate,
    * bits_per_sample, n_samples, duration_ms) from real header parsing;
    * duration in integer milliseconds (floor) so the value is exact in
    * both engines. Unparseable payloads are omitted (the quarantine
    * convention).
    */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseWavMeta(bytes).map { case (ch, rate, bits, dataBytes) =>
          val nSamples = dataBytes / (ch * (bits / 8))
          val durationMs = nSamples * 1000L / rate
          (id, ch, rate, bits, nSamples, durationMs)
        }
      })
      .toDF("media_id", "channels", "sample_rate", "bits_per_sample",
        "n_samples", "duration_ms")
      .orderBy(col("media_id"))
  }

  // ---------------------------------------------------------------------
  // Video: ISO BMFF (MP4) box walk — ftyp + moov/mvhd (public format:
  // ISO/IEC 14496-12 box structure; mvhd v0 carries timescale and
  // duration as big-endian u32 at fixed offsets in its payload).
  // ---------------------------------------------------------------------

  /** Minimal valid MP4 metadata stream: ftyp box + moov box containing a
    * version-0 mvhd with the given timescale/duration. No media data —
    * the header-only shape a metadata scan reads.
    */
  def buildMp4(timescale: Int, duration: Int): Array[Byte] = {
    val ftypPayload = "isom".getBytes("US-ASCII") ++ be32(512) ++
      "isommp42".getBytes("US-ASCII")
    val ftyp = be32(8 + ftypPayload.length) ++ "ftyp".getBytes("US-ASCII") ++
      ftypPayload
    val mvhdPayload = Array[Byte](0, 0, 0, 0) ++ // version 0 + flags
      be32(0) ++ be32(0) ++                      // creation/modification time
      be32(timescale) ++ be32(duration) ++
      be32(0x00010000) ++                        // rate 1.0
      Array[Byte](0x01, 0, 0, 0) ++              // volume 1.0 + reserved
      new Array[Byte](8) ++                      // reserved
      (be32(0x00010000) ++ be32(0) ++ be32(0) ++ // identity matrix
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000)) ++
      new Array[Byte](24) ++                     // pre_defined
      be32(2)                                    // next_track_ID
    val mvhd = be32(8 + mvhdPayload.length) ++ "mvhd".getBytes("US-ASCII") ++
      mvhdPayload
    val moov = be32(8 + mvhd.length) ++ "moov".getBytes("US-ASCII") ++ mvhd
    ftyp ++ moov
  }

  /** Parse (timescale, duration) from MP4 bytes by walking top-level
    * boxes to moov, then moov's children to a version-0 mvhd; None for
    * non-BMFF payloads (no ftyp first, the brand sniff).
    */
  def parseMp4Meta(b: Array[Byte]): Option[(Int, Int)] = {
    def boxType(off: Int): String =
      new String(b, off + 4, 4, "US-ASCII")
    // LONG offsets: a hostile 0x7FFFxxxx box size must walk off the
    // end, never wrap an Int into negative indexing
    def walk(from: Long, until: Long, want: String): Option[Int] = {
      var off = from
      while (off + 8 <= until) {
        val size = readBe32(b, off.toInt)
        if (size < 8) return None // size-0/1 (to-eof / 64-bit) unsupported
        if (boxType(off.toInt) == want) return Some(off.toInt)
        off += size.toLong
      }
      None
    }
    if (b.length < 16 || boxType(0) != "ftyp") return None
    for {
      moov <- walk(0L, b.length.toLong, "moov")
      moovEnd = math.min(moov.toLong + readBe32(b, moov), b.length.toLong)
      mvhd <- walk(moov + 8L, moovEnd, "mvhd")
      if mvhd + 28 <= b.length && b(mvhd + 8) == 0 // bounds BEFORE the version read
    } yield (readBe32(b, mvhd + 20), readBe32(b, mvhd + 24))
  }

  /** Video fixture table: real MP4 header streams whose mvhd fields
    * derive from doc_id — the same closed-form-oracle construction as
    * the image/audio tables.
    */
  def synthesizeVideoTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val timescale = 1000 * (1 + (id % 3).toInt) // 1000/2000/3000 ticks/s
      val duration = (1000 + id % 60000).toInt    // ticks
      (id, "video/mp4", buildMp4(timescale, duration))
    }.toDF("media_id", "media_type", "content")
  }

  /** Video metadata extraction: (media_id, timescale, duration_ticks,
    * duration_ms) from the real box walk; duration in integer
    * milliseconds (floor), exact in both engines. Unparseable payloads
    * are omitted.
    */
  def extractVideoFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseMp4Meta(bytes).map { case (timescale, duration) =>
          (id, timescale, duration, duration.toLong * 1000L / timescale)
        }
      })
      .toDF("media_id", "timescale", "duration_ticks", "duration_ms")
      .orderBy(col("media_id"))
  }

  // ---------------------------------------------------------------------
  // ISO BMFF sample tables (stbl): the public ISO/IEC 14496-12 structures
  // that describe a track's media samples WITHOUT touching the codec
  // bitstream — stts (decode durations, §8.6.1.2), stss (sync samples,
  // §8.6.2), stsz (sample sizes, §8.7.3.2), stsc (sample-to-chunk,
  // §8.7.4), stco (chunk offsets, §8.7.5). Decoding them yields real
  // per-track sample counts, byte totals, durations, bitrate and
  // keyframe density — the columns video-corpus curation filters on —
  // while the codec payload itself stays behind the documented
  // PixelFeatureDecoder boundary.
  // ---------------------------------------------------------------------

  /** One track's sample-table description for [[buildMp4Samples]].
    * `uniformSize > 0` uses stsz's constant-size field (no table);
    * `uniformSize == 0` writes `sizes` as the per-sample table.
    * `syncInterval = None` omits the stss box entirely — per ISO
    * 14496-12 §8.6.2 an absent stss means EVERY sample is a sync sample.
    */
  case class Mp4TrackSpec(
      handler: String,
      mediaTimescale: Int,
      stts: Seq[(Int, Int)], // (sampleCount, deltaTicks) runs
      uniformSize: Int,
      sizes: Seq[Int],
      syncInterval: Option[Int],
      samplesPerChunk: Int,
      width: Int = 0,   // display pixels; written 16.16 fixed in tkhd
      height: Int = 0)

  private[operators] def mp4Box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(8 + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload

  /** Full-structure MP4 header stream: ftyp + moov(mvhd + one trak per
    * spec, each with tkhd/mdia(mdhd/hdlr/minf(stbl(stsd stts [stss] stsz
    * stsc stco)))). No mdat — the header-only shape a metadata scan
    * reads; chunk offsets are synthetic but well-formed.
    */
  def buildMp4Samples(
      movieTimescale: Int, movieDuration: Int,
      tracks: Seq[Mp4TrackSpec]): Array[Byte] = {
    val ftyp = mp4Box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512) ++
        "isommp42".getBytes("US-ASCII"))
    val mvhd = mp4Box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(movieTimescale) ++ be32(movieDuration) ++
        be32(0x00010000) ++ Array[Byte](0x01, 0, 0, 0) ++
        new Array[Byte](8) ++
        (be32(0x00010000) ++ be32(0) ++ be32(0) ++
          be32(0) ++ be32(0x00010000) ++ be32(0) ++
          be32(0) ++ be32(0) ++ be32(0x40000000)) ++
        new Array[Byte](24) ++ be32(tracks.size + 1))
    val traks = tracks.zipWithIndex.map { case (t, idx) =>
      val nSamples = t.stts.map(_._1).sum
      val durTicks = t.stts.map { case (n, d) => n.toLong * d }.sum
      val tkhd = mp4Box("tkhd",
        Array[Byte](0, 0, 0, 7) ++ be32(0) ++ be32(0) ++
          be32(idx + 1) ++ be32(0) ++ be32(durTicks.toInt) ++
          new Array[Byte](52) ++ // reserved/layer/group/volume/matrix
          be32(t.width << 16) ++ be32(t.height << 16)) // 16.16 fixed
      val mdhd = mp4Box("mdhd",
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
          be32(t.mediaTimescale) ++ be32(durTicks.toInt) ++
          be16(0x55c4) ++ be16(0)) // language 'und' + pre_defined
      val hdlr = mp4Box("hdlr",
        Array[Byte](0, 0, 0, 0) ++ be32(0) ++
          t.handler.getBytes("US-ASCII") ++ new Array[Byte](12) ++
          Array[Byte](0)) // empty null-terminated name
      val stsd = mp4Box("stsd",
        Array[Byte](0, 0, 0, 0) ++ be32(1) ++
          (be32(16) ++ "mp4v".getBytes("US-ASCII") ++
            new Array[Byte](6) ++ be16(1))) // minimal sample entry
      val stts = mp4Box("stts",
        Array[Byte](0, 0, 0, 0) ++ be32(t.stts.size) ++
          t.stts.flatMap { case (n, d) => be32(n) ++ be32(d) }.toArray)
      val stss = t.syncInterval.map { k =>
        val syncs = (1 to nSamples by k).toArray
        mp4Box("stss",
          Array[Byte](0, 0, 0, 0) ++ be32(syncs.length) ++
            syncs.flatMap(be32))
      }
      val stsz = mp4Box("stsz",
        Array[Byte](0, 0, 0, 0) ++ be32(t.uniformSize) ++ be32(nSamples) ++
          (if (t.uniformSize == 0) t.sizes.flatMap(be32).toArray
           else Array.empty[Byte]))
      val stsc = mp4Box("stsc",
        Array[Byte](0, 0, 0, 0) ++ be32(1) ++
          be32(1) ++ be32(t.samplesPerChunk) ++ be32(1))
      val nChunks = (nSamples + t.samplesPerChunk - 1) / t.samplesPerChunk
      val stco = mp4Box("stco",
        Array[Byte](0, 0, 0, 0) ++ be32(nChunks) ++
          (0 until nChunks).flatMap(c => be32(4096 + c * 65536)).toArray)
      val stbl = mp4Box("stbl",
        stsd ++ stts ++ stss.getOrElse(Array.empty[Byte]) ++
          stsz ++ stsc ++ stco)
      val minf = mp4Box("minf", stbl)
      val mdia = mp4Box("mdia", mdhd ++ hdlr ++ minf)
      mp4Box("trak", tkhd ++ mdia)
    }
    ftyp ++ mp4Box("moov", mvhd ++ traks.flatten.toArray)
  }

  /** One decoded track's sample-table aggregates (all integer, all from
    * real box parsing): syncCount honors the absent-stss convention
    * (every sample is sync). Byte totals are Longs — a real corpus track
    * easily passes 2^31 bytes.
    */
  case class Mp4TrackStats(
      trackIdx: Int, mediaTimescale: Int, sampleCount: Long,
      totalSampleBytes: Long, maxSampleBytes: Long, durationTicks: Long,
      syncCount: Long, chunkCount: Long,
      width: Int = 0, height: Int = 0) // tkhd 16.16 integer part; 0 = absent

  /** Walk the full box tree and decode EVERY track's sample tables.
    * Nil for non-BMFF payloads or streams with no parseable track;
    * a malformed trak is skipped (quarantine channel), not fatal to its
    * siblings. Bounds are checked before every fixed-offset read — the
    * fuzz spec drives truncations through every byte length.
    */
  def parseMp4SampleTables(b: Array[Byte]): Seq[Mp4TrackStats] = {
    def boxType(off: Int): String = new String(b, off + 4, 4, "US-ASCII")
    // all children named `want` in [from, until) — LONG cursor so a
    // hostile size can only walk off the end, never wrap negative
    def children(from: Long, until: Long, want: String): List[Int] = {
      val out = List.newBuilder[Int]
      var off = from
      while (off + 8 <= until) {
        val size = readBe32(b, off.toInt)
        if (size < 8) return out.result()
        if (boxType(off.toInt) == want) out += off.toInt
        off += size.toLong
      }
      out.result()
    }
    def child(from: Long, until: Long, want: String): Option[Int] =
      children(from, until, want).headOption
    def boxEnd(off: Int): Long =
      math.min(off.toLong + readBe32(b, off), b.length.toLong)
    if (b.length < 16 || boxType(0) != "ftyp") return Nil
    val moovOpt = child(0L, b.length.toLong, "moov")
    if (moovOpt.isEmpty) return Nil
    val moov = moovOpt.get
    children(moov + 8L, boxEnd(moov), "trak").zipWithIndex.flatMap {
      case (trak, idx) =>
        val trakEnd = boxEnd(trak)
        // display size from tkhd's trailing 16.16 width/height (v0 payload
        // offsets 76/80); absent or truncated tkhd reads as 0x0 — a real
        // metadata scan treats that as "no display size", not corruption
        val (w, h) = child(trak + 8L, trakEnd, "tkhd") match {
          case Some(tk) if tk + 92 <= b.length && b(tk + 8) == 0 =>
            (readBe32(b, tk + 84) >>> 16, readBe32(b, tk + 88) >>> 16)
          case _ => (0, 0)
        }
        for {
          mdia <- child(trak + 8L, trakEnd, "mdia")
          mdiaEnd = boxEnd(mdia)
          mdhd <- child(mdia + 8L, mdiaEnd, "mdhd")
          if mdhd + 24 <= b.length && b(mdhd + 8) == 0 // version-0 layout
          mts = readBe32(b, mdhd + 20)
          minf <- child(mdia + 8L, mdiaEnd, "minf")
          minfEnd = boxEnd(minf)
          stbl <- child(minf + 8L, minfEnd, "stbl")
          stblEnd = boxEnd(stbl)
          stats <- parseStbl(b, stbl + 8, stblEnd, idx + 1, mts,
            child, children _)
        } yield stats.copy(width = w, height = h)
    }
  }

  /** Decode one stbl's stts/stss/stsz/stco into [[Mp4TrackStats]]; None
    * when a required table is missing, truncated, or inconsistent
    * (stts total ≠ stsz count — the §8.6.1 invariant).
    */
  private def parseStbl(
      b: Array[Byte], from: Long, until: Long, trackIdx: Int, mts: Int,
      child: (Long, Long, String) => Option[Int],
      children: (Long, Long, String) => List[Int]): Option[Mp4TrackStats] = {
    def entryCount(off: Int): Option[Int] =
      if (off + 16 <= b.length) Some(readBe32(b, off + 12)) else None
    for {
      stts <- child(from, until, "stts")
      nRuns <- entryCount(stts)
      if nRuns >= 0 && stts + 16 + 8L * nRuns <= b.length
      runs = (0 until nRuns).map { i =>
        (readBe32(b, stts + 16 + 8 * i), readBe32(b, stts + 20 + 8 * i))
      }
      if runs.forall { case (n, d) => n >= 0 && d >= 0 }
      sttsSamples = runs.map(_._1.toLong).sum
      durTicks = runs.map { case (n, d) => n.toLong * d }.sum
      stsz <- child(from, until, "stsz")
      if stsz + 20 <= b.length
      uniform = readBe32(b, stsz + 12)
      nSamples = readBe32(b, stsz + 16)
      if nSamples >= 0 && nSamples.toLong == sttsSamples
      sizeStats <-
        if (uniform != 0)
          Some((uniform.toLong * nSamples,
            if (nSamples > 0) uniform.toLong else 0L))
        else if (stsz + 20 + 4L * nSamples <= b.length) {
          var total = 0L; var max = 0L; var i = 0
          while (i < nSamples) {
            val sz = readBe32(b, stsz + 20 + 4 * i).toLong & 0xffffffffL
            total += sz; if (sz > max) max = sz; i += 1
          }
          Some((total, max))
        } else None
      stco <- child(from, until, "stco")
      nChunks <- entryCount(stco)
      if nChunks >= 0 && stco + 16 + 4L * nChunks <= b.length
      syncCount <- child(from, until, "stss") match {
        case None => Some(nSamples.toLong) // absent stss: all samples sync
        case Some(stss) =>
          entryCount(stss).filter(n =>
            n >= 0 && stss + 16 + 4L * n <= b.length).map(_.toLong)
      }
    } yield Mp4TrackStats(trackIdx, mts, nSamples.toLong,
      sizeStats._1, sizeStats._2, durTicks, syncCount, nChunks.toLong)
  }

  /** Video fixture table WITH sample tables: every doc gets a video
    * track whose stts runs, per-sample size table, sync interval and
    * chunking derive from doc_id in closed form; every fifth doc gets a
    * second audio-style track exercising the OTHER branch of each box —
    * uniform stsz, single-run stts, absent stss (all-sync). The oracle
    * can therefore state every decoded aggregate arithmetically while
    * the Spark side must walk the real boxes.
    */
  def synthesizeVideoSampleTable(
      spark: SparkSession, docs: DataFrame,
      corruptEvery: Option[Int] = None): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val ns = (24 + id % 120).toInt
      val video = Mp4TrackSpec(
        handler = "vide",
        mediaTimescale = 600 * (1 + (id % 2)).toInt,
        stts = Seq((ns / 2, 100), (ns - ns / 2, 150)),
        uniformSize = 0,
        sizes = (0 until ns).map(i => 200 + ((id + i) % 50).toInt * 10),
        syncInterval = Some((4 + id % 4).toInt),
        samplesPerChunk = 8,
        width = (320 + (id % 8) * 160).toInt,
        height = (180 + (id % 8) * 90).toInt)
      val tracks =
        if (id % 5 == 0) {
          val ns2 = (50 + id % 100).toInt
          Seq(video, Mp4TrackSpec(
            handler = "soun", mediaTimescale = 8000,
            stts = Seq((ns2, 160)), uniformSize = 64, sizes = Nil,
            syncInterval = None, samplesPerChunk = 16))
        } else Seq(video)
      val bytes = buildMp4Samples(1000, 60000, tracks)
      // planted corruption for the profile's quarantine channel: every
      // corruptEvery-th payload truncated short of any box header
      val out = corruptEvery match {
        case Some(m) if id % m == 0 => bytes.take(5)
        case _ => bytes
      }
      (id, "video/mp4", out)
    }.toDF("media_id", "media_type", "content")
  }

  /** Corpus-level VIDEO CURATION PROFILE over the sample-table decode:
    * tracks bucket by decoded display height (sd < 480 ≤ ed < 720 ≤ hd;
    * width 0 = "no-display", the audio-track/absent-tkhd channel), each
    * bucket aggregates track count, byte volume, bitrate extremes +
    * integer-milli mean, and keyframe-interval extremes — the
    * resolution/bitrate/keyframe filters a video-training-data pipeline
    * applies corpus-wide. Payloads yielding NO parseable track are the
    * "corrupt" bucket (quarantine channel). One map-only decode pass +
    * one aggregate: the 100 TB shape, same as [[avMediaProfile]].
    */
  def videoSampleProfile(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val parsedCol = col("parsed") === 1
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (_, bytes) =>
        val ts = parseMp4SampleTables(bytes).filter(t =>
          t.mediaTimescale > 0 && t.durationTicks > 0 && t.syncCount > 0)
        if (ts.isEmpty) Iterator.single(("corrupt", 0, 0L, 0L, 0L))
        else ts.iterator.map { t =>
          val bucket =
            if (t.width == 0) "no-display"
            else if (t.height < 480) "sd"
            else if (t.height < 720) "ed"
            else "hd"
          (bucket, 1, t.totalSampleBytes,
            t.totalSampleBytes * 8L * t.mediaTimescale / t.durationTicks,
            t.sampleCount / t.syncCount)
        }
      })
      .toDF("bucket", "parsed", "bytes", "bitrate", "kf")
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_tracks"),
        sum(when(parsedCol, col("bytes")).otherwise(0L))
          .as("total_sample_bytes"),
        min(when(parsedCol, col("bitrate"))).as("bitrate_min_bps"),
        max(when(parsedCol, col("bitrate"))).as("bitrate_max_bps"),
        expr("CASE WHEN sum(parsed) = 0 THEN NULL ELSE " +
          "CAST(1000 * sum(CASE WHEN parsed = 1 THEN bitrate ELSE 0 END)" +
          " DIV sum(parsed) AS BIGINT) END").as("avg_bitrate_milli"),
        min(when(parsedCol, col("kf"))).as("kf_interval_min"),
        max(when(parsedCol, col("kf"))).as("kf_interval_max"))
      .orderBy(col("bucket"))
  }

  /** Per-track sample-table extraction: one row per (video, track) with
    * the decoded counts plus the derived curation columns — duration_ms,
    * mean bitrate (bits/sec, floor), keyframe interval (samples per sync
    * sample, floor) — all exact integer arithmetic so the oracle matches
    * bit-for-bit. Tracks with a zero timescale, duration, or sync count
    * are quarantined (dropped), the corrupt-channel convention.
    */
  def extractVideoSampleStats(
      spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseMp4SampleTables(bytes).flatMap { t =>
          if (t.mediaTimescale <= 0 || t.durationTicks <= 0 ||
              t.syncCount <= 0) None
          else Some((id, t.trackIdx, t.mediaTimescale, t.sampleCount,
            t.totalSampleBytes, t.maxSampleBytes, t.durationTicks,
            t.durationTicks * 1000L / t.mediaTimescale,
            t.totalSampleBytes * 8L * t.mediaTimescale / t.durationTicks,
            t.syncCount, t.sampleCount / t.syncCount, t.chunkCount,
            t.width, t.height))
        }
      })
      .toDF("media_id", "track_idx", "media_timescale", "sample_count",
        "total_sample_bytes", "max_sample_bytes", "duration_ticks",
        "duration_ms", "bitrate_bps", "keyframe_count",
        "keyframe_interval", "chunk_count", "width", "height")
      .orderBy(col("media_id"), col("track_idx"))
  }

  /** Stand-in media table: document text bytes as the binary payload
    * (deterministic; real pipelines read image/audio files the same way —
    * `spark.read.format("binaryFile")`).
    */
  def synthesizeMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("content"))

  /** Image fixture table: real PNG/JPEG/GIF byte streams (format by
    * doc_id % 3) whose header-encoded dimensions derive from doc_id —
    * so a DuckDB oracle can state the expected parse output in closed
    * form while the Spark side must actually parse the bytes.
    */
  def synthesizeImageTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = (16 + id % 2048).toInt
      val h = (16 + (id * 7) % 2048).toInt
      (id % 3) match {
        case 0 => (id, "image/png", buildPng(w, h))
        case 1 => (id, "image/jpeg", buildJpeg(w, h))
        case _ => (id, "image/gif", buildGif(w, h))
      }
    }.toDF("media_id", "media_type", "content")
  }

  /** Pixel-bearing image fixture table: every doc becomes a complete RGBA
    * PNG (real deflated IDAT, all five scanline filters) whose pixel
    * values derive from doc_id in closed form — see [[buildPngPixels]] —
    * so the decoder must genuinely inflate and unfilter while a DuckDB
    * oracle states the channel statistics arithmetically. Dimensions stay
    * small (16–63 px per side) to bound fixture bytes.
    */
  def synthesizePixelImageTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // fanOut the id frame before the opaque build map: encode+decode is
    // real per-row CPU (deflate/inflate), and the single-row-group
    // fixture scan would otherwise run it serially in one task; at
    // scale the gate sees a big frame and leaves the scan split alone
    graft.Tables.fanOut(docs.select(col("doc_id").cast("long"))).as[Long].map { id =>
      val w = (16 + id % 48).toInt
      val h = (16 + (id * 7) % 48).toInt
      (id, "image/png", buildPngPixels(id, w, h))
    }.toDF("media_id", "media_type", "content")
  }

  /** Pixel-bearing GIF fixture table: every doc becomes a complete 8-color
    * GIF89a (real LZW-compressed index stream) whose palette and indices
    * derive from doc_id in closed form — see [[buildGifPixels]]. Same
    * dimension formulas as the PNG pixel table.
    */
  def synthesizePixelGifTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // fanOut before the build map — see synthesizePixelImageTable
    graft.Tables.fanOut(docs.select(col("doc_id").cast("long"))).as[Long].map { id =>
      val w = (16 + id % 48).toInt
      val h = (16 + (id * 7) % 48).toInt
      (id, "image/gif", buildGifPixels(id, w, h))
    }.toDF("media_id", "media_type", "content")
  }

  /** Per-image pixel statistics from the REAL decode (inflate + unfilter +
    * accumulate): exact integer channel sums become reproducible means
    * (`sum/n` is the same rational in any engine — no float accumulation
    * order), and the luminance mean is reported in integer milli-units
    * (`(299·rSum + 587·gSum + 114·bSum) div n`, the Rec.601 weights) so it
    * is exact as well. Undecodable payloads are omitted (quarantine
    * convention). This retires the digest stand-in for PNG: the feature
    * values are computed from decompressed pixels, not from the container
    * header or a hash.
    */
  def extractPixelStats(spark: SparkSession, media: DataFrame): DataFrame =
    pixelStatsFace(spark, media, decodePngPixelStats)

  /** [[extractPixelStats]] for GIF payloads — the same statistics face
    * over [[decodeGifPixelStats]] (real LZW decompression + palette
    * lookup).
    */
  def extractGifPixelStats(spark: SparkSession, media: DataFrame): DataFrame =
    pixelStatsFace(spark, media, decodeGifPixelStats)

  private def pixelStatsFace(
      spark: SparkSession, media: DataFrame,
      decode: Array[Byte] => Option[PngPixelStats]): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decode(bytes).map { s =>
          (id, s.width, s.height, s.nPixels, s.rSum, s.gSum, s.bSum,
            s.rMin, s.rMax, s.gMin, s.gMax, s.bMin, s.bMax, s.aMin, s.aMax)
        }
      })
      .toDF("media_id", "width", "height", "n_pixels", "r_sum", "g_sum",
        "b_sum", "r_min", "r_max", "g_min", "g_max", "b_min", "b_max",
        "a_min", "a_max")
      .select(
        col("media_id"), col("width"), col("height"), col("n_pixels"),
        round(col("r_sum") / col("n_pixels"), 6).as("r_mean"),
        round(col("g_sum") / col("n_pixels"), 6).as("g_mean"),
        round(col("b_sum") / col("n_pixels"), 6).as("b_mean"),
        expr("(299 * r_sum + 587 * g_sum + 114 * b_sum) DIV n_pixels")
          .as("lum_milli"),
        col("r_min"), col("r_max"), col("g_min"), col("g_max"),
        col("b_min"), col("b_max"), col("a_min"), col("a_max"))
      .orderBy(col("media_id"))
  }

  /** Image fixture table with PLANTED corruption: the [[synthesizeImageTable]]
    * streams, but every `doc_id % 17 == 0` payload is truncated to its
    * first 5 bytes — short of every format's header, so all three parsers
    * quarantine it. Closed-form corrupt population for the profile oracle.
    */
  def synthesizeMixedImageTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = (16 + id % 2048).toInt
      val h = (16 + (id * 7) % 2048).toInt
      val bytes = (id % 3) match {
        case 0 => buildPng(w, h)
        case 1 => buildJpeg(w, h)
        case _ => buildGif(w, h)
      }
      val mtype = (id % 3) match {
        case 0 => "image/png"
        case 1 => "image/jpeg"
        case _ => "image/gif"
      }
      (id, mtype, if (id % 17 == 0) bytes.take(5) else bytes)
    }.toDF("media_id", "media_type", "content")
  }

  /** Corpus-level media profile — the dataset-curation view over per-row
    * decode results: per declared format, total/parsed/corrupt counts (the
    * parsers' None channel IS the corrupt count), dimension extrema,
    * integer milli-unit mean dimensions (`1000·sum div n`, exact in any
    * engine), and aspect-ratio outliers (longest side ≥ 3× the shortest —
    * the usual "banner/sliver" training-data exclusion). One map-side
    * parse pass, one groupBy on the low-cardinality format key: the same
    * shape at 100 TB, with the aggregate combining map-side.
    */
  /** Audio/video corpus profile — the curation view [[mediaProfile]]
    * gives images, for TIME-BASED media: per-format parsed/corrupt
    * counts and exact duration statistics (integer ms; milli-unit mean
    * as 1000·sum DIV n — engine-exact like the image profile's
    * dimension means) plus a long-duration outlier count (≥ 30 s, the
    * clips a training pipeline would route to segmentation). Durations
    * come from REAL parses — WAV: PCM frames/rate from the RIFF walk;
    * MP4: mvhd ticks·1000/timescale — content-sniffed in that order
    * (never trusting the declared media_type, same as the image
    * profile); unparseable payloads are the corrupt channel. One
    * map-only pass + one aggregate: the 100 TB shape.
    */
  def avMediaProfile(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val parsedCol = col("parsed") === 1
    media
      .select(col("media_id").cast("long"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (_, mtype, bytes) =>
        val dur = parseWavMeta(bytes).map { case (ch, rate, bits, dataBytes) =>
          (dataBytes / (ch * (bits / 8))) * 1000L / rate
        }.orElse(parseMp4Meta(bytes).map { case (scale, ticks) =>
          ticks.toLong * 1000L / scale
        })
        (mtype, if (dur.isDefined) 1 else 0, dur.getOrElse(0L))
      })
      .toDF("media_type", "parsed", "dur")
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("parsed")).cast("long").as("n_parsed"),
        (count(lit(1)) - sum(col("parsed"))).cast("long").as("n_corrupt"),
        min(when(parsedCol, col("dur"))).as("dur_min_ms"),
        max(when(parsedCol, col("dur"))).as("dur_max_ms"),
        expr("CAST(1000 * sum(CASE WHEN parsed = 1 THEN dur ELSE 0 END)" +
          " DIV sum(parsed) AS BIGINT)").as("avg_dur_milli"),
        sum(when(parsedCol && col("dur") >= 30000L, 1).otherwise(0))
          .cast("long").as("n_long_outliers"))
      .orderBy(col("media_type"))
  }

  /** Mixed audio/video fixture with PLANTED corruption for the
    * [[avMediaProfile]] oracle: WAV tones for even ids, MP4s for odd,
    * every doc_id % 13 == 0 payload truncated to 5 bytes (short of both
    * formats' headers).
    */
  def synthesizeMixedAvTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val (mtype, bytes) =
        if (id % 2 == 0)
          ("audio/wav",
            buildWav(1 + (id % 2).toInt, 8000 * (1 + (id % 4)).toInt, 16,
              100 + (id % 1000).toInt))
        else
          ("video/mp4",
            buildMp4(1000 * (1 + (id % 3)).toInt, 1000 + (id % 60000).toInt))
      (id, mtype, if (id % 13 == 0) bytes.take(5) else bytes)
    }.toDF("media_id", "media_type", "content")
  }

  def mediaProfile(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val parsedCol = col("parsed") === 1
    media
      .select(col("media_id").cast("long"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (_, mtype, bytes) =>
        parseImageDimensions(bytes) match {
          case Some((w, h)) => (mtype, 1, w, h)
          case None => (mtype, 0, 0, 0)
        }
      })
      .toDF("media_type", "parsed", "w", "h")
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("parsed")).cast("long").as("n_parsed"),
        (count(lit(1)) - sum(col("parsed"))).cast("long").as("n_corrupt"),
        min(when(parsedCol, col("w"))).as("w_min"),
        max(when(parsedCol, col("w"))).as("w_max"),
        min(when(parsedCol, col("h"))).as("h_min"),
        max(when(parsedCol, col("h"))).as("h_max"),
        expr("CAST(1000 * sum(CASE WHEN parsed = 1 THEN w ELSE 0 END)" +
          " DIV sum(parsed) AS BIGINT)").as("avg_w_milli"),
        expr("CAST(1000 * sum(CASE WHEN parsed = 1 THEN h ELSE 0 END)" +
          " DIV sum(parsed) AS BIGINT)").as("avg_h_milli"),
        sum(when(parsedCol &&
            greatest(col("w"), col("h")) >= lit(3) * least(col("w"), col("h")),
          1).otherwise(0)).cast("long").as("n_aspect_outliers"))
      .orderBy(col("media_type"))
  }

  /** Partition-batched feature extraction through the decoder — the
    * mapInPandas-shaped path. One decoder call per partition batch, rows
    * streamed, nothing collected.
    */
  def extractFeatures(
      spark: SparkSession, media: DataFrame, decoder: MediaDecoder): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(rows => decoder.decodeBatch(rows))
      .toDF()
  }

  /** Frame sampling: split the binary payload into fixed-size "frames" and
    * keep every `every`-th one — the video-pipeline access pattern (decode
    * is per-frame downstream). Pure built-ins: `substring` works on BINARY,
    * frames stay opaque bytes; md5 fingerprints make the output
    * deterministic and small.
    */
  def frameSample(media: DataFrame, frameBytes: Int, every: Int): DataFrame =
    media
      .select(
        col("media_id"),
        posexplode(transform(
          sequence(lit(0),
            greatest(floor((length(col("content")) - 1) / frameBytes).cast("int"), lit(0))),
          i => substring(col("content"), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .where(col("frame_idx") % every === 0 && length(col("frame")) > 0)
      .select(
        col("media_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy(col("media_id"), col("frame_idx"))

  /** Resize metadata: target dimensions preserving aspect ratio — the
    * metadata side of a resize; pixel resampling would live in the
    * decoder. floor + clamp-to-1 (an image side never resizes to zero):
    * integer-exact semantics a DuckDB oracle can restate verbatim.
    */
  def resizeMeta(features: DataFrame, maxSide: Int): DataFrame =
    features.select(
      col("media_id"), col("width"), col("height"),
      least(lit(maxSide) / greatest(col("width"), col("height")).cast("double"), lit(1.0))
        .as("scale"))
      .select(
        col("media_id"),
        greatest(floor(col("width") * col("scale")), lit(1)).cast("int").as("resized_w"),
        greatest(floor(col("height") * col("scale")), lit(1)).cast("int").as("resized_h"))

  /** Native-function feature subset — no decoder, pure codegen'd built-ins
    * (octet length + md5), hence DuckDB-oracle-checkable end to end.
    */
  def binaryStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("media_type"),
      length(col("content")).cast("long").as("n_bytes"),
      md5(col("content")).as("content_md5"))
      .orderBy(col("media_id"))
}
