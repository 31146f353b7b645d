package graft.operators

/** Baseline sequential JPEG codec, from scratch per the PUBLIC ITU-T T.81
  * spec (no image library): marker/segment walk (§B.2), DQT/DHT table
  * parsing, canonical Huffman decoding (§F.2.2.3 DECODE with the
  * mincode/maxcode/valptr construction of §C.2), DC prediction + EXTEND
  * (§F.2.2.1), run/size AC decoding with ZRL and EOB (§F.2.2.2),
  * dequantization, a double-precision separable 8×8 IDCT (§A.3.3),
  * restart-marker handling (§E.2.4), replication chroma upsampling and
  * the JFIF YCbCr→RGB conversion. This retires the last entropy-coded
  * format behind the repo's former "codec boundary": PNG (inflate), GIF
  * (LZW) and JPEG (Huffman+DCT) all decode for real now.
  *
  * Scope and quarantine discipline (same contract as the PNG/GIF faces —
  * any stream outside it returns None, never throws): 8-bit baseline
  * sequential only (SOF0/SOF1; progressive SOF2 and every other frame
  * type quarantine), 1 or 3 components, sampling factors 1–4, one
  * interleaved scan covering all components, strict tail (EOI must
  * follow the entropy data, nothing after it — the GIF trailer
  * discipline), and the [[Multimodal.MaxDecodedPixels]] bomb ceiling.
  *
  * Rounding contract, stated precisely because the DuckDB oracle mirrors
  * it: sample reconstruction is floor(idct + 128 + 0.5) clamped to
  * [0, 255], and color conversion is floor(expr + 0.5) clamped, with the
  * JFIF constants written EXACTLY as in the oracle SQL (identical IEEE
  * double expressions on both engines — no round-mode ambiguity).
  *
  * Reference behavior cross-checked two ways in MultimodalSpec: the JDK's
  * independent ImageIO codec decodes [[buildJpegPixels]] streams to the
  * closed-form constants, and this decoder reproduces ImageIO-encoded
  * images within the ±1 IDCT tolerance ITU-T T.83 allows.
  */
private[operators] object Jpeg {

  import Multimodal.PngPixelStats

  /** Zigzag index → natural (row-major) coefficient position, T.81
    * Figure A.6.
    */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cosTable(u)(x) = C(u)·cos((2x+1)uπ/16), C(0)=1/√2 — the separable
    * IDCT basis (T.81 A.3.3).
    */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Shared control-flow signal for any malformed stream — caught at the
    * decode boundary and turned into None (the quarantine convention).
    */
  private object Malformed
    extends RuntimeException("malformed jpeg")
    with scala.util.control.NoStackTrace

  /** Canonical Huffman decode table (T.81 §C.2): mincode/maxcode/valptr
    * indexed by code length 1..16; maxcode = -1 marks an empty length.
    */
  private final class HuffTable(bits: Array[Int], val huffval: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = new Array[Int](17)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l) == 0) maxcode(l) = -1
        else {
          valptr(l) = k
          mincode(l) = code
          code += bits(l); k += bits(l)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      if (k != huffval.length) throw Malformed
    }
  }

  /** MSB-first bit reader over entropy-coded data with 0xFF00 byte
    * de-stuffing; any bare marker mid-symbol means the stream ran out
    * early (malformed). Restart/EOI markers are consumed explicitly via
    * [[alignAndMarker]], never through bit reads.
    */
  private final class BitReader(b: Array[Byte], start: Int) {
    var pos = start
    private var cur = 0
    private var used = 8
    private def loadByte(): Unit = {
      if (pos >= b.length) throw Malformed
      val v = b(pos) & 0xff; pos += 1
      if (v == 0xff) {
        if (pos >= b.length) throw Malformed
        if ((b(pos) & 0xff) != 0x00) throw Malformed // marker mid-entropy
        pos += 1
      }
      cur = v; used = 0
    }
    def nextBit(): Int = {
      if (used == 8) loadByte()
      val r = (cur >> (7 - used)) & 1
      used += 1
      r
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Discard padding bits, skip a stuffed 0xFF00 pad byte (an encoder
      * whose 1-padded final entropy byte lands on 0xFF must stuff it) and
      * 0xFF fill bytes, then return the marker.
      */
    def alignAndMarker(): Int = {
      used = 8
      while (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
          (b(pos + 1) & 0xff) == 0x00)
        pos += 2
      if (pos >= b.length || (b(pos) & 0xff) != 0xff) throw Malformed
      var j = pos
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) throw Malformed
      pos = j + 1
      b(j) & 0xff
    }
  }

  private def huffDecode(br: BitReader, t: HuffTable): Int = {
    var code = br.nextBit()
    var l = 1
    while (code > t.maxcode(l)) {
      code = (code << 1) | br.nextBit()
      l += 1
      if (l > 16) throw Malformed
    }
    t.huffval(t.valptr(l) + code - t.mincode(l))
  }

  /** T.81 F.2.2.1 EXTEND: map the t low bits back to the signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  private def readBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** floor(x + 0.5) clamped to [0, 255] — the rounding the oracle SQL
    * states verbatim (floor-based, so there is no half-even/half-up
    * divergence between engines).
    */
  private def clampRound(x: Double): Int = {
    val r = math.floor(x + 0.5)
    if (r <= 0.0) 0 else if (r >= 255.0) 255 else r.toInt
  }

  /** Decode one 8×8 block into `samples` (natural order, reconstructed
    * clamped sample values); returns the new DC prediction.
    */
  private def decodeBlock(
      br: BitReader, dc: HuffTable, ac: HuffTable, q: Array[Int],
      pred: Int, coef: Array[Double], tmp: Array[Double],
      samples: Array[Int]): Int = {
    java.util.Arrays.fill(coef, 0.0)
    val t = huffDecode(br, dc)
    if (t > 15) throw Malformed
    val diff = extend(br.receive(t), t)
    val newPred = pred + diff
    coef(0) = newPred.toDouble * q(0)
    var k = 1
    while (k < 64) {
      val rs = huffDecode(br, ac)
      val r = rs >> 4; val s = rs & 15
      if (s == 0) {
        if (r == 15) k += 16 // ZRL: sixteen zeros
        else k = 64 // EOB
      } else {
        k += r
        if (k > 63) throw Malformed
        coef(ZigZag(k)) = extend(br.receive(s), s).toDouble * q(k)
        k += 1
      }
    }
    // separable IDCT: rows then columns, 1/4 overall scale (T.81 A.3.3)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * CosT(u)(x); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += tmp(vv * 8 + x) * CosT(vv)(y); vv += 1 }
        samples(y * 8 + x) = clampRound(s / 4.0 + 128.0)
        x += 1
      }
      y += 1
    }
    newPred
  }

  /** REAL baseline JPEG pixel decode → channel statistics (the PNG/GIF
    * statistics face). None quarantines anything outside the documented
    * scope or malformed in any way.
    */
  def decodePixelStats(b: Array[Byte]): Option[PngPixelStats] = try {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    val qt = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var dri = 0
    var w = 0; var h = 0
    var comps: Array[Component] = null
    var off = 2L
    var scanStart = -1
    while (scanStart < 0) {
      if (off + 4 > b.length) return None
      if ((b(off.toInt) & 0xff) != 0xff) return None
      var j = off.toInt + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j + 2 >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        off = j + 1L // standalone
      } else if (marker == 0xd9) {
        return None // EOI before any scan
      } else {
        val len = readBe16(b, j + 1)
        if (len < 2 || j + 1 + len > b.length) return None
        val seg = j + 3 // first data byte
        val segEnd = j + 1 + len
        marker match {
          case 0xdb => // DQT: one or more tables, 8-bit precision only
            var p = seg
            while (p < segEnd) {
              val pq = (b(p) & 0xff) >> 4; val tq = b(p) & 0x0f
              if (pq != 0 || tq > 3 || p + 65 > segEnd) return None
              qt(tq) = Array.tabulate(64)(i => b(p + 1 + i) & 0xff)
              if (qt(tq).exists(_ == 0)) return None
              p += 65
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < segEnd) {
              val tc = (b(p) & 0xff) >> 4; val th = b(p) & 0x0f
              if (tc > 1 || th > 3 || p + 17 > segEnd) return None
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = b(p + l) & 0xff; total += bits(l); l += 1 }
              if (total > 256 || p + 17 + total > segEnd) return None
              val hv = Array.tabulate(total)(i => b(p + 17 + i) & 0xff)
              val tab = new HuffTable(bits, hv)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + total
            }
          case 0xc0 | 0xc1 => // baseline / extended-sequential Huffman
            if (comps != null) return None
            if (segEnd - seg < 6) return None
            val prec = b(seg) & 0xff
            h = readBe16(b, seg + 1); w = readBe16(b, seg + 3)
            val nc = b(seg + 5) & 0xff
            if (prec != 8 || w <= 0 || h <= 0) return None
            if (nc != 1 && nc != 3) return None
            if (w.toLong * h > Multimodal.MaxDecodedPixels) return None
            if (segEnd - seg < 6 + 3 * nc) return None
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + 3 * c
              val hv = b(o + 1) & 0xff
              val comp = Component(b(o) & 0xff, hv >> 4, hv & 15, b(o + 2) & 0xff)
              if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4 ||
                  comp.tq > 3) return None
              comp
            }
          case m if m >= 0xc2 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
              m != 0xcc =>
            return None // progressive/arithmetic/lossless: out of scope
          case 0xdd => // DRI
            if (segEnd - seg < 2) return None
            dri = readBe16(b, seg)
          case 0xda => // SOS
            if (comps == null) return None
            val ns = b(seg) & 0xff
            if (ns != comps.length || segEnd - seg < 1 + 2 * ns + 3) return None
            var c = 0
            while (c < ns) {
              val cs = b(seg + 1 + 2 * c) & 0xff
              val tt = b(seg + 2 + 2 * c) & 0xff
              val comp = comps.find(_.id == cs).getOrElse(return None)
              comp.td = tt >> 4; comp.ta = tt & 15
              if (comp.td > 3 || comp.ta > 3) return None
              c += 1
            }
            // Ss/Se/AhAl fixed for sequential (0, 63, 0)
            if ((b(segEnd - 3) & 0xff) != 0 || (b(segEnd - 2) & 0xff) != 63 ||
                (b(segEnd - 1) & 0xff) != 0) return None
            scanStart = segEnd
          case _ => () // APPn, COM: skip
        }
        off = j + 1L + len
      }
    }
    // every referenced table must exist
    comps.foreach { c =>
      if (qt(c.tq) == null || dcTabs(c.td) == null || acTabs(c.ta) == null)
        return None
    }
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component padded rasters (MCU grid); bomb guard covers padding
    val rasters = comps.map { c =>
      val pw = mcusX * c.h * 8; val ph = mcusY * c.v * 8
      if (pw.toLong * ph > 4L * Multimodal.MaxDecodedPixels) return None
      new Array[Int](pw * ph)
    }
    val br = new BitReader(b, scanStart)
    val preds = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    val block = new Array[Int](64)
    val totalMcus = mcusX * mcusY
    var mcu = 0
    var nextRst = 0
    while (mcu < totalMcus) {
      if (dri > 0 && mcu > 0 && mcu % dri == 0) {
        val m = br.alignAndMarker()
        if (m != 0xd0 + nextRst) throw Malformed
        nextRst = (nextRst + 1) % 8
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val pw = mcusX * c.h * 8
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            preds(ci) = decodeBlock(br, dcTabs(c.td), acTabs(c.ta),
              qt(c.tq), preds(ci), coef, tmp, block)
            val ox = (mx * c.h + bx) * 8; val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              System.arraycopy(block, yy * 8, rasters(ci), (oy + yy) * pw + ox, 8)
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // strict tail: EOI right after the (padded) entropy data, then nothing
    if (br.alignAndMarker() != 0xd9) return None
    if (br.pos != b.length) return None
    var rSum = 0L; var gSum = 0L; var bSum = 0L
    var rMin = 255; var rMax = 0; var gMin = 255; var gMax = 0
    var bMin = 255; var bMax = 0
    val pw0 = mcusX * comps(0).h * 8
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var r = 0; var g = 0; var bl = 0
        if (comps.length == 1) {
          val yv = rasters(0)(y * pw0 + x)
          r = yv; g = yv; bl = yv
        } else {
          // replication upsampling: component sample at the scaled position
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val pw = mcusX * c.h * 8
            rasters(ci)((y * c.v / vmax) * pw + (x * c.h / hmax))
          }
          val yv = sample(0).toDouble
          val cb = sample(1).toDouble
          val cr = sample(2).toDouble
          // JFIF conversion — EXACTLY the oracle SQL's double expressions
          r = clampRound(yv + 1.402 * (cr - 128.0))
          g = clampRound(yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0))
          bl = clampRound(yv + 1.772 * (cb - 128.0))
        }
        rSum += r; gSum += g; bSum += bl
        if (r < rMin) rMin = r; if (r > rMax) rMax = r
        if (g < gMin) gMin = g; if (g > gMax) gMax = g
        if (bl < bMin) bMin = bl; if (bl > bMax) bMax = bl
        x += 1
      }
      y += 1
    }
    Some(PngPixelStats(w, h, w.toLong * h, rSum, gSum, bSum,
      rMin, rMax, gMin, gMax, bMin, bMax, 255, 255))
  } catch {
    case scala.util.control.NonFatal(_) => None
  }

  // ---------------------------------------------------------------------
  // Encoder: complete baseline 4:4:4 streams with constant 8×8 blocks.
  // ---------------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def write(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** Pad the final byte with 1-bits (T.81 §F.1.2.3 convention). */
    def pad(): Unit = while (n != 0) write(1, 1)
  }

  /** Per-block constant YCbCr values derived from (id, bx, by) in closed
    * form — the oracle states the decoded RGB stats from these:
    *   Y(bx,by)  = (id + 7·bx + 13·by) % 256
    *   Cb(bx,by) = (3·id + 17 + 29·bx) % 256
    *   Cr(bx,by) = (5·id + 31 + 37·by) % 256
    */
  private[operators] def blockY(id: Long, bx: Int, by: Int): Int =
    ((id + 7L * bx + 13L * by) % 256L).toInt
  private[operators] def blockCb(id: Long, bx: Int, by: Int): Int =
    ((3L * id + 17L + 29L * bx) % 256L).toInt
  private[operators] def blockCr(id: Long, bx: Int, by: Int): Int =
    ((5L * id + 31L + 37L * by) % 256L).toInt

  /** Complete baseline sequential JPEG with REAL entropy-coded scan data:
    * 4:4:4 (three components, sampling 1×1), one quantization table with
    * q(DC) = 8 (so the DC-only constant blocks quantize and reconstruct
    * EXACTLY: a constant block's DCT is DC = 8·(v−128), AC = 0, and
    * 8·s/8 = s survives quantization losslessly), custom minimal Huffman
    * tables written as real DHT segments (DC: categories 0–11 as 4-bit
    * canonical codes; AC: a 1-bit EOB — legal tables any conformant
    * decoder reads, ImageIO-verified in the spec), and per-block constant
    * YCbCr from [[blockY]]/[[blockCb]]/[[blockCr]] — so decoded channel
    * statistics are closed-form: every pixel of block (bx,by) decodes to
    * exactly clampRound of the JFIF conversion of those constants.
    */
  def buildJpegPixels(
      id: Long, width: Int, height: Int, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, "pixel JPEG needs positive dimensions")
    require(restartInterval >= 0, "restartInterval must be >= 0")
    val out = new java.io.ByteArrayOutputStream()
    def be16(v: Int): Unit = { out.write(v >>> 8); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    marker(0xd8) // SOI
    marker(0xe0) // JFIF APP0
    be16(16)
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0)
    be16(1); be16(1); out.write(0); out.write(0)
    marker(0xdb) // DQT: table 0, zigzag order, q(0)=8 rest 16
    be16(2 + 65)
    out.write(0x00)
    out.write(8)
    var i = 1
    while (i < 64) { out.write(16); i += 1 }
    marker(0xc0) // SOF0: 8-bit, 3 components, 1x1 sampling, tq 0
    be16(8 + 3 * 3)
    out.write(8); be16(height); be16(width); out.write(3)
    var c = 1
    while (c <= 3) { out.write(c); out.write(0x11); out.write(0); c += 1 }
    marker(0xc4) // DHT: DC class 0 id 0 — 12 categories, 4-bit codes
    be16(2 + 17 + 12)
    out.write(0x00)
    i = 1
    while (i <= 16) { out.write(if (i == 4) 12 else 0); i += 1 }
    i = 0
    while (i < 12) { out.write(i); i += 1 }
    marker(0xc4) // DHT: AC class 1 id 0 — single EOB symbol, 1-bit code
    be16(2 + 17 + 1)
    out.write(0x10)
    i = 1
    while (i <= 16) { out.write(if (i == 1) 1 else 0); i += 1 }
    out.write(0x00)
    if (restartInterval > 0) { // DRI before SOS (T.81 §B.2.4.4)
      marker(0xdd)
      be16(4)
      be16(restartInterval)
    }
    marker(0xda) // SOS
    be16(6 + 2 * 3)
    out.write(3)
    c = 1
    while (c <= 3) { out.write(c); out.write(0x00); c += 1 }
    out.write(0); out.write(63); out.write(0)
    val bw = new BitWriter(out)
    val blocksX = (width + 7) / 8
    val blocksY = (height + 7) / 8
    val preds = new Array[Int](3)
    def encodeDc(compIdx: Int, value: Int): Unit = {
      val s = value - 128
      val diff = s - preds(compIdx)
      preds(compIdx) = s
      val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      bw.write(cat, 4) // canonical 4-bit code of category symbol == category
      if (cat > 0)
        bw.write(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
      bw.write(0, 1) // AC: EOB (code '0')
    }
    var mcu = 0
    var rst = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.pad() // byte-align, then RSTn and fresh DC predictions
          marker(0xd0 + rst)
          rst = (rst + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        encodeDc(0, blockY(id, bx, by))
        encodeDc(1, blockCb(id, bx, by))
        encodeDc(2, blockCr(id, bx, by))
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.pad()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** The closed-form decoded RGB of block (bx, by) — clampRound of the
    * JFIF conversion of the exact reconstructed constants; the spec's
    * reference for round-trip checks (the oracle SQL states the same
    * arithmetic).
    */
  private[operators] def blockRgb(id: Long, bx: Int, by: Int): (Int, Int, Int) = {
    val yv = blockY(id, bx, by).toDouble
    val cb = blockCb(id, bx, by).toDouble
    val cr = blockCr(id, bx, by).toDouble
    (clampRound(yv + 1.402 * (cr - 128.0)),
      clampRound(yv - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)),
      clampRound(yv + 1.772 * (cb - 128.0)))
  }
}
