package graft.operators

/** JPEG codec, from scratch per the PUBLIC ITU-T T.81 spec (no image
  * library): marker/segment walk (§B.2), DQT/DHT table parsing,
  * canonical Huffman decoding (§F.2.2.3 DECODE with the
  * mincode/maxcode/valptr construction of §C.2), DC prediction + EXTEND
  * (§F.2.2.1), run/size AC decoding with ZRL and EOB (§F.2.2.2),
  * dequantization, a double-precision separable 8×8 IDCT (§A.3.3),
  * restart-marker handling (§E.2.4), replication chroma upsampling and
  * the JFIF YCbCr→RGB conversion — plus PROGRESSIVE mode (§G.2, r8):
  * DC first/refinement scans, AC first/refinement with EOB-run
  * decoding, successive approximation, per-component coefficient planes
  * finalized at EOI. This retires the last entropy-coded format behind
  * the repo's former "codec boundary": PNG (inflate), GIF (LZW) and
  * JPEG (Huffman+DCT, sequential AND progressive) all decode for real.
  *
  * Scope and quarantine discipline (same contract as the PNG/GIF faces —
  * any stream outside it returns None, never throws): 8-bit Huffman
  * sequential (SOF0/SOF1) and progressive (SOF2); arithmetic-coded,
  * lossless and hierarchical frames quarantine. 1 or 3 components,
  * sampling factors 1–4, strict tail (EOI must follow the entropy data,
  * nothing after it — the GIF trailer discipline), the
  * [[Multimodal.MaxDecodedPixels]] bomb ceiling for sequential and the
  * tighter [[MaxProgressivePixels]] for progressive (its coefficient
  * planes stay resident until EOI).
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

  /** Separable IDCT of a dequantized (natural-order) coefficient block →
    * clamped reconstructed samples (T.81 A.3.3, 1/4 overall scale).
    */
  private def idctToSamples(
      coef: Array[Double], tmp: Array[Double], samples: Array[Int]): Unit = {
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
  }

  /** Decode one sequential 8×8 block into `samples` (natural order,
    * reconstructed clamped sample values); returns the new DC prediction.
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
        if (r == 15) {
          k += 16 // ZRL: sixteen zeros — landing exactly at 64 is legal,
          if (k > 64) throw Malformed // overrunning the block is not
        } else k = 64 // EOB
      } else {
        k += r
        if (k > 63) throw Malformed
        coef(ZigZag(k)) = extend(br.receive(s), s).toDouble * q(k)
        k += 1
      }
    }
    idctToSamples(coef, tmp, samples)
    newPred
  }

  /** Coefficient-plane ceiling for PROGRESSIVE decode (2^22 ≈ 4.2M px):
    * progressive decoding must keep every component's dequantizable
    * coefficients resident until EOI (~4 B × pixels × components), so
    * its bomb ceiling is tighter than the streaming baseline path's.
    */
  private val MaxProgressivePixels = 1L << 22

  /** Shared final stage: component rasters → channel statistics with
    * replication upsampling and the JFIF conversion (the oracle-mirrored
    * double expressions).
    */
  private def statsFromRasters(
      comps: Array[Component], rasters: Array[Array[Int]],
      w: Int, h: Int, mcusX: Int, hmax: Int, vmax: Int): PngPixelStats = {
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
    PngPixelStats(w, h, w.toLong * h, rSum, gSum, bSum,
      rMin, rMax, gMin, gMax, bMin, bMax, 255, 255)
  }

  /** REAL JPEG pixel decode → channel statistics (the PNG/GIF statistics
    * face): baseline/extended sequential (SOF0/SOF1) streamed block by
    * block, and PROGRESSIVE (SOF2, r8) via the T.81 §G successive-
    * approximation procedures — DC first/refine scans, AC first/refine
    * with EOB-run decoding, per-component coefficient planes dequantized
    * and IDCT'd at EOI. None quarantines anything outside the documented
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
    var progressive = false
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0
    // progressive state: per-component coefficient planes (padded block
    // grid × 64, natural order) + cumulative DC predictions per scan
    var coefPlanes: Array[Array[Int]] = null
    var scansSeen = 0
    var off = 2L
    while (off + 2 <= b.length) {
      if ((b(off.toInt) & 0xff) != 0xff) return None
      var j = off.toInt + 1
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        off = j + 1L // standalone
      } else if (marker == 0xd9) { // EOI
        if (!progressive || scansSeen == 0) return None
        if (j + 1 != b.length) return None // strict tail
        return Some(finishProgressive(comps, coefPlanes, qt, w, h,
          mcusX, mcusY, hmax, vmax))
      } else {
        if (j + 2 >= b.length) return None
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
          case 0xc0 | 0xc1 | 0xc2 => // sequential Huffman or progressive
            if (comps != null) return None
            if (segEnd - seg < 6) return None
            progressive = marker == 0xc2
            val prec = b(seg) & 0xff
            h = readBe16(b, seg + 1); w = readBe16(b, seg + 3)
            val nc = b(seg + 5) & 0xff
            if (prec != 8 || w <= 0 || h <= 0) return None
            if (nc != 1 && nc != 3) return None
            val ceiling =
              if (progressive) MaxProgressivePixels else Multimodal.MaxDecodedPixels
            if (w.toLong * h > ceiling) return None
            if (segEnd - seg < 6 + 3 * nc) return None
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + 3 * c
              val hv = b(o + 1) & 0xff
              val comp = Component(b(o) & 0xff, hv >> 4, hv & 15, b(o + 2) & 0xff)
              if (comp.h < 1 || comp.h > 4 || comp.v < 1 || comp.v > 4 ||
                  comp.tq > 3) return None
              comp
            }
            hmax = comps.map(_.h).max
            vmax = comps.map(_.v).max
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            if (progressive) {
              coefPlanes = comps.map { c =>
                val nBlocks = (mcusX * c.h).toLong * (mcusY * c.v)
                if (nBlocks * 64 > 4L * MaxProgressivePixels) return None
                new Array[Int]((nBlocks * 64).toInt)
              }
            }
          case m if m >= 0xc3 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
              m != 0xcc =>
            return None // arithmetic/lossless/hierarchical: out of scope
          case 0xdd => // DRI
            if (segEnd - seg < 2) return None
            dri = readBe16(b, seg)
          case 0xda => // SOS
            if (comps == null) return None
            val ns = b(seg) & 0xff
            if (ns < 1 || ns > comps.length || segEnd - seg < 1 + 2 * ns + 3)
              return None
            val scanComps = new Array[Int](ns)
            var c = 0
            while (c < ns) {
              val cs = b(seg + 1 + 2 * c) & 0xff
              val tt = b(seg + 2 + 2 * c) & 0xff
              val ci = comps.indexWhere(_.id == cs)
              if (ci < 0) return None
              scanComps(c) = ci
              comps(ci).td = tt >> 4; comps(ci).ta = tt & 15
              if (comps(ci).td > 3 || comps(ci).ta > 3) return None
              c += 1
            }
            val ss = b(segEnd - 3) & 0xff
            val se = b(segEnd - 2) & 0xff
            val ah = (b(segEnd - 1) & 0xff) >> 4
            val al = b(segEnd - 1) & 0x0f
            if (!progressive) {
              // sequential: one interleaved full-band scan, then EOI
              if (ns != comps.length || ss != 0 || se != 63 || ah != 0 ||
                  al != 0) return None
              comps.foreach { cc =>
                if (qt(cc.tq) == null || dcTabs(cc.td) == null ||
                    acTabs(cc.ta) == null) return None
              }
              return decodeSequentialScan(b, segEnd, comps, qt, dcTabs,
                acTabs, dri, w, h, mcusX, mcusY, hmax, vmax)
            }
            // progressive spectral/approximation constraints (T.81 G.1.1.1)
            if (ss > 63 || se > 63 || se < ss || (ss == 0 && se != 0) ||
                ah > 13 || al > 13) return None
            if (ss > 0 && ns != 1) return None // AC scans: one component
            val endPos = decodeProgressiveScan(b, segEnd, comps, scanComps,
              ss, se, ah, al, dcTabs, acTabs, dri, mcusX, mcusY, hmax, vmax,
              w, h, coefPlanes)
            scansSeen += 1
            // step over any stuffed 0xFF00 pad byte so the walker lands
            // on the next true marker
            var p = endPos
            while (p + 1 < b.length && (b(p) & 0xff) == 0xff &&
                (b(p + 1) & 0xff) == 0x00)
              p += 2
            off = p
          case _ => () // APPn, COM: skip
        }
        if (marker != 0xda) off = j + 1L + len
      }
    }
    None // ran off the end without EOI
  } catch {
    case scala.util.control.NonFatal(_) => None
  }

  /** The sequential entropy-coded scan: stream MCUs block by block into
    * rasters, require EOI + strict tail, return the statistics.
    */
  private def decodeSequentialScan(
      b: Array[Byte], scanStart: Int, comps: Array[Component],
      qt: Array[Array[Int]], dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      dri: Int, w: Int, h: Int, mcusX: Int, mcusY: Int,
      hmax: Int, vmax: Int): Option[PngPixelStats] = {
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
    Some(statsFromRasters(comps, rasters, w, h, mcusX, hmax, vmax))
  }

  /** One progressive scan (T.81 §G.2): DC first/refine over MCUs
    * (interleaved) or the single component's block grid, or AC
    * first/refine with EOB-run decoding over one component's block grid.
    * Mutates `coefPlanes`; returns the position after the entropy data.
    */
  private def decodeProgressiveScan(
      b: Array[Byte], scanStart: Int, comps: Array[Component],
      scanComps: Array[Int], ss: Int, se: Int, ah: Int, al: Int,
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable], dri: Int,
      mcusX: Int, mcusY: Int, hmax: Int, vmax: Int, w: Int, h: Int,
      coefPlanes: Array[Array[Int]]): Int = {
    val br = new BitReader(b, scanStart)
    val preds = new Array[Int](comps.length)
    var eobrun = 0
    var nextRst = 0
    var unit = 0 // restart counter: MCUs (interleaved) or blocks
    def maybeRestart(): Unit =
      if (dri > 0 && unit > 0 && unit % dri == 0) {
        val m = br.alignAndMarker()
        if (m != 0xd0 + nextRst) throw Malformed
        nextRst = (nextRst + 1) % 8
        java.util.Arrays.fill(preds, 0)
        eobrun = 0
      }
    def dcFirst(ci: Int, blockIdx: Int): Unit = {
      val t = huffDecode(br, dcTabs(comps(ci).td))
      if (t > 15) throw Malformed
      preds(ci) += extend(br.receive(t), t)
      coefPlanes(ci)(blockIdx * 64) = preds(ci) << al
    }
    def dcRefine(ci: Int, blockIdx: Int): Unit =
      if (br.nextBit() == 1) coefPlanes(ci)(blockIdx * 64) |= (1 << al)
    def acFirst(ci: Int, blockIdx: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      val cf = coefPlanes(ci); val base = blockIdx * 64
      var k = ss
      while (k <= se) {
        val rs = huffDecode(br, acTabs(comps(ci).ta))
        val r = rs >> 4; val s = rs & 15
        if (s == 0) {
          if (r == 15) {
            k += 16 // ZRL: landing exactly past the band end is legal,
            if (k > se + 1) throw Malformed // overrunning it is not
          } else {
            eobrun = (1 << r) - 1 + (if (r > 0) br.receive(r) else 0)
            return
          }
        } else {
          k += r
          if (k > se) throw Malformed
          cf(base + ZigZag(k)) = extend(br.receive(s), s) << al
          k += 1
        }
      }
    }
    def acRefine(ci: Int, blockIdx: Int): Unit = {
      val cf = coefPlanes(ci); val base = blockIdx * 64
      val p1 = 1 << al; val m1 = -p1
      var k = ss
      if (eobrun == 0) {
        var ended = false
        while (k <= se && !ended) {
          val rs = huffDecode(br, acTabs(comps(ci).ta))
          var r = rs >> 4; val s = rs & 15
          var newVal = 0
          if (s == 0) {
            if (r != 15) {
              // EOB run includes THIS block: the tail below corrects
              // remaining nonzero coefficients, then decrements
              eobrun = (1 << r) + (if (r > 0) br.receive(r) else 0)
              ended = true
            } // r == 15: ZRL — skip 16 zero-history coefficients
          } else {
            if (s != 1) throw Malformed
            newVal = if (br.nextBit() == 1) p1 else m1
          }
          if (!ended) {
            var placed = false
            while (k <= se && !placed) {
              val z = base + ZigZag(k)
              if (cf(z) != 0) {
                if (br.nextBit() == 1 && (cf(z) & p1) == 0)
                  cf(z) += (if (cf(z) >= 0) p1 else m1)
              } else if (r == 0) {
                if (newVal != 0) cf(z) = newVal
                placed = true
              } else r -= 1
              k += 1
            }
            if (!placed && newVal != 0) throw Malformed
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val z = base + ZigZag(k)
          if (cf(z) != 0) {
            if (br.nextBit() == 1 && (cf(z) & p1) == 0)
              cf(z) += (if (cf(z) >= 0) p1 else m1)
          }
          k += 1
        }
        eobrun -= 1
      }
    }
    // table existence for what this scan actually reads
    scanComps.foreach { ci =>
      if (ss == 0 && ah == 0 && dcTabs(comps(ci).td) == null) throw Malformed
      if (ss > 0 && acTabs(comps(ci).ta) == null) throw Malformed
    }
    if (scanComps.length > 1) {
      // interleaved (DC scans only): MCU order, h×v blocks per component
      if (ss != 0) throw Malformed
      val totalMcus = mcusX * mcusY
      var mcu = 0
      while (mcu < totalMcus) {
        maybeRestart()
        val mx = mcu % mcusX; val my = mcu / mcusX
        scanComps.foreach { ci =>
          val c = comps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              val blockIdx = (my * c.v + by) * (mcusX * c.h) + (mx * c.h + bx)
              if (ah == 0) dcFirst(ci, blockIdx) else dcRefine(ci, blockIdx)
              bx += 1
            }
            by += 1
          }
        }
        unit += 1
        mcu += 1
      }
    } else {
      // non-interleaved: the single component's own block grid (T.81
      // A.2.2 — ceil of the scaled dimensions, NOT the padded MCU grid)
      val ci = scanComps(0)
      val c = comps(ci)
      val compW = (w * c.h + hmax - 1) / hmax
      val compH = (h * c.v + vmax - 1) / vmax
      val bw = (compW + 7) / 8
      val bh = (compH + 7) / 8
      val rowBlocks = mcusX * c.h // padded-plane stride
      var bRow = 0
      while (bRow < bh) {
        var bCol = 0
        while (bCol < bw) {
          maybeRestart()
          val blockIdx = bRow * rowBlocks + bCol
          if (ss == 0) {
            if (ah == 0) dcFirst(ci, blockIdx) else dcRefine(ci, blockIdx)
          } else {
            if (ah == 0) acFirst(ci, blockIdx) else acRefine(ci, blockIdx)
          }
          unit += 1
          bCol += 1
        }
        bRow += 1
      }
    }
    br.pos
  }

  /** Progressive finalization at EOI: dequantize every coefficient plane
    * (natural-order q), IDCT each block into its raster, convert and
    * accumulate statistics.
    */
  private def finishProgressive(
      comps: Array[Component], coefPlanes: Array[Array[Int]],
      qt: Array[Array[Int]], w: Int, h: Int, mcusX: Int, mcusY: Int,
      hmax: Int, vmax: Int): PngPixelStats = {
    comps.foreach(c => if (qt(c.tq) == null) throw Malformed)
    val coef = new Array[Double](64)
    val tmp = new Array[Double](64)
    val block = new Array[Int](64)
    val rasters = comps.zipWithIndex.map { case (c, ci) =>
      // natural-order quant table: qNat(ZigZag(k)) = q(k)
      val qNat = new Array[Int](64)
      var k = 0
      while (k < 64) { qNat(ZigZag(k)) = qt(c.tq)(k); k += 1 }
      val cols = mcusX * c.h; val rows = mcusY * c.v
      val pw = cols * 8
      val raster = new Array[Int](pw * rows * 8)
      val cf = coefPlanes(ci)
      var bIdx = 0
      while (bIdx < cols * rows) {
        val base = bIdx * 64
        var z = 0
        while (z < 64) { coef(z) = cf(base + z).toDouble * qNat(z); z += 1 }
        idctToSamples(coef, tmp, block)
        val ox = (bIdx % cols) * 8; val oy = (bIdx / cols) * 8
        var yy = 0
        while (yy < 8) {
          System.arraycopy(block, yy * 8, raster, (oy + yy) * pw + ox, 8)
          yy += 1
        }
        bIdx += 1
      }
      raster
    }
    statsFromRasters(comps, rasters, w, h, mcusX, hmax, vmax)
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
