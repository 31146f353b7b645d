package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MPEG Layer III (MP3) frame-header decode — ISO/IEC 11172-3 §2.4.1.3
  * (MPEG-1) + ISO/IEC 13818-3 (MPEG-2) + the de-facto MPEG-2.5
  * extension — the legacy audio framing a web crawl actually carries:
  * ID3v2-tagged, often VBR with a Xing/Info first-frame header, across
  * all three version codes. Headers are walked frame by frame for
  * version, bitrate, sample rate, channel mode, padding and the derived
  * frame length (144000·kbps ÷ sr + pad for MPEG-1 Layer III;
  * 72000·kbps ÷ sr + pad for MPEG-2/2.5, whose granule is 576 samples),
  * with the entropy-coded audio payload out of scope by the same
  * contract that stops AAC at its headers.
  *
  * Decode contract (the Multimodal conventions): map-only byte walk, a
  * bomb ceiling on frame count, whole-payload quarantine on ANY
  * malformed structure (bad sync, reserved version/layer/bitrate/
  * sample-rate codes, malformed ID3v2 size, truncated Xing header,
  * truncation) — deterministic under every-prefix truncation and
  * single-byte mutation fuzz.
  */
object Mp3 {

  /** ISO 11172-3 Table B.2, MPEG-1 Layer III bitrates in kbps; index 0
    * ("free") and 15 (forbidden) are rejected.
    */
  val BitratesKbps: IndexedSeq[Int] = IndexedSeq(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** ISO 13818-3 Layer III bitrates (MPEG-2 and 2.5 share the table;
    * MPEG-2 Layer II uses the same table as Layer III).
    */
  val BitratesKbpsV2: IndexedSeq[Int] = IndexedSeq(
    0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** ISO 11172-3 Table B.2, MPEG-1 Layer I bitrates. */
  val BitratesKbpsL1: IndexedSeq[Int] = IndexedSeq(
    0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)

  /** ISO 11172-3 Table B.2, MPEG-1 Layer II bitrates. */
  val BitratesKbpsL2: IndexedSeq[Int] = IndexedSeq(
    0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)

  /** ISO 13818-3, MPEG-2/2.5 Layer I bitrates. */
  val BitratesKbpsL1V2: IndexedSeq[Int] = IndexedSeq(
    0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)

  /** Bitrate table by (version ×10, layer 1/2/3) — the full ISO matrix
    * (MPEG-2 and 2.5 share theirs; MPEG-2 Layers II and III share).
    */
  def bitrateTable(version: Int, layer: Int): IndexedSeq[Int] =
    (version, layer) match {
      case (10, 1) => BitratesKbpsL1
      case (10, 2) => BitratesKbpsL2
      case (10, 3) => BitratesKbps
      case (_, 1) => BitratesKbpsL1V2
      case _ => BitratesKbpsV2
    }

  /** Sampling rates by the 2-bit code; code 3 is reserved. MPEG-2
    * halves the MPEG-1 rates, MPEG-2.5 quarters them.
    */
  val SampleRates: IndexedSeq[Int] = IndexedSeq(44100, 48000, 32000)
  val SampleRatesV2: IndexedSeq[Int] = IndexedSeq(22050, 24000, 16000)
  val SampleRatesV25: IndexedSeq[Int] = IndexedSeq(11025, 12000, 8000)

  /** `version` is ×10 to stay integral: 10 = MPEG-1, 20 = MPEG-2,
    * 25 = MPEG-2.5. `layer` is 1/2/3 (Layer I/II/III).
    */
  final case class Mp3Frame(
      frameIdx: Int, version: Int, bitrateKbps: Int, sampleRate: Int,
      channels: Int, padded: Boolean, frameBytes: Int, layer: Int = 3)

  /** Whole-stream rollup: homogeneous (version, layer, sample rate,
    * channels) framing facts + the leading-ID3v2 size + the first
    * frame's VBR header when present (0 when absent) — Xing/Info
    * (vbrKind 1) at the side-info offset, or Fraunhofer VBRI (vbrKind
    * 2) at its fixed 32-byte offset.
    */
  final case class Mp3Stream(
      version: Int, nFrames: Int, totalBytes: Long, sampleRate: Int,
      channels: Int, id3Bytes: Int, hasVbr: Boolean, vbrFrames: Long,
      vbrBytes: Long, layer: Int = 3, vbrKind: Int = 0)

  private val MaxFrames = 10000

  /** MPEG-1 Layer III frame length in bytes (header included). */
  def frameLength(bitrateKbps: Int, sampleRate: Int, padded: Boolean): Int =
    frameLength(10, bitrateKbps, sampleRate, padded)

  /** Version-aware Layer III frame length: the MPEG-2/2.5 granule is
    * 576 samples (half of MPEG-1's 1152), so the constant halves.
    */
  def frameLength(
      version: Int, bitrateKbps: Int, sampleRate: Int,
      padded: Boolean): Int =
    (if (version == 10) 144000 else 72000) * bitrateKbps / sampleRate +
      (if (padded) 1 else 0)

  /** Layer-aware frame length (ISO 11172-3 §2.4.3.1 / 13818-3):
    * Layer I frames hold 384 samples in 4-byte SLOTS —
    * (12000·kbps/sr + pad)·4 — every version; Layer II holds 1152
    * samples — 144000·kbps/sr + pad — every version; Layer III is the
    * version-halved formula above.
    */
  def frameLengthL(
      version: Int, layer: Int, bitrateKbps: Int, sampleRate: Int,
      padded: Boolean): Int = layer match {
    case 1 => (12000 * bitrateKbps / sampleRate +
      (if (padded) 1 else 0)) * 4
    case 2 => 144000 * bitrateKbps / sampleRate + (if (padded) 1 else 0)
    case _ => frameLength(version, bitrateKbps, sampleRate, padded)
  }

  /** Build one frame: 4-byte header + deterministic filler payload. */
  def buildFrame(
      bitrateIdx: Int, srIdx: Int, padded: Boolean, channelMode: Int,
      fill: Int => Byte): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrate idx $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"bad sample-rate idx $srIdx")
    require(channelMode >= 0 && channelMode <= 3, s"bad channel mode $channelMode")
    val len = frameLength(BitratesKbps(bitrateIdx), SampleRates(srIdx), padded)
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = 0xfb.toByte // sync low 3 bits, MPEG-1 (11), Layer III (01), no CRC
    b(2) = ((bitrateIdx << 4) | (srIdx << 2) |
      ((if (padded) 1 else 0) << 1)).toByte
    b(3) = (channelMode << 6).toByte
    var i = 4
    while (i < len) { b(i) = fill(i); i += 1 }
    b
  }

  /** Fixture stream for doc `id`: 3 + id%5 frames, bitrate index
    * 1 + id%14, sample-rate code id%3, per-frame padding (id+f)%2,
    * channel mode id%4. Every 13th doc truncates its final frame by
    * 5 bytes — the planted corruption.
    */
  def buildFixture(id: Long): Array[Byte] = {
    val nFrames = 3 + (id % 5).toInt
    val bytes = (0 until nFrames).toArray.flatMap { f =>
      buildFrame(1 + (id % 14).toInt, (id % 3).toInt, (id + f) % 2 == 1,
        (id % 4).toInt, i => ((id + 17L * f + i) % 256).toByte)
    }
    if (id % 13 == 0) bytes.dropRight(5) else bytes
  }

  /** Version-aware frame builder (MPEG-1 / 2 / 2.5 Layer III, no CRC). */
  def buildFrameV(
      version: Int, bitrateIdx: Int, srIdx: Int, padded: Boolean,
      channelMode: Int, fill: Int => Byte): Array[Byte] = {
    require(Seq(10, 20, 25).contains(version), s"bad version $version")
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrate idx $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"bad sample-rate idx $srIdx")
    require(channelMode >= 0 && channelMode <= 3, s"bad channel mode $channelMode")
    val br = if (version == 10) BitratesKbps(bitrateIdx)
             else BitratesKbpsV2(bitrateIdx)
    val sr = version match {
      case 10 => SampleRates(srIdx)
      case 20 => SampleRatesV2(srIdx)
      case _ => SampleRatesV25(srIdx)
    }
    val vCode = version match { case 10 => 3; case 20 => 2; case _ => 0 }
    val len = frameLength(version, br, sr, padded)
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = (0xe0 | (vCode << 3) | (1 << 1) | 1).toByte // sync+ver+L3+noCRC
    b(2) = ((bitrateIdx << 4) | (srIdx << 2) |
      ((if (padded) 1 else 0) << 1)).toByte
    b(3) = (channelMode << 6).toByte
    var i = 4
    while (i < len) { b(i) = fill(i); i += 1 }
    b
  }

  /** Layer-aware frame builder (MPEG-1/2/2.5 × Layer I/II/III, no
    * CRC). Layer code in the header is 4 − layer (I=11, II=10, III=01).
    */
  def buildFrameVL(
      version: Int, layer: Int, bitrateIdx: Int, srIdx: Int,
      padded: Boolean, channelMode: Int, fill: Int => Byte): Array[Byte] = {
    require(Seq(10, 20, 25).contains(version), s"bad version $version")
    require(layer >= 1 && layer <= 3, s"bad layer $layer")
    require(bitrateIdx >= 1 && bitrateIdx <= 14, s"bad bitrate idx $bitrateIdx")
    require(srIdx >= 0 && srIdx <= 2, s"bad sample-rate idx $srIdx")
    require(channelMode >= 0 && channelMode <= 3, s"bad channel mode $channelMode")
    val br = bitrateTable(version, layer)(bitrateIdx)
    val sr = version match {
      case 10 => SampleRates(srIdx)
      case 20 => SampleRatesV2(srIdx)
      case _ => SampleRatesV25(srIdx)
    }
    val vCode = version match { case 10 => 3; case 20 => 2; case _ => 0 }
    val lCode = 4 - layer
    val len = frameLengthL(version, layer, br, sr, padded)
    val b = new Array[Byte](len)
    b(0) = 0xff.toByte
    b(1) = (0xe0 | (vCode << 3) | (lCode << 1) | 1).toByte
    b(2) = ((bitrateIdx << 4) | (srIdx << 2) |
      ((if (padded) 1 else 0) << 1)).toByte
    b(3) = (channelMode << 6).toByte
    var i = 4
    while (i < len) { b(i) = fill(i); i += 1 }
    b
  }

  /** Full-matrix fixture for doc `id` — Layer I/II/III across all three
    * versions (the population [[buildFixtureVbr]] never exercises), a
    * Fraunhofer VBRI first frame on the MPEG-1 Layer III slice: layer
    * 1 + id%3, version by (id/3)%3, sample-rate code (id/9)%3, bitrate
    * index 1 + id%14, channel mode (id/2)%4, 3 + id%5 music frames with
    * per-frame padding (id+f)%2, and — when layer 3, MPEG-1, id%5 < 2 —
    * a leading VBRI frame (bitrate index max(brIdx, 4), no padding)
    * carrying frames = 200 + id%800 and bytes = 20000 + id%80000 at the
    * fixed 32-byte offset. Every closed form restatable in SQL; every
    * 13th id truncates by 5 bytes (the planted corruption).
    */
  def buildFixtureLayers(id: Long): Array[Byte] = {
    val layer = 1 + (id % 3).toInt
    val version = Seq(10, 20, 25)(((id / 3) % 3).toInt)
    val srIdx = ((id / 9) % 3).toInt
    val brIdx = 1 + (id % 14).toInt
    val mode = ((id / 2) % 4).toInt
    val vbri =
      if (layer == 3 && version == 10 && id % 5 < 2) {
        val frames = 200 + (id % 800).toInt
        val bytes = 20000 + (id % 80000).toInt
        val fields = Array[Byte](0, 1, 0, 0, 0, 0) ++ // version, delay, quality
          Multimodal.be32(bytes) ++ Multimodal.be32(frames)
        val off = 4 + 32 // the published fixed offset past the header
        buildFrameVL(10, 3, math.max(brIdx, 4), srIdx, padded = false,
          mode, i =>
            if (i < off) 0
            else if (i < off + 4) "VBRI".charAt(i - off).toByte
            else if (i < off + 4 + fields.length) fields(i - off - 4)
            else ((id + i) % 256).toByte)
      } else Array.empty[Byte]
    val nMusic = 3 + (id % 5).toInt
    val music = (0 until nMusic).toArray.flatMap { f =>
      buildFrameVL(version, layer, brIdx, srIdx, (id + f) % 2 == 1, mode,
        i => ((id + 17L * f + i) % 256).toByte)
    }
    val bytes = vbri ++ music
    if (id % 13 == 0) bytes.dropRight(5) else bytes
  }

  /** Real-crawl-shaped fixture for doc `id` — the population the plain
    * [[buildFixture]] never exercises: version by id%3 (MPEG-1/2/2.5),
    * sample-rate code (id/3)%3, bitrate index 1 + id%14, channel mode
    * (id/2)%4, an ID3v2.3 tag of 20 + id%50 payload bytes when
    * id%7 < 3, and a Xing ("Xing" when id%10 < 3, else "Info") VBR
    * first frame when id%5 < 3 carrying frames = 100 + id%900 and
    * bytes = 10000 + id%90000 (flags 0x3), followed by 3 + id%5 music
    * frames with per-frame padding (id+f)%2. The Xing frame's bitrate
    * index is max(1 + id%14, 4): an 8 kbps MPEG-2 frame is 24–36 bytes
    * — too small to hold the 16-byte header after side info — and real
    * encoders likewise emit the info frame at a roomier bitrate than
    * the music. Every closed form is restatable in SQL; every 13th id
    * truncates by 5 bytes.
    */
  def buildFixtureVbr(id: Long): Array[Byte] = {
    val version = Seq(10, 20, 25)((id % 3).toInt)
    val srIdx = ((id / 3) % 3).toInt
    val brIdx = 1 + (id % 14).toInt
    val mode = ((id / 2) % 4).toInt
    val channels = if (mode == 3) 1 else 2
    val id3 =
      if (id % 7 < 3) {
        val payload = 20 + (id % 50).toInt
        "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0) ++
          // synchsafe size (payload < 2^7 fits in the last byte)
          Array[Byte](0, 0, (payload >>> 7).toByte, (payload & 0x7f).toByte) ++
          Array.tabulate(payload)(i => ((id + i) % 256).toByte)
      } else Array.empty[Byte]
    val xing =
      if (id % 5 < 3) {
        val tag = if (id % 10 < 3) "Xing" else "Info"
        val vbrFrames = 100 + (id % 900).toInt
        val vbrBytes = 10000 + (id % 90000).toInt
        val hdr = Multimodal.be32(3) ++ // flags: frames + bytes
          Multimodal.be32(vbrFrames) ++ Multimodal.be32(vbrBytes)
        val tagOff = 4 + sideInfoLen(version, channels)
        buildFrameV(version, math.max(brIdx, 4), srIdx, padded = false, mode, i =>
          if (i < tagOff) 0
          else if (i < tagOff + 4) tag.charAt(i - tagOff).toByte
          else if (i < tagOff + 4 + hdr.length) hdr(i - tagOff - 4)
          else ((id + i) % 256).toByte)
      } else Array.empty[Byte]
    val nMusic = 3 + (id % 5).toInt
    val music = (0 until nMusic).toArray.flatMap { f =>
      buildFrameV(version, brIdx, srIdx, (id + f) % 2 == 1, mode,
        i => ((id + 17L * f + i) % 256).toByte)
    }
    val bytes = id3 ++ xing ++ music
    if (id % 13 == 0) bytes.dropRight(5) else bytes
  }

  /** Bytes consumed by a leading ID3v2 tag: Some(0) when none, Some(n)
    * for a well-formed tag (10-byte header + synchsafe size + optional
    * 10-byte footer, ID3v2.4 §3.1), None when the tag is malformed or
    * runs past the payload.
    */
  def id3v2Length(b: Array[Byte]): Option[Int] = {
    if (b.length < 3 || b(0) != 'I' || b(1) != 'D' || b(2) != '3')
      return Some(0)
    if (b.length < 10) return None
    if ((b(3) & 0xff) == 0xff || (b(4) & 0xff) == 0xff) return None
    var size = 0
    var i = 6
    while (i < 10) {
      val v = b(i) & 0xff
      if (v >= 0x80) return None // size bytes are synchsafe (7-bit)
      size = (size << 7) | v
      i += 1
    }
    val total = 10 + size + (if ((b(5) & 0x10) != 0) 10 else 0)
    if (total > b.length) None else Some(total)
  }

  /** Walk the frame chain (after skipping a well-formed leading ID3v2
    * tag). Some(frames) iff EVERY frame parses and the chain ends
    * exactly at the payload boundary; None on bad sync, a reserved
    * version or layer code, free/forbidden bitrate, reserved
    * sample-rate code, malformed ID3v2, a tag-only payload,
    * truncation, or the bomb ceiling. All three layers decode (r15;
    * through r14 Layer I/II quarantined): the layer picks the bitrate
    * table and the frame-length arithmetic — Layer I's 384-sample
    * frames count in 4-byte slots, Layer II's 1152 samples hold at
    * every version.
    */
  def parseFrames(b: Array[Byte]): Option[Seq[Mp3Frame]] = {
    if (b == null || b.isEmpty) return None
    val skip = id3v2Length(b) match {
      case None => return None
      case Some(s) => s
    }
    if (skip >= b.length) return None // tag with no frames behind it
    val out = scala.collection.mutable.ArrayBuffer.empty[Mp3Frame]
    var off = skip
    while (off < b.length) {
      if (out.length >= MaxFrames) return None
      if (off + 4 > b.length) return None
      val b0 = b(off) & 0xff; val b1 = b(off + 1) & 0xff
      if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None // 11-bit sync
      val version = ((b1 >>> 3) & 3) match {
        case 3 => 10
        case 2 => 20
        case 0 => 25
        case _ => return None // reserved version code
      }
      val layer = ((b1 >>> 1) & 3) match {
        case 3 => 1
        case 2 => 2
        case 1 => 3
        case _ => return None // reserved layer code
      }
      val b2 = b(off + 2) & 0xff
      val brIdx = (b2 >>> 4) & 0xf
      if (brIdx < 1 || brIdx > 14) return None // free/forbidden
      val srIdx = (b2 >>> 2) & 3
      if (srIdx > 2) return None // reserved
      val br = bitrateTable(version, layer)(brIdx)
      val sr = version match {
        case 10 => SampleRates(srIdx)
        case 20 => SampleRatesV2(srIdx)
        case _ => SampleRatesV25(srIdx)
      }
      val padded = ((b2 >>> 1) & 1) == 1
      val mode = ((b(off + 3) & 0xff) >>> 6) & 3
      val len = frameLengthL(version, layer, br, sr, padded)
      if (off + len > b.length) return None // truncated frame
      out += Mp3Frame(out.length, version, br, sr,
        if (mode == 3) 1 else 2, padded, len, layer)
      off += len
    }
    Some(out.toSeq)
  }

  /** Side-info length for Layer III (ISO 11172-3 §2.4.1.7 / 13818-3):
    * MPEG-1 mono 17 / stereo 32; MPEG-2 and 2.5 mono 9 / stereo 17.
    * The Xing/Info tag sits right after header + side info.
    */
  private def sideInfoLen(version: Int, channels: Int): Int =
    if (version == 10) { if (channels == 1) 17 else 32 }
    else { if (channels == 1) 9 else 17 }

  /** Whole-stream decode: ID3v2 skip + frame walk + homogeneity check
    * (a stream whose version, sample rate, or channel count changes
    * mid-chain has ambiguous rollup stats → quarantine) + the first
    * frame's Xing/Info VBR header when present. A recognized tag that
    * doesn't fit inside its frame (or whose flagged fields run out) is
    * malformed → quarantine, like every other structure here.
    */
  def parseStreamInfo(b: Array[Byte]): Option[Mp3Stream] = {
    val skip = id3v2Length(if (b == null) Array.empty else b) match {
      case None => return None
      case Some(s) => s
    }
    val frames = parseFrames(b) match {
      case None => return None
      case Some(fs) => fs
    }
    val f0 = frames.head // parseFrames never returns an empty chain
    if (!frames.forall(f => f.version == f0.version &&
        f.sampleRate == f0.sampleRate && f.channels == f0.channels &&
        f.layer == f0.layer))
      return None
    var hasVbr = false
    var vbrKind = 0
    var vbrFrames = 0L
    var vbrBytes = 0L
    // CRC-protected frames (protection_absent == 0, header bit 0 clear)
    // carry a 16-bit CRC between header and side info — the Xing tag
    // shifts by 2 (a real-stream nuance: ignoring it reads garbage at
    // the tag offset and silently misses the VBR header)
    val crcBytes = if ((b(skip + 1) & 1) == 0) 2 else 0
    val tagOff = skip + 4 + crcBytes + sideInfoLen(f0.version, f0.channels)
    if (f0.layer == 3 && tagOff + 4 <= skip + f0.frameBytes) {
      val tag = new String(b, tagOff, 4, "US-ASCII")
      if (tag == "Xing" || tag == "Info") {
        val end = skip + f0.frameBytes
        if (tagOff + 8 > end) return None // truncated VBR header
        val flags = Multimodal.readBe32(b, tagOff + 4)
        var p = tagOff + 8
        if ((flags & 1) != 0) {
          if (p + 4 > end) return None
          vbrFrames = Multimodal.readBe32(b, p).toLong & 0xffffffffL; p += 4
        }
        if ((flags & 2) != 0) {
          if (p + 4 > end) return None
          vbrBytes = Multimodal.readBe32(b, p).toLong & 0xffffffffL; p += 4
        }
        hasVbr = true
        vbrKind = 1
      }
    }
    // Fraunhofer VBRI (r15): MPEG-1 Layer III only, at the FIXED
    // 32-byte offset past the header (independent of side-info size —
    // the published layout) — "VBRI", version(2), delay(2), quality(2),
    // bytes(4 BE), frames(4 BE). A recognized tag that runs out of its
    // frame is malformed → quarantine.
    val vbriOff = skip + 4 + 32
    if (!hasVbr && f0.layer == 3 && f0.version == 10 &&
        vbriOff + 4 <= skip + f0.frameBytes) {
      val tag = new String(b, vbriOff, 4, "US-ASCII")
      if (tag == "VBRI") {
        if (vbriOff + 18 > skip + f0.frameBytes) return None // truncated
        vbrBytes = Multimodal.readBe32(b, vbriOff + 10).toLong & 0xffffffffL
        vbrFrames = Multimodal.readBe32(b, vbriOff + 14).toLong & 0xffffffffL
        hasVbr = true
        vbrKind = 2
      }
    }
    Some(Mp3Stream(f0.version, frames.length,
      frames.map(_.frameBytes.toLong).sum, f0.sampleRate, f0.channels,
      skip, hasVbr, vbrFrames, vbrBytes, f0.layer, vbrKind))
  }

  /** Fixture media table: (media_id, media_type, content). */
  def synthesizeMp3Table(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, "audio/mpeg", buildFixture(id)))
      .toDF("media_id", "media_type", "content")
  }

  /** VBR fixture media table: (media_id, media_type, content). */
  def synthesizeMp3VbrTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, "audio/mpeg", buildFixtureVbr(id)))
      .toDF("media_id", "media_type", "content")
  }

  /** Layer-matrix fixture media table: (media_id, media_type, content). */
  def synthesizeMp3LayersTable(
      spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, "audio/mpeg", buildFixtureLayers(id)))
      .toDF("media_id", "media_type", "content")
  }

  /** Layer-aware per-stream face: layer, version, framing rollup, and
    * the VBR header kind/fields (0 when absent; 1 = Xing/Info, 2 =
    * VBRI). Map-only; quarantined payloads omitted.
    */
  def extractMp3LayerStats(
      spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseStreamInfo(bytes).map(s =>
          (id, s.layer.toLong, s.version.toLong, s.nFrames.toLong,
            s.totalBytes, s.sampleRate.toLong, s.channels.toLong,
            s.vbrKind.toLong, s.vbrFrames, s.vbrBytes))
      })
      .toDF("media_id", "layer", "version_x10", "n_frames", "total_bytes",
        "sample_rate", "channels", "vbr_kind", "vbr_frames", "vbr_bytes")
      .orderBy(col("media_id"))
  }

  /** Per-stream face: one rollup row per decodable stream — version
    * (×10), physical frame count (incl. a Xing frame), byte total,
    * sample rate, channels, leading-ID3v2 size, and the VBR header
    * fields (0 when absent). Map-only; quarantined payloads omitted.
    */
  def extractMp3StreamStats(
      spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseStreamInfo(bytes).map(s =>
          (id, s.version.toLong, s.nFrames.toLong, s.totalBytes,
            s.sampleRate.toLong, s.channels.toLong, s.id3Bytes.toLong,
            if (s.hasVbr) 1L else 0L, s.vbrFrames, s.vbrBytes))
      })
      .toDF("media_id", "version_x10", "n_frames", "total_bytes",
        "sample_rate", "channels", "id3_bytes", "vbr_flag", "vbr_frames",
        "vbr_bytes")
      .orderBy(col("media_id"))
  }

  /** Per-frame face: one row per decoded frame. Map-only; quarantined
    * payloads omitted entirely.
    */
  def extractMp3Info(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseFrames(bytes).toSeq.flatten.map(f =>
          (id, f.frameIdx.toLong, f.bitrateKbps.toLong,
            f.sampleRate.toLong, f.channels.toLong,
            if (f.padded) 1L else 0L, f.frameBytes.toLong))
      })
      .toDF("media_id", "frame_idx", "bitrate_kbps", "sample_rate",
        "channels", "padded", "frame_bytes")
      .orderBy(col("media_id"), col("frame_idx"))
  }
}
