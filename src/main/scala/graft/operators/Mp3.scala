package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MPEG-1 Layer III (MP3) frame-header decode — ISO/IEC 11172-3 §2.4.1.3,
  * the most common legacy audio framing a web crawl carries. Like the
  * ADTS stratum: 4-byte fixed headers walked frame by frame for bitrate,
  * sample rate, channel mode, padding and the derived frame length
  * (144000·bitrate_kbps ÷ sampleRate + padding for MPEG-1 Layer III),
  * with the entropy-coded audio payload out of scope by the same
  * contract that stops AAC at its headers.
  *
  * Decode contract (the Multimodal conventions): map-only byte walk, a
  * bomb ceiling on frame count, whole-payload quarantine on ANY
  * malformed frame (bad sync, reserved version/layer/bitrate/sample-rate
  * codes, truncation) — deterministic under every-prefix truncation and
  * single-byte mutation fuzz.
  */
object Mp3 {

  /** ISO 11172-3 Table B.2, MPEG-1 Layer III bitrates in kbps; index 0
    * ("free") and 15 (forbidden) are rejected.
    */
  val BitratesKbps: IndexedSeq[Int] = IndexedSeq(
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MPEG-1 sampling rates by the 2-bit code; code 3 is reserved. */
  val SampleRates: IndexedSeq[Int] = IndexedSeq(44100, 48000, 32000)

  final case class Mp3Frame(
      frameIdx: Int, bitrateKbps: Int, sampleRate: Int, channels: Int,
      padded: Boolean, frameBytes: Int)

  private val MaxFrames = 10000

  /** MPEG-1 Layer III frame length in bytes (header included). */
  def frameLength(bitrateKbps: Int, sampleRate: Int, padded: Boolean): Int =
    144000 * bitrateKbps / sampleRate + (if (padded) 1 else 0)

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

  /** Walk the frame chain. Some(frames) iff EVERY frame parses and the
    * chain ends exactly at the payload boundary; None on bad sync,
    * anything but MPEG-1 Layer III, free/forbidden bitrate, reserved
    * sample-rate code, truncation, or the bomb ceiling.
    */
  def parseFrames(b: Array[Byte]): Option[Seq[Mp3Frame]] = {
    if (b == null || b.isEmpty) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Mp3Frame]
    var off = 0
    while (off < b.length) {
      if (out.length >= MaxFrames) return None
      if (off + 4 > b.length) return None
      val b0 = b(off) & 0xff; val b1 = b(off + 1) & 0xff
      if (b0 != 0xff || (b1 & 0xe0) != 0xe0) return None // 11-bit sync
      if (((b1 >>> 3) & 3) != 3) return None // MPEG-1 only
      if (((b1 >>> 1) & 3) != 1) return None // Layer III only
      val b2 = b(off + 2) & 0xff
      val brIdx = (b2 >>> 4) & 0xf
      if (brIdx < 1 || brIdx > 14) return None // free/forbidden
      val srIdx = (b2 >>> 2) & 3
      if (srIdx > 2) return None // reserved
      val padded = ((b2 >>> 1) & 1) == 1
      val mode = ((b(off + 3) & 0xff) >>> 6) & 3
      val len = frameLength(BitratesKbps(brIdx), SampleRates(srIdx), padded)
      if (off + len > b.length) return None // truncated frame
      out += Mp3Frame(out.length, BitratesKbps(brIdx), SampleRates(srIdx),
        if (mode == 3) 1 else 2, padded, len)
      off += len
    }
    Some(out.toSeq)
  }

  /** Fixture media table: (media_id, media_type, content). */
  def synthesizeMp3Table(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, "audio/mpeg", buildFixture(id)))
      .toDF("media_id", "media_type", "content")
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
