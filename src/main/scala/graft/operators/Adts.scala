package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ADTS (Audio Data Transport Stream) frame-header decode — the AAC
  * elementary-stream framing of ISO/IEC 14496-3 §1.A.2 (the format of
  * raw `.aac` captures and many streaming audio payloads). This is the
  * compressed-audio twin of the MP4/H.264 strata: a multimodal curation
  * pipeline reads the 7-byte fixed headers to get codec profile, sample
  * rate, channel layout, frame sizes, and duration WITHOUT touching the
  * entropy-coded AAC payload (out of scope by the same contract that
  * stops H.264 at slice headers).
  *
  * Decode contract (the Multimodal conventions): pure map-only byte
  * walking, a bomb ceiling on frame count, and whole-payload quarantine
  * on ANY malformed frame (bad syncword, non-zero layer, impossible
  * frame length, truncation) — a half-parsed chain is never emitted, so
  * the surface is deterministic under every-prefix truncation fuzz.
  *
  * No reference-repo analog (`shra4747/HNSW-Vector-DB` carries no media
  * path); extension surface like the rest of `Multimodal`.
  */
object Adts {

  /** ISO/IEC 14496-3 Table 1.18 sampling_frequency_index → Hz. */
  val SampleRates: IndexedSeq[Int] = IndexedSeq(
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  /** One decoded fixed header: audio object type (profile bits + 1),
    * sampling index, channel configuration, and the full frame length
    * (header + payload) in bytes.
    */
  final case class AdtsFrame(
      frameIdx: Int, aot: Int, sfi: Int, channels: Int, frameBytes: Int)

  private val MaxFrames = 10000 // bomb ceiling: 10k frames per payload

  /** Build one ADTS frame: 7-byte fixed header (protection_absent = 1,
    * so no CRC) followed by `payload`. `aot` is the MPEG-4 audio object
    * type (1 = Main, 2 = LC, 4 = SBR ...); the header's 2-bit profile
    * field carries aot − 1.
    */
  def buildFrame(
      aot: Int, sfi: Int, chanCfg: Int, payload: Array[Byte]): Array[Byte] = {
    require(aot >= 1 && aot <= 4, s"aot out of the 2-bit profile range: $aot")
    require(sfi >= 0 && sfi < SampleRates.length, s"bad sfi $sfi")
    require(chanCfg >= 0 && chanCfg <= 7, s"bad channel_configuration $chanCfg")
    val frameLen = 7 + payload.length
    require(frameLen < (1 << 13), s"frame too long for 13 bits: $frameLen")
    val fullness = 0x7ff // VBR convention
    val h = new Array[Byte](7)
    h(0) = 0xff.toByte
    h(1) = 0xf1.toByte // sync low nibble, MPEG-4, layer 00, protection_absent
    h(2) = (((aot - 1) << 6) | (sfi << 2) | (chanCfg >>> 2)).toByte
    h(3) = (((chanCfg & 3) << 6) | (frameLen >>> 11)).toByte
    h(4) = ((frameLen >>> 3) & 0xff).toByte
    h(5) = (((frameLen & 7) << 5) | (fullness >>> 6)).toByte
    h(6) = ((fullness & 0x3f) << 2).toByte // raw_data_blocks = 0
    h ++ payload
  }

  /** Fixture stream for doc `id`: 2 + id%5 frames of deterministic
    * payload bytes, aot = 1 + id%3, sfi = id%13, channels = 1 + id%3,
    * payload length 10 + (id + 7f)%50. Every 13th doc truncates its
    * final frame by 3 bytes — the planted corruption the quarantine
    * channel must catch.
    */
  def buildFixture(id: Long): Array[Byte] = {
    val nFrames = 2 + (id % 5).toInt
    val bytes = (0 until nFrames).toArray.flatMap { f =>
      val payload = Array.tabulate(10 + ((id + 7L * f) % 50).toInt)(i =>
        ((id + 11L * f + i) % 256).toByte)
      buildFrame(1 + (id % 3).toInt, (id % 13).toInt, 1 + (id % 3).toInt,
        payload)
    }
    if (id % 13 == 0) bytes.dropRight(3) else bytes
  }

  /** Walk the frame chain. Some(frames) iff EVERY frame parses and the
    * chain ends exactly at the payload boundary; None (quarantine) on
    * bad sync, non-zero layer, frame_length < 8 (a 7-byte header with an
    * empty raw block is not a legal AAC frame), sfi 13/14 (reserved),
    * truncation, or more than the bomb ceiling of frames.
    */
  def parseFrames(b: Array[Byte]): Option[Seq[AdtsFrame]] = {
    if (b == null || b.isEmpty) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[AdtsFrame]
    var off = 0
    while (off < b.length) {
      if (out.length >= MaxFrames) return None
      if (off + 7 > b.length) return None // truncated header
      val b0 = b(off) & 0xff; val b1 = b(off + 1) & 0xff
      if (b0 != 0xff || (b1 & 0xf0) != 0xf0) return None // bad sync
      if (((b1 >>> 1) & 3) != 0) return None // layer must be 00
      val b2 = b(off + 2) & 0xff
      val aot = ((b2 >>> 6) & 3) + 1
      val sfi = (b2 >>> 2) & 0xf
      if (sfi >= SampleRates.length) return None // 13/14 reserved, 15 escape
      val chanCfg = ((b2 & 1) << 2) | (((b(off + 3) & 0xff) >>> 6) & 3)
      val frameLen = (((b(off + 3) & 0xff) & 0x3) << 11) |
        ((b(off + 4) & 0xff) << 3) | (((b(off + 5) & 0xff) >>> 5) & 7)
      if (frameLen < 8) return None
      if (off + frameLen > b.length) return None // truncated frame
      out += AdtsFrame(out.length, aot, sfi, chanCfg, frameLen)
      off += frameLen
    }
    Some(out.toSeq)
  }

  /** Fixture media table: (media_id, media_type, content) with a REAL
    * ADTS byte stream per document (every 13th planted-truncated).
    */
  def synthesizeAdtsTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, "audio/aac", buildFixture(id)))
      .toDF("media_id", "media_type", "content")
  }

  /** Per-frame face: one row per decoded frame with the header facts a
    * curation pass keys on — object type, sample rate, channel config,
    * frame size. Map-only over the payload column; quarantined payloads
    * are omitted entirely (never half-emitted).
    */
  def extractAdtsInfo(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseFrames(bytes).toSeq.flatten.map(f =>
          (id, f.frameIdx.toLong, f.aot.toLong,
            SampleRates(f.sfi).toLong, f.channels.toLong,
            f.frameBytes.toLong))
      })
      .toDF("media_id", "frame_idx", "aot", "sample_rate", "channels",
        "frame_bytes")
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Per-stream rollup: frame count, byte total, clip duration in exact
    * integer microseconds (1024 PCM samples per AAC frame — duration =
    * 1024·10⁶·n_frames div rate, stated identically in the oracle), and
    * the header facts (constant per stream by construction here; `min`
    * states that without assuming it).
    */
  def adtsStreamStats(spark: SparkSession, media: DataFrame): DataFrame =
    extractAdtsInfo(spark, media)
      .groupBy(col("media_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(col("frame_bytes")).as("total_bytes"),
        min(col("aot")).as("aot"),
        min(col("sample_rate")).as("sample_rate"),
        min(col("channels")).as("channels"))
      .select(col("media_id"), col("n_frames"), col("total_bytes"),
        col("aot"), col("sample_rate"), col("channels"),
        expr("(1024000000 * n_frames) div sample_rate")
          .as("duration_micros"))
      .orderBy(col("media_id"))
}
