package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Multimodal.{be16, be32, mp4Box, readBe32}

/** Fragmented MP4 (fMP4 / CMAF) movie-fragment decode — the ISO/IEC
  * 14496-12 §8.8 structures every DASH/HLS capture actually arrives in:
  * instead of one moov sample table, the stream is
  * `ftyp moov(mvex/trex) [moof(mfhd traf(tfhd [tfdt] trun)) mdat]×N`,
  * with per-sample durations/sizes either carried in each trun or
  * inherited from the trex defaults. Walking the fragment headers gives
  * the per-fragment sample counts, byte totals, decode-time baselines
  * and duration ticks a video-corpus curation pass keys on — the
  * fragmented twin of `media_video_samples`' stbl walk, with the codec
  * payload staying behind the same documented boundary.
  *
  * Decode contract (the Multimodal conventions): map-only byte walk,
  * bounds-checked before every fixed-offset read, a fragment-count bomb
  * ceiling, and whole-payload quarantine on ANY malformed fragment —
  * never a half-emitted fragment chain, deterministic under
  * every-prefix truncation fuzz.
  */
object Fmp4 {

  /** One decoded movie fragment: mfhd sequence number, the traf's
    * track, tfdt base decode time, trun sample count, and the byte /
    * duration totals with a flag telling whether they came from
    * per-sample trun entries or the trex defaults.
    */
  final case class Fragment(
      fragIdx: Int, sequence: Long, trackId: Long, baseDecodeTime: Long,
      sampleCount: Long, totalBytes: Long, durationTicks: Long,
      usesDefaults: Boolean)

  private val MaxFragments = 10000 // bomb ceiling

  // trun flag bits (§8.8.8)
  private val TrunDataOffset = 0x000001
  private val TrunSampleDuration = 0x000100
  private val TrunSampleSize = 0x000200

  // tfhd flag bits (§8.8.7)
  private val TfhdDefaultDuration = 0x000008
  private val TfhdDefaultSize = 0x000010

  /** Build a fragmented stream for doc `id`: ftyp + moov(mvhd, mvex/
    * trex with the id-derived defaults) + 2 + id%4 fragments. Even
    * fragments carry per-sample sizes AND durations in the trun; odd
    * fragments omit both and inherit the trex defaults — the cascade
    * the parser must honor. Sample counts and every size/duration are
    * closed forms of (id, fragment, sample). Every 13th id truncates
    * mid-fragment — the planted corruption.
    */
  def buildFixture(id: Long): Array[Byte] = {
    val nFrag = 2 + (id % 4).toInt
    val defDur = 512 + (id % 128).toInt
    val defSize = 256 + (id % 64).toInt
    val ftyp = mp4Box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512) ++
        "isomcmfc".getBytes("US-ASCII"))
    val mvhd = mp4Box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(90000) ++ be32(0) ++ // fragmented: duration unknown in moov
        be32(0x00010000) ++ Array[Byte](0x01, 0, 0, 0) ++
        new Array[Byte](8) ++
        (be32(0x00010000) ++ be32(0) ++ be32(0) ++
          be32(0) ++ be32(0x00010000) ++ be32(0) ++
          be32(0) ++ be32(0) ++ be32(0x40000000)) ++
        new Array[Byte](24) ++ be32(2))
    val trex = mp4Box("trex",
      Array[Byte](0, 0, 0, 0) ++ be32(1) /* track */ ++
        be32(1) /* default sample description */ ++
        be32(defDur) ++ be32(defSize) ++ be32(0) /* default flags */)
    val moov = mp4Box("moov", mvhd ++ mp4Box("mvex", trex))
    var decodeTime = 0L
    val frags = (0 until nFrag).toArray.flatMap { f =>
      val n = 4 + ((id + f) % 5).toInt
      val perSample = f % 2 == 0
      val sizes = (0 until n).map(i => 100 + ((id + 13L * f + i) % 200).toInt)
      val durs = (0 until n).map(i => 400 + ((id + 7L * f + i) % 100).toInt)
      val mfhd = mp4Box("mfhd",
        Array[Byte](0, 0, 0, 0) ++ be32(f + 1))
      val tfhdFlags =
        if (perSample) 0 else TfhdDefaultDuration | TfhdDefaultSize
      val tfhd = mp4Box("tfhd",
        Array[Byte](0, (tfhdFlags >>> 16).toByte, (tfhdFlags >>> 8).toByte,
          tfhdFlags.toByte) ++ be32(1) ++
          (if (perSample) Array.empty[Byte]
           else be32(defDur) ++ be32(defSize)))
      val tfdt = mp4Box("tfdt",
        Array[Byte](1, 0, 0, 0) ++ // version 1: 64-bit time
          be32((decodeTime >>> 32).toInt) ++ be32(decodeTime.toInt))
      val trunFlags = TrunDataOffset |
        (if (perSample) TrunSampleDuration | TrunSampleSize else 0)
      val entries =
        if (perSample)
          (0 until n).toArray.flatMap(i => be32(durs(i)) ++ be32(sizes(i)))
        else Array.empty[Byte]
      val trun = mp4Box("trun",
        Array[Byte](0, (trunFlags >>> 16).toByte, (trunFlags >>> 8).toByte,
          trunFlags.toByte) ++ be32(n) ++ be32(0) /* data offset stub */ ++
          entries)
      val mdatLen = if (perSample) sizes.sum else n * defSize
      val mdat = mp4Box("mdat",
        Array.tabulate(math.min(mdatLen, 64))(i =>
          ((id + f + i) % 256).toByte)) // truncated payload stand-in
      decodeTime += (if (perSample) durs.map(_.toLong).sum
                     else n.toLong * defDur)
      mp4Box("moof", mfhd ++ mp4Box("traf", tfhd ++ tfdt ++ trun)) ++ mdat
    }
    val bytes = ftyp ++ moov ++ frags
    if (id % 13 == 0) bytes.dropRight(11) else bytes
  }

  /** Walk the top-level box chain and decode every moof. Some(frags)
    * iff the WHOLE chain is well-formed (every box length sane, every
    * moof carrying mfhd + traf(tfhd, trun), trailing boxes complete);
    * None (quarantine) on any malformed or truncated structure, or
    * more than the bomb ceiling of fragments. trex defaults (§8.8.3)
    * are read from moov/mvex and applied when the tfhd carries them
    * and the trun omits per-sample fields — the inheritance cascade.
    */
  def parseFragments(b: Array[Byte]): Option[Seq[Fragment]] = {
    if (b == null || b.length < 8) return None
    def boxType(off: Int): String =
      new String(b, off + 4, 4, "US-ASCII")
    // top-level scan for moov/mvex/trex defaults
    var trexDur = -1L; var trexSize = -1L
    var off = 0
    var sawMoov = false
    val frags = scala.collection.mutable.ArrayBuffer.empty[Fragment]
    while (off < b.length) {
      if (off + 8 > b.length) return None
      val len = readBe32(b, off).toLong & 0xffffffffL
      if (len < 8 || off + len > b.length) return None
      boxType(off) match {
        case "moov" =>
          sawMoov = true
          // find mvex/trex inside moov
          var o = off + 8
          val end = off + len.toInt
          while (o < end) {
            if (o + 8 > end) return None
            val l2 = readBe32(b, o).toLong & 0xffffffffL
            if (l2 < 8 || o + l2 > end) return None
            if (boxType(o) == "mvex") {
              var o3 = o + 8
              val end3 = o + l2.toInt
              while (o3 < end3) {
                if (o3 + 8 > end3) return None
                val l3 = readBe32(b, o3).toLong & 0xffffffffL
                if (l3 < 8 || o3 + l3 > end3) return None
                if (boxType(o3) == "trex") {
                  if (l3 < 8 + 24) return None
                  trexDur = readBe32(b, o3 + 20).toLong & 0xffffffffL
                  trexSize = readBe32(b, o3 + 24).toLong & 0xffffffffL
                }
                o3 += l3.toInt
              }
            }
            o += l2.toInt
          }
        case "moof" =>
          if (frags.length >= MaxFragments) return None
          val frag = parseMoof(b, off + 8, off + len.toInt,
            frags.length, trexDur, trexSize)
          frag match {
            case Some(fr) => frags += fr
            case None => return None
          }
        case _ => // ftyp/mdat/free: skip
      }
      off += len.toInt
    }
    if (!sawMoov) return None
    Some(frags.toSeq)
  }

  private def parseMoof(
      b: Array[Byte], start: Int, end: Int, idx: Int,
      trexDur: Long, trexSize: Long): Option[Fragment] = {
    def boxType(off: Int): String = new String(b, off + 4, 4, "US-ASCII")
    var seq = -1L
    var trackId = -1L; var baseTime = 0L
    var tfhdDur = -1L; var tfhdSize = -1L
    var sampleCount = -1L; var totalBytes = -1L; var totalDur = -1L
    var usesDefaults = false
    var trafSeen = false
    var off = start
    while (off < end) {
      if (off + 8 > end) return None
      val len = readBe32(b, off).toLong & 0xffffffffL
      if (len < 8 || off + len > end) return None
      boxType(off) match {
        case "mfhd" =>
          if (len < 16) return None
          seq = readBe32(b, off + 12).toLong & 0xffffffffL
        case "traf" if trafSeen =>
          // multi-track fragments are out of decode scope: QUARANTINE
          // rather than silently report only the last track's samples
          return None
        case "traf" =>
          trafSeen = true
          var o = off + 8
          val tEnd = off + len.toInt
          while (o < tEnd) {
            if (o + 8 > tEnd) return None
            val l2 = readBe32(b, o).toLong & 0xffffffffL
            if (l2 < 8 || o + l2 > tEnd) return None
            boxType(o) match {
              case "tfhd" =>
                if (l2 < 16) return None
                val flags = readBe32(b, o + 8) & 0xffffff
                trackId = readBe32(b, o + 12).toLong & 0xffffffffL
                val hEnd = o + l2.toInt
                var p = o + 16
                if ((flags & 0x000001) != 0) p += 8 // base-data-offset (64-bit)
                if ((flags & 0x000002) != 0) p += 4 // sample-description-index
                if ((flags & TfhdDefaultDuration) != 0) {
                  if (p + 4 > hEnd) return None
                  tfhdDur = readBe32(b, p).toLong & 0xffffffffL; p += 4
                }
                if ((flags & TfhdDefaultSize) != 0) {
                  if (p + 4 > hEnd) return None
                  tfhdSize = readBe32(b, p).toLong & 0xffffffffL; p += 4
                }
              case "tfdt" =>
                if (l2 < 12) return None
                val version = b(o + 8) & 0xff
                if (version == 1) {
                  if (l2 < 20) return None
                  baseTime = ((readBe32(b, o + 12).toLong & 0xffffffffL) << 32) |
                    (readBe32(b, o + 16).toLong & 0xffffffffL)
                } else {
                  if (l2 < 16) return None
                  baseTime = readBe32(b, o + 12).toLong & 0xffffffffL
                }
              case "trun" =>
                if (l2 < 16) return None
                val flags = readBe32(b, o + 8) & 0xffffff
                val n = readBe32(b, o + 12).toLong & 0xffffffffL
                if (n > Int.MaxValue) return None
                var p = o + 16
                if ((flags & TrunDataOffset) != 0) p += 4
                if ((flags & 0x000004) != 0) p += 4 // first-sample-flags
                val hasDur = (flags & TrunSampleDuration) != 0
                val hasSize = (flags & TrunSampleSize) != 0
                val hasCts = (flags & 0x000800) != 0
                val perSample =
                  (if (hasDur) 4 else 0) + (if (hasSize) 4 else 0) +
                    (if ((flags & 0x000400) != 0) 4 else 0) +
                    (if (hasCts) 4 else 0)
                if (p + n * perSample > o + l2) return None
                var db = 0L; var dd = 0L
                // skip the entry walk when no per-sample field is read:
                // a (mutated) flags=0 trun with a huge count would
                // otherwise spin an empty multi-billion-iteration loop
                if (hasDur || hasSize) {
                  var i = 0L
                  while (i < n) {
                    var q = (p + i * perSample).toInt
                    if (hasDur) { dd += readBe32(b, q).toLong & 0xffffffffL; q += 4 }
                    if (hasSize) { db += readBe32(b, q).toLong & 0xffffffffL; q += 4 }
                    i += 1
                  }
                }
                val effDur = if (tfhdDur >= 0) tfhdDur else trexDur
                val effSize = if (tfhdSize >= 0) tfhdSize else trexSize
                if (!hasDur && effDur < 0) return None // no duration anywhere
                if (!hasSize && effSize < 0) return None
                // a traf may carry trun* (§8.8.8): ACCUMULATE across
                // them instead of keeping only the last one's totals
                sampleCount = math.max(sampleCount, 0L) + n
                totalDur = math.max(totalDur, 0L) +
                  (if (hasDur) dd else n * effDur)
                totalBytes = math.max(totalBytes, 0L) +
                  (if (hasSize) db else n * effSize)
                usesDefaults = usesDefaults || !hasDur || !hasSize
              case _ =>
            }
            o += l2.toInt
          }
        case _ =>
      }
      off += len.toInt
    }
    if (seq < 0 || trackId < 0 || sampleCount < 0) None
    else Some(Fragment(idx, seq, trackId, baseTime, sampleCount,
      totalBytes, totalDur, usesDefaults))
  }

  /** Fixture media table: (media_id, media_type, content) with a REAL
    * fragmented byte stream per document (every 13th planted-truncated).
    */
  def synthesizeFmp4Table(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, "video/mp4", buildFixture(id)))
      .toDF("media_id", "media_type", "content")
  }

  /** Per-fragment face: one row per decoded movie fragment with the
    * curation facts — sequence, decode-time baseline, sample count,
    * byte and duration totals, and whether trex/tfhd defaults were
    * inherited. Map-only; quarantined payloads omitted entirely.
    */
  def extractFragments(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        parseFragments(bytes).toSeq.flatten.map(f =>
          (id, f.fragIdx.toLong, f.sequence, f.trackId, f.baseDecodeTime,
            f.sampleCount, f.totalBytes, f.durationTicks,
            if (f.usesDefaults) 1L else 0L))
      })
      .toDF("media_id", "frag_idx", "sequence", "track_id",
        "base_decode_time", "n_samples", "total_bytes", "duration_ticks",
        "uses_defaults")
      .orderBy(col("media_id"), col("frag_idx"))
  }
}
