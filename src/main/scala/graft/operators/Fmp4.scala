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

  /** One decoded (movie fragment, track) row: mfhd sequence number,
    * the traf's track, tfdt base decode time, trun sample count, and
    * the byte / duration totals with a flag telling whether they came
    * from per-sample trun entries or the tfhd/trex defaults. A muxed
    * DASH moof (audio + video traf in one fragment) yields one row per
    * traf, each honoring its OWN tfhd→trex default cascade.
    */
  final case class Fragment(
      fragIdx: Int, sequence: Long, trackId: Long, baseDecodeTime: Long,
      sampleCount: Long, totalBytes: Long, durationTicks: Long,
      usesDefaults: Boolean)

  private val MaxFragments = 10000 // bomb ceiling (moof count)
  private val MaxTrafsPerMoof = 64 // muxed-track ceiling
  // per-traf cumulative sample ceiling: with samples capped at 2^22 and
  // every per-sample value < 2^32, totals stay below 2^54 — no Long
  // overflow is reachable; the multiplyExact/addExact guards below are
  // belt-and-braces for the arithmetic the ceiling already bounds
  private val MaxSamplesPerTraf = 1L << 22

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

  /** Muxed two-track fixture for doc `id` — the interleaved DASH shape
    * one moov cannot express: every moof carries BOTH a video traf
    * (track 1, the same closed forms as [[buildFixture]]) and an audio
    * traf (track 2). Audio truns never carry per-sample fields: even
    * fragments inherit the trex defaults (1024 ticks, 64+id%32 bytes),
    * odd fragments override them via tfhd (960 ticks, 48+id%16 bytes) —
    * so the per-track trex registry, the tfhd-overrides-trex tier, and
    * the per-traf decode-time baselines are all load-bearing. Sample
    * counts and sizes are closed forms of (id, fragment, sample) for
    * the DuckDB oracle. Every 13th id truncates mid-stream.
    */
  def buildFixtureMux(id: Long): Array[Byte] = {
    val nFrag = 2 + (id % 4).toInt
    val vDur = 512 + (id % 128).toInt
    val vSize = 256 + (id % 64).toInt
    val aSize = 64 + (id % 32).toInt
    val aSizeAlt = 48 + (id % 16).toInt
    val ftyp = mp4Box("ftyp",
      "isom".getBytes("US-ASCII") ++ be32(512) ++
        "isomcmfc".getBytes("US-ASCII"))
    val mvhd = mp4Box("mvhd",
      Array[Byte](0, 0, 0, 0) ++ be32(0) ++ be32(0) ++
        be32(90000) ++ be32(0) ++
        be32(0x00010000) ++ Array[Byte](0x01, 0, 0, 0) ++
        new Array[Byte](8) ++
        (be32(0x00010000) ++ be32(0) ++ be32(0) ++
          be32(0) ++ be32(0x00010000) ++ be32(0) ++
          be32(0) ++ be32(0) ++ be32(0x40000000)) ++
        new Array[Byte](24) ++ be32(3))
    def trexBox(track: Int, dur: Int, size: Int): Array[Byte] =
      mp4Box("trex",
        Array[Byte](0, 0, 0, 0) ++ be32(track) ++ be32(1) ++
          be32(dur) ++ be32(size) ++ be32(0))
    val moov = mp4Box("moov",
      mvhd ++ mp4Box("mvex",
        trexBox(1, vDur, vSize) ++ trexBox(2, 1024, aSize)))
    def tfdtBox(t: Long): Array[Byte] =
      mp4Box("tfdt", Array[Byte](1, 0, 0, 0) ++
        be32((t >>> 32).toInt) ++ be32(t.toInt))
    def trafBox(track: Int, baseTime: Long, n: Int,
        tfhdDefaults: Option[(Int, Int)],
        perSample: Option[(Seq[Int], Seq[Int])]): Array[Byte] = {
      val tfhdFlags = if (tfhdDefaults.isDefined)
        TfhdDefaultDuration | TfhdDefaultSize else 0
      val tfhd = mp4Box("tfhd",
        Array[Byte](0, (tfhdFlags >>> 16).toByte, (tfhdFlags >>> 8).toByte,
          tfhdFlags.toByte) ++ be32(track) ++
          tfhdDefaults.map { case (d, s) => be32(d) ++ be32(s) }
            .getOrElse(Array.empty[Byte]))
      val trunFlags = TrunDataOffset |
        (if (perSample.isDefined) TrunSampleDuration | TrunSampleSize else 0)
      val entries = perSample.map { case (durs, sizes) =>
        (0 until n).toArray.flatMap(i => be32(durs(i)) ++ be32(sizes(i)))
      }.getOrElse(Array.empty[Byte])
      val trun = mp4Box("trun",
        Array[Byte](0, (trunFlags >>> 16).toByte, (trunFlags >>> 8).toByte,
          trunFlags.toByte) ++ be32(n) ++ be32(0) ++ entries)
      mp4Box("traf", tfhd ++ tfdtBox(baseTime) ++ trun)
    }
    var vTime = 0L; var aTime = 0L
    val frags = (0 until nFrag).toArray.flatMap { f =>
      val mfhd = mp4Box("mfhd", Array[Byte](0, 0, 0, 0) ++ be32(f + 1))
      // video track: per-sample on even fragments, tfhd defaults on odd
      val nV = 4 + ((id + f) % 5).toInt
      val vSizes = (0 until nV).map(i => 100 + ((id + 13L * f + i) % 200).toInt)
      val vDurs = (0 until nV).map(i => 400 + ((id + 7L * f + i) % 100).toInt)
      val vTraf =
        if (f % 2 == 0) trafBox(1, vTime, nV, None, Some((vDurs, vSizes)))
        else trafBox(1, vTime, nV, Some((vDur, vSize)), None)
      // audio track: trex defaults on even fragments, tfhd on odd
      val nA = 6 + ((id + 2L * f) % 7).toInt
      val aTraf =
        if (f % 2 == 0) trafBox(2, aTime, nA, None, None)
        else trafBox(2, aTime, nA, Some((960, aSizeAlt)), None)
      val mdat = mp4Box("mdat",
        Array.tabulate(48)(i => ((id + f + i) % 256).toByte))
      vTime += (if (f % 2 == 0) vDurs.map(_.toLong).sum else nV.toLong * vDur)
      aTime += nA.toLong * (if (f % 2 == 0) 1024L else 960L)
      mp4Box("moof", mfhd ++ vTraf ++ aTraf) ++ mdat
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
    // top-level scan for moov/mvex — PER-TRACK trex defaults (§8.8.3):
    // a muxed stream carries one trex per track; a duplicate trex for
    // the same track is ambiguous → quarantine
    val trex = scala.collection.mutable.LongMap.empty[(Long, Long)]
    var off = 0
    var sawMoov = false
    var nMoofs = 0
    val frags = scala.collection.mutable.ArrayBuffer.empty[Fragment]
    while (off < b.length) {
      if (off + 8 > b.length) return None
      val len = readBe32(b, off).toLong & 0xffffffffL
      if (len < 8 || off + len > b.length) return None
      boxType(off) match {
        case "moov" =>
          sawMoov = true
          // find mvex/trex boxes inside moov
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
                  val tid = readBe32(b, o3 + 12).toLong & 0xffffffffL
                  if (trex.contains(tid)) return None
                  trex.update(tid,
                    (readBe32(b, o3 + 20).toLong & 0xffffffffL,
                      readBe32(b, o3 + 24).toLong & 0xffffffffL))
                }
                o3 += l3.toInt
              }
            }
            o += l2.toInt
          }
        case "moof" =>
          if (nMoofs >= MaxFragments) return None
          parseMoof(b, off + 8, off + len.toInt, nMoofs, trex) match {
            case Some(fr) => frags ++= fr
            case None => return None
          }
          nMoofs += 1
        case _ => // ftyp/mdat/free: skip
      }
      off += len.toInt
    }
    if (!sawMoov) return None
    Some(frags.toSeq)
  }

  /** One moof → one Fragment per traf. Quarantines (None) on: missing
    * mfhd, zero trafs, more than [[MaxTrafsPerMoof]] trafs, two trafs
    * for the same track (ambiguous totals), or any malformed traf.
    */
  private def parseMoof(
      b: Array[Byte], start: Int, end: Int, idx: Int,
      trex: scala.collection.mutable.LongMap[(Long, Long)])
      : Option[Seq[Fragment]] = {
    def boxType(off: Int): String = new String(b, off + 4, 4, "US-ASCII")
    var seq = -1L
    val rows = scala.collection.mutable.ArrayBuffer.empty[Fragment]
    val seenTracks = scala.collection.mutable.LongMap.empty[Boolean]
    var off = start
    while (off < end) {
      if (off + 8 > end) return None
      val len = readBe32(b, off).toLong & 0xffffffffL
      if (len < 8 || off + len > end) return None
      boxType(off) match {
        case "mfhd" =>
          if (len < 16) return None
          seq = readBe32(b, off + 12).toLong & 0xffffffffL
        case "traf" =>
          if (rows.length >= MaxTrafsPerMoof) return None
          parseTraf(b, off + 8, off + len.toInt, trex) match {
            case Some((trackId, baseTime, n, bytes, dur, defaults)) =>
              if (seenTracks.contains(trackId)) return None
              seenTracks.update(trackId, true)
              rows += Fragment(idx, 0L, trackId, baseTime, n, bytes, dur,
                defaults)
            case None => return None
          }
        case _ =>
      }
      off += len.toInt
    }
    if (seq < 0 || rows.isEmpty) None
    else Some(rows.toSeq.map(_.copy(sequence = seq)))
  }

  /** One traf → (trackId, baseDecodeTime, sampleCount, totalBytes,
    * totalDur, usesDefaults). The default cascade is resolved per traf:
    * trun per-sample fields win, else the traf's OWN tfhd defaults,
    * else this track's trex entry. A trun before the tfhd is malformed
    * (§8.8.7 makes tfhd the traf's first box, and without it neither
    * the track id nor the defaults are known) → quarantine rather than
    * silently resolving against trex. Accumulation is overflow-checked
    * and sample counts are ceiling-bounded — an adversarial huge
    * sample_count with inherited defaults can neither spin nor wrap
    * the Long totals into silent negatives.
    */
  private def parseTraf(
      b: Array[Byte], start: Int, end: Int,
      trex: scala.collection.mutable.LongMap[(Long, Long)])
      : Option[(Long, Long, Long, Long, Long, Boolean)] = {
    def boxType(off: Int): String = new String(b, off + 4, 4, "US-ASCII")
    var trackId = -1L; var baseTime = 0L
    var tfhdDur = -1L; var tfhdSize = -1L
    var tfhdSeen = false
    var sampleCount = -1L; var totalBytes = -1L; var totalDur = -1L
    var usesDefaults = false
    var o = start
    while (o < end) {
      if (o + 8 > end) return None
      val l2 = readBe32(b, o).toLong & 0xffffffffL
      if (l2 < 8 || o + l2 > end) return None
      boxType(o) match {
        case "tfhd" =>
          if (tfhdSeen) return None // duplicate tfhd: ambiguous defaults
          tfhdSeen = true
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
          // the tfhd carries the track id and the first default tier:
          // a trun before it cannot be resolved — malformed, quarantine
          if (!tfhdSeen) return None
          if (l2 < 16) return None
          val flags = readBe32(b, o + 8) & 0xffffff
          val n = readBe32(b, o + 12).toLong & 0xffffffffL
          if (n > MaxSamplesPerTraf) return None
          if (math.max(sampleCount, 0L) + n > MaxSamplesPerTraf) return None
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
          // skip the entry walk when no per-sample field is read: a
          // (mutated) flags=0 trun with a huge count would otherwise
          // spin an empty multi-billion-iteration loop
          if (hasDur || hasSize) {
            var i = 0L
            while (i < n) {
              var q = (p + i * perSample).toInt
              if (hasDur) { dd += readBe32(b, q).toLong & 0xffffffffL; q += 4 }
              if (hasSize) { db += readBe32(b, q).toLong & 0xffffffffL; q += 4 }
              i += 1
            }
          }
          val (trexDur, trexSize) = trex.getOrElse(trackId, (-1L, -1L))
          val effDur = if (tfhdDur >= 0) tfhdDur else trexDur
          val effSize = if (tfhdSize >= 0) tfhdSize else trexSize
          if (!hasDur && effDur < 0) return None // no duration anywhere
          if (!hasSize && effSize < 0) return None
          // a traf may carry trun* (§8.8.8): ACCUMULATE across them
          // instead of keeping only the last one's totals; every
          // product and sum is exact-checked (unreachable under the
          // sample ceiling, quarantine rather than wrap if not)
          try {
            sampleCount = Math.addExact(math.max(sampleCount, 0L), n)
            totalDur = Math.addExact(math.max(totalDur, 0L),
              if (hasDur) dd else Math.multiplyExact(n, effDur))
            totalBytes = Math.addExact(math.max(totalBytes, 0L),
              if (hasSize) db else Math.multiplyExact(n, effSize))
          } catch {
            case _: ArithmeticException => return None
          }
          usesDefaults = usesDefaults || !hasDur || !hasSize
        case _ =>
      }
      o += l2.toInt
    }
    if (trackId < 0 || sampleCount < 0) None
    else Some((trackId, baseTime, sampleCount, totalBytes, totalDur,
      usesDefaults))
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

  /** Muxed audio+video twin of [[synthesizeFmp4Table]]: every moof
    * interleaves two trafs, the real DASH capture shape.
    */
  def synthesizeFmp4MuxTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long")).as[Long]
      .map(id => (id, "video/mp4", buildFixtureMux(id)))
      .toDF("media_id", "media_type", "content")
  }

  /** Per-(fragment, track) face: one row per decoded traf with the
    * curation facts — sequence, decode-time baseline, sample count,
    * byte and duration totals, and whether trex/tfhd defaults were
    * inherited. Single-traf fragments yield exactly one row (the
    * original per-fragment face unchanged); muxed fragments yield one
    * row per track. Map-only; quarantined payloads omitted entirely.
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
      .orderBy(col("media_id"), col("frag_idx"), col("track_id"))
  }
}
