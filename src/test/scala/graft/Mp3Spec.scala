package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mp3

class Mp3Spec extends AnyFunSuite {

  test("build → parse round-trips the closed forms") {
    for (id <- 0L until 60L if id % 13 != 0) {
      val got = Mp3.parseFrames(Mp3.buildFixture(id))
      assert(got.isDefined, s"id $id quarantined")
      val fs = got.get
      assert(fs.length == 3 + (id % 5).toInt)
      fs.zipWithIndex.foreach { case (f, i) =>
        val br = Mp3.BitratesKbps(1 + (id % 14).toInt)
        val sr = Mp3.SampleRates((id % 3).toInt)
        val pad = (id + i) % 2 == 1
        assert(f.frameIdx == i)
        assert(f.bitrateKbps == br)
        assert(f.sampleRate == sr)
        assert(f.channels == (if (id % 4 == 3) 1 else 2))
        assert(f.padded == pad)
        assert(f.frameBytes ==
          144000 * br / sr + (if (pad) 1 else 0))
      }
    }
  }

  test("planted truncation quarantines; bad sync/version/layer/codes quarantine") {
    for (id <- Seq(0L, 13L, 26L))
      assert(Mp3.parseFrames(Mp3.buildFixture(id)).isEmpty)
    val good = Mp3.buildFrame(5, 0, padded = false, channelMode = 3, _ => 0)
    assert(Mp3.parseFrames(good).map(_.length).contains(1))
    val badSync = good.clone(); badSync(0) = 0x7f.toByte
    assert(Mp3.parseFrames(badSync).isEmpty)
    val mpeg2 = good.clone(); mpeg2(1) = (mpeg2(1) & ~0x10).toByte // version 10
    assert(Mp3.parseFrames(mpeg2).isEmpty)
    val layer1 = good.clone(); layer1(1) = (layer1(1) | 0x06).toByte // layer 11
    assert(Mp3.parseFrames(layer1).isEmpty)
    val freeBr = good.clone(); freeBr(2) = (freeBr(2) & 0x0f).toByte // idx 0
    assert(Mp3.parseFrames(freeBr).isEmpty)
    val badSr = good.clone(); badSr(2) = (badSr(2) | 0x0c).toByte // sr 11
    assert(Mp3.parseFrames(badSr).isEmpty)
  }

  test("every strict prefix is quarantined or a complete shorter chain; mutations never throw") {
    val full = Mp3.buildFixture(7L)
    for (n <- 0 until full.length) {
      Mp3.parseFrames(full.take(n)) match {
        case Some(fs) => assert(fs.map(_.frameBytes).sum == n)
        case None =>
      }
    }
    for (p <- 0 until math.min(full.length, 600); delta <- Seq(1, 0x80)) {
      val mut = full.clone(); mut(p) = (mut(p) + delta).toByte
      assert(Mp3.parseFrames(mut) == Mp3.parseFrames(mut))
    }
  }

  private def wantStream(id: Long)
      : (Long, Long, Long, Long, Long, Long, Long, Long, Long) = {
    val version = Seq(10L, 20L, 25L)((id % 3).toInt)
    val sr = ((id % 3).toInt match {
      case 0 => Mp3.SampleRates
      case 1 => Mp3.SampleRatesV2
      case _ => Mp3.SampleRatesV25
    })(((id / 3) % 3).toInt)
    val table = if (id % 3 == 0) Mp3.BitratesKbps else Mp3.BitratesKbpsV2
    val br = table(1 + (id % 14).toInt)
    val brX = table(math.max(1 + (id % 14).toInt, 4))
    val channels = if ((id / 2) % 4 == 3) 1L else 2L
    val nMusic = 3 + (id % 5).toInt
    val hasVbr = id % 5 < 3
    val granule = if (version == 10) 144000 else 72000
    val base = granule * br / sr
    val baseX = granule * brX / sr
    val padSum = (0 until nMusic).count(f => (id + f) % 2 == 1)
    val nFrames = nMusic + (if (hasVbr) 1 else 0)
    (version, nFrames.toLong,
      nMusic.toLong * base + padSum + (if (hasVbr) baseX.toLong else 0L),
      sr.toLong,
      channels,
      if (id % 7 < 3) 30 + id % 50 else 0L,
      if (hasVbr) 1L else 0L,
      if (hasVbr) 100 + id % 900 else 0L,
      if (hasVbr) 10000 + id % 90000 else 0L)
  }

  test("VBR fixture round-trips: ID3 skip, version tables, Xing fields") {
    for (id <- 0L until 90L if id % 13 != 0) {
      val got = Mp3.parseStreamInfo(Mp3.buildFixtureVbr(id))
      assert(got.isDefined, s"id $id quarantined")
      val s = got.get
      assert((s.version.toLong, s.nFrames.toLong, s.totalBytes,
        s.sampleRate.toLong, s.channels.toLong, s.id3Bytes.toLong,
        if (s.hasVbr) 1L else 0L, s.vbrFrames, s.vbrBytes) ==
        wantStream(id), s"id $id")
    }
    for (id <- Seq(0L, 13L, 26L))
      assert(Mp3.parseStreamInfo(Mp3.buildFixtureVbr(id)).isEmpty)
    // coverage sanity: the 90-id sweep hits every stratum, including
    // mono + Xing (side-info offset 9/17) and ID3 + MPEG-2.5
    val ids = (0L until 90L).filter(_ % 13 != 0)
    assert(ids.exists(id => (id / 2) % 4 == 3 && id % 5 < 3))
    assert(ids.exists(id => id % 7 < 3 && id % 3 == 2))
  }

  test("ID3v2 edge cases: malformed synchsafe, overrunning size, tag-only payload") {
    val frame = Mp3.buildFrame(5, 0, padded = false, channelMode = 0, _ => 0)
    def id3(size: Int, flags: Int = 0): Array[Byte] =
      "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, flags.toByte) ++
        Array[Byte](0, 0, ((size >>> 7) & 0x7f).toByte, (size & 0x7f).toByte)
    // well-formed tag + frame parses; id3Bytes lands in the stream face
    val ok = id3(4) ++ Array[Byte](1, 2, 3, 4) ++ frame
    assert(Mp3.parseFrames(ok).map(_.length).contains(1))
    assert(Mp3.parseStreamInfo(ok).map(_.id3Bytes).contains(14))
    // non-synchsafe size byte (>= 0x80) is malformed
    val badSize = ok.clone(); badSize(9) = 0x80.toByte
    assert(Mp3.parseFrames(badSize).isEmpty)
    // size overrunning the payload is malformed
    assert(Mp3.parseFrames(id3(1000) ++ frame).isEmpty)
    // a tag with no frames behind it is not an audio stream
    assert(Mp3.parseFrames(id3(4) ++ Array[Byte](1, 2, 3, 4)).isEmpty)
    // footer flag consumes 10 more bytes
    val footer = id3(4, flags = 0x10) ++ Array[Byte](1, 2, 3, 4) ++
      new Array[Byte](10) ++ frame
    assert(Mp3.parseStreamInfo(footer).map(_.id3Bytes).contains(24))
  }

  test("MPEG-2/2.5 frames parse with halved granule; truncated Xing quarantines") {
    val v2 = Mp3.buildFrameV(20, 3, 1, padded = false, channelMode = 0, _ => 0)
    val got2 = Mp3.parseFrames(v2)
    assert(got2.map(_.head.sampleRate).contains(24000))
    assert(got2.map(_.head.bitrateKbps).contains(24))
    assert(got2.map(_.head.frameBytes).contains(72000 * 24 / 24000))
    val v25 = Mp3.buildFrameV(25, 14, 2, padded = true, channelMode = 3, _ => 0)
    val got25 = Mp3.parseFrames(v25)
    assert(got25.map(_.head.sampleRate).contains(8000))
    assert(got25.map(_.head.channels).contains(1))
    // a recognized Xing tag whose flagged fields run out of the frame
    // is malformed: plant "Xing" with flags 0x3 too close to the end
    val short = Mp3.buildFrameV(10, 1, 0, padded = false, channelMode = 0,
      _ => 0)
    val tagOff = 4 + 32
    "Xing".getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) =>
      short(short.length - 10 + i) = c } // tag fits, fields don't
    val planted = short.clone()
    "Xing".getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) =>
      planted(tagOff + i) = c }
    planted(tagOff + 7) = 3 // flags frames+bytes, fields fit: fine
    assert(Mp3.parseStreamInfo(planted).exists(_.hasVbr))
    val truncTag = planted.take(tagOff + 10) // fields cut off mid-frame
    assert(Mp3.parseFrames(truncTag).isEmpty) // frame truncated anyway
  }

  test("CRC-protected first frame shifts the Xing tag by the 2 CRC bytes") {
    // hand-build a protected MPEG-1 stereo frame: clear bit 0 of the
    // header, place a fake CRC, then the tag at 4 + 2 + 32
    val f = Mp3.buildFrameV(10, 4, 0, padded = false, channelMode = 0, _ => 0)
    f(1) = (f(1) & ~1).toByte // protection_absent = 0
    val tagOff = 4 + 2 + 32
    "Info".getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) =>
      f(tagOff + i) = c }
    f(tagOff + 7) = 3 // flags: frames + bytes
    f(tagOff + 11) = 42 // frames = 42
    f(tagOff + 15) = 7 // bytes = 7
    val got = Mp3.parseStreamInfo(f)
    assert(got.exists(_.hasVbr), s"CRC-shifted tag missed: $got")
    assert(got.exists(s => s.vbrFrames == 42L && s.vbrBytes == 7L))
    // the same tag at the UNPROTECTED offset must not be recognized in
    // a protected frame (that position is inside the side info)
    val f2 = Mp3.buildFrameV(10, 4, 0, padded = false, channelMode = 0, _ => 0)
    f2(1) = (f2(1) & ~1).toByte
    "Info".getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) =>
      f2(4 + 32 + i) = c }
    assert(Mp3.parseStreamInfo(f2).exists(!_.hasVbr))
  }

  test("VBR fixture: every strict prefix parses-or-quarantines; mutations never throw") {
    val full = Mp3.buildFixtureVbr(22L) // mono + Xing + v2 stratum
    for (n <- 0 until full.length) {
      val a = Mp3.parseStreamInfo(full.take(n)) // must not throw
      assert(a == Mp3.parseStreamInfo(full.take(n)))
    }
    for (p <- 0 until math.min(full.length, 600); delta <- Seq(1, 0x80)) {
      val mut = full.clone(); mut(p) = (mut(p) + delta).toByte
      assert(Mp3.parseStreamInfo(mut) == Mp3.parseStreamInfo(mut))
    }
  }

  test("spark stream-stats face matches the closed forms on a fixture table") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = (0L until 60L).toDF("doc_id")
    val rows = Mp3.extractMp3StreamStats(
      spark, Mp3.synthesizeMp3VbrTable(spark, docs)).collect()
    val wantIds = (0L until 60L).filter(_ % 13 != 0)
    assert(rows.map(_.getLong(0)).toSeq == wantIds)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9)) == wantStream(id), s"id $id")
    }
  }

  test("spark face matches the closed forms on a fixture table") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = (0L until 30L).toDF("doc_id")
    val rows = Mp3.extractMp3Info(
      spark, Mp3.synthesizeMp3Table(spark, docs)).collect()
    val wantIds = (0L until 30L).filter(_ % 13 != 0)
    assert(rows.map(_.getLong(0)).distinct.toSeq == wantIds)
    assert(rows.length == wantIds.map(id => 3 + (id % 5).toInt).sum)
    val r = rows.head // id 1: br idx 2 → 40 kbps, sr 48000, stereo(joint)
    assert((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (1L, 40L, 48000L, 2L))
  }

  /** The layer-matrix fixture's closed forms, independently restated. */
  private def wantLayers(id: Long)
      : (Long, Long, Long, Long, Long, Long, Long, Long, Long) = {
    val layer = 1 + (id % 3).toInt
    val version = Seq(10, 20, 25)(((id / 3) % 3).toInt)
    val sr = (version match {
      case 10 => Mp3.SampleRates
      case 20 => Mp3.SampleRatesV2
      case _ => Mp3.SampleRatesV25
    })(((id / 9) % 3).toInt)
    val br = Mp3.bitrateTable(version, layer)(1 + (id % 14).toInt)
    val channels = if ((id / 2) % 4 == 3) 1L else 2L
    val nMusic = 3 + (id % 5).toInt
    val hasVbri = layer == 3 && version == 10 && id % 5 < 2
    val base = Mp3.frameLengthL(version, layer, br, sr, padded = false)
    val slot = if (layer == 1) 4 else 1
    val padSum = (0 until nMusic).count(f => (id + f) % 2 == 1)
    val brX = Mp3.BitratesKbps(math.max(1 + (id % 14).toInt, 4))
    val baseX =
      if (hasVbri) Mp3.frameLengthL(10, 3, brX, sr, padded = false) else 0
    (layer.toLong, version.toLong,
      nMusic.toLong + (if (hasVbri) 1 else 0),
      (nMusic.toLong * base + padSum.toLong * slot + baseX),
      sr.toLong, channels,
      if (hasVbri) 2L else 0L,
      if (hasVbri) 200L + id % 800 else 0L,
      if (hasVbri) 20000L + id % 80000 else 0L)
  }

  test("layer matrix: Layer I slots, Layer II lengths, VBRI fields round-trip") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = (0L until 120L).toDF("doc_id")
    val rows = Mp3.extractMp3LayerStats(
      spark, Mp3.synthesizeMp3LayersTable(spark, docs)).collect()
    val wantIds = (0L until 120L).filter(_ % 13 != 0)
    assert(rows.map(_.getLong(0)).toSeq == wantIds)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getLong(9)) == wantLayers(id), s"id $id")
    }
    // the fixture genuinely exercises all three layers, all three
    // versions, and at least one VBRI stream
    val byLayer = rows.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(byLayer.keySet == Set(1L, 2L, 3L))
    assert(rows.map(_.getLong(2)).distinct.toSet == Set(10L, 20L, 25L))
    assert(rows.exists(_.getLong(7) == 2L), "no VBRI stream in fixture")
  }

  test("layer fixture: every strict prefix parses-or-quarantines; mutations never throw") {
    for (id <- Seq(2L, 5L, 14L, 35L)) { // VBRI carrier, L3/v2.5, L1, L2
      val full = Mp3.buildFixtureLayers(id)
      for (n <- 0 until full.length) {
        Mp3.parseFrames(full.take(n)) match {
          case Some(fs) => assert(fs.map(_.frameBytes).sum == n)
          case None =>
        }
      }
      for (p <- 0 until math.min(full.length, 400); delta <- Seq(1, 0x80)) {
        val mut = full.clone(); mut(p) = (mut(p) + delta).toByte
        assert(Mp3.parseStreamInfo(mut) == Mp3.parseStreamInfo(mut))
      }
    }
  }

  test("mixed-layer chains quarantine; VBRI only reads on MPEG-1 Layer III") {
    // a Layer III frame followed by a Layer II frame: frames parse but
    // the rollup is ambiguous -> parseStreamInfo quarantines
    val l3 = Mp3.buildFrameVL(10, 3, 5, 0, padded = false, 0, _ => 0)
    val l2 = Mp3.buildFrameVL(10, 2, 5, 0, padded = false, 0, _ => 0)
    assert(Mp3.parseFrames(l3 ++ l2).exists(_.map(_.layer) == Seq(3, 2)))
    assert(Mp3.parseStreamInfo(l3 ++ l2).isEmpty)
    // a bare VBRI record (zero fields) reads as vbr_kind 2 on the
    // MPEG-1 Layer III path...
    val tight = Mp3.buildFrameVL(10, 3, 1, 0, padded = false, 0, i =>
      if (i >= 36 && i < 40) "VBRI".charAt(i - 36).toByte else 0)
    assert(Mp3.parseStreamInfo(tight).exists(s =>
      s.vbrKind == 2 && s.hasVbr && s.vbrFrames == 0 && s.vbrBytes == 0))
    // ...but the same bytes at the same offset in a Layer II frame are
    // payload, not a header (the published layout is Layer III only)
    val l2vbri = Mp3.buildFrameVL(10, 2, 1, 0, padded = false, 0, i =>
      if (i >= 36 && i < 40) "VBRI".charAt(i - 36).toByte else 0)
    assert(Mp3.parseStreamInfo(l2vbri).exists(s => !s.hasVbr && s.vbrKind == 0))
    // and a truncated carrier frame quarantines whole
    assert(Mp3.parseStreamInfo(tight.take(50)).isEmpty)
  }
}
