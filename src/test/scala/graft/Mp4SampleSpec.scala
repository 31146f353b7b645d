package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{Mp4TrackSpec, Mp4TrackStats}

/** ISO BMFF sample-table decode (stts/stss/stsz/stco): pinned-fixture
  * parsing (bytes written from ISO/IEC 14496-12 §8.6/§8.7 by hand, NOT
  * via the builder, so a mirrored builder/parser bug cannot
  * self-certify), builder round-trips against independently computed
  * aggregates, truncation/corruption fuzz, and the Spark face.
  */
class Mp4SampleSpec extends SparkSpec {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // ftyp + moov(trak(mdia(mdhd ts=600 dur=300, minf(stbl(
  //   stsd[opaque], stts[(3,100)], stss[1,3], stsz[0;10,20,30],
  //   stco[0x1000])))))  — hand-assembled, sizes computed on paper
  private val pinned = hex(
    "00000010 66747970 69736f6d 6d703431" + // ftyp isom mp41
    "000000BC 6d6f6f76" +                   // moov (188)
    "000000B4 7472616B" +                   // trak (180)
    "000000AC 6d646961" +                   // mdia (172)
    "00000020 6d646864 00000000 00000000 00000000 00000258 0000012C 55C40000" +
    "00000084 6d696e66" +                   // minf (132)
    "0000007C 7374626C" +                   // stbl (124)
    "00000010 73747364 00000000 00000001" + // stsd (opaque to the walk)
    "00000018 73747473 00000000 00000001 00000003 00000064" +
    "00000018 73747373 00000000 00000002 00000001 00000003" +
    "00000020 7374737A 00000000 00000000 00000003 0000000A 00000014 0000001E" +
    "00000014 7374636F 00000000 00000001 00001000")

  test("pinned hand-assembled stbl parses to the paper-computed stats") {
    // no tkhd in the pinned fixture: display size reads as 0x0 (absent)
    assert(Multimodal.parseMp4SampleTables(pinned) ===
      Seq(Mp4TrackStats(1, 600, 3, 60, 30, 300, 2, 1, 0, 0)))
  }

  test("pinned fixture: every truncation length parses without throwing") {
    for (len <- 0 to pinned.length) {
      val r = Multimodal.parseMp4SampleTables(pinned.take(len))
      if (len < pinned.length) assert(r.isEmpty, s"partial parse at $len")
    }
  }

  private def fixtureTracks(id: Long): Seq[Mp4TrackSpec] = {
    val ns = (24 + id % 120).toInt
    val video = Mp4TrackSpec("vide", 600 * (1 + (id % 2)).toInt,
      Seq((ns / 2, 100), (ns - ns / 2, 150)), 0,
      (0 until ns).map(i => 200 + ((id + i) % 50).toInt * 10),
      Some((4 + id % 4).toInt), 8,
      width = (320 + (id % 8) * 160).toInt,
      height = (180 + (id % 8) * 90).toInt)
    if (id % 5 == 0) {
      val ns2 = (50 + id % 100).toInt
      Seq(video,
        Mp4TrackSpec("soun", 8000, Seq((ns2, 160)), 64, Nil, None, 16))
    } else Seq(video)
  }

  test("builder round-trip matches independently computed aggregates") {
    for (id <- Seq(0L, 1L, 5L, 7L, 49L, 119L, 120L, 123L)) {
      val got = Multimodal.parseMp4SampleTables(
        Multimodal.buildMp4Samples(1000, 60000, fixtureTracks(id)))
      val ns = (24 + id % 120).toInt
      val k = (4 + id % 4).toInt
      val sizes = (0 until ns).map(i => 200L + ((id + i) % 50) * 10)
      assert(got.head === Mp4TrackStats(1, 600 * (1 + (id % 2)).toInt,
        ns.toLong, sizes.sum, sizes.max,
        (ns / 2) * 100L + (ns - ns / 2) * 150L,
        ((ns + k - 1) / k).toLong, ((ns + 7) / 8).toLong,
        (320 + (id % 8) * 160).toInt, (180 + (id % 8) * 90).toInt))
      if (id % 5 == 0) {
        val ns2 = (50 + id % 100).toInt
        assert(got(1) === Mp4TrackStats(2, 8000, ns2.toLong, ns2 * 64L,
          64L, ns2 * 160L, ns2.toLong, ((ns2 + 15) / 16).toLong, 0, 0))
        assert(got.size === 2)
      } else assert(got.size === 1)
    }
  }

  test("truncation fuzz over a built stream never throws; corruption quarantines") {
    val b = Multimodal.buildMp4Samples(1000, 60000, fixtureTracks(10L))
    for (len <- 0 to b.length) Multimodal.parseMp4SampleTables(b.take(len))
    // hostile box sizes: zero, negative-as-unsigned, and huge at every
    // 4-byte-aligned offset — must never throw or loop
    for (off <- 0 until b.length - 4 by 4; bad <- Seq(0, 0xFFFFFFFF, 0x7FFFFFF0)) {
      val m = b.clone()
      m(off) = (bad >>> 24).toByte; m(off + 1) = (bad >>> 16).toByte
      m(off + 2) = (bad >>> 8).toByte; m(off + 3) = bad.toByte
      Multimodal.parseMp4SampleTables(m)
    }
    // stts/stsz inconsistency (the §8.6.1 invariant) quarantines the track:
    // bump stts's first run count without touching stsz
    // (id 10 carries two tracks — only the corrupted video track drops)
    val idx = b.indexOfSlice("stts".getBytes("US-ASCII"))
    val m = b.clone(); m(idx + 11) = (m(idx + 11) + 1).toByte
    assert(Multimodal.parseMp4SampleTables(m).map(_.trackIdx) === Seq(2))
  }

  test("a malformed trak is skipped, not fatal to siblings") {
    val two = Multimodal.buildMp4Samples(1000, 60000, fixtureTracks(0L))
    // corrupt the FIRST trak's mdhd version byte → track 1 quarantined
    val idx = two.indexOfSlice("mdhd".getBytes("US-ASCII"))
    val m = two.clone(); m(idx + 4) = 1
    val got = Multimodal.parseMp4SampleTables(m)
    assert(got.map(_.trackIdx) === Seq(2))
  }

  test("video profile: buckets by decoded height, corrupt channel counts planted truncations") {
    val df = Multimodal.videoSampleProfile(spark,
      Multimodal.synthesizeVideoSampleTable(
        spark, Tables.documents(spark, sfDir), corruptEvery = Some(11)))
    val rows = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nDocs = Tables.documents(spark, sfDir).count()
    val ids = (0L until nDocs)
    val live = ids.filterNot(_ % 11 == 0)
    assert(rows("corrupt") === ids.count(_ % 11 == 0).toLong)
    assert(rows("sd") === live.count(_ % 8 <= 3).toLong)       // 180..450
    assert(rows("ed") === live.count(i => i % 8 == 4 || i % 8 == 5).toLong)
    assert(rows("hd") === live.count(_ % 8 >= 6).toLong)       // 720, 810
    assert(rows("no-display") === live.count(_ % 5 == 0).toLong) // audio tracks
    // corrupt bucket carries no parsed stats
    val corrupt = df.where(org.apache.spark.sql.functions.col("bucket") === "corrupt").head()
    assert(corrupt.isNullAt(3) && corrupt.isNullAt(4) && corrupt.isNullAt(5))
  }

  test("Spark face: per-track rows with exact derived columns at sf0.001") {
    val df = Multimodal.extractVideoSampleStats(spark,
      Multimodal.synthesizeVideoSampleTable(spark, Tables.documents(spark, sfDir)))
    val rows = df.collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    val rowsById = rows.groupBy(_.getLong(0))
    assert(rowsById.size === nDocs)
    rows.foreach { r =>
      val id = r.getLong(0)
      if (r.getInt(1) == 1) {
        val ns = (24 + id % 120).toInt
        val mts = 600 * (1 + (id % 2)).toInt
        val sizes = (0 until ns).map(i => 200L + ((id + i) % 50) * 10)
        val dur = (ns / 2) * 100L + (ns - ns / 2) * 150L
        assert(r.getLong(3) === ns.toLong)
        assert(r.getLong(4) === sizes.sum)
        assert(r.getLong(7) === dur * 1000L / mts)            // duration_ms
        assert(r.getLong(8) === sizes.sum * 8L * mts / dur)   // bitrate_bps
        assert(r.getInt(12) === (320 + (id % 8) * 160).toInt) // width
        assert(r.getInt(13) === (180 + (id % 8) * 90).toInt)  // height
      } else {
        assert(id % 5 === 0)
        val ns2 = (50 + id % 100).toInt
        assert(r.getLong(9) === ns2.toLong)   // keyframe_count (all sync)
        assert(r.getLong(10) === 1L)          // keyframe_interval
      }
    }
  }
}
