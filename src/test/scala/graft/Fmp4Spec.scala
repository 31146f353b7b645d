package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fmp4

class Fmp4Spec extends AnyFunSuite {

  private def wantFragments(id: Long): Seq[(Long, Long, Long, Long, Long, Long)] = {
    // (seq, baseTime, n, bytes, dur, usesDefaults) closed forms
    val nFrag = 2 + (id % 4).toInt
    var base = 0L
    (0 until nFrag).map { f =>
      val n = 4 + ((id + f) % 5).toInt
      val (bytes, dur) =
        if (f % 2 == 0)
          ((0 until n).map(i => 100L + (id + 13L * f + i) % 200).sum,
            (0 until n).map(i => 400L + (id + 7L * f + i) % 100).sum)
        else
          (n.toLong * (256 + id % 64), n.toLong * (512 + id % 128))
      val row = (f + 1L, base, n.toLong, bytes, dur,
        if (f % 2 == 0) 0L else 1L)
      base += dur
      row
    }
  }

  test("build → parse round-trips the closed forms, incl. the trex default cascade") {
    for (id <- 0L until 60L if id % 13 != 0) {
      val got = Fmp4.parseFragments(Fmp4.buildFixture(id))
      assert(got.isDefined, s"id $id quarantined")
      val rows = got.get.map(f => (f.sequence, f.baseDecodeTime,
        f.sampleCount, f.totalBytes, f.durationTicks,
        if (f.usesDefaults) 1L else 0L))
      assert(rows == wantFragments(id), s"id $id")
      assert(got.get.forall(_.trackId == 1L))
    }
  }

  test("planted truncation (every 13th id) quarantines the whole payload") {
    for (id <- Seq(0L, 13L, 26L, 39L))
      assert(Fmp4.parseFragments(Fmp4.buildFixture(id)).isEmpty)
  }

  test("every strict prefix quarantines or is a complete shorter chain") {
    val full = Fmp4.buildFixture(5L)
    var legal = 0
    for (n <- 0 until full.length) {
      Fmp4.parseFragments(full.take(n)) match {
        case Some(fs) =>
          // only complete box boundaries BEFORE the first moof (no
          // fragments) or after a full moof+mdat pair may parse
          legal += 1
          assert(fs.length <= wantFragments(5L).length)
        case None => // quarantined
      }
    }
    assert(legal < full.length / 8, s"$legal prefixes parsed — fuzz too lax")
  }

  test("a fragment chain with no moov (so no trex defaults) quarantines") {
    val full = Fmp4.buildFixture(1L) // id 1: fragment 1 inherits defaults
    // strip ftyp+moov: find the first moof
    def boxLen(b: Array[Byte], off: Int) =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
        ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
    var off = 0
    while (new String(full, off + 4, 4, "US-ASCII") != "moof")
      off += boxLen(full, off)
    assert(Fmp4.parseFragments(full.drop(off)).isEmpty)
  }

  test("a traf with trun* ACCUMULATES; a second traf (multi-track) quarantines") {
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def box(t: String, p: Array[Byte]) =
      be32(8 + p.length) ++ t.getBytes("US-ASCII") ++ p
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "isom".getBytes)
    val trex = box("trex", Array[Byte](0, 0, 0, 0) ++ be32(1) ++ be32(1) ++
      be32(100) ++ be32(50) ++ be32(0))
    val moov = box("moov", box("mvex", trex))
    val mfhd = box("mfhd", Array[Byte](0, 0, 0, 0) ++ be32(1))
    val tfhd = box("tfhd", Array[Byte](0, 0, 0, 0) ++ be32(1))
    val tfdt = box("tfdt", Array[Byte](1, 0, 0, 0) ++ be32(0) ++ be32(7))
    // trun 1: 2 samples with explicit sizes 10, 20 (flags 0x200)
    val trun1 = box("trun", Array[Byte](0, 0, 2, 0) ++ be32(2) ++
      be32(10) ++ be32(20))
    // trun 2: 3 samples, no per-sample fields — trex defaults apply
    val trun2 = box("trun", Array[Byte](0, 0, 0, 0) ++ be32(3))
    val traf = box("traf", tfhd ++ tfdt ++ trun1 ++ trun2)
    val one = ftyp ++ moov ++ box("moof", mfhd ++ traf)
    val got = Fmp4.parseFragments(one)
    assert(got.isDefined)
    val f = got.get.head
    assert(f.sampleCount == 5L) // 2 + 3 accumulated
    assert(f.totalBytes == 10 + 20 + 3 * 50L)
    assert(f.durationTicks == 2 * 100L + 3 * 100L) // all durs from trex
    assert(f.usesDefaults && f.baseDecodeTime == 7L)
    // a second traf for the SAME track in one moof is ambiguous: quarantine
    val two = ftyp ++ moov ++ box("moof", mfhd ++ traf ++ traf)
    assert(Fmp4.parseFragments(two).isEmpty)
    // a trun BEFORE the tfhd can't resolve track or defaults: quarantine
    val trafBad = box("traf", trun2 ++ tfhd ++ tfdt)
    assert(Fmp4.parseFragments(
      ftyp ++ moov ++ box("moof", mfhd ++ trafBad)).isEmpty)
    // an adversarial huge sample count with inherited defaults (no
    // per-sample entries to bounds-check) hits the sample ceiling and
    // quarantines instead of overflowing the Long totals
    val trunHuge = box("trun", Array[Byte](0, 0, 0, 0) ++ be32(0x7fffffff))
    val trafHuge = box("traf", tfhd ++ tfdt ++ trunHuge)
    assert(Fmp4.parseFragments(
      ftyp ++ moov ++ box("moof", mfhd ++ trafHuge)).isEmpty)
  }

  private def wantMuxFragments(id: Long)
      : Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    // (f, track, baseTime, n, bytes, dur, usesDefaults) closed forms,
    // ordered (f, track)
    val nFrag = 2 + (id % 4).toInt
    var vBase = 0L; var aBase = 0L
    (0 until nFrag).flatMap { f =>
      val nV = 4 + ((id + f) % 5).toInt
      val (vBytes, vDur) =
        if (f % 2 == 0)
          ((0 until nV).map(i => 100L + (id + 13L * f + i) % 200).sum,
            (0 until nV).map(i => 400L + (id + 7L * f + i) % 100).sum)
        else (nV.toLong * (256 + id % 64), nV.toLong * (512 + id % 128))
      val nA = 6 + ((id + 2L * f) % 7).toInt
      val aDur = nA.toLong * (if (f % 2 == 0) 1024L else 960L)
      val aBytes = nA.toLong *
        (if (f % 2 == 0) 64 + id % 32 else 48 + id % 16)
      val rows = Seq(
        (f.toLong, 1L, vBase, nV.toLong, vBytes, vDur,
          if (f % 2 == 0) 0L else 1L),
        (f.toLong, 2L, aBase, nA.toLong, aBytes, aDur, 1L))
      vBase += vDur; aBase += aDur
      rows
    }
  }

  test("muxed build → parse: one row per (fragment, track), per-track cascade") {
    for (id <- 0L until 60L if id % 13 != 0) {
      val got = Fmp4.parseFragments(Fmp4.buildFixtureMux(id))
      assert(got.isDefined, s"id $id quarantined")
      val rows = got.get.map(f => (f.fragIdx.toLong, f.trackId,
        f.baseDecodeTime, f.sampleCount, f.totalBytes, f.durationTicks,
        if (f.usesDefaults) 1L else 0L))
      assert(rows == wantMuxFragments(id), s"id $id")
      assert(got.get.forall(f => f.sequence == f.fragIdx + 1L))
    }
    for (id <- Seq(0L, 13L, 26L))
      assert(Fmp4.parseFragments(Fmp4.buildFixtureMux(id)).isEmpty)
  }

  test("muxed fixture: every strict prefix parses-or-quarantines, mutations never throw") {
    val full = Fmp4.buildFixtureMux(5L)
    var legal = 0
    for (n <- 0 until full.length) {
      Fmp4.parseFragments(full.take(n)) match {
        case Some(fs) =>
          legal += 1
          assert(fs.length <= wantMuxFragments(5L).length)
        case None =>
      }
    }
    assert(legal < full.length / 8, s"$legal prefixes parsed — fuzz too lax")
    for (p <- full.indices by 3; delta <- Seq(1, 0x80)) {
      val mut = full.clone()
      mut(p) = (mut(p) + delta).toByte
      val a = Fmp4.parseFragments(mut) // must not throw
      val b = Fmp4.parseFragments(mut)
      assert(a == b, s"nondeterministic at byte $p delta $delta")
    }
  }

  test("spark face: muxed table yields per-(fragment, track) rows matching closed forms") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = (0L until 30L).toDF("doc_id")
    val rows = Fmp4.extractFragments(
      spark, Fmp4.synthesizeFmp4MuxTable(spark, docs)).collect()
    val wantIds = (0L until 30L).filter(_ % 13 != 0)
    val want = wantIds.flatMap(id => wantMuxFragments(id).map {
      case (f, track, base, n, bytes, dur, ud) =>
        (id, f, f + 1L, track, base, n, bytes, dur, ud)
    })
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7), r.getLong(8))).toSeq
    assert(got == want)
  }

  test("single-byte mutations never throw — parse or quarantine, deterministically") {
    val full = Fmp4.buildFixture(7L)
    for (p <- full.indices; delta <- Seq(1, 0x80)) {
      val mut = full.clone()
      mut(p) = (mut(p) + delta).toByte
      val a = Fmp4.parseFragments(mut) // must not throw
      val b = Fmp4.parseFragments(mut)
      assert(a == b, s"nondeterministic at byte $p delta $delta")
    }
  }

  test("spark face: per-fragment rows match the closed forms on a fixture table") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = (0L until 30L).toDF("doc_id")
    val rows = Fmp4.extractFragments(
      spark, Fmp4.synthesizeFmp4Table(spark, docs)).collect()
    val wantIds = (0L until 30L).filter(_ % 13 != 0)
    assert(rows.map(_.getLong(0)).distinct.toSeq == wantIds)
    assert(rows.length == wantIds.map(id => 2 + (id % 4).toInt).sum)
    val want = wantIds.flatMap(id => wantFragments(id).zipWithIndex.map {
      case ((seq, base, n, bytes, dur, ud), f) =>
        (id, f.toLong, seq, 1L, base, n, bytes, dur, ud)
    })
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      r.getLong(7), r.getLong(8))).toSeq
    assert(got == want)
  }
}
