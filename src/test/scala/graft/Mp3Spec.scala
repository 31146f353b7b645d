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
}
