package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Adts

class AdtsSpec extends AnyFunSuite {

  test("build → parse round-trips every fixture id's closed form") {
    for (id <- 0L until 60L if id % 13 != 0) {
      val frames = Adts.parseFrames(Adts.buildFixture(id))
      assert(frames.isDefined, s"id $id quarantined")
      val fs = frames.get
      assert(fs.length == 2 + (id % 5).toInt, s"id $id frame count")
      fs.zipWithIndex.foreach { case (f, i) =>
        assert(f.frameIdx == i)
        assert(f.aot == 1 + (id % 3).toInt)
        assert(f.sfi == (id % 13).toInt)
        assert(f.channels == 1 + (id % 3).toInt)
        assert(f.frameBytes == 17 + ((id + 7L * i) % 50).toInt)
      }
    }
  }

  test("planted truncation (every 13th id) quarantines the whole payload") {
    for (id <- Seq(0L, 13L, 26L, 39L))
      assert(Adts.parseFrames(Adts.buildFixture(id)).isEmpty)
  }

  test("every strict prefix quarantines — never throws, never half-emits") {
    val full = Adts.buildFixture(7L)
    for (n <- 0 until full.length) {
      val got = Adts.parseFrames(full.take(n))
      // a prefix that happens to end exactly on a frame boundary is a
      // legal shorter chain; anything else must quarantine
      got match {
        case Some(fs) =>
          assert(fs.map(_.frameBytes).sum == n, s"prefix $n half-emitted")
        case None => // quarantined, fine
      }
    }
  }

  test("bad sync, bad layer, reserved sfi, undersized frame all quarantine") {
    val good = Adts.buildFrame(2, 4, 2, Array.fill(20)(1.toByte))
    assert(Adts.parseFrames(good).map(_.length).contains(1))
    val badSync = good.clone(); badSync(0) = 0x7f.toByte
    assert(Adts.parseFrames(badSync).isEmpty)
    val badLayer = good.clone(); badLayer(1) = (badLayer(1) | 0x02).toByte
    assert(Adts.parseFrames(badLayer).isEmpty)
    // sfi 13 (reserved): byte2 bits [5:2]
    val badSfi = good.clone()
    badSfi(2) = ((badSfi(2) & 0xc3) | (13 << 2)).toByte
    assert(Adts.parseFrames(badSfi).isEmpty)
    // frame_length 7 (header only, empty raw block) is rejected
    val empty = Adts.buildFrame(2, 4, 2, Array.emptyByteArray)
    assert(Adts.parseFrames(empty).isEmpty)
  }

  test("single-byte mutations never throw — parse or quarantine, deterministically") {
    val full = Adts.buildFixture(7L)
    for (p <- full.indices; delta <- Seq(1, 0x80)) {
      val mut = full.clone()
      mut(p) = (mut(p) + delta).toByte
      val a = Adts.parseFrames(mut) // must not throw
      val b = Adts.parseFrames(mut)
      assert(a == b, s"nondeterministic at byte $p delta $delta")
    }
  }

  test("spark faces: per-frame rows and rollup match the closed forms") {
    val spark = SparkSpec.session
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val media = Adts.synthesizeAdtsTable(spark, docs)
    val rows = Adts.extractAdtsInfo(spark, media).collect()
    val wantIds = (0L until 40L).filter(_ % 13 != 0)
    assert(rows.map(_.getLong(0)).distinct.toSeq == wantIds)
    assert(rows.length == wantIds.map(id => 2 + (id % 5).toInt).sum)
    val r = rows.head // id 1: aot 2, sfi 1 → 88200, 2 channels
    assert((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      (1L, 2L, 88200L, 2L))
    val st = Adts.adtsStreamStats(spark, media)
      .where(col("media_id") === 1L).collect().head
    assert(st.getLong(1) == 3L) // 2 + 1%5
    assert(st.getLong(6) == 1024000000L * 3 / 88200) // duration_micros
  }
}
