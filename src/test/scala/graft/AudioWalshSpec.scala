package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Walsh–Hadamard audio face invariants: plain-Scala transform parity
  * on real decoded bytes, basis sanity (DC / constant / alternating
  * signals), quarantine edges, and the DataFrame face shape.
  */
class AudioWalshSpec extends SparkSpec {

  private def refWalsh(samples: Seq[Int], k: Long): Long =
    samples.zipWithIndex.map { case (v, i) =>
      if (java.lang.Long.bitCount(i & k) % 2 == 0) v.toLong else -v.toLong
    }.sum

  /** Independent restatement of the tone fixture's closed form
    * (sawtooth documented at Multimodal.toneSample).
    */
  private def tone(id: Long, i: Int, ch: Int): Int =
    (((id + i.toLong * (17L + 2L * (id % 500L)) + 7919L * ch) % 65536L)
      - 32768L).toInt

  test("coefficients match the reference transform on a decoded tone WAV") {
    val id = 7L
    val bytes = Multimodal.buildWavTone(id, channels = 2, sampleRate = 8000, nSamples = 100)
    val got = Multimodal.decodeWavWalsh(bytes).get
    (0 until 2).foreach { ch =>
      val s = (0 until 64).map(i => tone(id, i, ch))
      val w = got(ch)
      assert((w.wDc, w.w1, w.w2, w.w4) ==
        (refWalsh(s, 0), refWalsh(s, 1), refWalsh(s, 2), refWalsh(s, 4)))
    }
  }

  test("alternating full-scale signal puts all energy in W_1") {
    // s(n) = (-1)^n * 1000: W_1 = 64 * 1000, every other coefficient 0
    val header = Multimodal.buildWav(1, 8000, 16, 64)
    val out = header.clone()
    (0 until 64).foreach { i =>
      val v = if (i % 2 == 0) 1000 else -1000
      out(44 + 2 * i) = (v & 0xff).toByte
      out(44 + 2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val w = Multimodal.decodeWavWalsh(out).get.head
    assert((w.wDc, w.w1, w.w2, w.w4) == (0L, 64000L, 0L, 0L))
  }

  test("constant signal is pure DC") {
    val header = Multimodal.buildWav(1, 8000, 16, 64)
    val out = header.clone()
    (0 until 64).foreach { i =>
      out(44 + 2 * i) = 5.toByte; out(44 + 2 * i + 1) = 0.toByte
    }
    val w = Multimodal.decodeWavWalsh(out).get.head
    assert((w.wDc, w.w1, w.w2, w.w4) == (320L, 0L, 0L, 0L))
  }

  test("quarantine: short clips, truncation, and non-WAV bytes") {
    val short = Multimodal.buildWavTone(3L, 1, 8000, 63) // one frame under the block
    assert(Multimodal.decodeWavWalsh(short).isEmpty)
    val full = Multimodal.buildWavTone(3L, 1, 8000, 100)
    assert(Multimodal.decodeWavWalsh(full.take(80)).isEmpty)
    assert(Multimodal.decodeWavWalsh("not a wav".getBytes).isEmpty)
  }

  test("windowed stats match a reference per-window recount of the tone") {
    val id = 11L
    val bytes = Multimodal.buildWavTone(id, channels = 2,
      sampleRate = 8000, nSamples = 300) // 4 full windows
    val got = Multimodal.decodeWavWalshWindows(bytes).get
    (0 until 2).foreach { ch =>
      val perWin = (0 until 300 / 64).map { w =>
        val s = (0 until 64).map(i => tone(id, w * 64 + i, ch))
        Seq(0L, 1L, 2L, 4L).map(k => math.abs(refWalsh(s, k)))
      }
      val want = (0 until 4).map(m =>
        (perWin.map(_(m)).sum, perWin.map(_(m)).max))
      val g = got(ch)
      assert(g.nWindows == 300 / 64)
      assert(Seq((g.eDcSum, g.eDcMax), (g.e1Sum, g.e1Max),
        (g.e2Sum, g.e2Max), (g.e4Sum, g.e4Max)) == want, s"channel $ch")
    }
  }

  test("planted alternating tone concentrates windowed energy in bin 1") {
    // s(n) = (-1)^n * 800 across 5 full windows: every window's |W_1|
    // = 64*800, every other bin exactly 0 — sums and maxima follow
    val header = Multimodal.buildWav(1, 8000, 16, 320)
    val out = header.clone()
    (0 until 320).foreach { i =>
      val v = if (i % 2 == 0) 800 else -800
      out(44 + 2 * i) = (v & 0xff).toByte
      out(44 + 2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val s = Multimodal.decodeWavWalshWindows(out).get.head
    assert(s.nWindows == 5L)
    assert((s.eDcSum, s.eDcMax) == (0L, 0L))
    assert((s.e1Sum, s.e1Max) == (5L * 64 * 800, 64L * 800))
    assert((s.e2Sum, s.e2Max) == (0L, 0L))
    assert((s.e4Sum, s.e4Max) == (0L, 0L))
  }

  test("windowed quarantine: short clips and every truncation never throw") {
    assert(Multimodal.decodeWavWalshWindows(
      Multimodal.buildWavTone(3L, 1, 8000, 63)).isEmpty)
    val full = Multimodal.buildWavTone(3L, 1, 8000, 130) // 2 windows
    val whole = Multimodal.decodeWavWalshWindows(full)
    assert(whole.exists(_.head.nWindows == 2L))
    (0 until full.length by 3).foreach { n =>
      Multimodal.decodeWavWalshWindows(full.take(n)) // None or fewer windows, never a throw
    }
  }

  test("face emits one row per channel with the smaller-k dominance rule") {
    import spark.implicits._
    val media = Seq(
      (1L, "audio/wav", Multimodal.buildWavTone(1L, 2, 8000, 100)),
      (2L, "audio/wav", Multimodal.buildWavTone(2L, 1, 8000, 64)),
      (3L, "audio/wav", Array[Byte](1, 2, 3))) // quarantined
      .toDF("media_id", "media_type", "content")
    val rows = Multimodal.extractAudioWalsh(spark, media).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (1L, 1), (2L, 0)))
    rows.foreach { r =>
      val (w1, w2, w4) = (r.getLong(3), r.getLong(4), r.getLong(5))
      val want =
        if (math.abs(w1) >= math.abs(w2) && math.abs(w1) >= math.abs(w4)) 1L
        else if (math.abs(w2) >= math.abs(w4)) 2L
        else 4L
      assert(r.getLong(6) == want)
    }
  }
}
