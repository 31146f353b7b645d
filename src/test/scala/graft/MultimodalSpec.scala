package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Binary-column plumbing: the decoder path must agree with the native
  * (codegen'd) path on the features both can compute, and be deterministic.
  */
class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.synthesizeMediaTable(Tables.documents(spark, sfDir))

  test("decoder-path md5/n_bytes match the native binaryStats path") {
    val native = Multimodal.binaryStats(media)
      .select("media_id", "n_bytes", "content_md5")
    val decoded = Multimodal
      .extractFeatures(spark, media, Multimodal.DeterministicFakeDecoder)
      .select("media_id", "n_bytes", "content_md5")
    assert(native.exceptAll(decoded).count() == 0)
    assert(decoded.exceptAll(native).count() == 0)
  }

  test("frame sampling reassembles to the original payload length") {
    import spark.implicits._
    val one = Seq((1L, "text/plain", ("x" * 700).getBytes("UTF-8")))
      .toDF("media_id", "media_type", "content")
    // every=1 keeps all frames: 700 bytes at 256/frame → 256+256+188
    val frames = Multimodal.frameSample(one, frameBytes = 256, every = 1).collect()
    assert(frames.map(_.getAs[Long]("frame_bytes")).toSeq == Seq(256L, 256L, 188L))
    // every=2 keeps frames 0 and 2
    val sampled = Multimodal.frameSample(one, frameBytes = 256, every = 2).collect()
    assert(sampled.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
  }

  test("resize preserves aspect ratio and never upscales") {
    val features = Multimodal.extractFeatures(spark, media, Multimodal.DeterministicFakeDecoder)
    val resized = Multimodal.resizeMeta(features, maxSide = 64)
      .join(features, "media_id").collect()
    resized.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (rw, rh) = (r.getAs[Int]("resized_w"), r.getAs[Int]("resized_h"))
      assert(math.max(rw, rh) <= 64)
      assert(rw <= w && rh <= h) // never upscale
      // aspect ratio preserved within rounding
      assert(math.abs(rw.toDouble / rh - w.toDouble / h) < 0.1)
    }
  }

  test("fake decode is deterministic and shapes are sane") {
    val f1 = Multimodal.extractFeatures(spark, media, Multimodal.DeterministicFakeDecoder)
    val rows = f1.orderBy("media_id").limit(5).collect()
    assert(rows.forall { r =>
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      w >= 64 && w < 128 && h >= 64 && h < 128 &&
        r.getAs[Seq[Float]]("embedding").length == 8
    })
    val f2 = Multimodal.extractFeatures(spark, media, Multimodal.DeterministicFakeDecoder)
    assert(f1.exceptAll(f2).count() == 0)
  }
}
