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
