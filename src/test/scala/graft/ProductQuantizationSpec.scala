package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Knn, ProductQuantization => PQ}

/** PQ invariants: compression, reproducibility, and ADC recall. */
class ProductQuantizationSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val model = PQ.train(emb, m = 8, k = 16)

  test("codes are one small int per subspace — the 64x compression shape") {
    val enc = PQ.encode(emb, model)
    assert(enc.count() == emb.count())
    val bad = enc.where(
      size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad == 0)
  }

  test("training and encoding are reproducible at a fixed seed") {
    val again = PQ.train(emb, m = 8, k = 16)
    assert(model.codebooks.flatten.flatten.toSeq == again.codebooks.flatten.flatten.toSeq)
  }

  test("self-match survives 64x quantization on the fixture") {
    // near-random high-dim vectors are nearly equidistant, so PQ (like any
    // coarse quantizer) cannot rank strangers there — but the query's own
    // row must still land in its ADC top-10
    val q = emb.where(col("vec_id") === 100)
      .select(col("embedding").cast("array<double>"))
      .collect()(0).getAs[scala.collection.Seq[Double]](0).toArray
    val adc = PQ.adcKnn(PQ.encode(emb, model), model, q, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(adc.contains(100L), adc.toString)
  }

  test("on clustered data: ADC finds the cluster; shortlist+rerank finds the neighbors") {
    import spark.implicits._
    val rnd = new java.util.Random(13L)
    val dim = 32
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian() * 2.0))
    val rows = (0 until 2000).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + 0.2 * rnd.nextGaussian()).toSeq)
    }
    val data = rows.toDF("vec_id", "embedding")
    val m = PQ.train(data, m = 4, k = 32)
    val q = rows(7)._2.toArray
    val exact = Knn.knn(data,
        data.where(col("vec_id") === 7).select(col("embedding").as("qv")),
        10, VectorFunctions.euclidean)
      .collect().map(_.getLong(0)).toSet
    val enc = PQ.encode(data, m)
    // raw ADC: every candidate is from the query's cluster (codebook cells
    // align with clusters; within-cell ranks tie)
    val adc = PQ.adcKnn(enc, m, q, k = 10).collect().map(_.getLong(0))
    assert(adc.forall(id => id % 16 == 7), adc.mkString(","))
    // deployed shape: ADC shortlist of 100 (5% of corpus) + exact re-rank
    val reranked = PQ.adcKnnRerank(enc, data, m, q, k = 10, shortlist = 100)
      .collect().map(_.getLong(0)).toSet
    assert((exact & reranked).size >= 9, s"exact=$exact reranked=$reranked")
  }
}
