package graft

import org.apache.spark.sql.functions._

import graft.operators.{Knn, Quantization}
import graft.functions.VectorFunctions

/** SQ8 scalar quantization invariants. */
class QuantizationSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("codes are bytes: every code in [0, 255], endpoints hit exactly") {
    val enc = Quantization.sq8Encode(emb)
    val bad = enc.where(exists(col("codes"), c => c < 0 || c > 255)).count()
    assert(bad == 0)
    // a non-constant vector's min and max elements map to 0 and 255
    val ends = enc.where(col("vmax") > col("vmin"))
      .where(!array_contains(col("codes"), 0) || !array_contains(col("codes"), 255))
      .count()
    assert(ends == 0)
  }

  test("reconstruction error is bounded by span/510 (+ rounding slack)") {
    // max_abs_err is reported rounded HALF_UP at 6 decimals, so allow 5e-7
    val viol = Quantization.sq8Stats(emb)
      .where(col("max_abs_err") > (col("vmax") - col("vmin")) / 510.0 + 1e-6)
      .count()
    assert(viol == 0)
  }

  test("constant vector encodes to zero codes and decodes exactly") {
    import spark.implicits._
    val const = Seq((1L, Seq(0.5, 0.5, 0.5))).toDF("vec_id", "embedding")
    val enc = Quantization.sq8Encode(const).collect().head
    assert(enc.getAs[scala.collection.Seq[Int]]("codes").toSeq == Seq(0, 0, 0))
    val stats = Quantization.sq8Stats(const).collect().head
    assert(stats.getAs[Double]("max_abs_err") == 0.0)
  }

  test("asymmetric SQ8 top-10 recalls >= 8 of the exact euclidean top-10") {
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val exact = Knn.knn(emb, q, 10, VectorFunctions.euclidean)
      .collect().map(_.getLong(0)).toSet
    val sq = Quantization.sq8Knn(emb, q, 10).collect().map(_.getLong(0)).toSet
    assert((exact & sq).size >= 8, s"exact=$exact sq=$sq")
  }
}
