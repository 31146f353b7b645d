package graft

import org.apache.spark.sql.functions._

import graft.index.{HnswIndex, HnswSpark}
import graft.functions.VectorFunctions
import graft.operators.Knn

/** Partitioned build + broadcast probe against the sf0.001 fixture:
  * recall@10 ≥ 0.9 vs the exact kNN operator (BASELINE.md ANN gate).
  */
class HnswSparkSpec extends SparkSpec {

  test("partitioned HNSW recall@10 >= 0.9 vs exact kNN on sf0.001") {
    val emb = Tables.embeddings(spark, sfDir)
    val params = HnswSpark.Params(dim = 64)
    val indexes = HnswSpark.build(emb, params, numPartitions = 4)
    assert(indexes.length == 4)
    assert(indexes.map(_.size).sum == emb.count())

    val queries = emb.where(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    val recalls = queries.map { case (qid, qv) =>
      val exact = Knn.knn(
        emb,
        emb.where(col("vec_id") === qid).select(col("embedding").as("qv")),
        k = 10, metric = VectorFunctions.cosine)
        .collect().map(_.getLong(0)).toSet
      val approx = HnswSpark.searchAll(indexes.toSeq, qv, 10).map(_._1).toSet
      (exact intersect approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.length
    assert(mean >= 0.9, s"mean recall@10 $mean < 0.9")
  }

  test("searchDf returns k rows per query through the broadcast path") {
    val emb = Tables.embeddings(spark, sfDir)
    val indexes = HnswSpark.build(emb, HnswSpark.Params(dim = 64), numPartitions = 2)
    val bc = spark.sparkContext.broadcast(indexes)
    val queries = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val out = HnswSpark.searchDf(spark, bc, queries, k = 5)
    val counts = out.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.length == 3 && counts.forall(_ == 5))
    // each query's own vector is its nearest neighbor at distance ~0
    val self = out.where(col("query_id") === col("vec_id")).collect()
    assert(self.length == 3 && self.forall(_.getDouble(2) < 1e-5))
  }
}
