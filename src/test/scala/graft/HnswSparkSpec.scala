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

  test("incremental insert/overwrite/delete on a built index (A1/A3 parity)") {
    val emb = Tables.embeddings(spark, sfDir)
    val indexes = HnswSpark.build(emb, HnswSpark.Params(dim = 64), numPartitions = 3)
    val before = indexes.map(_.size).sum

    // insert two new vectors; one overwrites an existing id
    val novel = Array.fill(64)(9.9)
    val (ins, del, miss) = HnswSpark.applyMutations(
      indexes,
      inserts = Seq(100000L -> novel, 0L -> novel),
      deletes = Seq(7L, 999999L))
    assert((ins, del, miss) == (2, 1, 1)) // 999999 unknown → miss (graph.py:193-194)
    assert(indexes.map(_.size).sum == before + 1 - 1) // +new, overwrite, -deleted

    // the new vector is its own nearest neighbor; overwritten id moved too
    val hits = HnswSpark.searchAll(indexes.toSeq, novel, 3).map(_._1)
    assert(hits.take(2).toSet == Set(100000L, 0L)) // both sit at the same point
    // deleted id no longer appears anywhere
    val q7 = emb.where(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Double](0).toArray
    assert(!HnswSpark.searchAll(indexes.toSeq, q7, 20).map(_._1).contains(7L))
    // round-trip through persistence keeps the mutated state
    val dir = java.nio.file.Files.createTempDirectory("hnsw_mut").toString
    graft.index.HnswPersistence.save(spark, indexes, dir)
    val reloaded = graft.index.HnswPersistence.load(spark, dir)
    assert(HnswSpark.searchAll(reloaded.toSeq, novel, 2).map(_._1).toSet
      == Set(100000L, 0L))
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
