package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.index.{HnswPersistence, HnswSpark}

/** S1-S3 parity: save → load round-trip preserves search results exactly
  * (reference core/storage/engine.py rehydrates without reconstruction).
  */
class HnswPersistenceSpec extends SparkSpec {

  test("save/load round-trip: identical search results, stats table works") {
    val emb = Tables.embeddings(spark, sfDir)
    val built = HnswSpark.build(emb, HnswSpark.Params(dim = 64), numPartitions = 3)
    val dir = Files.createTempDirectory("hnsw_persist").toString

    HnswPersistence.save(spark, built, dir)
    assert(HnswPersistence.exists(spark, dir))
    val loaded = HnswPersistence.load(spark, dir)

    assert(loaded.length == built.length)
    assert(loaded.map(_.size).sum == built.map(_.size).sum)
    // identical top-k on several queries — rehydration, not reconstruction
    val queries = emb.where(col("vec_id") < 5)
      .select(col("embedding")).collect().map(_.getSeq[Double](0).toArray)
    queries.foreach { q =>
      val a = HnswSpark.searchAll(built.toSeq, q, 10)
      val b = HnswSpark.searchAll(loaded.toSeq, q, 10)
      assert(a == b)
    }
    // the edge table is queryable as a graph-stats table (O10 analog)
    val stats = HnswPersistence.layerStats(spark, dir).collect()
    assert(stats.nonEmpty)
    assert(stats.filter(_.getAs[Int]("layer") == 0)
      .map(_.getAs[Long]("n_nodes")).sum == emb.count())
  }

  test("exists is false for a missing path (engine.py:125-126 analog)") {
    assert(!HnswPersistence.exists(spark, "/tmp/definitely_missing_hnsw_index"))
  }
}
