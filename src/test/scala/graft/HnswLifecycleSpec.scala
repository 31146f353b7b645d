package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.index.{HnswIndex, HnswPersistence, HnswSpark}

/** End-to-end index lifecycle: mutations → compaction → persistence →
  * reload → continued construction, including the round-2 guarantee that
  * a reloaded index RESUMES the level-RNG stream rather than replaying it.
  */
class HnswLifecycleSpec extends SparkSpec {

  private def vec(rnd: java.util.Random, d: Int) = Array.fill(d)(rnd.nextGaussian())

  test("reloaded index resumes the level-RNG stream: future inserts match") {
    val dim = 8
    val rnd = new java.util.Random(3L)
    val original = new HnswIndex(dim, seed = 77L)
    (0 until 60).foreach(i => original.insert(i.toLong, vec(rnd, dim)))

    val clone = HnswIndex.fromExport(
      dim, original.m, original.efConstruction, original.efSearch,
      original.metric,
      original.exportNodes.toSeq, original.exportEdges.toSeq,
      original.entryPointId, original.seed, original.levelDraws)

    // identical post-reload insert batch must draw identical levels and
    // produce identical graphs (same seed + same RNG position)
    val more = (60 until 90).map(i => i.toLong -> vec(rnd, dim))
    // the same vectors must go to both, so materialize first
    more.foreach { case (id, v) => original.insert(id, v) }
    more.foreach { case (id, v) => clone.insert(id, v) }
    assert(original.exportNodes.map(t => (t._1, t._3)).toSeq ==
      clone.exportNodes.map(t => (t._1, t._3)).toSeq, "levels diverged")
    val q = vec(new java.util.Random(9L), dim)
    assert(original.search(q, 10) == clone.search(q, 10))
  }

  test("mutate -> compact -> persist -> reload preserves search results") {
    val emb = Tables.embeddings(spark, sfDir)
    val shards = HnswSpark.build(emb, HnswSpark.Params(dim = 64), numPartitions = 4)

    // online mutations: overwrite 5 ids, delete 5, insert 5 fresh
    val rnd = new java.util.Random(5L)
    val inserts = (0L until 5L).map(id => id -> vec(rnd, 64)) ++
      (1000L until 1005L).map(id => id -> vec(rnd, 64))
    val (ins, del, miss) = HnswSpark.applyMutations(
      shards, inserts, deletes = (5L until 10L) ++ Seq(99999L))
    assert(ins == 10 && del == 5 && miss == 1)

    val compacted = shards.map(_.compacted())
    assert(compacted.map(_.deadCount).sum == 0)

    val path = Files.createTempDirectory("graft_lifecycle").toString
    HnswPersistence.save(spark, compacted, path)
    val reloaded = HnswPersistence.load(spark, path)

    val q = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") === 42).select(col("embedding"))
      .collect()(0).getAs[scala.collection.Seq[Double]](0).toArray
    val before = HnswSpark.searchAll(compacted.toSeq, q, 10)
    val after = HnswSpark.searchAll(reloaded.toSeq, q, 10)
    assert(before == after, s"before=$before after=$after")
    // deleted ids are gone, fresh ids are findable
    assert(!reloaded.exists(_.containsId(7L)))
    assert(reloaded.exists(_.containsId(1002L)))
    // and the reloaded shards keep serving writes (RNG resumed per shard)
    val (ins2, _, _) = HnswSpark.applyMutations(
      reloaded, Seq(2000L -> vec(rnd, 64)), Nil)
    assert(ins2 == 1 && reloaded.exists(_.containsId(2000L)))
  }
}
