package graft

import graft.index.{HnswIndex, HnswSpark}

/** Auto-id assignment parity (VERDICT r2 item 7; reference
  * graph.py:131-136): insert-without-id assigns `current_id` monotonically,
  * and an externally-supplied id bumps the counter past itself so auto ids
  * never collide.
  */
class AutoIdSpec extends SparkSpec {

  private def vec(x: Double) = Array.fill(4)(x)

  test("insertAuto assigns monotonic ids; external id bumps the counter") {
    val idx = new HnswIndex(dim = 4)
    assert(idx.nextAutoId == 0L)
    assert(idx.insertAuto(vec(0.1)) == 0L)
    assert(idx.insertAuto(vec(0.2)) == 1L)
    // external id far ahead bumps the counter past itself
    idx.insert(100L, vec(0.3))
    assert(idx.nextAutoId == 101L)
    assert(idx.insertAuto(vec(0.4)) == 101L)
    // external id BEHIND the counter does not regress it
    idx.insert(5L, vec(0.5))
    assert(idx.insertAuto(vec(0.6)) == 102L)
    // overwrite of an existing id doesn't disturb monotonicity
    idx.insert(100L, vec(0.7))
    assert(idx.insertAuto(vec(0.8)) == 103L)
    assert(idx.size == 7) // 0,1,100,101,5,102,103 (100 overwritten in place)
  }

  test("counter survives export -> fromExport (persistence parity)") {
    val idx = new HnswIndex(dim = 4)
    idx.insert(41L, vec(1.0))
    idx.insertAuto(vec(2.0)) // takes 42
    val reloaded = HnswIndex.fromExport(
      4, idx.m, idx.efConstruction, idx.efSearch, idx.metric,
      idx.exportNodes.toSeq, idx.exportEdges.toSeq, idx.entryPointId,
      idx.seed, idx.levelDraws)
    // rebuilt from node ids: next auto id clears every persisted id
    assert(reloaded.nextAutoId == 43L)
    assert(reloaded.insertAuto(vec(3.0)) == 43L)
  }

  test("deleted max id is never re-assigned after reload (persisted next_id)") {
    val idx = new HnswIndex(dim = 4)
    idx.insertAuto(vec(0.1)) // 0
    idx.insertAuto(vec(0.2)) // 1
    idx.delete(1L)           // max id now dead; live nodes imply next=1
    val reloaded = HnswIndex.fromExport(
      4, idx.m, idx.efConstruction, idx.efSearch, idx.metric,
      idx.exportNodes.toSeq, idx.exportEdges.toSeq, idx.entryPointId,
      idx.seed, idx.levelDraws, idx.totalSearches, idx.totalInsertions,
      idx.nextAutoId)
    // without the persisted counter this would re-assign the deleted id 1
    assert(reloaded.nextAutoId == 2L)
    assert(reloaded.insertAuto(vec(0.3)) == 2L)
  }

  test("lifetime counters: searches/insertions count and survive reload (graph.py:72-73)") {
    val idx = new HnswIndex(dim = 4)
    idx.insert(1L, vec(0.1)); idx.insert(2L, vec(0.2))
    idx.insert(1L, vec(0.3)) // overwrite still counts as an insertion
    idx.search(vec(0.1), 1)
    idx.search(vec(0.2), 1)
    assert(idx.totalInsertions == 3L)
    assert(idx.totalSearches == 2L)
    idx.delete(2L) // deletes touch neither counter
    assert((idx.totalSearches, idx.totalInsertions) == (2L, 3L))
    val reloaded = HnswIndex.fromExport(
      4, idx.m, idx.efConstruction, idx.efSearch, idx.metric,
      idx.exportNodes.toSeq, idx.exportEdges.toSeq, idx.entryPointId,
      idx.seed, idx.levelDraws, idx.totalSearches, idx.totalInsertions)
    reloaded.search(vec(0.1), 1)
    assert((reloaded.totalSearches, reloaded.totalInsertions) == (3L, 3L))
  }

  test("sharded insertAuto clears every shard's ids and routes to smallest") {
    val a = new HnswIndex(dim = 4); a.insert(10L, vec(0.1)); a.insert(11L, vec(0.2))
    val b = new HnswIndex(dim = 4); b.insert(500L, vec(0.3))
    val indexes = Array(a, b)
    val id = HnswSpark.insertAuto(indexes, vec(0.4))
    assert(id == 501L) // max counter across shards
    assert(b.containsId(501L)) // smallest shard owned the row
    assert(HnswSpark.insertAuto(indexes, vec(0.5)) == 502L)

    // engineStats surfaces the lifetime counters per shard
    val stats = HnswSpark.engineStats(spark, indexes)
      .orderBy("shard").collect()
    assert(stats.map(_.getAs[Long]("total_insertions")).sum ==
      indexes.map(_.totalInsertions).sum)
    assert(stats.map(_.getAs[Long]("n_vectors")).sum == 5L)
  }
}
