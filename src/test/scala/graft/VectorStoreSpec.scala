package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.VectorStore

/** The REST state machine facade (reference api/rest/server.py:60-254):
  * dim inference on first insert, auto ids, metadata lifecycle, per-item
  * batch fault isolation, '{}' for missing metadata.
  */
class VectorStoreSpec extends AnyFunSuite {

  private def vec(xs: Double*) = xs.toArray

  test("first insert fixes the dimension; mismatches rejected (server.py:140-146)") {
    val store = new VectorStore()
    assert(store.dim.isEmpty)
    store.insert(vec(1, 2, 3))
    assert(store.dim.contains(3))
    val e = intercept[IllegalArgumentException](store.insert(vec(1, 2)))
    assert(e.getMessage.contains("does not match index dimension"))
  }

  test("auto ids, metadata lifecycle, '{}' default (server.py:149-150, :170-177, :190-193)") {
    val store = new VectorStore()
    val a = store.insert(vec(1, 0), metadata = Some("""{"k":1}"""))
    val b = store.insert(vec(0, 1)) // no metadata
    assert((a, b) == (0L, 1L))
    val r = store.search(vec(1, 0), k = 2)
    assert(r.totalSearched == 2)
    assert(r.hits.map(h => (h._1, h._3)) == Seq((a, """{"k":1}"""), (b, "{}")))
    // delete drops the vector AND its metadata; unknown id → false
    assert(store.delete(a))
    assert(!store.delete(999L))
    assert(store.search(vec(1, 0), k = 2).hits.map(_._1) == Seq(b))
    // re-inserting the id starts with fresh (absent → {}) metadata
    store.insert(vec(1, 0), id = Some(a))
    assert(store.search(vec(1, 0), k = 1).hits.head._3 == "{}")
  }

  test("empty store re-infers dimension, keeping counters (server.py:140-141)") {
    val store = new VectorStore()
    val a = store.insert(vec(1, 2, 3))
    store.search(vec(1, 2, 3), k = 1)
    assert(store.delete(a))
    // every vector deleted → next insert may change the dimension
    store.insert(vec(1, 2))
    assert(store.dim.contains(2))
    // lifetime counters and the auto-id stream survived the re-inference
    val (_, searches, insertions, _) = store.stats
    assert((searches, insertions) == ((1L, 2L)))
    assert(store.insert(vec(3, 4)) > a) // ids never reused across the reset
  }

  test("batch insert is per-item fault isolated (server.py:202-230)") {
    val store = new VectorStore()
    val r = store.batchInsert(
      Seq(vec(1, 0), vec(1, 2, 3), vec(0, 1)), // middle row has wrong dim
      ids = Some(Seq(10L)))                     // partial ids: rest auto
    assert(r.failed == 1)
    assert(r.insertedIds == Seq(10L, 11L)) // 10 external, then auto continues
    assert(store.size == 2)
  }

  test("maxElements cap refuses inserts past capacity (graph.py:54, :129-130)") {
    val store = new VectorStore(maxElements = 2)
    store.insert(vec(1, 0)); store.insert(vec(0, 1))
    val e = intercept[IllegalArgumentException](store.insert(vec(1, 1)))
    assert(e.getMessage.contains("Maximum elements (2) reached"))
    assert(store.size == 2)
    // batch inserts past the cap are per-item failures, not batch aborts
    val r = store.batchInsert(Seq(vec(2, 2), vec(3, 3)))
    assert(r.failed == 2 && r.insertedIds.isEmpty)
    // deleting frees capacity again
    assert(store.delete(0L))
    assert(store.insert(vec(1, 1)) == 2L)
  }

  test("search and batch responses carry measured latency_ms (server.py:162,178,206,221)") {
    val store = new VectorStore()
    val b = store.batchInsert(Seq(vec(1, 0), vec(0, 1)))
    assert(b.latencyMs >= 0.0)
    val s = store.search(vec(1, 0), k = 1)
    assert(s.latencyMs >= 0.0 && s.hits.nonEmpty)
    // the empty-store short-circuit still reports latency
    assert(new VectorStore().search(vec(1, 0), k = 1).latencyMs >= 0.0)
  }

  test("stats + health surface counters and liveness (server.py:232-254)") {
    val store = new VectorStore()
    assert(store.stats == ((0, 0L, 0L, Seq.empty)))
    store.insert(vec(1, 0)); store.insert(vec(0, 1))
    store.search(vec(1, 0), k = 1)
    val (n, searches, insertions, levels) = store.stats
    assert((n, searches, insertions) == ((2, 1L, 2L)))
    assert(levels.nonEmpty)
    assert(store.health == (("healthy", 2)))
  }

  test("empty store searches return empty, not errors (graph.py:178-179)") {
    val store = new VectorStore()
    val r = store.search(vec(1, 2), k = 5)
    assert(r.hits.isEmpty && r.totalSearched == 0)
  }
}
