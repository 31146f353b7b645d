package graft.index

import scala.collection.mutable

/** The reference server's full mutable state machine (AppState +
  * endpoint semantics, reference api/rest/server.py:60-254) as a single
  * engine facade — the piece of A1-A6 parity the stateless operators
  * can't express:
  *
  *  - the FIRST insert fixes the index dimension (server.py:140-141
  *    `if len(nodes) == 0: graph.dim = len(vector)`); later inserts must
  *    match (HTTP 400 ≙ IllegalArgumentException);
  *  - insert without an id auto-assigns (`current_id`, graph.py:131-136),
  *    and metadata attaches only when provided (server.py:149-150);
  *  - delete reports success=false for unknown ids and removes the
  *    deleted id's metadata (server.py:190-193);
  *  - batch insert is per-item fault-isolated: a bad row is counted in
  *    `failed` and the rest proceed (server.py:202-230);
  *  - search attaches metadata with `{}` for missing entries
  *    (server.py:170-177) and floors ef at k (graph.py:180-181);
  *  - stats surfaces total_vectors + lifetime counters (server.py:232-243),
  *    health surfaces status/total_vectors (server.py:248-254).
  *
  * Metadata is a JSON string ≙ the reference's schemaless dict. For the
  * distributed serving paths use HnswSpark; this facade is the
  * single-index API-parity surface (and what a thin HTTP layer would
  * wrap).
  */
final class VectorStore(
    m: Int = 16,
    efConstruction: Int = 200,
    efSearch: Int = 50,
    metric: String = "cosine",
    maxElements: Int = VectorStore.DefaultMaxElements) {

  private var idx: Option[HnswIndex] = None
  private val metadataStore = mutable.Map.empty[Long, String]

  private def nowMs(): Double = System.nanoTime() / 1e6

  /** Index dimension, once fixed by the first insert. */
  def dim: Option[Int] = idx.map(_.dim)
  def size: Int = idx.map(_.size).getOrElse(0)

  /** A1 `/insert`. Returns the (possibly auto-assigned) id.
    * The reference re-infers the dimension whenever the index is EMPTY
    * (`if len(nodes) == 0: graph.dim = len(vector)`, server.py:140-141)
    * — including after every vector has been deleted — so an empty store
    * accepts any dimension; engine counters and the auto-id stream
    * survive the re-inference (the reference mutates dim on the same
    * graph object, keeping its counters).
    */
  def insert(
      vector: Array[Double],
      id: Option[Long] = None,
      metadata: Option[String] = None): Long = {
    // capacity cap parity (graph.py:54 default 1e6, enforced :129-130
    // with a ValueError): the single-process store refuses inserts past
    // maxElements. The distributed paths (HnswSpark) scope this out —
    // partitioning replaces the per-process RAM cap (SURVEY §4.3).
    require(size < maxElements, s"Maximum elements ($maxElements) reached")
    val index = idx match {
      case Some(i) if i.size > 0 || i.dim == vector.length => i
      case prior =>
        val fresh = new HnswIndex(vector.length, m, efConstruction, efSearch, metric)
        prior.foreach { old =>
          fresh.restoreCounters(old.totalSearches, old.totalInsertions)
          fresh.restoreNextId(old.nextAutoId)
        }
        idx = Some(fresh)
        fresh
    }
    require(
      vector.length == index.dim,
      s"Vector dimension ${vector.length} does not match index dimension ${index.dim}")
    val assigned = id match {
      case Some(x) => index.insert(x, vector); x
      case None => index.insertAuto(vector)
    }
    metadata.foreach(md => metadataStore(assigned) = md)
    assigned
  }

  /** A4 `/batch_insert`: per-item fault isolation — failures counted,
    * survivors inserted — plus the measured `latency_ms` every reference
    * batch response carries (server.py:206,221).
    */
  def batchInsert(
      vectors: Seq[Array[Double]],
      ids: Option[Seq[Long]] = None,
      metadata: Option[Seq[String]] = None): VectorStore.BatchInsertResponse = {
    val t0 = nowMs()
    val inserted = Seq.newBuilder[Long]
    var failed = 0
    vectors.zipWithIndex.foreach { case (v, i) =>
      try {
        val assigned = insert(
          v,
          ids.collect { case xs if i < xs.length => xs(i) },
          metadata.collect { case xs if i < xs.length => xs(i) })
        inserted += assigned
      } catch {
        // per-item try/except parity (server.py:211-219 catches Exception):
        // ANY bad row is counted and the rest of the batch proceeds
        case scala.util.control.NonFatal(_) => failed += 1
      }
    }
    VectorStore.BatchInsertResponse(inserted.result(), failed, nowMs() - t0)
  }

  /** A2 `/search`: (id, distance, metadata-or-'{}') triples, plus
    * total_searched = index size and the measured `latency_ms`
    * (server.py:162,178-186 — the reference's only observability surface).
    */
  def search(
      query: Array[Double],
      k: Int = 10,
      ef: Option[Int] = None): VectorStore.SearchResponse = {
    val t0 = nowMs()
    graft.operators.SearchApi.validateK(k)
    idx match {
      case None => VectorStore.SearchResponse(Seq.empty, 0, nowMs() - t0)
      case Some(index) =>
        require(
          query.length == index.dim,
          s"Query dimension ${query.length} doesn't match index dimension ${index.dim}")
        val hits = index.search(query, k, ef).map { case (id, d) =>
          (id, HnswSpark.roundDist6(d), metadataStore.getOrElse(id, "{}"))
        }
        VectorStore.SearchResponse(hits, index.size, nowMs() - t0)
    }
  }

  /** A3 `/delete`: false for unknown ids; drops the id's metadata. */
  def delete(id: Long): Boolean = {
    val ok = idx.exists(_.delete(id))
    if (ok) metadataStore.remove(id)
    ok
  }

  /** A5 `/stats`: (total_vectors, total_searches, total_insertions,
    * per-level stats).
    */
  def stats: (Int, Long, Long, Seq[(Int, Int, Double)]) =
    idx match {
      case None => (0, 0L, 0L, Seq.empty)
      case Some(i) => (i.size, i.totalSearches, i.totalInsertions, i.levelStats)
    }

  /** A6 `/health`. */
  def health: (String, Int) = ("healthy", size)
}

object VectorStore {

  /** The reference's per-process capacity default (graph.py:54). */
  val DefaultMaxElements: Int = 1000000

  /** A2 response: hits as (id, distance, metadata-or-'{}'), plus
    * total_searched and measured latency_ms (server.py:178-186).
    */
  final case class SearchResponse(
      hits: Seq[(Long, Double, String)],
      totalSearched: Int,
      latencyMs: Double)

  /** A4 response: inserted ids, failed count, latency_ms
    * (server.py:221-230).
    */
  final case class BatchInsertResponse(
      insertedIds: Seq[Long],
      failed: Int,
      latencyMs: Double)
}
