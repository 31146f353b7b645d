package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed HNSW: partitioned build + broadcast probe.
  *
  * The reference is a single-process index capped at 1e6 vectors
  * (reference core/hnsw/graph.py:54, :129-130). The Spark design removes the
  * cap by sharding: each partition builds an independent sub-index over its
  * rows (`mapPartitions`, embarrassingly parallel, no shuffle beyond the
  * initial repartition), and a query probes every sub-index and merges the
  * per-shard top-k — the same union → sort → limit shape Spark's
  * TakeOrderedAndProject uses. Probing all shards with the same ef keeps
  * recall at least as high as one big index probed once.
  *
  * At 100 TB the sub-indexes stay on executors (one per partition,
  * persisted); here they are collected + broadcast, which is the right
  * shape for a serving corpus that fits a broadcast (≤ ~1 GB). Build is
  * O(N log N / P) per partition with zero cross-partition traffic.
  */
object HnswSpark {

  final case class Params(
      dim: Int,
      m: Int = 16,
      efConstruction: Int = 200,
      efSearch: Int = 50,
      metric: String = "cosine")

  /** Build one sub-index per partition. Input df must have (idCol: LONG,
    * vecCol: ARRAY<DOUBLE>). Returns the sub-indexes (one per non-empty
    * partition).
    */
  def build(
      df: DataFrame,
      params: Params,
      numPartitions: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Array[HnswIndex] = {
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .repartition(numPartitions, col(idCol))
      .rdd
      .mapPartitionsWithIndex { (pid, rows) =>
        val idx = new HnswIndex(
          params.dim, params.m, params.efConstruction, params.efSearch,
          params.metric, seed = 42L + pid)
        rows.foreach { r =>
          val vec = r.getSeq[Double](1).toArray
          idx.insert(r.getLong(0), vec)
        }
        if (idx.size > 0) Iterator.single(idx) else Iterator.empty
      }
      .collect()
  }

  /** Incremental maintenance of a built index — the reference's online
    * insert/delete (A1/A3, reference api/rest/server.py:136-157, :188-200)
    * applied to the sharded artifact instead of rebuilding:
    * inserts route to the currently-smallest shard (any shard is correct —
    * search probes all of them), duplicate external ids overwrite in place
    * (graph.py:131-139), deletes tombstone wherever the id lives and
    * report false for unknown ids (graph.py:193-194).
    * Mutates the in-memory shards; persist with HnswPersistence to make
    * the new state durable. Returns (inserted, deleted, deleteMisses).
    */
  def applyMutations(
      indexes: Array[HnswIndex],
      inserts: Seq[(Long, Array[Double])],
      deletes: Seq[Long]): (Int, Int, Int) = {
    var ins = 0
    inserts.foreach { case (id, vec) =>
      // overwrite in place if the id exists somewhere; else smallest shard
      val owner = indexes.find(_.containsId(id))
        .getOrElse(indexes.minBy(_.size))
      owner.insert(id, vec)
      ins += 1
    }
    var del = 0; var miss = 0
    deletes.foreach { id =>
      if (indexes.exists(ix => ix.containsId(id) && ix.delete(id))) del += 1
      else miss += 1
    }
    (ins, del, miss)
  }

  /** Round a distance like the exact path's roundDist does: 6 decimals,
    * HALF_UP (Spark's `round`), -0.0 normalized — so HNSW distances diff
    * cleanly against exact-operator distances for the same pair.
    */
  def roundDist6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0

  /** Probe all sub-indexes for one query and merge top-k. */
  def searchAll(
      indexes: Seq[HnswIndex], q: Array[Double], k: Int, ef: Option[Int] = None)
    : Seq[(Long, Double)] =
    indexes
      .flatMap(_.search(q, k, ef))
      .sortBy { case (id, d) => (d, id) }
      .take(k)

  /** Single-query serving variant: probe the shards concurrently. Use for
    * latency-sensitive point lookups; in batched searchDf the parallelism
    * already comes from query rows across tasks, so the sequential probe
    * avoids oversubscription there. Same results as searchAll.
    */
  def searchAllPar(
      indexes: IndexedSeq[HnswIndex], q: Array[Double], k: Int,
      ef: Option[Int] = None): Seq[(Long, Double)] = {
    val per = java.util.stream.IntStream.range(0, indexes.length).parallel()
      .mapToObj(i => indexes(i).search(q, k, ef))
      .collect(java.util.stream.Collectors.toList[Seq[(Long, Double)]])
    var merged = Seq.empty[(Long, Double)]
    per.forEach(s => merged = merged ++ s)
    merged.sortBy { case (id, d) => (d, id) }.take(k)
  }

  /** DataFrame-shaped batched search: broadcast the sub-indexes, probe per
    * query row on executors. Output: (query_id, vec_id, distance).
    */
  def searchDf(
      spark: SparkSession,
      bc: Broadcast[Array[HnswIndex]],
      queries: DataFrame, // (query_id LONG, qv ARRAY<DOUBLE>)
      k: Int,
      ef: Option[Int] = None): DataFrame = {
    import spark.implicits._
    queries
      .select(col("query_id").cast("long"), col("qv").cast("array<double>"))
      .as[(Long, Seq[Double])]
      .flatMap { case (qid, qv) =>
        searchAll(bc.value.toSeq, qv.toArray, k, ef)
          .map { case (id, d) => (qid, id, roundDist6(d)) }
      }
      .toDF("query_id", "vec_id", "distance")
  }
}
