package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Exact k-nearest-neighbor operators — the oracle-checkable query surface of
  * the reference's search API (reference: core/hnsw/graph.py:175-189 `search`,
  * api/rest/server.py:159-186 `POST /search`).
  *
  * Scale design: `orderBy(distance).limit(k)` plans as
  * `TakeOrderedAndProjectExec` — a per-partition top-k with a driver-side
  * k-way merge, NOT a global sort. At 100 TB this reads each partition once,
  * keeps k rows per partition in a bounded heap, and shuffles only
  * `k × numPartitions` rows. The query side of every join here is a
  * broadcast (one vector, or a handful), so there is no shuffle of the corpus
  * at all in the single-query path.
  *
  * Determinism: distances are rounded to 6 decimals and ties broken by id
  * ascending BEFORE the limit, so Spark and the DuckDB oracle select the
  * identical row set (FIXTURES.md determinism rules).
  */
object Knn {

  /** Top-k rows of `corpus` nearest to the single query vector in `query`
    * (a 1-row frame with column `qv`). Mirrors reference `search()`
    * semantics: ascending distance, ≤ k rows, empty corpus → empty result
    * (reference graph.py:178-179, :188-189).
    */
  def knn(
      corpus: DataFrame,
      query: DataFrame,
      k: Int,
      metric: (Column, Column) => Column,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    SearchApi.validateK(k) // 1 ≤ k ≤ 1000 on the direct path too (server.py:33)
    corpus
      .crossJoin(broadcast(query))
      .select(
        col(idCol),
        VectorFunctions.roundDist(metric(col(vecCol), col("qv"))).as("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }

  /** kNN then metadata attach — the reference joins top-k results to its
    * metadata store after the search, with `{}` for missing entries
    * (reference api/rest/server.py:170-177 `metadata_store.get(id, {})`).
    * Here: left join, and if the metadata frame carries the schemaless
    * payload column `metadata` (a JSON string ≙ the reference's dict),
    * absent ids coalesce to the empty document `'{}'` — exact parity with
    * the reference's default instead of SQL NULL.
    * The metadata side joins AFTER the limit, so only k rows hit the join —
    * same laziness the reference gets by attaching metadata post-search.
    */
  def knnWithMetadata(
      corpus: DataFrame,
      query: DataFrame,
      metadata: DataFrame,
      k: Int,
      metric: (Column, Column) => Column,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val joined = knn(corpus, query, k, metric, idCol, vecCol)
      .join(broadcast(metadata), Seq(idCol), "left_outer")
    val coalesced =
      if (metadata.columns.contains("metadata"))
        joined.withColumn("metadata", coalesce(col("metadata"), lit("{}")))
      else joined
    coalesced.orderBy(col("distance"), col(idCol))
  }

  /** Batched kNN: many queries × corpus in one pass. Generalizes the
    * reference's one-query-per-request loop (api/rest/server.py:202-230
    * batch path is a sequential per-vector loop) into a single distributed
    * plan: broadcast the query set, compute all pairs, reduce per query
    * with the bounded TopKByDistance aggregate.
    *
    * Scale: queries broadcast (small side) and the corpus never shuffles
    * for the distance computation. The top-k aggregate combines MAP-SIDE,
    * so the shuffle carries at most k × partitions rows per query — a
    * ranking window would shuffle the entire corpus × queries pair frame
    * before ranking.
    */
  def knnBatch(
      corpus: DataFrame,
      queries: DataFrame, // columns: query_id, qv
      k: Int,
      metric: (Column, Column) => Column,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    SearchApi.validateK(k)
    corpus
      .crossJoin(broadcast(queries))
      .select(
        col("query_id"),
        col(idCol),
        VectorFunctions.roundDist(metric(col(vecCol), col("qv"))).as("distance"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topK(col("distance"), col(idCol), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "r")))
      .select(
        col("query_id"),
        col("r.vec_id").as(idCol),
        col("r.distance").as("distance"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Predicate-filtered kNN — an extension beyond the reference (its
    * metadata is attached after top-k and is never filterable, SURVEY §2.5).
    * The filter runs BEFORE the top-k so it prunes at the scan.
    */
  def filteredKnn(
      corpus: DataFrame,
      query: DataFrame,
      predicate: Column,
      k: Int,
      metric: (Column, Column) => Column,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    knn(corpus.where(predicate), query, k, metric, idCol, vecCol)

  /** Range search: all rows within distance `radius` of the query —
    * extension op (SURVEY §2.5 table); a plain filter, fully pushed down.
    */
  def rangeSearch(
      corpus: DataFrame,
      query: DataFrame,
      radius: Double,
      metric: (Column, Column) => Column,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    corpus
      .crossJoin(broadcast(query))
      .select(
        col(idCol),
        VectorFunctions.roundDist(metric(col(vecCol), col("qv"))).as("distance"))
      .where(col("distance") <= radius)
      .orderBy(col("distance"), col(idCol))
  }

  /** Delete = anti-join, the reference's tombstone semantics (reference
    * core/hnsw/graph.py:191-207 removes the node and all edges to it; in a
    * dataset world the visible table simply loses the rows).
    */
  def delete(corpus: DataFrame, deletedIds: DataFrame, idCol: String = "vec_id"): DataFrame =
    corpus.join(deletedIds, Seq(idCol), "left_anti")

  /** Index/corpus statistics — the reference's `get_stats` aggregate
    * (reference core/hnsw/graph.py:209-234: count, max/avg level, per-level
    * connection averages). On the corpus table the analog is per-label
    * count + mean vector norm.
    */
  def stats(corpus: DataFrame, vecCol: String = "embedding"): DataFrame =
    corpus
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(avg(VectorFunctions.norm2(col(vecCol))), 6).as("avg_norm"),
        min(col("vec_id")).as("min_id"),
        max(col("vec_id")).as("max_id"))
      .orderBy(col("label"))
}
