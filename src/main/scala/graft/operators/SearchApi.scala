package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** The reference's REST surface (A1-A6, reference api/rest/server.py) as
  * library functions over DataFrames. The HTTP layer is intentionally
  * absent — a Spark engine's "API" is its callable surface — but the
  * request semantics (validation bounds, dimension checks, failure
  * accounting, defaulted parameters) are preserved exactly.
  */
object SearchApi {

  /** k validation: 1 ≤ k ≤ 1000, default 10 (reference server.py:33
    * `Field(10, ge=1, le=1000)`).
    */
  val DefaultK = 10
  val MaxK = 1000
  def validateK(k: Int): Int = {
    require(k >= 1 && k <= MaxK, s"k must be in [1, $MaxK], got $k")
    k
  }

  /** ef defaults to max(efSearch, k) (reference graph.py:180-181). */
  def effectiveEf(ef: Option[Int], efSearch: Int, k: Int): Int =
    math.max(ef.getOrElse(efSearch), k)

  /** A2 `POST /search`: dim check (400 ≙ IllegalArgumentException), top-k,
    * metadata attach, plus total_searched = corpus size
    * (reference server.py:159-186).
    */
  case class SearchResult(results: DataFrame, totalSearched: Long)

  def search(
      corpus: DataFrame,
      metadata: DataFrame,
      query: DataFrame,
      dim: Int,
      k: Int = DefaultK,
      metric: (Column, Column) => Column = VectorFunctions.cosine): SearchResult = {
    validateK(k)
    val qDim = query.select(size(col("qv"))).head().getInt(0)
    require(qDim == dim, s"Query dimension $qDim doesn't match index dimension $dim")
    SearchResult(
      Knn.knnWithMetadata(corpus, query, metadata, k, metric),
      corpus.count())
  }

  /** A4 `POST /batch_insert`: per-row validation with failure accounting —
    * rows with the wrong dimension are rejected and counted, valid rows
    * are appended (reference server.py:202-230 counts `failed` per item).
    * One distributed pass instead of the reference's sequential loop.
    */
  case class BatchInsertResult(corpus: DataFrame, inserted: Long, failed: Long)

  def batchInsert(
      corpus: DataFrame,
      batch: DataFrame, // (vec_id, embedding, label)
      dim: Int): BatchInsertResult = {
    // (accepted, rejected) from ONE aggregation pass over the batch — a
    // single Spark job, not three (count(when(...)) counts non-nulls).
    val ok = VectorFunctions.hasDim(col("embedding"), dim)
    val counts = batch
      .agg(count(lit(1)).as("total"), count(when(ok, lit(1))).as("accepted"))
      .head()
    val (total, accepted) = (counts.getLong(0), counts.getLong(1))
    BatchInsertResult(corpus.unionByName(batch.where(ok)), accepted, total - accepted)
  }

  /** A6 `GET /health`: liveness + vector count (reference server.py:248-254). */
  def health(corpus: DataFrame): (String, Long) = ("healthy", corpus.count())

  /** Per-batch validation report as a DataFrame — the oracle-checkable
    * face of A4's failure accounting.
    */
  def validationReport(batch: DataFrame, dim: Int): DataFrame =
    batch
      .select(
        when(VectorFunctions.hasDim(col("embedding"), dim), lit("accepted"))
          .otherwise(lit("rejected_dim")).as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("status"))
}
