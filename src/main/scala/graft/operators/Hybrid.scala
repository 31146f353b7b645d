package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Hybrid lexical + semantic retrieval via reciprocal rank fusion
  * (Cormack, Clarke & Buettcher 2009, "Reciprocal Rank Fusion
  * outperforms Condorcet and individual Rank Learning Methods"): rank
  * the corpus twice — an Okapi BM25 leg over the query's terms and a
  * cosine-distance leg over the query's embedding — truncate each leg
  * to its top-legK, and fuse by RRF(d) = Σ_legs 1/(rrfK + rank_leg(d)).
  * The engine's two retrieval families ([[Ranking]] and [[Knn]])
  * composed into the serving shape RAG stacks actually deploy; the
  * reference has only the vector half.
  *
  * Scale shape: each leg ends in a BOUNDED top-k
  * (TakeOrderedAndProject — per-partition heaps, no global sort), so
  * the only frames past the legs are ≤ legK rows; the rank windows and
  * the full-outer fusion join run on those bounded frames (the
  * PrefixSum small-path precedent: below a bound, one partition IS the
  * right plan). Upstream, the lexical leg reuses [[Ranking.tfDfCorpus]]
  * — one (doc, token) shuffle, query terms broadcast — and the vector
  * leg is the knn_cosine plan. Both legs and the fusion are
  * deterministic (rounded scores, id tie-breaks), hence oracle-checked.
  */
object Hybrid {

  /** Fused top-N: (doc_id, fused, lex_rank, vec_rank); rank 0 = the doc
    * missed that leg's top-legK (its RRF contribution is 0 — standard
    * truncated-list RRF). Query = doc `queryDocId`'s text for the
    * lexical leg and embedding `queryDocId` for the vector leg (the
    * fixtures' aligned id domains).
    */
  def rrfHybridSearch(
      docs: DataFrame,
      emb: DataFrame,
      queryDocId: Long = 0L,
      legK: Int = 50,
      rrfK: Int = 60,
      topN: Int = 10,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val lex = rankLeg(lexScores(docs, queryDocId, k1, b),
      col("s").desc, "lex_rank", legK)
    val vec = rankLeg(vecDistances(emb, queryDocId),
      col("d").asc, "vec_rank", legK)
    val contribution = (rank: Column) =>
      when(rank.isNull, lit(0.0)).otherwise(lit(1.0) / (lit(rrfK) + rank))
    lex.select(col("doc_id"), col("lex_rank"))
      .join(vec.select(col("doc_id"), col("vec_rank")), Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        round(contribution(col("lex_rank")) + contribution(col("vec_rank")), 6)
          .as("fused"),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
      .orderBy(col("fused").desc, col("doc_id"))
      .limit(topN)
  }

  /** Per-doc BM25 relevance against the query doc's DISTINCT terms:
    * (doc_id, s). Per-term scores sum UNROUNDED and round once — the
    * 6-decimal hash is then stable under both engines' sum orders.
    */
  private def lexScores(
      docs: DataFrame, queryDocId: Long, k1: Double, b: Double): DataFrame = {
    val (tf, df, corpus) = Ranking.tfDfCorpus(docs)
    val qterms = docs.where(col("doc_id") === queryDocId)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .distinct()
    tf.join(broadcast(qterms), Seq("token"))
      .join(df, Seq("token"))
      .crossJoin(broadcast(corpus))
      .groupBy(col("doc_id"))
      .agg((round(sum(Ranking.termScore(k1, b)), 6) + 0.0).as("s"))
  }

  /** Cosine distance of every vector to the query embedding:
    * (doc_id, d) — the knn_cosine scan shape.
    */
  private def vecDistances(emb: DataFrame, queryDocId: Long): DataFrame = {
    val q = emb.where(col("vec_id") === queryDocId)
      .select(col("embedding").as("qv"))
    emb.crossJoin(broadcast(q))
      .select(
        col("vec_id").as("doc_id"),
        VectorFunctions.roundDist(
          VectorFunctions.cosine(col("embedding"), col("qv"))).as("d"))
  }

  /** Truncate a scored leg to its top-legK (bounded TakeOrderedAndProject)
    * and attach 1-based ranks — the window runs on the ≤ legK-row frame.
    */
  private def rankLeg(
      scored: DataFrame, order: Column, rankName: String, legK: Int): DataFrame = {
    val tieBroken = scored.orderBy(order, col("doc_id")).limit(legK)
    tieBroken.withColumn(
      rankName,
      row_number().over(Window.orderBy(order, col("doc_id"))).cast("long"))
  }
}
