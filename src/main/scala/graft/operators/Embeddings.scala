package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Embedding-table aggregation utilities — the per-group vector math a
  * labeling/clustering pipeline needs around the ANN operators.
  */
object Embeddings {

  /** Per-group mean embedding (label centroids) in LONG FORM:
    * (group, dim_idx, centroid_val, n_vectors) — one row per dimension
    * instead of an array column, so every output is a plain scalar type
    * (exactly hashable cross-engine) and downstream joins can address
    * single dimensions.
    *
    * Scale shape: posexplode → groupBy(group, dim) with partial (map-
    * side) sum/count — the shuffle key space is groups × dims, never the
    * row count, and no vector is ever folded on a single reducer. Mean
    * rounded to 6 decimals (+0.0 normalization) like every numeric
    * surface here, so float summation-order differences stay far below
    * the comparison precision.
    */
  def labelCentroids(
      df: DataFrame,
      groupCol: String = "label",
      vecCol: String = "embedding"): DataFrame =
    df
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim_idx", "x")))
      .groupBy(col(groupCol), col("dim_idx"))
      .agg(
        (round(avg(col("x")), 6) + lit(0.0)).as("centroid_val"),
        count(lit(1)).as("n_vectors"))
      .select(col(groupCol), col("dim_idx").cast("long").as("dim_idx"),
        col("centroid_val"), col("n_vectors"))
      .orderBy(col(groupCol), col("dim_idx"))

  /** Hard-negative mining for contrastive training: for each anchor,
    * the k NEAREST corpus vectors carrying a DIFFERENT label — the
    * near-misses a triplet/InfoNCE loss learns most from (random
    * negatives are trivially separable; these are not).
    *
    * Scale shape is knnBatch's: anchors broadcast (the small side), the
    * label filter prunes pairs before any distance is computed, and the
    * per-anchor cut is the bounded graft_topk aggregate — map-side k-heap
    * partials, so the shuffle carries k × partitions rows per anchor, and
    * the corpus itself never shuffles. The label join-back runs against
    * the BOUNDED result (k × anchors rows, broadcast), not the corpus.
    *
    * Anchors frame: (query_id, qv, qlabel). Output: (query_id, vec_id,
    * neg_label, distance, rank) ascending by (distance, vec_id) per
    * anchor — deterministic, oracle-checkable.
    */
  /** Batch-hard triplet assembly (the "In Defense of the Triplet Loss"
    * mining rule): per anchor, the HARDEST positive (farthest same-label
    * vector — ties to the smaller id) and the HARDEST negative (nearest
    * different-label vector — same tie rule), plus the margin violation
    * pos_distance − neg_distance (> −α ⇒ the triplet is active at
    * margin α). The pair a training loop feeds straight into a triplet
    * loss.
    *
    * Scale shape: ONE pass over the corpus with anchors broadcast, and
    * BOTH argmins fold in a single aggregate — conditional
    * `max/min(when(...))` over (distance, id) structs skip the
    * other-label rows as nulls, so there is no second scan, no topk
    * buffer, and the shuffle carries one struct pair per anchor per
    * partition. Anchors lacking any same-label (or any different-label)
    * peer emit NULL on that side.
    */
  def batchHardTriplets(
      emb: DataFrame,
      anchors: DataFrame, // columns: query_id, qv, qlabel
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame =
    emb
      .crossJoin(broadcast(anchors))
      .where(col(idCol) =!= col("query_id"))
      .select(
        col("query_id"), col(idCol), col(labelCol), col("qlabel"),
        VectorFunctions.roundDist(
          VectorFunctions.cosine(col(vecCol), col("qv"))).as("d"))
      .groupBy(col("query_id"))
      .agg(
        max(when(col(labelCol) === col("qlabel"),
          struct(col("d").as("d"), (-col(idCol)).as("nid")))).as("p"),
        min(when(col(labelCol) =!= col("qlabel"),
          struct(col("d").as("d"), col(idCol).as("id")))).as("n"))
      .select(
        col("query_id"),
        (-col("p.nid")).as("pos_id"), col("p.d").as("pos_distance"),
        col("n.id").as("neg_id"), col("n.d").as("neg_distance"),
        (round(col("p.d") - col("n.d"), 6) + lit(0.0)).as("margin_violation"))
      .orderBy(col("query_id"))

  def hardNegatives(
      emb: DataFrame,
      anchors: DataFrame, // columns: query_id, qv, qlabel
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val mined = emb
      .crossJoin(broadcast(anchors))
      .where(col(labelCol) =!= col("qlabel") && col(idCol) =!= col("query_id"))
      .select(
        col("query_id"), col(idCol),
        VectorFunctions.roundDist(
          VectorFunctions.cosine(col(vecCol), col("qv"))).as("distance"))
      .groupBy(col("query_id"))
      .agg(VectorFunctions.topK(col("distance"), col(idCol), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "r")))
      .select(
        col("query_id"), col("r.vec_id").as(idCol),
        col("r.distance").as("distance"),
        (col("pos") + 1).cast("long").as("rank"))
    emb.select(col(idCol), col(labelCol).as("neg_label"))
      .join(broadcast(mined), idCol)
      .select(col("query_id"), col(idCol), col("neg_label"),
        col("distance"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
