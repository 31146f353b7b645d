package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
