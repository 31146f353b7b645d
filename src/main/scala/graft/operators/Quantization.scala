package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Scalar quantization (SQ8) for embedding columns — the standard scale
  * path the reference lacks: it stores float64 vectors only (reference
  * core/storage/engine.py:82), so a 1M×128-d corpus is 1 GB of doubles.
  * SQ8 stores one byte per dimension plus a per-vector (min, max) pair —
  * 8× smaller, which is the difference between a broadcastable serving
  * corpus and one that is not.
  *
  * Encode: code_i = floor((x_i − vmin) / (vmax − vmin) · 255 + 0.5),
  * per-vector min/max. Decode: x̂_i = vmin + code_i/255 · (vmax − vmin).
  * Every step is deterministic IEEE arithmetic, identical in Spark and
  * DuckDB — so unlike most quantizers this one is oracle-checkable.
  * Constant vectors (vmax = vmin) encode to all-zero codes and decode to
  * the constant.
  *
  * Search over quantized vectors is ASYMMETRIC: the full-precision query
  * against decoded corpus vectors — the usual SQ trade (no query-side
  * quantization error).
  */
object Quantization {

  /** (id, vmin, vmax, codes ARRAY<INT>) — the compressed form. */
  def sq8Encode(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    val span = col("vmax") - col("vmin")
    emb
      .select(col(idCol), v.cast("array<double>").as("v"))
      .withColumn("vmin", array_min(col("v")))
      .withColumn("vmax", array_max(col("v")))
      .withColumn("codes",
        when(col("vmax") === col("vmin"), transform(col("v"), _ => lit(0)))
          .otherwise(transform(col("v"),
            x => floor((x - col("vmin")) / span * 255.0 + lit(0.5)).cast("int"))))
      .select(col(idCol), col("vmin"), col("vmax"), col("codes"))
  }

  /** Reconstructed ARRAY<DOUBLE> from (vmin, vmax, codes) columns. */
  def sq8DecodeCol(vmin: Column, vmax: Column, codes: Column): Column =
    transform(codes, c => vmin + c.cast("double") / 255.0 * (vmax - vmin))

  /** Per-vector quantization-error stats vs the original embedding:
    * mean and max |x − x̂|, both bounded by span/510 and span/255.
    */
  def sq8Stats(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val enc = sq8Encode(emb, idCol, vecCol)
    emb
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .join(enc, idCol)
      .withColumn("errs",
        zip_with(col("v"), sq8DecodeCol(col("vmin"), col("vmax"), col("codes")),
          (x, xh) => abs(x - xh)))
      .select(
        col(idCol),
        round(col("vmin"), 6).as("vmin"),
        round(col("vmax"), 6).as("vmax"),
        (round(aggregate(col("errs"), lit(0.0), _ + _) / size(col("errs")), 6) + lit(0.0))
          .as("mean_abs_err"),
        (round(array_max(col("errs")), 6) + lit(0.0)).as("max_abs_err"))
      .orderBy(col(idCol))
  }

  /** Top-k by euclidean distance of the full-precision query against the
    * DECODED corpus — the asymmetric-distance search. Same plan shape as
    * Knn.knn (broadcast query, TakeOrderedAndProject).
    */
  def sq8Knn(
      emb: DataFrame,
      query: DataFrame, // one row, col "qv"
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val enc = sq8Encode(emb, idCol, vecCol)
    enc
      .crossJoin(broadcast(query.select(col("qv").cast("array<double>").as("qv"))))
      .select(
        col(idCol),
        VectorFunctions.roundDist(
          VectorFunctions.euclidean(
            sq8DecodeCol(col("vmin"), col("vmax"), col("codes")), col("qv")))
          .as("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }
}
