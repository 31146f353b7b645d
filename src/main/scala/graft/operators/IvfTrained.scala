package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** IVF with TRAINED centroids — the production-quality variant of Ivf:
  * centroids come from MLlib k-means (seeded, so builds are reproducible
  * run-to-run) instead of the lowest-id vectors. Trained cells are
  * balanced around the data's actual modes, so recall at the same nProbe
  * is higher than the deterministic variant's — the trade is that k-means
  * involves RNG + iteration order, which no cross-engine oracle can
  * reproduce; quality is therefore spec-gated (recall vs exact), the same
  * contract as HNSW (SURVEY §4.2 determinism rule).
  *
  * Scale shape: k-means training samples/aggregates per-partition
  * (MLlib's distributed Lloyd iterations), the centroid set broadcasts,
  * assignment is one narrow pass, and the probe reads nProbe/nCentroids
  * of the corpus. At 100 TB the assignment would be written once as a
  * table bucketed by cell (sources.Storage.writeBucketed) and probes
  * become pruned scans.
  */
object IvfTrained {

  /** `spherical = true` means the cells were trained on l2-normalized
    * vectors (spherical k-means): euclidean distance on the unit sphere is
    * monotone in cosine distance, so cell geometry matches cosine queries.
    * Use spherical cells for cosine/dot metrics, raw cells for euclidean.
    */
  final case class Model(
      centroids: Array[(Int, Array[Double])],
      spherical: Boolean)

  /** Train `nCentroids` k-means centroids (MLlib, seeded) over the
    * embedding column. Returns the centroid table for broadcast joins.
    */
  def train(
      emb: DataFrame,
      nCentroids: Int,
      spherical: Boolean = false,
      seed: Long = 42L,
      maxIter: Int = 20,
      vecCol: String = "embedding"): Model = {
    val v = col(vecCol).cast("array<double>")
    // ml.functions.array_to_vector is the built-in array→Vector bridge —
    // no Scala UDF at the MLlib boundary
    val feats = emb.select(
      org.apache.spark.ml.functions.array_to_vector(
        if (spherical) VectorFunctions.l2Normalize(v) else v).as("features"))
    val km = new KMeans()
      .setK(nCentroids).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features")
    val model = km.fit(feats)
    Model(model.clusterCenters.zipWithIndex.map { case (c, i) => (i, c.toArray) },
      spherical)
  }

  /** The vector used for cell geometry (normalized iff the model is
    * spherical); the FINAL ranking metric always sees the raw vector.
    */
  private def cellVec(m: Model, v: Column): Column =
    if (m.spherical) VectorFunctions.l2Normalize(v) else v

  private def centDf(emb: DataFrame, m: Model): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    m.centroids.toSeq.toDF("cent_id", "cv")
  }

  /** Nearest-centroid assignment (ties by cent_id): (id, embedding, cent_id). */
  def assign(
      emb: DataFrame,
      m: Model,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("cd"), col("cent_id"))
    emb
      .crossJoin(broadcast(centDf(emb, m)))
      .select(
        col(idCol), col(vecCol), col("cent_id"),
        VectorFunctions.euclidean(cellVec(m, col(vecCol)), col("cv")).as("cd"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col(idCol), col(vecCol), col("cent_id"))
  }

  /** Top-k by `metric` probing the `nProbe` cells nearest the query. */
  def knn(
      emb: DataFrame,
      query: DataFrame, // one row, col "qv"
      m: Model,
      k: Int,
      nProbe: Int,
      metric: (Column, Column) => Column,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val probed = centDf(emb, m)
      .crossJoin(broadcast(query))
      .select(col("cent_id"),
        VectorFunctions.euclidean(col("cv"), cellVec(m, col("qv"))).as("qd"))
      .orderBy(col("qd"), col("cent_id"))
      .limit(nProbe)
    assign(emb, m, idCol, vecCol)
      .join(broadcast(probed), Seq("cent_id"))
      .crossJoin(broadcast(query))
      .select(col(idCol),
        VectorFunctions.roundDist(metric(col(vecCol), col("qv"))).as("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }
}
