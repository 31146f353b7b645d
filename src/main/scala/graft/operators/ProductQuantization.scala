package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the standard heavy-compression ANN path:
  * split each vector into M subvectors, k-means a codebook per subspace,
  * store one code byte per subspace. A 64-d float64 vector (512 B)
  * becomes M=8 bytes — 64× — which is what makes billion-vector serving
  * corpora fit in memory. Complements SQ8 (8×, oracle-checkable) at the
  * other end of the compression/recall trade.
  *
  * Search uses ADC (asymmetric distance computation): per query, build an
  * M×K table of exact query-subvector→centroid distances, then every
  * corpus distance is M table lookups + adds — no decode.
  *
  * Codebooks are trained with seeded MLlib k-means per subspace (same
  * reproducibility contract as IvfTrained: deterministic per
  * seed+partitioning, but not cross-engine — so quality is spec-gated,
  * not oracle-hashed).
  *
  * Scale shape: training samples the corpus (k-means on M small
  * subspaces), codebooks broadcast (M·K·dsub doubles — KBs), encoding is
  * one narrow pass, and the encoded table is 64× smaller than the
  * original — scans, shuffles, and caches all shrink with it.
  */
object ProductQuantization {

  /** codebooks(m)(k) = centroid k of subspace m (each of length dim/M). */
  final case class Model(dim: Int, m: Int, codebooks: Array[Array[Array[Double]]]) {
    def dsub: Int = dim / m
  }

  /** Train per-subspace codebooks (K centroids each) with seeded k-means. */
  def train(
      emb: DataFrame,
      m: Int,
      k: Int,
      seed: Long = 42L,
      maxIter: Int = 20,
      vecCol: String = "embedding"): Model = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(vecCol).cast("array<double>")).as[Seq[Double]]
    val dim = vecs.head().length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val codebooks = (0 until m).map { sub =>
      // slice + array_to_vector: the built-in MLlib boundary bridge, no UDF
      val feats = vecs
        .toDF("sv")
        .select(org.apache.spark.ml.functions.array_to_vector(
          slice(col("sv"), sub * dsub + 1, dsub)).as("features"))
      new org.apache.spark.ml.clustering.KMeans()
        .setK(k).setSeed(seed + sub).setMaxIter(maxIter)
        .fit(feats)
        .clusterCenters.map(_.toArray)
    }.toArray
    Model(dim, m, codebooks)
  }

  /** Encode: (id, codes ARRAY<INT>) — code(m) = nearest centroid in
    * subspace m (euclidean, ties to the lower id). One narrow pass with
    * broadcast codebooks.
    */
  def encode(
      emb: DataFrame,
      model: Model,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    emb.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        val mm = bc.value
        val codes = Array.tabulate(mm.m) { sub =>
          val off = sub * mm.dsub
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < mm.codebooks(sub).length) {
            val cent = mm.codebooks(sub)(c)
            var d = 0.0; var i = 0
            while (i < cent.length) {
              val t = v(off + i) - cent(i); d += t * t; i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          best
        }
        (id, codes)
      }
      .toDF(idCol, "codes")
  }

  /** ADC top-k: exact per-subspace distance table for the query, then
    * each corpus row costs M lookups. Returns (id, distance) with
    * distance = sqrt(Σ_sub ‖q_sub − centroid(code_sub)‖²) — the PQ
    * approximation of euclidean distance.
    */
  def adcKnn(
      encoded: DataFrame, // (idCol, codes)
      model: Model,
      query: Array[Double],
      k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    require(query.length == model.dim)
    val table: Array[Array[Double]] = Array.tabulate(model.m) { sub =>
      val off = sub * model.dsub
      model.codebooks(sub).map { cent =>
        var d = 0.0; var i = 0
        while (i < cent.length) { val t = query(off + i) - cent(i); d += t * t; i += 1 }
        d
      }
    }
    val bc = spark.sparkContext.broadcast(table)
    encoded.select(col(idCol).cast("long"), col("codes"))
      .as[(Long, Array[Int])]
      .map { case (id, codes) =>
        val t = bc.value
        var d = 0.0; var sub = 0
        while (sub < codes.length) { d += t(sub)(codes(sub)); sub += 1 }
        (id, math.sqrt(d))
      }
      .toDF(idCol, "distance")
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }

  /** PQ as a CANDIDATE GENERATOR + exact re-rank — how PQ is actually
    * deployed: the cheap ADC scan runs over the 64×-compressed table to
    * produce a `shortlist`, and only those rows' full vectors are read for
    * exact ranking. ADC collapses within-cell distances (all members of a
    * codebook cell tie), so top-k STRAIGHT from ADC scrambles local ranks;
    * the re-rank restores them while still touching shortlist/N of the
    * full-precision data.
    */
  def adcKnnRerank(
      encoded: DataFrame,
      emb: DataFrame,
      model: Model,
      query: Array[Double],
      k: Int,
      shortlist: Int = 100,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = encoded.sparkSession
    val cand = adcKnn(encoded, model, query, shortlist, idCol).select(col(idCol))
    val qLit = lit(query.toSeq.toArray)
    emb.join(broadcast(cand), idCol)
      .select(
        col(idCol),
        graft.functions.VectorFunctions
          .roundDist(graft.functions.VectorFunctions.euclidean(
            col(vecCol).cast("array<double>"), qLit))
          .as("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }
}
