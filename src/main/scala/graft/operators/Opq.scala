package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized-PQ rotations in front of (residual) product quantization
  * (Ge et al. 2014, "Optimized Product Quantization", public). PQ
  * quantizes each dsub-dim subspace independently, so its distortion is
  * smallest when variance spreads evenly across subspaces and
  * cross-subspace correlation is low. A fixed ORTHOGONAL rotation R
  * applied before encoding changes neither true distances
  * (‖Rx − Ry‖ = ‖x − y‖, cosine likewise) nor the serving shape — only
  * the statistics the codebooks see. The reference has no quantized
  * ANN at all (SURVEY §2.5); this is extension surface on top of the
  * r13 residual IVF-PQ family.
  *
  * Two rotations, two verification classes (the bpe_encode /
  * bpe_encode_fixed precedent):
  *
  *  - [[hdRotationColumn]] — seeded-sign Walsh–Hadamard, R = H·D/√dim
  *    with H_ij = (−1)^popcount(i AND j) and D a per-input-dim md5 sign
  *    flip (the module-wide md5 determinism trick, Projection's matrix
  *    idiom). This is the STRUCTURED rotation of the public
  *    fast-projection literature (Ailon–Chazelle's SRHT; the random
  *    pre-rotations in front of PQ in open-source ANN engines). Every
  *    matrix entry is ±1/√dim, so a rotated coordinate is an ORDERED
  *    sum of ±x_j divided by √dim — engine-exact through the
  *    ArrayMatVec codegen loop, which is why the whole opq_knn answer
  *    (rotation + coarse cells + residual codebooks + ADC + rerank)
  *    hash-checks against a DuckDB replay.
  *
  *  - [[fitPcaRotation]] — the data-dependent parametric OPQ: the PCA
  *    eigenbasis (Pca.fitComponents' deterministic Jacobi) with Ge et
  *    al.'s eigenvalue ALLOCATION — eigenvectors dealt greedily across
  *    the m subspaces so per-subspace variance products balance. The
  *    eigensolve is driver math (the pca_project rows-only class — not
  *    one SQL query), so this face is spec-gated (orthonormality,
  *    distance preservation) and soak-measured (the 1M recall curve),
  *    not oracle-hashed.
  *
  * Scale shape: both rotations are dim×dim literals shipped in the
  * plan (32 KB of doubles at dim=64) applied in one map-only codegen
  * pass — no shuffle, no join, no stored state; appends rotate
  * independently. Everything downstream is the audited residual-PQ
  * serving shape.
  */
object Opq {

  /** The D sign for input dim j: +1 iff the first hex char of
    * md5("hd:j") < '8' (the draw's top bit) — restatable in any engine
    * with md5, kept textually adjacent to [[oracleHdSignSql]].
    */
  private def hdSign(j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"hd:$j".getBytes("UTF-8"))
    if ((hex(0) & 0x80) == 0) 1.0 else -1.0
  }

  /** The DuckDB expression for the same sign — `j` is a SQL expression
    * for the 0-based input dim.
    */
  def oracleHdSignSql(j: String): String =
    s"CASE WHEN substr(md5('hd:' || ($j)::VARCHAR), 1, 1) < '8' " +
      "THEN 1.0 ELSE -1.0 END"

  /** Row-major flat H·D (out dim i, in dim j): H_ij · d_j ∈ {±1}. */
  private def hdFlat(dim: Int): Seq[Double] = {
    val d = Array.tabulate(dim)(hdSign)
    for (i <- 0 until dim; j <- 0 until dim) yield {
      val h = if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1.0 else -1.0
      h * d(j)
    }
  }

  /** Rotated-vector column: out[i] = round(Σ_j H_ij·d_j·x_j / √dim, 6)
    * (+0.0), the native matvec loop. H·D/√dim is exactly orthonormal
    * (H·Hᵀ = dim·I, D² = I), so distances and cosines are preserved up
    * to the 6-decimal output rounding. dim must be a power of two (H
    * exists only there).
    */
  def hdRotationColumn(vec: Column, dim: Int): Column = {
    require(dim >= 2 && (dim & (dim - 1)) == 0,
      s"Hadamard rotation needs a power-of-two dim (got $dim)")
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.ArrayMatVec(
        org.apache.spark.sql.graftbridge.Bridge
          .expression(vec.cast("array<double>")),
        hdFlat(dim), dim, dim,
        divisor = math.sqrt(dim.toDouble), roundDecimals = 6))
  }

  /** (id, rotated embedding) frame under the HD rotation. */
  def hdRotate(
      emb: DataFrame, dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), hdRotationColumn(col(vecCol), dim).as(vecCol))

  /** HD-rotated residual IVF-PQ ANN — [[ProductQuantization
    * .residualAdcKnn]] run entirely in the rotated space (training,
    * codes, probes, ADC, and the exact cosine rerank all see rotated
    * vectors; rotated cosine = original cosine up to the rotation's
    * 6-decimal rounding, so ranks are the original-space ranks).
    */
  def opqKnn(
      emb: DataFrame,
      query: DataFrame, // one row, col "qv"
      dim: Int,
      kCoarse: Int,
      coarseIters: Int,
      m: Int,
      kSub: Int,
      pqIters: Int,
      nProbe: Int,
      k: Int,
      candFactor: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ProductQuantization.residualAdcKnn(
      hdRotate(emb, dim, idCol, vecCol),
      query.select(hdRotationColumn(col("qv"), dim).as("qv")),
      dim, kCoarse, coarseIters, m, kSub, pqIters, nProbe, k, candFactor,
      idCol, vecCol)

  /** Batch twin over the bounded (query_id, qv) frame. */
  def opqKnnBatch(
      emb: DataFrame,
      queries: DataFrame, // (query_id, qv), bounded
      dim: Int,
      kCoarse: Int,
      coarseIters: Int,
      m: Int,
      kSub: Int,
      pqIters: Int,
      nProbe: Int,
      k: Int,
      candFactor: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ProductQuantization.residualAdcKnnBatch(
      hdRotate(emb, dim, idCol, vecCol),
      queries.select(col("query_id"),
        hdRotationColumn(col("qv"), dim).as("qv")),
      dim, kCoarse, coarseIters, m, kSub, pqIters, nProbe, k, candFactor,
      idCol, vecCol)

  /** The rotation CTE: `rot(vec_id, embedding)` restating
    * [[hdRotationColumn]] in DuckDB — ascending-j list_sum matches the
    * matvec loop's ascending-i summation order term for term, ±x_j
    * products are exact, √dim is the identical correctly-rounded
    * double in both engines, and round-6 (+0.0) is the module-wide
    * hashable-surface discipline.
    */
  private def rotCteSql(table: String, dim: Int): String =
    s"""rot AS MATERIALIZED (SELECT vec_id,
       |  list_transform(generate_series(0, ${dim - 1}), i ->
       |    round(list_sum(list_transform(generate_series(0, ${dim - 1}), j ->
       |      (CASE WHEN bit_count(i & j) % 2 = 0 THEN 1.0 ELSE -1.0 END) *
       |      (${oracleHdSignSql("j")}) * v[j + 1]))
       |      / sqrt($dim.0), 6) + 0.0) AS embedding
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM $table))"""
      .stripMargin

  /** The DuckDB twin of [[opqKnn]]: the residual-PQ replay run against
    * the rotation CTE instead of the raw table.
    */
  def opqOracleSql(
      table: String, dim: Int, kCoarse: Int, coarseIters: Int,
      m: Int, kSub: Int, pqIters: Int, nProbe: Int,
      k: Int, candFactor: Int,
      dist: (String, String) => String): String = {
    val inner = ProductQuantization.residualOracleSql(
      "rot", dim, kCoarse, coarseIters, m, kSub, pqIters, nProbe,
      k, candFactor, dist)
    "WITH " + rotCteSql(table, dim) + ",\n" + inner.stripPrefix("WITH ")
  }

  /** The DuckDB twin of [[opqKnnBatch]]. */
  def opqBatchOracleSql(
      table: String, dim: Int, kCoarse: Int, coarseIters: Int,
      m: Int, kSub: Int, pqIters: Int, nProbe: Int,
      k: Int, candFactor: Int,
      dist: (String, String) => String): String = {
    val inner = ProductQuantization.residualBatchOracleSql(
      "rot", dim, kCoarse, coarseIters, m, kSub, pqIters, nProbe,
      k, candFactor, dist)
    "WITH " + rotCteSql(table, dim) + ",\n" + inner.stripPrefix("WITH ")
  }

  /** Persist the HD-rotated residual quantizer as the PARTITIONED
    * LAYOUT ([[ProductQuantization.writeResidualLayout]] over the
    * rotated corpus): the serving layout's cells, codes, and model all
    * live in the rotated space; [[opqKnnFromLayout]] rotates the query
    * the same way, so directory-level cell pruning and the 16×
    * compression carry over unchanged.
    */
  def writeOpqLayout(
      emb: DataFrame,
      rm: ProductQuantization.ResidualModel,
      path: String,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    ProductQuantization.writeResidualLayout(
      hdRotate(emb, dim, idCol, vecCol), rm, path, idCol, vecCol)

  /** Serve from an OPQ layout: the query rotates into the layout's
    * space, probes prune cell directories, and the exact rerank runs
    * against the ROTATED corpus (rotated cosine = original cosine up
    * to round-6, the [[opqKnn]] contract).
    */
  def opqKnnFromLayout(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      emb: DataFrame,
      query: DataFrame, // one row, col "qv"
      dim: Int,
      nProbe: Int,
      k: Int,
      candFactor: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    ProductQuantization.residualAdcKnnFromLayout(
      spark, path, hdRotate(emb, dim, idCol, vecCol),
      query.select(hdRotationColumn(col("qv"), dim).as("qv")),
      nProbe, k, candFactor, idCol, vecCol)

  /** Persist an EXPLICIT-rotation OPQ layout (r15): the rotation
    * matrix itself rides as a `rotation` side table beside the model
    * and the partitioned cells, so the layout can serve the
    * PCA-allocated rotation — [[writeOpqLayout]] hard-codes HD, and
    * re-deriving the eigenbasis at serve time would repeat an
    * eigensolve the layout exists to avoid. Cell pruning and the 16×
    * code compression carry over unchanged: the rotation only changes
    * WHICH space the persisted cells live in.
    */
  def writeOpqLayoutRotated(
      emb: DataFrame,
      rm: ProductQuantization.ResidualModel,
      rotation: Array[Array[Double]],
      path: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    rotation.zipWithIndex.flatMap { case (row, i) =>
      row.zipWithIndex.map { case (x, j) => (i.toLong, j.toLong, x) }
    }.toSeq.toDF("row_idx", "dim_idx", "v")
      .write.mode("overwrite").parquet(s"$path/rotation")
    ProductQuantization.writeResidualLayout(
      emb.select(col(idCol), rotationColumn(col(vecCol), rotation).as(vecCol)),
      rm, path, idCol, vecCol)
  }

  /** Load a layout's rotation side table back (dim×dim, bounded). */
  def readLayoutRotation(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Array[Array[Double]] = {
    val rows = spark.read.parquet(s"$path/rotation").collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    require(rows.nonEmpty,
      s"OPQ layout at $path has an empty rotation side table")
    val dim = rows.map(_._1).max + 1
    require(rows.length == dim * dim,
      s"OPQ rotation side table at $path is corrupt: ${rows.length} " +
        s"entries for dim=$dim (expected ${dim * dim})")
    val m = Array.ofDim[Double](dim, dim)
    rows.foreach { case (i, j, x) => m(i)(j) = x }
    m
  }

  /** Serve from a rotation-carrying OPQ layout: the persisted matrix
    * rotates the query and the rerank corpus into the layout's space,
    * probes prune cell directories as ever. Round-trip contract
    * (OpqSpec): write(fitPcaRotation + fitResidual) → serve ≡ the
    * direct [[opqPcaKnn]] answer.
    */
  def opqKnnFromLayoutRotated(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      emb: DataFrame,
      query: DataFrame, // one row, col "qv"
      nProbe: Int,
      k: Int,
      candFactor: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val r = readLayoutRotation(spark, path)
    ProductQuantization.residualAdcKnnFromLayout(
      spark, path,
      emb.select(col(idCol), rotationColumn(col(vecCol), r).as(vecCol)),
      query.select(rotationColumn(col("qv"), r).as("qv")),
      nProbe, k, candFactor, idCol, vecCol)
  }

  /** Batch twin of [[opqKnnFromLayoutRotated]] — model and rotation
    * read once, every query's probe still a partition filter.
    */
  def opqKnnBatchFromLayoutRotated(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      emb: DataFrame,
      queries: DataFrame, // (query_id, qv), bounded
      nProbe: Int,
      k: Int,
      candFactor: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val r = readLayoutRotation(spark, path)
    ProductQuantization.residualAdcKnnBatchFromLayout(
      spark, path,
      emb.select(col(idCol), rotationColumn(col(vecCol), r).as(vecCol)),
      queries.select(col("query_id"),
        rotationColumn(col("qv"), r).as("qv")),
      nProbe, k, candFactor, idCol, vecCol)
  }

  /** Parametric OPQ rotation (Ge et al. 2014): the full-dim PCA
    * eigenbasis with EIGENVALUE ALLOCATION — eigenvectors are dealt in
    * descending-eigenvalue order, each to the subspace with the
    * smallest current log-variance product (free slots only), so the
    * per-subspace variance products balance and no subspace's codebook
    * is starved or saturated. Returns the row-major dim×dim rotation
    * (row r = the eigenvector assigned to output dim r; output dims
    * [s·dsub, (s+1)·dsub) form subspace s).
    *
    * Deterministic end to end: the gramian statistics are exact sums,
    * the Jacobi sweep order is fixed, the sign convention pins each
    * eigenvector, and the greedy allocation breaks ties on (product,
    * fill, index). Driver math (the pca_project class), spec-gated —
    * see OpqSpec.
    */
  def fitPcaRotation(
      emb: DataFrame, dim: Int, m: Int,
      vecCol: String = "embedding"): Array[Array[Double]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val (vals, vecs, _) = Pca.fitComponents(emb, dim, dim, vecCol)
    // greedy balanced allocation on log-eigenvalue sums (floored away
    // from log(0); eigenvalues arrive descending from fitComponents)
    val logs = vals.map(v => math.log(math.max(v, 1e-300)))
    val load = new Array[Double](m)
    val fill = new Array[Int](m)
    val slots = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    for (e <- 0 until dim) {
      val s = (0 until m).filter(fill(_) < dsub)
        .minBy(b => (load(b), fill(b), b))
      load(s) += logs(e); fill(s) += 1; slots(s) += e
    }
    val rows = Array.ofDim[Array[Double]](dim)
    for (s <- 0 until m; (e, r) <- slots(s).zipWithIndex)
      rows(s * dsub + r) = vecs(e)
    rows
  }

  /** Rotated-vector column for a fitted rotation matrix (round-6
    * through the native matvec, the pcaProject pass shape).
    */
  def rotationColumn(vec: Column, r: Array[Array[Double]]): Column = {
    val dim = r.length
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.ArrayMatVec(
        org.apache.spark.sql.graftbridge.Bridge
          .expression(vec.cast("array<double>")),
        r.flatten.toSeq, dim, dim, divisor = 1.0, roundDecimals = 6))
  }

  /** PCA-OPQ residual IVF-PQ ANN: fit the allocation-balanced
    * eigenbasis, rotate corpus + query, run the residual-PQ chain in
    * the rotated space. The recall-vs-bytes claim this face exists for
    * is measured at 1M in the soak (flat vs HD vs PCA rotation at
    * identical code budgets).
    */
  def opqPcaKnn(
      emb: DataFrame,
      query: DataFrame, // one row, col "qv"
      dim: Int,
      kCoarse: Int,
      coarseIters: Int,
      m: Int,
      kSub: Int,
      pqIters: Int,
      nProbe: Int,
      k: Int,
      candFactor: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val r = fitPcaRotation(emb, dim, m, vecCol)
    ProductQuantization.residualAdcKnn(
      emb.select(col(idCol), rotationColumn(col(vecCol), r).as(vecCol)),
      query.select(rotationColumn(col("qv"), r).as("qv")),
      dim, kCoarse, coarseIters, m, kSub, pqIters, nProbe, k, candFactor,
      idCol, vecCol)
  }
}
