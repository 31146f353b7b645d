package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection — the dimensionality-reduction
  * step in front of ANN / clustering / near-dup at scale: a 1536-dim
  * embedding column is 6 KB/row of float32; projecting to 32–128 dims
  * before candidate generation cuts every downstream shuffle and index
  * byte proportionally, and the JL lemma bounds the pairwise-distance
  * distortion (Achlioptas 2003, "Database-friendly random projections":
  * a ±1 Rademacher matrix satisfies the lemma — no Gaussian sampling
  * needed, which is exactly what makes the operator engine-portable).
  *
  * Determinism discipline (the module-wide md5 trick, applied to a
  * MATRIX): sign(i, j) = +1 iff the first hex char of md5("i:j") < '8'
  * (the draw's top bit), i = input dim, j = output dim, both 0-based.
  * A pure function of the indices — any engine can restate the matrix,
  * so projected values hash-match cross-engine, and a re-run (or an
  * append arriving months later) projects with the SAME matrix without
  * any stored state. out[j] = round(Σ_i v[i]·sign(i,j) / √dOut, 6).
  *
  * Scale shape: the matrix is dIn × dOut signs (64 KB of doubles at
  * 1536×256) computed ONCE on the driver and shipped in the plan as
  * literals — the projection itself is a narrow per-row map over
  * codegen'd `zip_with`/`aggregate` (no UDF, no shuffle, no join).
  * Appending rows projects them independently; nothing global exists.
  */
object Projection {

  /** The ±1.0 Rademacher row for output dim `j` (length dIn). */
  private def signRow(dIn: Int, j: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dIn) { i =>
      val hex = md.digest(s"$i:$j".getBytes("UTF-8")) // digest() resets md
      // first hex char < '8'  ⇔  top nibble < 8  ⇔  top bit of byte 0 is 0
      if ((hex(0) & 0x80) == 0) 1.0 else -1.0
    }
  }

  /** The DuckDB expression for sign(i, j) — kept adjacent to [[signRow]]
    * so the two statements of the matrix cannot drift. `i`/`j` are SQL
    * expressions for the 0-based input/output dims.
    */
  def oracleSignSql(i: String, j: String): String =
    s"CASE WHEN substr(md5(($i)::VARCHAR || ':' || ($j)::VARCHAR), 1, 1) < '8' " +
      "THEN 1.0 ELSE -1.0 END"

  /** Projected-vector column: array<double> of length dOut, each element
    * rounded to 6 decimals (+0.0 normalization, the repo-wide discipline
    * for hashable numeric surfaces). The matrix multiply runs as the
    * native [[graft.functions.ArrayMatVec]] codegen loop (the Column-
    * level dOut × zip_with/aggregate form ran interpreted with boxing:
    * 74 s for 1M rows at 256→32; the native loop is the measured-
    * bottleneck escalation). Vectors shorter than dIn project as
    * zero-padded; longer vectors ignore the tail.
    */
  def projectColumn(vec: Column, dIn: Int, dOut: Int): Column = {
    require(dIn >= 1 && dOut >= 1, s"bad dims dIn=$dIn dOut=$dOut")
    val scale = math.sqrt(dOut.toDouble)
    val flat: Seq[Double] =
      (0 until dOut).flatMap(j => signRow(dIn, j).toSeq)
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.ArrayMatVec(
        org.apache.spark.sql.graftbridge.Bridge
          .expression(vec.cast("array<double>")),
        flat, dIn, dOut, divisor = scale, roundDecimals = 6))
  }

  /** (id, rp) frame: every row's embedding projected to dOut dims. */
  def randomProject(
      emb: DataFrame,
      dIn: Int,
      dOut: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), projectColumn(col(vecCol), dIn, dOut).as("rp"))

  /** The long-form scalar face — (id, out_dim, value), one row per
    * projected dimension, every column a plain hashable scalar (the
    * labelCentroids output convention).
    */
  def randomProjectTable(
      emb: DataFrame,
      dIn: Int,
      dOut: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    randomProject(emb, dIn, dOut, idCol, vecCol)
      // the OUTER variant deliberately: posexplode makes the optimizer
      // infer a `size(gen) > 0 AND isnotnull(gen)` filter BELOW the
      // Generate that re-evaluates the whole matvec twice more per row
      // (3× the 8k-MAC loop); outer needs no such filter, and the
      // generator never returns null/empty on non-null input (dOut ≥ 1)
      .select(col(idCol),
        posexplode_outer(col("rp")).as(Seq("out_dim", "value")))
      .select(col(idCol), col("out_dim").cast("long").as("out_dim"),
        col("value"))
      .orderBy(col(idCol), col("out_dim"))

  /** Exact top-k cosine search in the PROJECTED space — the
    * reduce-then-search serving shape (project once at ingest, search the
    * narrow vectors; full-dim rerank is a bounded join-back away). Query =
    * 1-row frame with `qv` in the ORIGINAL space; both sides project with
    * the same matrix by construction.
    */
  def projectedKnn(
      emb: DataFrame,
      query: DataFrame,
      dIn: Int,
      dOut: Int,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    Knn.knn(
      randomProject(emb, dIn, dOut, idCol, vecCol),
      query.select(projectColumn(col("qv"), dIn, dOut).as("qv")),
      k, graft.functions.VectorFunctions.cosine,
      idCol = idCol, vecCol = "rp")

  /** Reduce-then-RERANK — the recommended serving composition (the
    * README soaks price direct reduced-space search at recall 0.21–0.35
    * on hard clustered corpora; the full-dim rerank recovers most of
    * it): candidate generation = top k·candFactor by projected cosine
    * ([[projectedKnn]]'s bounded TakeOrdered cut, round-6 distances +
    * id tiebreaks so the candidate SET is deterministic), then exact
    * full-dim cosine over ONLY those survivors, top-k. Both stages are
    * pure functions of (corpus, query, matrix) — the whole composition
    * is oracle-checkable, unlike recall-gated ANN paths.
    *
    * Scale shape: the narrow projected corpus carries the scan; the
    * k·candFactor survivor ids broadcast back onto the full-dim frame
    * (map-side hash join, no corpus shuffle), so full vectors are
    * touched for exactly k·candFactor rows per query.
    */
  def projectedKnnRerank(
      emb: DataFrame,
      query: DataFrame, // 1-row frame with `qv` in the ORIGINAL space
      dIn: Int,
      dOut: Int,
      k: Int,
      candFactor: Int = 8,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(candFactor >= 1, s"candFactor must be >= 1 (got $candFactor)")
    val cands = projectedKnn(emb, query, dIn, dOut, k * candFactor,
      idCol, vecCol).select(col(idCol))
    emb.join(broadcast(cands), Seq(idCol))
      .crossJoin(broadcast(query))
      .select(col(idCol),
        graft.functions.VectorFunctions.roundDist(
          graft.functions.VectorFunctions.cosine(col(vecCol), col("qv")))
          .as("distance"))
      .orderBy(col("distance"), col(idCol))
      .limit(k)
  }
}
