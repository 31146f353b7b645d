package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Distributed PCA gates: the Gramian statistics against local exact
  * sums, the eigensolve against the defining equations, and the
  * projection faces.
  */
class PcaSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val local: Array[Array[Double]] = emb
    .select(col("embedding").cast("array<double>")).collect()
    .map(_.getSeq[Double](0).toArray)

  test("covariance long form matches local exact computation") {
    val n = local.length
    val dim = 64
    val mu = Array.tabulate(dim)(i => local.map(_(i)).sum / n)
    val got = Pca.covariance(emb, dim).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    graft.CacheTracker.releaseAll()
    assert(got.size == dim * (dim + 1) / 2)
    for (i <- 0 until dim; j <- i until dim) {
      val want = local.map(v => v(i) * v(j)).sum / n - mu(i) * mu(j)
      assert(math.abs(got((i, j)) - want) < 2e-6,
        s"cov($i,$j): ${got((i, j))} vs $want")
    }
  }

  test("fitComponents: orthonormal basis satisfying the eigen equation") {
    val dim = 64
    val (vals, vecs, mu) = Pca.fitComponents(emb, dim, c = 8)
    assert(vals.length == 8 && vecs.length == 8)
    // eigenvalues descending, non-negative (covariance is PSD)
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b - 1e-12 })
    assert(vals.forall(_ >= -1e-9))
    // orthonormality
    for (a <- 0 until 8; b <- a until 8) {
      val dot = vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-8, s"<v$a, v$b> = $dot")
    }
    // the defining equation: C w ≈ λ w against the LOCAL exact covariance
    val n = local.length
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      local.map(v => v(i) * v(j)).sum / n - mu(i) * mu(j)
    }
    for (k <- 0 until 8) {
      val cw = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cov(i)(j) * vecs(k)(j)).sum)
      val resid = math.sqrt(
        cw.zip(vecs(k)).map { case (x, w) => (x - vals(k) * w) * (x - vals(k) * w) }.sum)
      assert(resid < 1e-6, s"eigen residual for component $k: $resid")
    }
    // deterministic across calls (fixed sweep order + sign convention)
    val (vals2, vecs2, _) = Pca.fitComponents(emb, dim, c = 8)
    assert(vals.toSeq == vals2.toSeq)
    assert(vecs.map(_.toSeq).toSeq == vecs2.map(_.toSeq).toSeq)
  }

  test("stats buffers merge incrementally: split ∪ merge ≡ one pass") {
    val whole = Pca.stats(emb, 64)
    val a = Pca.stats(emb.where(col("vec_id") % 2 === 0), 64)
    val b = Pca.stats(emb.where(col("vec_id") % 2 =!= 0), 64)
    val merged = Pca.mergeStats(a, b)
    assert(merged.length == whole.length)
    // float addition is commutative pairwise here; partition split order
    // differs from the one-pass order, so compare at far-below-rounding
    // tolerance rather than bitwise
    whole.zip(merged).zipWithIndex.foreach { case ((w, m), i) =>
      assert(math.abs(w - m) <= 1e-9 * math.max(1.0, math.abs(w)),
        s"slot $i: $w vs $m")
    }
    // n adds exactly
    assert(merged.last == whole.last)
  }

  test("whitening: projected coordinates have unit variance, zero correlation") {
    val c = 8
    val proj = Pca.whitenProject(emb, 64, c).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2))).toMap
    val n = proj.size
    val cols = Array.tabulate(c)(k => proj.values.map(_(k)).toArray)
    for (a <- 0 until c) {
      val ma = cols(a).sum / n
      val va = cols(a).map(x => (x - ma) * (x - ma)).sum / n
      assert(math.abs(va - 1.0) < 0.05, s"component $a variance $va")
      for (b <- a + 1 until c) {
        val mb = cols(b).sum / n
        val cov = cols(a).zip(cols(b))
          .map { case (x, y) => (x - ma) * (y - mb) }.sum / n
        assert(math.abs(cov) < 0.05, s"components $a,$b covariance $cov")
      }
    }
  }

  test("projection: variance concentrates and reconstruction improves with c") {
    val dim = 64
    val proj = Pca.pcaProject(emb, dim, c = 8).collect()
    assert(proj.length == local.length * 8)
    // per-component variance of the projected values must be (near) the
    // eigenvalues, and thus non-increasing
    val (vals, _, _) = Pca.fitComponents(emb, dim, c = 8)
    val byComp = proj.groupBy(_.getLong(1)).view
      .mapValues { rs =>
        val xs = rs.map(_.getDouble(2))
        val m = xs.sum / xs.length
        xs.map(x => (x - m) * (x - m)).sum / xs.length
      }.toMap
    for (k <- 0 until 8)
      assert(math.abs(byComp(k.toLong) - vals(k)) < 0.05 * vals(0) + 1e-6,
        s"component $k variance ${byComp(k.toLong)} vs eigenvalue ${vals(k)}")
    // total captured variance grows with c (strictly, given distinct
    // positive eigenvalues on real data)
    val (vals4, _, _) = Pca.fitComponents(emb, dim, c = 4)
    assert(vals4.sum < vals.sum)
  }
}
