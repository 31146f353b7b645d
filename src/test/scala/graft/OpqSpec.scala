package graft

import org.apache.spark.sql.functions._

import graft.operators.{Knn, Opq, ProductQuantization => PQ}
import graft.functions.VectorFunctions

/** OPQ rotation gates: exact orthonormality of both rotations (distance /
  * cosine preservation up to the 6-decimal output rounding), the Ge-style
  * eigenvalue allocation's balance invariants, and end-to-end rank parity
  * of the rotated residual-PQ chain at exhaustive settings.
  */
class OpqSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  /** Driver-side reference of the HD rotation for one vector. */
  private def hdRef(x: Array[Double]): Array[Double] = {
    val dim = x.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = Array.tabulate(dim) { j =>
      if ((md.digest(s"hd:$j".getBytes("UTF-8"))(0) & 0x80) == 0) 1.0 else -1.0
    }
    Array.tabulate(dim) { i =>
      var s = 0.0
      var j = 0
      while (j < dim) {
        val h = if (java.lang.Integer.bitCount(i & j) % 2 == 0) 1.0 else -1.0
        s += h * d(j) * x(j)
        j += 1
      }
      java.math.BigDecimal.valueOf(s / math.sqrt(dim.toDouble))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() + 0.0
    }
  }

  test("HD rotation column matches the driver reference bit for bit") {
    val rows = Opq.hdRotate(emb.where(col("vec_id") < 20), dim = 64)
      .orderBy(col("vec_id")).collect()
    val raw = emb.where(col("vec_id") < 20).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>")).collect()
    rows.zip(raw).foreach { case (got, x) =>
      val want = hdRef(x.getSeq[Double](0).toArray)
      assert(got.getSeq[Double](1).toArray.toSeq == want.toSeq)
    }
  }

  test("HD rotation preserves norms and pairwise cosine (orthonormal up to round-6)") {
    val raw = emb.where(col("vec_id") < 10).orderBy(col("vec_id"))
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    val rot = raw.map(hdRef)
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum / (norm(a) * norm(b))
    raw.zip(rot).foreach { case (x, r) =>
      assert(math.abs(norm(x) - norm(r)) < 1e-3,
        s"norm drift ${norm(x)} vs ${norm(r)}")
    }
    for (i <- raw.indices; j <- i + 1 until raw.length)
      assert(math.abs(cos(raw(i), raw(j)) - cos(rot(i), rot(j))) < 1e-4)
  }

  test("PCA rotation: orthonormal rows, every subspace gets dsub eigenvectors") {
    val dim = 64; val m = 4
    val r = Opq.fitPcaRotation(emb, dim, m)
    assert(r.length == dim && r.forall(_.length == dim))
    for (i <- 0 until dim; j <- i until dim) {
      val d = r(i).zip(r(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"R row dot ($i,$j) = $d")
    }
    // determinism: refit is bit-identical (fixed Jacobi + pinned signs +
    // deterministic allocation)
    val again = Opq.fitPcaRotation(emb, dim, m)
    assert(r.flatten.toSeq == again.flatten.toSeq)
  }

  test("PCA eigenvalue allocation balances per-subspace variance products") {
    val dim = 64; val m = 4
    val (vals, vecs, _) = graft.operators.Pca.fitComponents(emb, dim, dim)
    val r = Opq.fitPcaRotation(emb, dim, m)
    // recover each rotation row's eigenvalue by matching the eigenvector
    // (structural key — the spec's fit and the rotation's fit are
    // bit-identical by the determinism gate above, but distinct arrays)
    val byVec = vecs.map(_.toSeq).zip(vals).toMap
    val logs = r.map(row => math.log(math.max(byVec(row.toSeq), 1e-300)))
      .grouped(dim / m).map(_.sum).toArray
    val spreadAllocated = logs.max - logs.min
    // the unpermuted descending basis would put the largest eigenvalues
    // all in subspace 0 — its spread is the (worse) baseline
    val naive = vals.map(v => math.log(math.max(v, 1e-300)))
      .grouped(dim / m).map(_.sum).toArray
    val spreadNaive = naive.max - naive.min
    assert(spreadAllocated <= spreadNaive + 1e-9,
      s"allocation spread $spreadAllocated > naive $spreadNaive")
  }

  test("opqKnn at exhaustive settings reproduces exact top-k ids") {
    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val exact = Knn.knn(emb, query, 10, VectorFunctions.cosine)
      .collect().map(_.getLong(0)).toSet
    // nProbe = kCoarse (no pruning) + large candFactor → the shortlist
    // covers the exact neighborhood; the exact rerank restores rank
    val opq = Opq.opqKnn(emb, query, dim = 64, kCoarse = 4,
      coarseIters = 2, m = 4, kSub = 8, pqIters = 2, nProbe = 4,
      k = 10, candFactor = 64)
      .collect().map(_.getLong(0)).toSet
    val overlap = (exact intersect opq).size
    assert(overlap >= 9, s"exhaustive OPQ lost exact neighbors: $overlap/10")
  }

  test("OPQ layout round-trip: served-from-disk rows equal the in-memory face") {
    val dir = java.nio.file.Files.createTempDirectory("opq_layout").toString
    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val rot = Opq.hdRotate(emb, dim = 64)
    val rm = PQ.fitResidual(rot, dim = 64, kCoarse = 4, coarseIters = 2,
      m = 4, kSub = 8, pqIters = 2)
    Opq.writeOpqLayout(emb, rm, dir, dim = 64)
    val fromLayout = Opq.opqKnnFromLayout(spark, dir, emb, query,
      dim = 64, nProbe = 2, k = 10, candFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val inMem = Opq.opqKnn(emb, query, dim = 64, kCoarse = 4,
      coarseIters = 2, m = 4, kSub = 8, pqIters = 2, nProbe = 2,
      k = 10, candFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fromLayout == inMem)
  }

  test("opqPcaKnn runs end to end and self-match survives") {
    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val got = Opq.opqPcaKnn(emb, query, dim = 64, kCoarse = 4,
      coarseIters = 2, m = 4, kSub = 8, pqIters = 2, nProbe = 4,
      k = 10, candFactor = 16).collect()
    assert(got.length == 10)
    assert(got.map(_.getLong(0)).contains(0L), "query's own row missing")
  }

  test("rotated layout round-trip: persisted PCA rotation serves the opqPcaKnn answer") {
    val dir = java.nio.file.Files.createTempDirectory("opq_pca_layout").toString
    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    // write: fit the allocation-balanced rotation + the residual model
    // on the rotated corpus, persist BOTH beside the cells
    val r = Opq.fitPcaRotation(emb, dim = 64, m = 4)
    val rotated = emb.select(col("vec_id"),
      Opq.rotationColumn(col("embedding"), r).as("embedding"))
    val rm = PQ.fitResidual(rotated, dim = 64, kCoarse = 4, coarseIters = 2,
      m = 4, kSub = 8, pqIters = 2)
    Opq.writeOpqLayoutRotated(emb, rm, r, dir)
    // the persisted matrix equals the fitted one exactly
    val back = Opq.readLayoutRotation(spark, dir)
    assert(back.length == 64 && back.zip(r).forall {
      case (a, b) => a.sameElements(b)
    })
    // serve: the layout answer equals the direct opqPcaKnn face
    val fromLayout = Opq.opqKnnFromLayoutRotated(spark, dir, emb, query,
      nProbe = 2, k = 10, candFactor = 8)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
    val direct = Opq.opqPcaKnn(emb, query, dim = 64, kCoarse = 4,
      coarseIters = 2, m = 4, kSub = 8, pqIters = 2, nProbe = 2,
      k = 10, candFactor = 8)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
    assert(fromLayout == direct)
    // batch twin agrees with the single-query face on a one-row batch
    val batch = Opq.opqKnnBatchFromLayoutRotated(spark, dir, emb,
      emb.where(col("vec_id") === 0).select(col("vec_id").as("query_id"),
        col("embedding").as("qv")),
      nProbe = 2, k = 10, candFactor = 8)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getDouble(3))).toSeq
    assert(batch == fromLayout)
  }
}
