package graft

import org.apache.spark.sql.functions._

import graft.operators.Kmeans

/** Integer-exact k-means gates: exact parity with a plain-Scala
  * reference walk (the Coreset discipline), partition invariance, the
  * empty-cluster keep rule, and micro-quantization round semantics.
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sfDir)

  /** Plain-Scala Lloyd with the identical integer rules. */
  private def refKmeans(
      vecs: Seq[(Long, Array[Long])], k: Int, iterations: Int)
      : (Array[Array[Long]], Map[Long, Long]) = {
    var cents = vecs.sortBy(_._1).take(k).map(_._2.clone).toArray
    def assign(): Map[Long, Long] =
      vecs.map { case (id, v) =>
        val best = cents.zipWithIndex.map { case (c, j) =>
          (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, j.toLong)
        }.min
        id -> best._2
      }.toMap
    for (_ <- 1 to iterations) {
      val a = assign()
      val next = cents.zipWithIndex.map { case (old, j) =>
        val members = vecs.filter(v => a(v._1) == j.toLong).map(_._2)
        if (members.isEmpty) old
        else Array.tabulate(old.length) { i =>
          members.map(_(i)).sum / members.length // Long / Long truncates
        }
      }
      cents = next
    }
    (cents, assign())
  }

  private def microOf(v: Seq[Double]): Array[Long] =
    v.map(x => BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray

  test("fit + assign match the plain-Scala integer reference exactly") {
    val local = emb.where(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), microOf(r.getSeq[Double](1))))
      .toSeq
    val (wantCents, wantAssign) = refKmeans(local, k = 5, iterations = 3)
    val sub = emb.where(col("vec_id") < 200)
    val gotFit = Kmeans.fitFace(sub, k = 5, iterations = 3).collect()
    gotFit.foreach { r =>
      val (cid, i, v) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(v == wantCents(cid.toInt)(i.toInt), s"cent $cid dim $i")
    }
    val counts = wantAssign.values.groupBy(identity).view.mapValues(_.size.toLong)
    gotFit.groupBy(_.getLong(0)).foreach { case (cid, rows) =>
      assert(rows.head.getLong(3) == counts.getOrElse(cid, 0L), s"count $cid")
    }
    val gotAssign = Kmeans.assignFace(sub, k = 5, iterations = 3).collect()
    gotAssign.foreach { r =>
      assert(r.getLong(1) == wantAssign(r.getLong(0)), s"vec ${r.getLong(0)}")
    }
  }

  test("partition-invariant: repartitioned corpus trains bit-identically") {
    val a = Kmeans.fitFace(emb.where(col("vec_id") < 300), k = 4, iterations = 2).collect()
    val b = Kmeans.fitFace(emb.where(col("vec_id") < 300).repartition(7), k = 4, iterations = 2)
      .collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("trainedKnn: probing all cells equals exact knn; pruning is a subset") {
    import graft.operators.Knn
    import graft.functions.VectorFunctions
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val all = Kmeans.trainedKnn(emb, q, k = 10, kCells = 8,
      iterations = 2, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Knn.knn(emb, q, 10, VectorFunctions.cosine).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(all.toSeq == exact.toSeq)
    val pruned = Kmeans.trainedKnn(emb, q, k = 10, kCells = 8,
      iterations = 2, nProbe = 2).collect().map(_.getLong(0)).toSet
    // pruned results are drawn from the corpus and deterministic
    val pruned2 = Kmeans.trainedKnn(emb, q, k = 10, kCells = 8,
      iterations = 2, nProbe = 2).collect().map(_.getLong(0)).toSet
    assert(pruned == pruned2 && pruned.nonEmpty)
    // the query's own cell is always probed -> vec 0 itself survives
    assert(pruned.contains(0L))
  }

  test("trained layout: probe equals trainedKnn and prunes cell directories") {
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val path = java.nio.file.Files.createTempDirectory("kmeans-layout").toString
    Kmeans.writeLayout(emb, kCells = 8, iterations = 2, path)
    val fromLayout = Kmeans.trainedKnnFromLayout(spark, path, q,
      k = 10, nProbe = 2)
    val inMemory = Kmeans.trainedKnn(emb, q, k = 10, kCells = 8,
      iterations = 2, nProbe = 2)
    val a = fromLayout.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = inMemory.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b && a.size == 10)
    // the cell scan carries a cent_id PARTITION filter — pruning at
    // file listing, before any row is read (the membership-broadcast
    // the in-memory face used to carry is gone entirely here)
    val plan = fromLayout.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cent_id#") ||
      plan.contains("cent_id IN"),
      s"no partition filter on the cell scan:\n$plan")
    // probing 2 of 8 cells reads a strict subset of the corpus even at
    // an unbounded k — file-level pruning, not a post-read filter
    val probedRows = Kmeans.trainedKnnFromLayout(spark, path, q,
      k = 1000000, nProbe = 2).count()
    assert(probedRows < emb.count(),
      s"probe read the whole corpus ($probedRows rows)")
    // the listing-time partition metric on a bare pruned scan (inside
    // the join AQE re-instantiates the scan and detaches its metric)
    val bare = spark.read.parquet(s"$path/cells")
      .where(col("cent_id").isin(0L, 1L))
    bare.collect()
    val scanned = graft.sources.Storage.prunedPartitionCount(bare)
    assert(scanned.exists(n => n > 0 && n <= 2),
      s"bare pruned scan read $scanned partitions, want <= 2")
    // round-tripped model is the fitted model
    val m = Kmeans.fit(emb, 8, 2)
    val m2 = Kmeans.readModel(spark, path)
    assert(m.centroids.map { case (c, v) => (c, v.toSeq) }.toSeq ==
      m2.centroids.map { case (c, v) => (c, v.toSeq) }.toSeq)
  }

  test("an emptied cluster keeps its previous centroid") {
    // centroid 1 starts on an outlier pulled away in iteration 1:
    // vec 0 at origin, vec 1 near the main mass; after one round both
    // points assign to whichever centroid won them, and a centroid with
    // zero members must carry its old coordinates forward
    val vecs = Seq(
      (0L, Seq(0.0, 0.0)),
      (1L, Seq(10.0, 10.0)),
      (2L, Seq(10.2, 10.2)),
      (3L, Seq(10.4, 10.4))).toDF("vec_id", "embedding")
    val m = Kmeans.fit(vecs, k = 2, iterations = 2)
    // cluster 0 = {0}; cluster 1 = {1,2,3} -> mean stays the mass
    val local = Seq((0L, microOf(Seq(0.0, 0.0))), (1L, microOf(Seq(10.0, 10.0))),
      (2L, microOf(Seq(10.2, 10.2))), (3L, microOf(Seq(10.4, 10.4))))
    val (want, _) = refKmeans(local, k = 2, iterations = 2)
    assert(m.centroids.map(_._2.toSeq).toSeq == want.map(_.toSeq).toSeq)
    // and a genuinely emptied cluster: both points nearer centroid 0
    // after round 1 -> centroid 1 keeps its init coordinates
    val collapse = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.4, 0.0)),
      (2L, Seq(0.1, 0.0)), (3L, Seq(0.2, 0.0))).toDF("vec_id", "embedding")
    val m2 = Kmeans.fit(collapse, k = 2, iterations = 2)
    val localC = Seq((0L, microOf(Seq(0.0, 0.0))), (1L, microOf(Seq(0.4, 0.0))),
      (2L, microOf(Seq(0.1, 0.0))), (3L, microOf(Seq(0.2, 0.0))))
    val (wantC, _) = refKmeans(localC, k = 2, iterations = 2)
    assert(m2.centroids.map(_._2.toSeq).toSeq == wantC.map(_.toSeq).toSeq)
  }
}
