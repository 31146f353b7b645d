package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Ivf, IvfTrained, Knn}

/** MLlib-trained IVF: reproducibility and recall-vs-exact quality gate. */
class IvfTrainedSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val model = IvfTrained.train(emb, nCentroids = 16, spherical = true)

  test("training is reproducible at a fixed seed") {
    val again = IvfTrained.train(emb, nCentroids = 16, spherical = true)
    assert(model.centroids.map(_._2.toSeq).toSeq ==
      again.centroids.map(_._2.toSeq).toSeq)
  }

  test("every vector lands in exactly one cell; cells cover the corpus") {
    val assigned = IvfTrained.assign(emb, model)
    assert(assigned.count() == emb.count())
    assert(assigned.groupBy(col("vec_id")).count().where(col("count") > 1).count() == 0)
  }

  test("recall@10 vs exact beats the deterministic lowest-id IVF at equal probe") {
    // fixture vectors are near-random in 64-d, so absolute recall at
    // nProbe/nCentroids = 1/4 is inherently modest for ANY cell method;
    // the gate here is trained-vs-naive and trained-vs-proportional.
    // Query 100 is NOT one of the naive variant's id-chosen centroids —
    // querying a centroid vector hands naive its cell for free.
    val q = emb.where(col("vec_id") === 100).select(col("embedding").as("qv"))
    val exact = Knn.knn(emb, q, 10, VectorFunctions.cosine)
      .collect().map(_.getLong(0)).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      (df.collect().map(_.getLong(0)).toSet & exact).size / 10.0
    val trained = recall(
      IvfTrained.knn(emb, q, model, k = 10, nProbe = 4, VectorFunctions.cosine))
    val naive = recall(
      Ivf.knn(emb, q, k = 10, nCentroids = 16, nProbe = 4, VectorFunctions.cosine))
    assert(trained >= 0.25, s"trained recall $trained below proportional baseline")
    assert(trained >= naive, s"trained $trained < naive $naive")
  }

  test("knnExact equals the brute-force exact top-k for every query tried") {
    for (qid <- Seq(0L, 100L, 257L)) {
      val q = emb.where(col("vec_id") === qid).select(col("embedding").as("qv"))
      val exact = Knn.knn(emb, q, 10, VectorFunctions.cosine)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = IvfTrained.knnExact(emb, q, model, k = 10, nProbeSeed = 4)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == exact, s"qid=$qid")
    }
  }

  test("knnExact stays exact under a deliberately bad quantizer") {
    // one Lloyd iteration from a different seed: poor cells, but the
    // radius bound only prunes provably top-k-free cells — exactness is
    // a property of the math, not the model
    val bad = IvfTrained.train(emb, nCentroids = 16, spherical = true,
      seed = 7L, maxIter = 1)
    val q = emb.where(col("vec_id") === 100).select(col("embedding").as("qv"))
    val exact = Knn.knn(emb, q, 10, VectorFunctions.cosine)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = IvfTrained.knnExact(emb, q, bad, k = 10, nProbeSeed = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact)
  }

  test("knnExact euclidean over a raw model is exact; metric/model mismatch rejects") {
    val raw = IvfTrained.train(emb, nCentroids = 16, spherical = false)
    val q = emb.where(col("vec_id") === 42).select(col("embedding").as("qv"))
    val exact = Knn.knn(emb, q, 10, VectorFunctions.euclidean)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = IvfTrained.knnExact(emb, q, raw, k = 10, nProbeSeed = 4,
      metricName = "euclidean")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact)
    intercept[IllegalArgumentException] {
      IvfTrained.knnExact(emb, q, raw, k = 10, metricName = "cosine")
    }
    intercept[IllegalArgumentException] {
      IvfTrained.knnExact(emb, q, model, k = 10, metricName = "euclidean")
    }
  }

  test("knnExactBatch equals brute-force knnBatch per query, even with a bad model") {
    val queries = emb.where(col("vec_id") < 7)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = Knn.knnBatch(emb, queries, k = 10, VectorFunctions.cosine)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("distance"))).sorted.toSeq
    for (mdl <- Seq(model,
        IvfTrained.train(emb, nCentroids = 16, spherical = true, seed = 99L, maxIter = 1))) {
      val got = IvfTrained.knnExactBatch(emb, queries, mdl, k = 10, nProbeSeed = 3)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("vec_id"), r.getAs[Double]("distance"))).sorted.toSeq
      graft.CacheTracker.releaseAll()
      assert(got == exact)
    }
  }

  test("on clustered data the radius bound prunes most cells") {
    import spark.implicits._
    val rnd = new java.util.Random(5L)
    val dim = 32
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 2000).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + 0.1 * rnd.nextGaussian()).toSeq)
    }
    val data = rows.toDF("vec_id", "embedding")
    val m = IvfTrained.train(data, nCentroids = 16, spherical = true)
    val q = data.where(col("vec_id") === 7).select(col("embedding").as("qv"))
    val assigned = IvfTrained.assignWithDist(data, m)
    val cells = IvfTrained.exactCandidateCells(
      assigned, q, m, k = 10, nProbeSeed = 2,
      VectorFunctions.cosine, cosineSpace = true, "vec_id", "embedding")
    assert(cells.size < 16, s"no pruning: $cells")
    assert(cells.size <= 8, s"weak pruning on tightly clustered data: $cells")
    // and the pruned search still equals exact
    val exact = Knn.knn(data, q, 10, VectorFunctions.cosine)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = IvfTrained.knnExact(data, q, m, k = 10, nProbeSeed = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == exact)
  }

  test("cell-partitioned layout: the exact probe's cell filter prunes the scan") {
    // the 100 TB shape: assignment written partitioned by cell, so the
    // surviving-cell filter of the exact probe becomes PARTITION PRUNING
    // at the scan — files of pruned cells are never opened
    val dir = java.nio.file.Files.createTempDirectory("ivf_cells").toString
    val assigned = IvfTrained.assignWithDist(emb, model)
    assigned.write.mode("overwrite").partitionBy("cent_id").parquet(dir)
    val back = spark.read.parquet(dir)
    val q = emb.where(col("vec_id") === 100).select(col("embedding").as("qv"))
    val cells = IvfTrained.exactCandidateCells(
      back, q, model, k = 10, nProbeSeed = 4,
      graft.functions.VectorFunctions.cosine, cosineSpace = true,
      "vec_id", "embedding")
    assert(cells.nonEmpty && cells.size < 16, s"no pruning at all: $cells")
    val probe = back.where(col("cent_id").isin(cells: _*))
    probe.collect()
    val scans = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val filesTotal = back.inputFiles.length
    assert(filesRead < filesTotal,
      s"scan read all $filesTotal files — cell filter did not prune")
    val planStr = probe.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("cent_id"),
      s"no partition filter on cent_id in:\n$planStr")
  }

  test("on clustered data, spherical cells recover >= 0.9 recall at nProbe 2/16") {
    // 16 directional clusters on the unit sphere — the workload IVF exists
    // for. Trained cells align with the clusters; probing 2 of 16 cells
    // must capture the query's cluster.
    import spark.implicits._
    val rnd = new java.util.Random(11L)
    val dim = 32
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 2000).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => x + 0.15 * rnd.nextGaussian()).toSeq)
    }
    val data = rows.toDF("vec_id", "embedding")
    val m = IvfTrained.train(data, nCentroids = 16, spherical = true)
    val q = data.where(col("vec_id") === 7).select(col("embedding").as("qv"))
    val exact = Knn.knn(data, q, 10, VectorFunctions.cosine)
      .collect().map(_.getLong(0)).toSet
    val got = IvfTrained.knn(data, q, m, k = 10, nProbe = 2, VectorFunctions.cosine)
      .collect().map(_.getLong(0)).toSet
    assert((got & exact).size >= 9, s"exact=$exact got=$got")
  }
}
