package graft

import org.apache.spark.sql.functions._

import graft.operators.Projection

/** JL random projection: matrix determinism, map-only plan, norm
  * preservation (the JL property at loose fixture-scale tolerance), and
  * the reduce-then-search face.
  */
class ProjectionSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("projection is deterministic and partitioning-independent") {
    val a = Projection.randomProjectTable(emb, 64, 16).collect()
    val b = Projection.randomProjectTable(emb.repartition(7), 64, 16).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == emb.count() * 16)
  }

  test("sign matrix matches the md5 hex-string rule stated for the oracle") {
    // independent restatement: hex-encode the md5 and compare char 0,
    // exactly what the DuckDB CASE does
    val hex = "0123456789abcdef"
    for (i <- 0 until 64; j <- 0 until 16) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$j".getBytes("UTF-8"))
      val firstHexChar = hex((d(0) >> 4) & 0xf)
      val expected = if (firstHexChar < '8') 1.0 else -1.0
      // recover the engine's sign from a 1-row projection of basis vector e_i
      // (too slow per (i,j)); instead trust projectColumn and check the rule
      // against the PRIVATE row via a unit projection below
      assert((if ((d(0) & 0x80) == 0) 1.0 else -1.0) == expected)
    }
    // unit test the composed column on a basis vector: projecting e_i must
    // emit exactly sign(i, j)/sqrt(dOut) in slot j
    import spark.implicits._
    val i0 = 5
    val basis = Seq((0L, Array.tabulate(64)(i => if (i == i0) 1.0 else 0.0)))
      .toDF("vec_id", "embedding")
    val got = Projection.randomProject(basis, 64, 16)
      .select(col("rp")).as[Seq[Double]].head()
    for (j <- 0 until 16) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i0:$j".getBytes("UTF-8"))
      val s = if ((d(0) & 0x80) == 0) 1.0 else -1.0
      val expect = BigDecimal(s / math.sqrt(16.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(j) - expect) < 1e-9, s"slot $j: ${got(j)} vs $expect")
    }
  }

  test("projection plans map-only: no exchange, no join") {
    val plan = Projection.randomProject(emb, 64, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle leaked into:\n$plan")
    assert(!plan.contains("Join"), s"join leaked into:\n$plan")
  }

  test("norms are preserved on average (the JL contract, loose gate)") {
    // E[‖Pv‖²] = ‖v‖² for a Rademacher JL matrix; per-row deviation is
    // O(1/√dOut) ≈ 0.35 at dOut=16, so gate the MEAN relative deviation
    // well above its expectation but far below "broken"
    val p = Projection.randomProject(emb, 64, 16)
    val joined = emb.select(col("vec_id"),
        aggregate(col("embedding").cast("array<double>"), lit(0.0),
          (a, x) => a + x * x).as("n2"))
      .join(p, "vec_id")
      .select((abs(aggregate(col("rp"), lit(0.0), (a, x) => a + x * x) /
        col("n2") - 1.0)).as("dev"))
    val meanDev = joined.agg(avg(col("dev"))).head().getDouble(0)
    assert(meanDev < 0.5, s"mean relative norm distortion $meanDev")
  }

  test("projectedKnn: k ascending rows from the projected space") {
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val res = Projection.projectedKnn(emb, q, 64, 16, k = 10).collect()
    assert(res.length == 10)
    val ds = res.map(_.getAs[Double]("distance"))
    assert(ds.sameElements(ds.sorted))
    // vec 0 is its own nearest neighbor at distance 0 in ANY linear map
    assert(res.head.getAs[Long]("vec_id") == 0L && ds.head == 0.0)
  }

  test("projectedKnnRerank: exact full-dim distances over the projected cut") {
    import graft.functions.VectorFunctions
    import graft.operators.Knn
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val res = Projection.projectedKnnRerank(emb, q, 64, 16,
      k = 10, candFactor = 8).collect()
    assert(res.length == 10)
    val ds = res.map(_.getAs[Double]("distance"))
    assert(ds.sameElements(ds.sorted))
    // every returned row comes from the k·candFactor projected cut
    val cands = Projection.projectedKnn(emb, q, 64, 16, k = 80)
      .collect().map(_.getLong(0)).toSet
    assert(res.forall(r => cands.contains(r.getLong(0))))
    // distances are the EXACT full-dim cosine — each must equal the
    // exact-knn distance for the same id wherever the two share ids
    val exact = Knn.knn(emb, q, 1000, VectorFunctions.cosine)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    res.foreach(r => assert(exact(r.getLong(0)) == r.getDouble(1)))
    // candFactor wide enough to cover the corpus ⇒ the composition IS
    // exact knn, row for row
    val n = emb.count().toInt
    val full = Projection.projectedKnnRerank(emb, q, 64, 16,
      k = 10, candFactor = (n + 9) / 10).collect()
    val truth = Knn.knn(emb, q, 10, VectorFunctions.cosine).collect()
    assert(full.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      truth.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
