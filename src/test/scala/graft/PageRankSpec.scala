package graft

import org.apache.spark.sql.functions._

import graft.operators.{GraphOps, Ivf}

/** Integer-exact PageRank invariants: a plain-Scala reference replay,
  * symmetry on a cycle, authority on a star, mass accounting, and the
  * fixture-graph run.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = 1000000000L

  /** Plain-Scala reference of the same integer recurrence. */
  private def refPageRank(
      edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] = {
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.size
    val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(v => v -> Scale / n).toMap
    (1 to iterations).foreach { _ =>
      val inc = edges
        .map { case (s, d) => d -> r(s) / odeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map { v =>
        v -> ((Scale * 15 / 100) / n + inc.getOrElse(v, 0L) * 85 / 100)
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iterations: Int) =
    GraphOps.pageRank(
      edges.toDF("src_id", "nbr_id"), iterations = iterations)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the plain-Scala integer reference on a mixed graph") {
    val edges = Seq[(Long, Long)](
      (0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 2), (4, 3), (4, 0))
    assert(run(edges, 5) == refPageRank(edges, 5))
    assert(run(edges, 1) == refPageRank(edges, 1))
  }

  test("cycle symmetry: every node on a ring gets the identical rank") {
    val ring = (0L until 5L).map(i => (i, (i + 1) % 5))
    val got = run(ring, 5)
    assert(got.values.toSet.size == 1, got)
  }

  test("star authority: the hub outranks every leaf") {
    // leaves 1..4 point at hub 0; hub closes the graph pointing at 1
    val star = Seq[(Long, Long)]((1, 0), (2, 0), (3, 0), (4, 0), (0, 1))
    val got = run(star, 5)
    assert(got(0L) > got.filterKeys(_ != 0L).values.max, got)
  }

  test("mass is conserved up to deterministic truncation") {
    val edges = Seq[(Long, Long)](
      (0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 2), (4, 3), (4, 0))
    val total = run(edges, 5).values.sum
    // each division layer sheds < 1 micro-unit per node per iteration
    assert(total <= Scale && total > Scale - 5 * 3 * 5, total)
  }

  /** Reference for the personalized recurrence: teleport and init mass
    * restricted to `seeds`.
    */
  private def refPersonalized(
      edges: Seq[(Long, Long)], seeds: Set[Long], iterations: Int): Map[Long, Long] = {
    val nodes = edges.map(_._1).distinct.sorted
    val ns = nodes.count(seeds.contains)
    val odeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(v => v -> (if (seeds.contains(v)) Scale / ns else 0L)).toMap
    (1 to iterations).foreach { _ =>
      val inc = edges
        .map { case (s, d) => d -> r(s) / odeg(s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map { v =>
        val base = if (seeds.contains(v)) (Scale * 15 / 100) / ns else 0L
        v -> (base + inc.getOrElse(v, 0L) * 85 / 100)
      }.toMap
    }
    r
  }

  test("personalized: matches the seed-gated reference; mass stays near seeds") {
    import spark.implicits._
    // two loosely-coupled triangles: 0-1-2 and 10-11-12, one bridge 2->10
    val edges = Seq[(Long, Long)](
      (0, 1), (1, 2), (2, 0), (2, 10), (10, 11), (11, 12), (12, 10))
    val seeds = Seq(0L, 1L).toDF("vec_id")
    val got = GraphOps.personalizedPageRank(
      edges.toDF("src_id", "nbr_id"), seeds, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPersonalized(edges, Set(0L, 1L), 5))
    // the seed triangle holds more mass than the far one
    val near = got(0L) + got(1L) + got(2L)
    val far = got(10L) + got(11L) + got(12L)
    assert(near > far, got)
  }

  test("personalized: a seed set missing every node fails loudly, not NULL ranks") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src_id", "nbr_id")
    val seeds = Seq(99L).toDF("node_id") // intersects nothing
    val e = intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(edges, seeds, iterations = 2).collect()
    }
    assert(e.getMessage.contains("no seed intersects"))
  }

  test("personalized with ALL nodes as seeds equals the global walk") {
    import spark.implicits._
    val edges = Seq[(Long, Long)](
      (0, 1), (0, 2), (1, 2), (2, 0), (3, 0), (3, 2), (4, 3), (4, 0))
    val all = edges.map(_._1).distinct.toDF("vec_id")
    val global = run(edges, 5)
    val pers = GraphOps.personalizedPageRank(
      edges.toDF("src_id", "nbr_id"), all, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pers == global)
  }

  /** Reference label propagation: synchronous majority of out-neighbor
    * labels, ties to the smaller label, seeds clamped, −1 = unlabeled.
    */
  private def refLabelProp(
      edges: Seq[(Long, Long)], seeds: Map[Long, Long], iterations: Int)
    : Map[Long, Long] = {
    val nodes = edges.map(_._1).distinct.sorted
    var lab = nodes.map(v => v -> seeds.getOrElse(v, -1L)).toMap
    (1 to iterations).foreach { _ =>
      val next = nodes.map { v =>
        if (seeds.contains(v)) v -> seeds(v)
        else {
          val votes = edges.collect { case (s, d) if s == v && lab(d) >= 0 => lab(d) }
          if (votes.isEmpty) v -> lab(v)
          else {
            val (bestLab, _) = votes.groupBy(identity).view.mapValues(_.size)
              .toSeq.maxBy { case (l, c) => (c, -l) }
            v -> bestLab
          }
        }
      }.toMap
      lab = next
    }
    lab
  }

  test("label propagation matches the reference; seeds stay clamped") {
    import spark.implicits._
    // chain 0-1-2-3-4 (each points both ways; ends self-close), seeds at the ends
    val edges = Seq[(Long, Long)](
      (0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3))
    val seeds = Seq((0L, 7L), (4L, 9L)).toDF("vec_id", "label")
    val got = GraphOps.labelPropagation(
      edges.toDF("src_id", "nbr_id"), seeds, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refLabelProp(edges, Map(0L -> 7L, 4L -> 9L), 4))
    assert(got(0L) == 7L && got(4L) == 9L)
    // interior nodes got labeled from the frontier
    assert(got.values.forall(_ >= 0))
  }

  test("label propagation tie breaks to the smaller label") {
    import spark.implicits._
    // node 2 hears one vote each for labels 5 and 3 -> takes 3
    val edges = Seq[(Long, Long)]((2, 0), (2, 1), (0, 2), (1, 2))
    val seeds = Seq((0L, 5L), (1L, 3L)).toDF("vec_id", "label")
    val got = GraphOps.labelPropagation(
      edges.toDF("src_id", "nbr_id"), seeds, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) == 3L, got)
  }

  test("label propagation spreads over the fixture graph, seeds clamped") {
    // NOTE the fixture's labels are independent of embedding geometry
    // (same-label fraction among 5-NN ≈ 1/|labels|), so recovery
    // ACCURACY is not assertable here — the reference-parity tests above
    // gate correctness; this gates spread, clamping, and determinism.
    val emb = Tables.embeddings(spark, sfDir)
    val seeds = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("label"))
    val edges = graft.operators.Ivf.knnGraph(emb, k = 5, nCentroids = 8, nProbe = 4)
    val out = GraphOps.labelPropagation(edges, seeds, iterations = 5)
    val rows = out.collect()
    assert(rows.length == emb.count())
    // labels spread to (nearly) everyone within 5 hops of a seed
    val labeled = rows.count(_.getLong(1) >= 0)
    assert(labeled >= rows.length * 9 / 10, s"only $labeled labeled")
    // seeds kept their true label
    val truth = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(r => truth.contains(r.getLong(0)))
      .foreach(r => assert(r.getLong(1) == truth(r.getLong(0))))
    // deterministic across runs
    val again = GraphOps.labelPropagation(edges, seeds, iterations = 5)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("label propagation local and distributed paths are bit-identical") {
    import spark.implicits._
    def both(edges: org.apache.spark.sql.DataFrame,
             seeds: org.apache.spark.sql.DataFrame, iters: Int) = {
      val local = GraphOps.labelPropagation(edges, seeds, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val dist = GraphOps.labelPropagation(edges, seeds, iters,
        smallEdgeThreshold = 0L) // force the distributed rounds
      assert(dist.schema == GraphOps.labelPropagation(edges, seeds, iters).schema)
      (local, dist.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    }
    // tie-heavy small graph
    val tieEdges = Seq[(Long, Long)]((2, 0), (2, 1), (0, 2), (1, 2))
      .toDF("src_id", "nbr_id")
    val tieSeeds = Seq((0L, 5L), (1L, 3L)).toDF("vec_id", "label")
    val (tl, td) = both(tieEdges, tieSeeds, 3)
    assert(tl == td)
    // fixture kNN graph — persisted AND materialized like the query
    // map's shared graph, so the planner-stat gate sees the accurate
    // cached size (pre-materialization estimates are cross-join
    // inflated and would misroute small graphs to the distributed path)
    val emb = Tables.embeddings(spark, sfDir)
    val seeds = emb.where(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("label"))
    val edges = graft.operators.Ivf.knnGraph(emb, k = 5, nCentroids = 8, nProbe = 4)
      .persist()
    edges.count()
    try {
      val defaultPlan = GraphOps.labelPropagation(edges, seeds, 5)
        .queryExecution.executedPlan.toString
      assert(defaultPlan.contains("LocalTableScan"),
        s"small materialized graph did not take the local path:\n$defaultPlan")
      val (fl, fd) = both(edges, seeds, 5)
      assert(fl == fd)
    } finally edges.unpersist()
  }

  test("triangle census: closed forms on known graphs") {
    import spark.implicits._
    def stats(edges: Seq[(Long, Long)]) =
      GraphOps.triangleStats(edges.toDF("src_id", "nbr_id")).collect().head
    // K4: 4 nodes, 6 edges, 12 wedges, 4 triangles, clustering 1.0
    val k4 = for {
      a <- 0L until 4L; b <- 0L until 4L if a != b
    } yield (a, b)
    val s4 = stats(k4)
    assert((s4.getLong(0), s4.getLong(1), s4.getLong(2), s4.getLong(3)) ==
      (4L, 6L, 12L, 4L))
    assert(s4.getDouble(4) == 1.0)
    // triangle + pendant: 0-1-2 closed, 3 hangs off 0 -> 1 triangle,
    // wedges = 3+1+1+0 at nodes (deg 3,2,2,1) = 3+1+1+0 = 5
    val pend = Seq[(Long, Long)]((0, 1), (1, 2), (2, 0), (0, 3))
    val sp = stats(pend)
    assert((sp.getLong(1), sp.getLong(2), sp.getLong(3)) == (4L, 5L, 1L))
    // star: no triangles, clustering 0.0
    val star = Seq[(Long, Long)]((1, 0), (2, 0), (3, 0))
    val ss = stats(star)
    assert(ss.getLong(3) == 0L && ss.getDouble(4) == 0.0)
    // direction and duplicates don't matter: the undirected closure dedups
    val dup = stats(Seq[(Long, Long)]((0, 1), (1, 0), (1, 2), (2, 0), (0, 2)))
    assert(dup.getLong(1) == 3L && dup.getLong(3) == 1L)
  }

  test("triangle census matches a brute-force count on the fixture graph") {
    val edges = graft.operators.Ivf.knnGraph(
      Tables.embeddings(spark, sfDir), k = 5, nCentroids = 8, nProbe = 4)
    val got = GraphOps.triangleStats(edges).collect().head
    // brute force over the collected undirected closure
    val und = edges.select(col("src_id"), col("nbr_id")).collect()
      .flatMap(r => Seq((r.getLong(0), r.getLong(1)), (r.getLong(1), r.getLong(0))))
      .filter { case (a, b) => a < b }.distinct.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }.toSeq.distinct
    val tri = (for {
      Seq(a, b, c) <- nodes.sorted.combinations(3)
      if und(a -> b) && und(a -> c) && und(b -> c)
    } yield 1).size.toLong
    assert(got.getLong(3) == tri, s"got ${got.getLong(3)} want $tri")
    assert(got.getLong(1) == und.size.toLong)
  }

  test("fixture kNN graph: every corpus vector ranked, pr consistent") {
    val out = GraphOps.pageRank(
      Ivf.knnGraph(Tables.embeddings(spark, sfDir),
        k = 5, nCentroids = 8, nProbe = 4),
      iterations = 3)
    val rows = out.collect()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(rows.length == n)
    // pr is exactly the rounded micro value
    rows.foreach { r =>
      val want = BigDecimal(r.getLong(1) / Scale.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(r.getDouble(2) == want)
    }
  }
}
