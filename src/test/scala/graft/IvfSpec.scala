package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.{Ivf, Knn}

class IvfSpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sfDir)
  private def q0 = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))

  test("assignment covers every vector exactly once") {
    val assigned = Ivf.assign(emb, nCentroids = 16, VectorFunctions.cosine)
    assert(assigned.count() == emb.count())
    assert(assigned.select("vec_id").distinct().count() == emb.count())
    // each centroid vector is assigned to itself (distance 0 to own cell)
    val self = assigned.where(col("vec_id") < 16)
      .where(col("vec_id") === col("cent_id"))
    assert(self.count() == 16)
  }

  test("ivf knn returns k ascending rows including the query itself") {
    val r = Ivf.knn(emb, q0, k = 10, nCentroids = 16, nProbe = 4,
      metric = VectorFunctions.cosine).collect()
    assert(r.length == 10)
    assert(r.head.getLong(0) == 0L && r.head.getDouble(1) == 0.0)
    val ds = r.map(_.getDouble(1)).toSeq
    assert(ds == ds.sorted)
  }

  test("probing all cells reduces IVF to exact knn") {
    val ivfAll = Ivf.knn(emb, q0, k = 10, nCentroids = 16, nProbe = 16,
      metric = VectorFunctions.cosine).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val exact = Knn.knn(emb, q0, k = 10, metric = VectorFunctions.cosine)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(ivfAll.toSeq == exact.toSeq)
  }

  test("knn graph: k rows per vector, no self edges, all-cells = exact") {
    val g = Ivf.knnGraph(emb, k = 3, nCentroids = 8, nProbe = 2).collect()
    val n = emb.count()
    assert(g.length == n * 3) // every vector gets exactly k neighbors
    assert(g.forall(r => r.getLong(0) != r.getLong(1))) // no self edges
    // ranks are 1..k ascending by (distance, nbr_id) per source
    g.groupBy(_.getLong(0)).values.foreach { rows =>
      val byRank = rows.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq == Seq(1L, 2L, 3L))
      assert(byRank.map(_.getDouble(2)).toSeq == byRank.map(_.getDouble(2)).sorted.toSeq)
    }
    // probing every cell makes the graph exact: row 7's neighbors equal
    // the exact kNN of vector 7 (minus itself), computed with the same
    // normalize-then-(1 − dot) distance the graph uses
    val all = Ivf.knnGraph(emb, k = 3, nCentroids = 8, nProbe = 8)
      .where(col("src_id") === 7).orderBy(col("rank"))
      .collect().map(_.getLong(1)).toSeq
    val normed = emb.select(
      col("vec_id"), VectorFunctions.l2Normalize(col("embedding")).as("nv"))
    val q7 = normed.where(col("vec_id") === 7).select(col("nv").as("qn"))
    val exact7 = normed.crossJoin(broadcast(q7))
      .select(col("vec_id"),
        VectorFunctions.roundDist(
          lit(1.0) - VectorFunctions.dot(col("nv"), col("qn"))).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(4)
      .collect().map(_.getLong(0)).filter(_ != 7L).take(3).toSeq
    assert(all == exact7)
  }

  test("knn graph: salting never changes results, widens the shuffle key space") {
    // identical output with salting off vs the default on
    val unsalted = Ivf.knnGraph(emb, k = 3, nCentroids = 8, nProbe = 2, saltFactor = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sorted.toSeq
    val salted = Ivf.knnGraph(emb, k = 3, nCentroids = 8, nProbe = 2, saltFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).sorted.toSeq
    assert(salted == unsalted)
    // the candidate join keys on (cent_id, __salt) — with broadcast ruled
    // out the exchange partitions on BOTH columns, so the shuffle key space
    // is nCentroids × saltFactor, not nCentroids (the de-skew contract)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Ivf.knnGraph(emb, k = 3, nCentroids = 8, nProbe = 2, saltFactor = 8)
        .queryExecution.executedPlan.toString
      val partitionings = "hashpartitioning\\([^)]*\\)".r.findAllIn(plan).toSeq
      assert(partitionings.exists(p => p.contains("cent_id") && p.contains("__salt")),
        s"no (cent_id, __salt) exchange in:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("knnGraphStats invariants match a direct recount of the edge list") {
    val emb = Tables.embeddings(spark, sfDir)
    val edges = Ivf.knnGraph(emb, k = 5, nCentroids = 16, nProbe = 4)
      .select("src_id", "nbr_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edgeSet = edges.toSet
    val wantMutual = edges.count { case (s, n) => edgeSet.contains((n, s)) }
    val wantMaxIn = edges.groupBy(_._2).values.map(_.length).max
    val row = Ivf.knnGraphStats(emb, k = 5, nCentroids = 16, nProbe = 4).head()
    assert(row.getAs[Long]("n_nodes") === edges.map(_._1).distinct.length.toLong)
    assert(row.getAs[Long]("n_edges") === edges.length.toLong)
    assert(row.getAs[Long]("n_mutual") === wantMutual.toLong)
    assert(row.getAs[Long]("max_in_degree") === wantMaxIn.toLong)
    val rec = row.getAs[Double]("reciprocity")
    assert(rec >= 0.0 && rec <= 1.0)
    // mutual edges come in (a,b)/(b,a) pairs: the count is always even
    assert(row.getAs[Long]("n_mutual") % 2 === 0L)
    graft.CacheTracker.releaseAll()
  }
}
