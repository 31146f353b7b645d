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
}
