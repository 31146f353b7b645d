package graft

import graft.operators.Embeddings

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions
import graft.operators.Knn

/** Exact kNN edge semantics from FIXTURES.md §B. */
class KnnSpec extends SparkSpec {

  private def mkCorpus(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  private val q = {
    import spark.implicits._
    Seq(Tuple1(Seq(1.0, 0.0))).toDF("qv")
  }

  test("empty corpus returns empty result (reference graph.py:178-179)") {
    val empty = mkCorpus(Nil)
    assert(Knn.knn(empty, q, 10, VectorFunctions.cosine).count() == 0)
  }

  test("k > corpus size returns all rows (reference graph.py:188-189)") {
    val corpus = mkCorpus(Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0)))
    assert(Knn.knn(corpus, q, 10, VectorFunctions.cosine).count() == 2)
  }

  test("ties break by id ascending (engine determinism rule)") {
    val corpus = mkCorpus(Seq(
      5L -> Seq(1.0, 0.0), 2L -> Seq(2.0, 0.0), 9L -> Seq(3.0, 0.0)))
    val r = Knn.knn(corpus, q, 3, VectorFunctions.cosine).collect()
    // all three are colinear with q → cosine distance 0 → id order
    assert(r.map(_.getLong(0)).toSeq == Seq(2L, 5L, 9L))
  }

  test("labelCentroids: element-wise group means in long form") {
    import spark.implicits._
    val df = Seq(
      (1, Seq(1.0, 2.0)), (1, Seq(3.0, 6.0)), // label 1 mean (2, 4)
      (2, Seq(10.0, 0.0))                     // label 2 mean (10, 0)
    ).toDF("label", "embedding")
    val got = Embeddings.labelCentroids(df)
      .collect()
      .map(r => ((r.getInt(0), r.getLong(1)), (r.getDouble(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      (1, 0L) -> (2.0, 2L), (1, 1L) -> (4.0, 2L),
      (2, 0L) -> (10.0, 1L), (2, 1L) -> (0.0, 1L)))
  }

  test("delete is an anti-join; deleting everything leaves nothing") {
    val corpus = mkCorpus(Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0)))
    import spark.implicits._
    val dels = Seq(1L, 2L).toDF("vec_id")
    assert(Knn.delete(corpus, dels).count() == 0)
  }
}
