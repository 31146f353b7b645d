package graft

import graft.operators.Hybrid

/** RRF fusion semantics on a corpus small enough to hand-compute: rank
  * arithmetic, single-leg docs (rank 0 on the missed leg), tie-breaks,
  * and leg truncation. The fixture-scale result is DuckDB-oracle-checked
  * (`hybrid_search`).
  */
class HybridSpec extends SparkSpec {

  import spark.implicits._

  // docs 0,1 share the query terms; 2,3 share none. Vector ranks to
  // (1,0): 0 (d=0), 2 (d~0.006), 1 (d=1), 3 (d=2).
  private lazy val docs = Seq(
    (0L, "alpha beta"), (1L, "alpha beta"),
    (2L, "gamma delta"), (3L, "epsilon zeta")).toDF("doc_id", "text")
  private lazy val emb = Seq(
    (0L, Array(1f, 0f)), (1L, Array(0f, 1f)),
    (2L, Array(0.9f, 0.1f)), (3L, Array(-1f, 0f))).toDF("vec_id", "embedding")

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("fused scores are the hand-computed reciprocal rank sums") {
    val got = Hybrid.rrfHybridSearch(docs, emb, queryDocId = 0L)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    // lex ranks: doc0=1, doc1=2 (tie on equal score broken by id); 2,3 absent
    // vec ranks: doc0=1, doc2=2, doc1=3, doc3=4
    val expected = Seq(
      (0L, round6(1.0 / 61 + 1.0 / 61), 1L, 1L),
      (1L, round6(1.0 / 62 + 1.0 / 63), 2L, 3L),
      (2L, round6(1.0 / 62), 0L, 2L),
      (3L, round6(1.0 / 64), 0L, 4L))
    assert(got.toSeq == expected)
  }

  test("legK truncates both legs; docs outside both legs never appear") {
    val got = Hybrid.rrfHybridSearch(docs, emb, queryDocId = 0L, legK = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L)) // doc 0 tops both legs; nothing else survives
  }

  test("batch output equals per-query single runs (fixtures, all 5 queries)") {
    val d = Tables.documents(spark, sfDir)
    val e = Tables.embeddings(spark, sfDir)
    val batch = Hybrid.rrfHybridBatch(d, e).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.map(r =>
          (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toSeq
      }
    assert(batch.keySet == Set(0L, 1L, 2L, 3L, 4L))
    for (qid <- 0L to 4L) {
      val single = Hybrid.rrfHybridSearch(d, e, queryDocId = qid).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(batch(qid) == single, s"query $qid batch != single")
    }
  }

  test("the query doc tops the fused ranking on the fixtures") {
    val out = Hybrid.rrfHybridSearch(
      Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir))
      .collect()
    assert(out.head.getLong(0) == 0L)
    // the query doc is exact-match on the vector leg; on the lexical leg
    // a longer doc can out-score it (tf saturation) — present, not rank 1
    assert(out.head.getLong(3) == 1L)
    assert(out.head.getLong(2) >= 1L)
    assert(out.length == 10)
  }
}
