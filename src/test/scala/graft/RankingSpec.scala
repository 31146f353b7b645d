package graft

import org.apache.spark.sql.functions._

import graft.operators.Ranking

/** BM25 semantics the DuckDB oracle (`bm25_terms`) can't isolate: exact
  * hand-computed scores on a tiny corpus, idf monotonicity, and tie
  * ordering.
  */
class RankingSpec extends SparkSpec {

  import spark.implicits._

  test("scores match the hand-computed BM25 formula on a tiny corpus") {
    val df = Seq(
      (1L, "cat cat dog"),
      (2L, "dog fish")).toDF("doc_id", "text")
    val got = Ranking.bm25TopTerms(df, topK = 10)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val n = 2.0
    val avgdl = 2.5
    def bm25(tf: Double, df: Double, dl: Double): Double = {
      val raw = math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got((1L, "cat")) == bm25(tf = 2, df = 1, dl = 3))
    assert(got((1L, "dog")) == bm25(tf = 1, df = 2, dl = 3))
    assert(got((2L, "dog")) == bm25(tf = 1, df = 2, dl = 2))
    assert(got((2L, "fish")) == bm25(tf = 1, df = 1, dl = 2))
    // rare "cat" outranks common "dog" at equal tf would require same dl;
    // within doc 1, tf=2 rare term dominates
    assert(got((1L, "cat")) > got((1L, "dog")))
  }

  test("topK truncates by rank with ties broken by token") {
    val df = Seq((1L, "b a c d")).toDF("doc_id", "text")
    // all four tokens tie on score (same tf/df/dl) → alphabetical ranks
    val rows = Ranking.bm25TopTerms(df, topK = 3)
      .collect().map(r => (r.getString(1), r.getLong(3)))
    assert(rows.toSeq == Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("idf is monotone: a term in every doc ranks below a rare term (fixture)") {
    val docs = Tables.documents(spark, sfDir)
    val out = Ranking.bm25TopTerms(docs, topK = 3)
    assert(out.count() > 0)
    // every doc gets at most topK rows and ranks are 1..k
    val bad = out.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
      .where(col("n") =!= col("mx") || col("n") > 3)
    assert(bad.count() == 0)
  }

  test("retrievalEval: perfect, disjoint, and partial runs by hand") {
    def frame(rows: Seq[(Long, Long, Long)]) =
      rows.toDF("query_id", "vec_id", "rank")
    val truth = frame(Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L),
      (3L, 30L, 1L), (3L, 31L, 2L), (3L, 32L, 3L)))
    val run = frame(Seq(
      // q1: perfect (same set, same order)
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      // q2: disjoint
      (2L, 90L, 1L), (2L, 91L, 2L), (2L, 92L, 3L),
      // q3: one hit at rank 2
      (3L, 95L, 1L), (3L, 31L, 2L), (3L, 96L, 3L)))
    val got = Ranking.retrievalEval(truth, run, k = 3).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln2 = math.log(2.0)
    def log2(x: Double) = math.log(x) / ln2
    assert(got(1L) == ((3L, 1.0, 1.0, 1.0)))
    assert(got(2L) == ((0L, 0.0, 0.0, 0.0)))
    val idcg = 1.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    val dcg3 = 1.0 / log2(3.0) // single hit at rank 2
    assert(got(3L) == ((1L,
      r6(1.0 / 3.0), r6(1.0 / 2.0), r6(dcg3 / idcg))), got(3L).toString)
  }
}
