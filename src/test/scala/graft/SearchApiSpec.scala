package graft

import org.apache.spark.sql.functions._

import graft.operators.SearchApi

/** A1-A6 request semantics (reference api/rest/server.py). */
class SearchApiSpec extends SparkSpec {

  lazy val emb = Tables.embeddings(spark, sfDir)
  private def q0 = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))

  test("k bounds enforced: 1 <= k <= 1000 (server.py:33)") {
    intercept[IllegalArgumentException](SearchApi.validateK(0))
    intercept[IllegalArgumentException](SearchApi.validateK(1001))
    assert(SearchApi.validateK(1) == 1 && SearchApi.validateK(1000) == 1000)
  }

  test("ef defaults to max(efSearch, k) (graph.py:180-181)") {
    assert(SearchApi.effectiveEf(None, efSearch = 50, k = 10) == 50)
    assert(SearchApi.effectiveEf(None, efSearch = 50, k = 200) == 200)
    assert(SearchApi.effectiveEf(Some(80), efSearch = 50, k = 10) == 80)
    assert(SearchApi.effectiveEf(Some(5), efSearch = 50, k = 10) == 10)
  }

  test("search returns k results + total_searched; dim mismatch rejected (server.py:159-186)") {
    val meta = emb.select(col("vec_id"), col("label"))
    val r = SearchApi.search(emb, meta, q0, dim = 64, k = 5)
    assert(r.totalSearched == 500)
    val rows = r.results.collect()
    assert(rows.length == 5)
    assert(rows.head.getAs[Long]("vec_id") == 0L) // self-match first
    intercept[IllegalArgumentException](
      SearchApi.search(emb, meta, q0, dim = 128, k = 5))
  }

  test("batch insert counts failures without aborting (server.py:202-230)") {
    val corrupted = emb.limit(100).withColumn(
      "embedding",
      when(col("vec_id") % 10 === 0, slice(col("embedding"), 1, 32))
        .otherwise(col("embedding")))
    val r = SearchApi.batchInsert(emb, corrupted, dim = 64)
    assert(r.inserted + r.failed == 100)
    assert(r.failed == corrupted.where(size(col("embedding")) =!= 64).count())
    assert(r.corpus.count() == 500 + r.inserted)
  }

  test("health reports liveness + count (server.py:248-254)") {
    assert(SearchApi.health(emb) == ("healthy", 500L))
  }
}
