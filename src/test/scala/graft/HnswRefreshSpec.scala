package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.index.HnswSpark

/** Incremental resident-index refresh from the mutation log (round-11):
  * a bounded batch applied to loaded shards via the build's own
  * partitioner must serve the same results as a full rebuild over the
  * folded table — at generous ef both searches are effectively
  * exhaustive over the live set, so parity is exact, not statistical
  * (everything is seeded: the gate is deterministic).
  */
class HnswRefreshSpec extends SparkSpec {

  private val params = HnswSpark.Params(dim = 64)
  private val P = 4
  private val bigEf = Some(2000) // >> live count: exhaustive search

  private def emb = Tables.embeddings(spark, sfDir)
  private def base = emb.where(col("vec_id") < 300)

  // vectors for new/overwrite ids borrowed from other fixture rows so
  // every vector is a real dim-64 embedding
  private def vecOf(srcId: Long) = emb.where(col("vec_id") === srcId)
    .select(col("embedding")).head().getSeq[Double](0)

  /** (seq, op, vec_id, vec): 50 brand-new ids, 10 overwrites of existing
    * ids with DIFFERENT vectors, 20 deletes, one delete-miss, and one
    * id mutated twice (insert then delete — seq order must win).
    */
  private def mutationBatch: DataFrame = {
    import spark.implicits._
    val newRows = (0 until 50).map { i =>
      (1000L + i, "insert", 10000L + i, Some(vecOf(300L + i)))
    }
    val overwrites = (0 until 10).map { i =>
      (2000L + i, "insert", i.toLong, Some(vecOf(350L + i)))
    }
    val deletes = (0 until 20).map { i =>
      (3000L + i, "delete", 20L + i, Option.empty[Seq[Double]])
    }
    val miss = Seq((4000L, "delete", 99999L, Option.empty[Seq[Double]]))
    val churn = Seq(
      (5000L, "insert", 10100L, Some(vecOf(400L))),
      (5001L, "delete", 10100L, Option.empty[Seq[Double]]))
    (newRows ++ overwrites ++ deletes ++ miss ++ churn)
      .toDF("seq", "op", "vec_id", "vec")
  }

  /** The folded post-mutation table a full rebuild would index. */
  private def foldedTable: DataFrame = {
    import spark.implicits._
    val deleted = (20L until 40L).toSet + 10100L
    val overwritten = (0L until 10L).toSet
    val kept = base.where(!col("vec_id").isin((deleted ++ overwritten).toSeq: _*))
      .select(col("vec_id"), col("embedding"))
    val news = (0 until 50).map(i => (10000L + i, vecOf(300L + i)))
      .toDF("vec_id", "embedding")
    val over = (0 until 10).map(i => (i.toLong, vecOf(350L + i)))
      .toDF("vec_id", "embedding")
    kept.unionByName(news).unionByName(over)
  }

  private def queriesDf = emb.where(col("vec_id") >= 450 && col("vec_id") < 466)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  private def canon(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._3, t._2)).toSeq

  test("refreshed shards serve the same rows as a full rebuild over the folded table") {
    val shards = HnswSpark.buildResident(base, params, P)
    val refreshed = HnswSpark.refreshResident(shards, mutationBatch, params)
    val rebuilt = HnswSpark.buildResident(foldedTable, params, P)
    try {
      val viaRefresh = canon(
        HnswSpark.searchResident(spark, refreshed, queriesDf, k = 10, bigEf))
      val viaRebuild = canon(
        HnswSpark.searchResident(spark, rebuilt, queriesDf, k = 10, bigEf))
      assert(viaRefresh === viaRebuild)
      assert(viaRefresh.nonEmpty)
    } finally {
      shards.unpersist(true); refreshed.unpersist(true); rebuilt.unpersist(true)
    }
  }

  test("overwrite/delete/churn semantics land on the refreshed index") {
    val shards = HnswSpark.buildResident(base, params, P)
    val refreshed = HnswSpark.refreshResident(shards, mutationBatch, params)
    try {
      val all = refreshed.collect()
      // deletes gone, miss harmless, insert-then-delete churn gone
      for (id <- (20L until 40L) ++ Seq(10100L))
        assert(!all.exists(_.containsId(id)), s"id $id must be deleted")
      // new ids present exactly once (hash routing: one owner shard)
      for (i <- 0 until 50)
        assert(all.count(_.containsId(10000L + i)) === 1)
      // overwritten id serves its NEW vector at distance 0
      val newVec = vecOf(350L).toArray
      val hits = HnswSpark.searchAll(all.toSeq, newVec, k = 1, bigEf)
      assert(hits.head._1 === 0L && hits.head._2 < 1e-12)
      // live count = folded-table cardinality
      assert(all.map(_.size.toLong).sum === foldedTable.count())
    } finally { shards.unpersist(true); refreshed.unpersist(true) }
  }

  test("empty batch: untouched shards pass through and serve identical rows") {
    import spark.implicits._
    val shards = HnswSpark.buildResident(base, params, P)
    val refreshed = HnswSpark.refreshResident(
      shards,
      Seq.empty[(Long, String, Long, Option[Seq[Double]])]
        .toDF("seq", "op", "vec_id", "vec"),
      params)
    try {
      val a = canon(HnswSpark.searchResident(spark, shards, queriesDf, 10, bigEf))
      val b = canon(HnswSpark.searchResident(spark, refreshed, queriesDf, 10, bigEf))
      assert(a === b)
    } finally { shards.unpersist(true); refreshed.unpersist(true) }
  }

  test("chained refreshes equal one combined refresh AND a rebuild of the final fold") {
    import spark.implicits._
    // batch 1: insert 20 new ids; batch 2: delete half of them + overwrite
    // one base id — the continuous-ingest shape (refresh of a refreshed set)
    val b1 = (0 until 20).map(i => (100L + i, "insert", 20000L + i, Some(vecOf(100L + i))))
      .toDF("seq", "op", "vec_id", "vec")
    val b2 = ((0 until 10).map(i => (200L + i, "delete", 20000L + i, Option.empty[Seq[Double]])) :+
      (300L, "insert", 5L, Some(vecOf(250L))))
      .toDF("seq", "op", "vec_id", "vec")
    val shards = HnswSpark.buildResident(base, params, P)
    val r1 = HnswSpark.refreshResident(shards, b1, params)
    val r12 = HnswSpark.refreshResident(r1, b2, params)
    val combined = HnswSpark.refreshResident(shards, b1.unionByName(b2), params)
    val folded = base.where(col("vec_id") =!= 5L)
      .select(col("vec_id"), col("embedding"))
      .unionByName((10 until 20).map(i => (20000L + i, vecOf(100L + i)))
        .toDF("vec_id", "embedding"))
      .unionByName(Seq((5L, vecOf(250L))).toDF("vec_id", "embedding"))
    val rebuilt = HnswSpark.buildResident(folded, params, P)
    try {
      val a = canon(HnswSpark.searchResident(spark, r12, queriesDf, 10, bigEf))
      val b = canon(HnswSpark.searchResident(spark, combined, queriesDf, 10, bigEf))
      val c = canon(HnswSpark.searchResident(spark, rebuilt, queriesDf, 10, bigEf))
      assert(a === b, "chained must equal combined")
      assert(a === c, "chained must equal a rebuild of the final fold")
    } finally Seq(shards, r1, r12, combined, rebuilt).foreach(_.unpersist(true))
  }

  test("refreshed shards survive saveResident -> loadResident and serve identically") {
    import graft.index.HnswPersistence
    val path = java.nio.file.Files.createTempDirectory("hnsw-refresh-save").toString
    val shards = HnswSpark.buildResident(base, params, P)
    val refreshed = HnswSpark.refreshResident(shards, mutationBatch, params)
    try {
      val before = canon(
        HnswSpark.searchResident(spark, refreshed, queriesDf, 10, bigEf))
      HnswPersistence.saveResident(spark, refreshed, path)
      val loaded = HnswPersistence.loadResident(spark, path)
      try {
        val after = canon(
          HnswSpark.searchResident(spark, loaded, queriesDf, 10, bigEf))
        assert(after === before,
          "a persisted refreshed index must serve the same rows")
      } finally loaded.unpersist(true)
    } finally { shards.unpersist(true); refreshed.unpersist(true) }
  }

  test("refresh after save/load routes correctly even with empty build partitions") {
    import spark.implicits._
    import graft.index.HnswPersistence
    // 5 rows into 8 partitions: several build partitions are empty, so
    // element-order shard numbering would compact the layout and shift
    // hash routing — the exact bug the partition-index ids + layout
    // table fix. An overwrite after load must land on the OWNING shard
    // (no duplicate id anywhere), and a new id must be insertable.
    val tiny = emb.where(col("vec_id") < 5)
    val built = HnswSpark.buildResident(tiny, params, 8)
    val path = java.nio.file.Files.createTempDirectory("hnsw-sparse-save").toString
    HnswPersistence.saveResident(spark, built, path)
    val loaded = HnswPersistence.loadResident(spark, path)
    val batch = Seq(
      (1L, "insert", 2L, Some(vecOf(100L))),  // overwrite existing id 2
      (2L, "insert", 777L, Some(vecOf(101L))) // brand-new id
    ).toDF("seq", "op", "vec_id", "vec")
    val refreshed = HnswSpark.refreshResident(loaded, batch, params)
    try {
      assert(loaded.getNumPartitions === 8, "layout must survive the round-trip")
      val all = refreshed.collect()
      assert(all.count(_.containsId(2L)) === 1, "overwrite must not duplicate")
      assert(all.count(_.containsId(777L)) === 1)
      // the overwritten id serves its NEW vector at distance ~0
      val hits = HnswSpark.searchAll(all.toSeq, vecOf(100L).toArray, 1, bigEf)
      assert(hits.head._1 === 2L && hits.head._2 < 1e-12)
      // and the total live count is base + 1 (no phantom copies)
      assert(all.map(_.size.toLong).sum === 6L)
    } finally {
      built.unpersist(true); loaded.unpersist(true); refreshed.unpersist(true)
    }
  }

  test("refresh is deterministic and leaves the parent shards untouched") {
    val shards = HnswSpark.buildResident(base, params, P)
    val before = canon(HnswSpark.searchResident(spark, shards, queriesDf, 10, bigEf))
    val r1 = HnswSpark.refreshResident(shards, mutationBatch, params)
    val r2 = HnswSpark.refreshResident(shards, mutationBatch, params)
    try {
      val a = canon(HnswSpark.searchResident(spark, r1, queriesDf, 10, bigEf))
      val b = canon(HnswSpark.searchResident(spark, r2, queriesDf, 10, bigEf))
      assert(a === b, "two refreshes from the same parent must agree")
      // copy-on-write: the parent still serves its ORIGINAL rows
      val after = canon(HnswSpark.searchResident(spark, shards, queriesDf, 10, bigEf))
      assert(after === before, "refresh must not mutate the cached parent")
    } finally { shards.unpersist(true); r1.unpersist(true); r2.unpersist(true) }
  }
}
