package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.index.HnswSpark
import graft.operators.Knn

/** Predicate-filtered ANN on the resident path (VERDICT r5 item 2):
  * the in-traversal filtered beam search must
  *  - return ONLY ids passing the predicate,
  *  - return k results whenever ≥ k ids pass,
  *  - hit recall@10 ≥ 0.9 against the exact filtered twin
  *    (Knn.filteredKnn) at every selectivity in the sweep (1%, 10%, 50%),
  *  - keep the HnswResidentProbe node in the plan (no fallback to a scan),
  *  - enforce the broadcast allow-list bound loudly.
  */
class HnswFilteredSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  private def queriesDf = emb
    .where(col("vec_id") < 20)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  // selectivity sweep: modulus predicates are pure functions of the id,
  // evaluable identically by the probe and by the exact twin's WHERE
  private val sweep: Seq[(String, Int, Long => Boolean)] = Seq(
    ("1%", 100, (id: Long) => id % 100 == 0),
    ("10%", 10, (id: Long) => id % 10 == 0),
    ("50%", 2, (id: Long) => id % 2 == 0))

  // exact filtered twin: the filteredKnn semantics (filter BEFORE top-k)
  // in batch form — knnBatch over the pre-filtered corpus
  private def exactTopK(mod: Int, k: Int): Map[Long, Seq[Long]] =
    Knn.knnBatch(
      emb.where(col("vec_id") % mod === 0), queriesDf, k = k,
      metric = VectorFunctions.cosine)
      .select(col("query_id").cast("long"), col("vec_id").cast("long"),
        col("rank"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getAs[Int]("rank")).map(_.getLong(1)).toSeq
      }

  test("filtered resident probe: recall >= 0.9 across the selectivity sweep") {
    val shards = HnswSpark.buildResident(
      emb, HnswSpark.Params(dim = 64), numPartitions = 4)
    try {
      sweep.foreach { case (label, mod, allow) =>
        val k = 10
        val approx = HnswSpark.searchResidentFiltered(
          spark, shards, queriesDf, k = k, allow = allow, ef = Some(100))
          .select(col("query_id").cast("long"), col("vec_id").cast("long"))
          .collect()
          .groupBy(_.getLong(0))
          .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
        val exact = exactTopK(mod, k)
        // every returned id passes the predicate
        approx.foreach { case (_, ids) =>
          assert(ids.forall(allow), s"[$label] non-passing id returned")
        }
        // as many results as the passing population allows, up to k —
        // the exact twin's per-query row count IS that number
        approx.foreach { case (q, ids) =>
          assert(ids.size == exact(q).size,
            s"[$label] query $q returned ${ids.size} != ${exact(q).size}")
        }
        val recalls = exact.map { case (q, truth) =>
          approx.get(q).fold(0.0)(got =>
            truth.count(got.contains).toDouble / truth.size)
        }
        val meanRecall = recalls.sum / recalls.size
        assert(meanRecall >= 0.9,
          s"[$label] mean recall@10 $meanRecall < 0.9")
        info(s"selectivity $label: mean recall@10 = $meanRecall")
      }
    } finally shards.unpersist(blocking = true)
  }

  test("plan retains the filtered HnswResidentProbe node (no scan fallback)") {
    val shards = HnswSpark.buildResident(
      emb, HnswSpark.Params(dim = 64), numPartitions = 2)
    try {
      val df = HnswSpark.searchResidentFiltered(
        spark, shards, queriesDf, k = 5, allow = (id: Long) => id % 2 == 0)
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("HnswResidentProbe"), physical.take(500))
      assert(physical.contains("filtered"), physical.take(500))
    } finally shards.unpersist(blocking = true)
  }

  test("broadcastAllowList: probe agrees with the closed-form predicate") {
    val shards = HnswSpark.buildResident(
      emb, HnswSpark.Params(dim = 64), numPartitions = 2)
    try {
      val listAllow = HnswSpark.broadcastAllowList(
        spark, emb.where(col("vec_id") % 10 === 0).select(col("vec_id")))
      val viaList = HnswSpark.searchResidentFiltered(
        spark, shards, queriesDf, k = 10, allow = listAllow, ef = Some(100))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._3, t._2)).toSeq
      val viaPred = HnswSpark.searchResidentFiltered(
        spark, shards, queriesDf, k = 10,
        allow = (id: Long) => id % 10 == 0, ef = Some(100))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._3, t._2)).toSeq
      assert(viaList == viaPred)
    } finally shards.unpersist(blocking = true)
  }

  test("broadcastAllowList enforces the broadcast-small contract loudly") {
    val e = intercept[IllegalStateException] {
      HnswSpark.broadcastAllowList(
        spark, emb.select(col("vec_id")), maxIds = 10)
    }
    assert(e.getMessage.contains("allow-list exceeds"))
  }

  test("zero-survivor predicate returns empty, not garbage") {
    val shards = HnswSpark.buildResident(
      emb, HnswSpark.Params(dim = 64), numPartitions = 2)
    try {
      val out = HnswSpark.searchResidentFiltered(
        spark, shards, queriesDf.limit(2), k = 5,
        allow = (_: Long) => false)
      assert(out.count() == 0)
    } finally shards.unpersist(blocking = true)
  }
}
