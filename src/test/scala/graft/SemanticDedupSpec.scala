package graft

import org.apache.spark.sql.functions._

import graft.operators.SemanticDedup

/** Semantic-dedup (SemDeDup) semantics: within-cluster lower-id prune,
  * cluster-boundary misses (the documented trade), zero-norm handling,
  * and salt invariance. The full-corpus result is DuckDB-oracle-checked
  * (`semantic_dedup`); these gate the behaviors the oracle can't isolate.
  */
class SemanticDedupSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, Array[Float])], eps: Double, nCents: Int,
      salt: Int = SemanticDedup.SaltFactor) =
    SemanticDedup.semanticDedup(
      rows.toDF("vec_id", "embedding"), eps, nCents, saltFactor = salt)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap

  test("lowest id in a duplicate blob is kept, the rest drop") {
    // ids 0,1 are the centroids; 2 and 3 duplicate 0's direction exactly,
    // 4 is a singleton near centroid 1
    val rows = Seq(
      0L -> Array(1f, 0f), 1L -> Array(0f, 1f),
      2L -> Array(2f, 0f), 3L -> Array(0.5f, 0f),
      4L -> Array(0.5f, 0.6f))
    val kept = run(rows, eps = 0.05, nCents = 2)
    assert(kept == Map(0L -> 1, 1L -> 1, 2L -> 0, 3L -> 0, 4L -> 1))
  }

  test("near-dup pairs straddling a cluster boundary are both kept (the SemDeDup trade)") {
    // v2 (40°) sits nearest centroid 0, v3 (50°) nearest centroid 1;
    // their mutual cosine distance ~0.015 is within eps but each is
    // ~0.23 from its own centroid — cross-cluster, so no prune
    val rows = Seq(
      0L -> Array(1f, 0f), 1L -> Array(0f, 1f),
      2L -> Array(0.766f, 0.643f), 3L -> Array(0.643f, 0.766f))
    val kept = run(rows, eps = 0.05, nCents = 2)
    assert(kept == Map(0L -> 1, 1L -> 1, 2L -> 1, 3L -> 1))
    // sanity: the same eps WOULD prune were they co-clustered
    val oneCluster = run(rows, eps = 0.05, nCents = 1)
    assert(oneCluster(3L) == 0)
  }

  test("zero vectors are distance 1.0 from everything, incl. each other") {
    val rows = Seq(
      0L -> Array(1f, 0f), 1L -> Array(0f, 0f), 2L -> Array(0f, 0f))
    // eps < 1: both zero vectors kept (their mutual distance is exactly 1)
    assert(run(rows, eps = 0.9, nCents = 1).values.toSeq.count(_ == 1) == 3)
    // eps = 1: zero-zero and zero-nonzero distances hit the threshold
    val atOne = run(rows, eps = 1.0, nCents = 1)
    assert(atOne(0L) == 1 && atOne(1L) == 0 && atOne(2L) == 0)
  }

  test("caller-supplied centroids: overloads agree; true centers catch boundary pairs id-centroids miss") {
    // identity: explicit lowest-id raw centroids == the deterministic path
    val emb = Tables.embeddings(spark, sfDir)
    val explicitCents = emb.orderBy(col("vec_id")).limit(16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val viaOverload = SemanticDedup
      .semanticDedupWith(emb, explicitCents, 0.65, "vec_id", 8)
      .collect().toSeq
    val direct = SemanticDedup.semanticDedup(emb, 0.65, 16).collect().toSeq
    assert(viaOverload == direct)

    // a near-dup pair at 45° straddles the id-centroid boundary (ids 0,1
    // = the axes) and survives; supplied TRUE cluster centers (the
    // SemDeDup paper's k-means configuration) co-cluster it and prune
    val rows = Seq(
      0L -> Array(1f, 0f), 1L -> Array(0f, 1f),
      2L -> Array(0.72f, 0.69f), 3L -> Array(0.69f, 0.72f)).toDF("vec_id", "embedding")
    val eps = 0.01
    val idCents = SemanticDedup.semanticDedup(rows, eps, nCentroids = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(idCents == Map(0L -> 1, 1L -> 1, 2L -> 1, 3L -> 1)) // miss
    val trained = Seq(
      (0L, Array(1.0, 1.0)), (1L, Array(1.0, -1.0))).toDF("cent_id", "cv")
    val withTrained = SemanticDedup
      .semanticDedupWith(rows, trained, eps, "vec_id", 8)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(withTrained(2L) == 1 && withTrained(3L) == 0) // caught
  }

  test("MLlib k-means centroids plug in end-to-end (IvfTrained -> semanticDedupWith)") {
    val emb = Tables.embeddings(spark, sfDir)
    val m = graft.operators.IvfTrained.train(emb, nCentroids = 8, spherical = true)
    val cents = m.centroids.toSeq.toDF("cent_id", "cv")
    val out = SemanticDedup.semanticDedupWith(emb, cents, 0.65, "vec_id", 8)
      .collect()
    assert(out.length == emb.count())
    val dropped = out.filter(_.getInt(2) == 0).map(_.getLong(0)).toSet
    assert(dropped.nonEmpty, "eps=0.65 should prune within trained clusters")
    // the min id of the corpus can never be dropped: no lower-id witness
    assert(!dropped.contains(out.map(_.getLong(0)).min))
  }

  test("saltFactor never changes results") {
    val emb = Tables.embeddings(spark, sfDir)
    val base = SemanticDedup.semanticDedup(emb, 0.65, 16, saltFactor = 1)
      .collect().toSeq
    val salted = SemanticDedup.semanticDedup(emb, 0.65, 16, saltFactor = 8)
      .collect().toSeq
    assert(base == salted)
    assert(base.exists(_.getInt(2) == 0), "fixture eps should prune something")
  }
}
