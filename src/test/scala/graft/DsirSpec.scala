package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 16

  // target corpus: "alpha beta" world; raw pool: one target-like doc, one
  // alien doc, one mixed doc
  private def target = Seq(
    (100L, "alpha beta alpha beta"),
    (101L, "beta alpha beta"),
    (102L, "alpha alpha beta beta")).toDF("doc_id", "text")

  private def raw = Seq(
    (0L, "alpha beta alpha"),
    (1L, "zeta eta theta iota kappa"),
    (2L, "alpha zeta beta eta")).toDF("doc_id", "text")

  test("model has exactly one row per bucket and log-ratios are finite") {
    val m = Dsir.bucketLogRatios(raw, target, B).collect()
    assert(m.length == B)
    assert(m.map(_.getLong(0)).toSet == (0L until B).toSet)
    // smoothing: every ratio finite, including buckets untouched by one
    // or both corpora (the +1/+B prior)
    assert(m.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    assert(m.exists(r => r.getLong(1) == 0L || r.getLong(2) == 0L),
      "fixture should leave at least one bucket empty on one side")
  }

  test("target-like raw docs outweigh alien ones; mixed sits between") {
    val w = Dsir.importanceWeights(raw, target, B).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.keySet == Set(0L, 1L, 2L))
    assert(w(0L) > w(1L), s"target-like ${w(0L)} !> alien ${w(1L)}")
    assert(w(0L) > w(2L) && w(2L) > w(1L),
      s"mixed doc not between: ${w.toSeq.sortBy(_._1)}")
    // the target-like doc's weight is positive (more likely under p̂),
    // the alien doc's negative (its buckets only ever seen in the raw
    // pool)
    assert(w(0L) > 0.0 && w(1L) < 0.0)
  }

  test("n_feats is the exact unigram+bigram multiplicity") {
    val w = Dsir.importanceWeights(raw, target, B).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // "alpha beta alpha": 3 unigrams + 2 bigrams
    assert(w(0L) == 5L)
    // "zeta eta theta iota kappa": 5 + 4
    assert(w(1L) == 9L)
    // "alpha zeta beta eta": 4 + 3
    assert(w(2L) == 7L)
  }

  test("selectTop is the weights head: desc by logw, doc_id tiebreak, ranked") {
    val sel = Dsir.selectTop(raw, target, B, k = 2).collect()
    assert(sel.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(sel.map(_.getLong(1)).toSeq == Seq(0L, 2L)) // target-like, mixed
    val w = Dsir.importanceWeights(raw, target, B).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, lw) => (-lw, id) }.take(2).map(_._1).toSeq
    assert(sel.map(_.getLong(1)).toSeq == w)
  }

  test("gumbelSample: deterministic, ranked, and tiny τ recovers selectTop's order") {
    val a = Dsir.gumbelSample(raw, target, B, k = 3, temperature = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val b = Dsir.gumbelSample(raw, target, B, k = 3, temperature = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(a.toSeq == b.toSeq) // md5 noise: a DRAW, but a deterministic one
    assert(a.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(a.map(_._3).toSeq == a.map(_._3).sortBy(-_).toSeq)
    // τ → 0: logw/τ dominates the noise, so the sample degenerates to
    // the zero-temperature top-k (the documented limit)
    val tiny = Dsir.gumbelSample(raw, target, B, k = 2, temperature = 1e-6)
      .collect().map(_.getLong(1)).toSeq
    val sel = Dsir.selectTop(raw, target, B, k = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(tiny == sel)
    intercept[IllegalArgumentException] {
      Dsir.gumbelSample(raw, target, B, k = 2, temperature = 0.0)
    }
  }

  test("incremental model: merged increment counts refit the exact from-scratch model") {
    import spark.implicits._
    val part1 = raw.where(col("doc_id") < 2)
    val part2 = raw.where(col("doc_id") >= 2)
    val merged = Dsir.mergeCounts(
      Dsir.bucketCounts(part1, B), Dsir.bucketCounts(part2, B))
    val scratch = Dsir.bucketCounts(raw, B)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(merged) == m(scratch))
    // and the model from merged counts is bit-identical to a full refit
    val viaCounts = Dsir.logRatiosFromCounts(
      merged, Dsir.bucketCounts(target, B), B)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val refit = Dsir.bucketLogRatios(raw, target, B)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(viaCounts == refit)
  }

  test("weights are stable across input partitioning") {
    val a = Dsir.importanceWeights(raw, target, B).collect().toSeq
    val b = Dsir.importanceWeights(raw.repartition(7), target.repartition(3), B)
      .collect().toSeq
    assert(a == b)
  }

  test("on the documents fixture: every raw doc weighted, model broadcast-sized") {
    val docs = Tables.documents(spark, sfDir)
    val rawPool = docs.where(col("source") =!= "src0")
    val tgt = docs.where(col("source") === "src0")
    val w = Dsir.importanceWeights(rawPool, tgt, 64)
    val n = w.count()
    assert(n == rawPool.count(), s"weighted $n of ${rawPool.count()} docs")
    // plan: the model join must be broadcast (64 rows), never SMJ
    val p = w.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }
}
