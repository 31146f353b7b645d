package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontamination, Dedup, Sampling, TextAnalysis, TrainingPipeline}

/** End-to-end corpus assembly (TrainingPipeline.assembleCorpus): the
  * composed flow must satisfy every stage's invariant simultaneously.
  */
class PipelineE2ESpec extends SparkSpec {

  test("assembled corpus honors dedup, decontamination, filters, and budget") {
    val docs = Tables.documents(spark, sfDir)
    val benchmark = docs.where(col("source") === "src0")
    val train = docs.where(col("source") =!= "src0")
    val weights = Map("src1" -> 1.0, "src2" -> 0.5)
    val budget = 20000L

    val manifest = TrainingPipeline.assembleCorpus(
      train, benchmark,
      minQuality = 0.3, maxDup3gram = 0.2,
      mixtureWeights = weights, defaultFraction = 0.5,
      tokenBudget = budget, seqLen = 512).persist()
    val admitted = manifest.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(admitted.nonEmpty, "pipeline admitted nothing — parameters too strict")

    // 1. at most one doc per near-dup cluster
    val clusters = Dedup.dedupClusters(train, n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val admittedClusters = admitted.toSeq.map(clusters)
    assert(admittedClusters.distinct.size == admittedClusters.size,
      "two admitted docs share a near-dup cluster")

    // 2. nothing contaminated survives
    val contaminated = Decontamination.scan(train, benchmark, n = 4)
      .collect().map(_.getLong(0)).toSet
    assert((admitted & contaminated).isEmpty)

    // 3. quality floor + repetition cap hold for every admitted doc
    val toks = TextAnalysis.tokens(col("text"))
    val badQuality = train
      .select(col("doc_id"), TextAnalysis.qualityCol(toks).as("q"))
      .where(col("q") < 0.3).collect().map(_.getLong(0)).toSet
    assert((admitted & badQuality).isEmpty)
    val tooRepetitive = TextAnalysis.repetitionStats(train)
      .where(col("dup_3gram_ratio") > 0.2).collect().map(_.getLong(0)).toSet
    assert((admitted & tooRepetitive).isEmpty)

    // 4. mixture stickiness: a weight-1.0 source loses docs only to the
    // OTHER stages, never to sampling — every src1 doc passing stages 1-3
    // and the budget filter is present or absent identically on re-run
    val rerun = TrainingPipeline.assembleCorpus(
      train, benchmark,
      minQuality = 0.3, maxDup3gram = 0.2,
      mixtureWeights = weights, defaultFraction = 0.5,
      tokenBudget = budget, seqLen = 512)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rerun == admitted, "pipeline is not reproducible")

    // 5. budget respected: total admitted tokens <= budget
    val total = manifest.agg(sum(col("n_tokens"))).head().getLong(0)
    assert(total <= budget, s"budget $budget exceeded: $total")

    // 6. manifest tiles the admitted token stream contiguously
    val sorted = manifest.collect().sortBy(_.getAs[Long]("start_offset"))
    var off = 0L
    sorted.foreach { r =>
      assert(r.getAs[Long]("start_offset") == off)
      off += r.getAs[Long]("n_tokens")
    }
    manifest.unpersist(blocking = false)
  }
}
