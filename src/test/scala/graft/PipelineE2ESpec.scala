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

  test("round-6 stages compose: passage scrub, semantic decontam, shuffle pack") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val benchmark = docs.where(col("source") === "src0")
    val train = docs.where(col("source") =!= "src0")
    val eps = 0.68

    val manifest = TrainingPipeline.assembleCorpus(
      train, benchmark,
      minQuality = 0.2, maxDup3gram = 0.3,
      mixtureWeights = Map("src1" -> 1.0, "src2" -> 1.0),
      defaultFraction = 1.0,
      tokenBudget = 50000L, seqLen = 512,
      passageScrubTokens = Some(3),
      semanticDecontam = Some((emb, eps)),
      shuffleSeed = Some(42L)).persist()
    val admitted = manifest.select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(admitted.nonEmpty, "extended pipeline admitted nothing")

    // semantic quarantine holds: no admitted doc is within eps of the
    // benchmark embedding set
    val benchEmb = emb.join(
      benchmark.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi")
    val semanticFlagged = Decontamination.semanticScan(
      emb.join(train.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"),
      benchEmb, eps)
      .collect().map(_.getLong(0)).toSet
    assert(semanticFlagged.nonEmpty,
      "semantic stage not exercised — eps flags nothing on the fixture")
    assert((admitted & semanticFlagged).isEmpty,
      "a semantically-contaminated doc survived")

    // the manifest's token counts are the SCRUBBED sizes: for every
    // admitted doc, n_tokens <= the raw doc's token count, with at least
    // one strict shrink across the corpus (the fixture has real span dups)
    val rawTokens = train
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val packed = manifest.select(col("doc_id"), col("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    packed.foreach { case (id, n) =>
      assert(n <= rawTokens(id), s"doc $id grew under scrubbing")
    }
    assert(packed.exists { case (id, n) => n < rawTokens(id) },
      "scrubbing removed nothing — stage not exercised")

    // shuffle-order packing still tiles contiguously (offsets are a
    // permutation-ordered prefix sum), and the order is NOT doc_id order
    val byOffset = manifest.collect().sortBy(_.getAs[Long]("start_offset"))
    var off = 0L
    byOffset.foreach { r =>
      assert(r.getAs[Long]("start_offset") == off)
      off += r.getAs[Long]("n_tokens")
    }
    val offsetOrderIds = byOffset.map(_.getAs[Long]("doc_id")).toSeq
    assert(offsetOrderIds != offsetOrderIds.sorted,
      "shuffle seed produced identity order — not shuffled")
    manifest.unpersist(blocking = false)
    graft.CacheTracker.releaseAll()
  }

  test("curriculum packing: bands descend along the token stream") {
    val docs = Tables.documents(spark, sfDir)
    val benchmark = docs.where(col("source") === "src0")
    val train = docs.where(col("source") =!= "src0")
    val bands = 10
    val manifest = TrainingPipeline.assembleCorpus(
      train, benchmark,
      minQuality = 0.2, maxDup3gram = 0.3,
      mixtureWeights = Map.empty, defaultFraction = 1.0,
      tokenBudget = 50000L, seqLen = 512,
      shuffleSeed = Some(7L),
      curriculumBands = Some(bands)).persist()
    val rows = manifest.collect().sortBy(_.getAs[Long]("start_offset"))
    assert(rows.nonEmpty)
    // offsets still tile contiguously
    var off = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("start_offset") == off)
      off += r.getAs[Long]("n_tokens")
    }
    // recompute each admitted doc's band from the SAME quality score and
    // assert non-increasing along the stream (easy/clean docs first)
    val bandOf = TextAnalysis.qualityScore(train)
      .select(col("doc_id"),
        least(floor(col("quality") * bands).cast("long"), lit(bands - 1L))
          .as("band"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val streamBands = rows.map(r => bandOf(r.getAs[Long]("doc_id"))).toSeq
    assert(streamBands.zip(streamBands.tail).forall { case (a, b) => b <= a },
      s"bands must not increase along the curriculum: $streamBands")
    assert(streamBands.distinct.size > 1, "fixture should span bands")
    // within the largest band, order is the seeded shuffle, not doc_id
    val (modalBand, _) = streamBands.groupBy(identity).view.mapValues(_.size)
      .maxBy(_._2)
    val inBand = rows.map(_.getAs[Long]("doc_id"))
      .filter(id => bandOf(id) == modalBand).toSeq
    assert(inBand != inBand.sorted, "within-band order should be shuffled")
    manifest.unpersist(blocking = false)
    graft.CacheTracker.releaseAll()
  }
}
