package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontamination, Packing, PrefixSum}

/** The round-3 LLM-pipeline additions: distributed prefix sum,
  * decontamination scan, sequence packing.
  */
class PipelineOpsSpec extends SparkSpec {

  test("runningSum matches a single-partition window on any order") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 37) % 101, i.toLong, (i % 7).toLong))
      .toDF("grp", "id", "v")
    val got = PrefixSum.runningSum(df, Seq(col("grp"), col("id")), col("v"), "run")
      .select(col("id"), col("run")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // oracle: driver-side scan in the same order
    var acc = 0L
    val want = df.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
      .map { case (_, id, v) => acc += v; (id, acc) }
      .toMap
    assert(got == want)
  }

  test("runningSum size gate: small-window and distributed paths are identical") {
    import spark.implicits._
    val df = (1 to 500).map(i => ((i * 37) % 101, i.toLong, (i % 7).toLong))
      .toDF("grp", "id", "v")
    def run(threshold: Long) = PrefixSum
      .runningSum(df, Seq(col("grp"), col("id")), col("v"), "run", threshold)
      .select(col("id"), col("run")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // threshold 0 forces the distributed two-pass; MaxValue forces the
    // single-partition window — same results either way
    assert(run(0L) == run(Long.MaxValue))
    // and identical SCHEMAS: the window path's `out` must be
    // non-nullable like the distributed path's, or schema-sensitive
    // callers would behave differently by data size
    def schemaOf(threshold: Long) = PrefixSum
      .runningSum(df, Seq(col("grp"), col("id")), col("v"), "run", threshold)
      .schema
    assert(schemaOf(0L) == schemaOf(Long.MaxValue))
  }

  test("decontamination flags exactly the docs sharing a benchmark n-gram") {
    import spark.implicits._
    val bench = Seq((900L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta zeta eta"), // shares 'alpha beta gamma delta'
      (2L, "totally unrelated words here now"), // clean
      (3L, "x alpha beta gamma delta epsilon y") // shares two 4-grams
    ).toDF("doc_id", "text")
    val got = Decontamination.scan(train, bench, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 3L -> 2L))
  }

  test("winnowScan flags paraphrase-adjacent leakage the n-gram scan misses") {
    import spark.implicits._
    val benchText = "which of the following statements about photosynthesis " +
      "is correct according to the passage above"
    val bench = Seq((900L, benchText)).toDF("doc_id", "text")
    val train = Seq(
      // verbatim leak with a small local edit at the front: still shares
      // long character runs -> flagged by winnow fingerprints
      (1L, "QUESTION: " + benchText.replace("which of", "pick which of")),
      (2L, "totally unrelated training document about cooking pasta " +
        "with garlic and olive oil in a large pan on medium heat")
    ).toDF("doc_id", "text")
    val got = Decontamination.winnowScan(train, bench, k = 12, w = 6, minShared = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.contains(1L), s"leaked doc not flagged: $got")
    assert(!got.contains(2L), s"clean doc falsely flagged: $got")
    // the shared-count is bounded by the exact fingerprint intersection
    val fps = graft.operators.TextAnalysis
      .winnowFingerprints(train.unionAll(bench), 12, 6)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(got(1L) == (fps(1L) & fps(900L)).size.toLong)
  }

  test("semanticScan flags planted embedding leaks and nothing orthogonal") {
    import spark.implicits._
    val bench = Seq(
      (100L, Array(1.0, 0.0, 0.0)),
      (101L, Array(0.0, 1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val train = Seq(
      (1L, Array(0.999, 0.01, 0.0)), // near-verbatim leak of bench 100
      (2L, Array(0.0, 0.0, 1.0)),    // orthogonal: distance 1.0 to both
      (3L, Array(-1.0, 0.0, 0.0))    // anti-parallel: distance 2.0
    ).toDF("vec_id", "embedding")
    val got = Decontamination.semanticScan(train, bench, eps = 0.3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L))
    assert(got(1L) < 0.01)
  }

  test("winnowScanAgainst rejects an index built with different (k, w) loudly") {
    val docs = Tables.documents(spark, sfDir)
    val bench = docs.where(col("source") === "src0")
    val index = Decontamination.winnowIndex(bench, k = 8, w = 4)
    val e = intercept[IllegalArgumentException] {
      Decontamination.winnowScanAgainst(
        docs.where(col("source") =!= "src0"), index,
        minShared = 30, k = 12, w = 6) // mismatched parameters
    }
    assert(e.getMessage.contains("DIFFERENT winnow parameters"))
  }

  test("incremental winnow decontamination equals the batch scan on a split corpus") {
    val docs = Tables.documents(spark, sfDir)
    val bench = docs.where(col("source") === "src0")
    val train = docs.where(col("source") =!= "src0")
    // batch scan over everything, restricted to the "new" half
    val batch = Decontamination
      .winnowScan(train, bench, k = 12, w = 6, minShared = 30)
      .where(col("doc_id") % 2 === 1)
    // incremental: index persisted to parquet, reloaded, new half scanned
    val path = java.nio.file.Files
      .createTempDirectory("winnow-index").toString
    Decontamination.winnowIndex(bench, k = 12, w = 6)
      .write.mode("overwrite").parquet(path)
    val incremental = Decontamination.winnowScanAgainst(
      train.where(col("doc_id") % 2 === 1),
      spark.read.parquet(path), minShared = 30, k = 12, w = 6)
    assert(batch.exceptAll(incremental).count() == 0)
    assert(incremental.exceptAll(batch).count() == 0)
    assert(incremental.count() > 0) // the split actually exercises rows
  }

  test("mixturePlan: integer arithmetic, shortfall, and zero-weight audit rows") {
    import spark.implicits._
    // src a: 100 tokens, src b: 10, src c: 40 (exact by construction)
    def textOf(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, textOf(60), "a"), (2L, textOf(40), "a"),
      (3L, textOf(10), "b"), (4L, textOf(40), "c"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.TrainingPipeline
      .mixturePlan(docs, Map("a" -> 0.5, "b" -> 0.5), tokenBudget = 100L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // a: available 100, desired 50, keep 50%, no shortfall
    assert(got("a") == ((100L, 500000L, 50L, 500000L, 0L)))
    // b: available 10, desired 50 -> keep capped at 100%, shortfall 40
    assert(got("b") == ((10L, 500000L, 50L, 1000000L, 40L)))
    // c: weight 0 -> audit row with desired 0, no shortfall
    assert(got("c") == ((40L, 0L, 0L, 0L, 0L)))
  }

  test("temperaturePlan: tau=1 is natural shares, lower tau flattens toward uniform") {
    import spark.implicits._
    def textOf(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // 160 tokens total: a=80, b=64, c=16 (5:4:1)
    val docs = Seq(
      (1L, textOf(80), "a"), (2L, textOf(64), "b"), (3L, textOf(16), "c"))
      .toDF("doc_id", "text", "source")
    def shares(tau: Double): Map[String, Long] =
      graft.operators.TrainingPipeline
        .temperaturePlan(docs, tau, tokenBudget = 1000L)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val natural = shares(1.0)
    assert(natural("a") == 500000L && natural("b") == 400000L &&
      natural("c") == 100000L)
    val smoothed = shares(0.5)
    // smoothing moves every share toward uniform (1/3), monotonically
    assert(smoothed("a") < natural("a") && smoothed("c") > natural("c"))
    assert(smoothed("a") > 333333L && smoothed("c") < 333334L)
    // shares still sum to ~1e6 (rounding slack <= |sources|)
    assert(math.abs(smoothed.values.sum - 1000000L) <= 3)
    // downstream columns are mixturePlan's integer arithmetic
    val row = graft.operators.TrainingPipeline
      .temperaturePlan(docs, 0.5, tokenBudget = 1000L)
      .where(col("source") === "a").collect().head
    val (avail, wm, desired, keep) =
      (row.getLong(1), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(avail == 80L)
    assert(desired == 1000L * wm / 1000000L)
    assert(keep == math.min(1000000L, desired * 1000000L / avail))
    intercept[IllegalArgumentException] {
      graft.operators.TrainingPipeline.temperaturePlan(docs, 0.0, 100L)
    }
  }

  test("temperaturePlan executes through the SAME batch executor as mixturePlan") {
    import spark.implicits._
    def textOf(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = (0L until 60L).map(i =>
      (i, textOf(5 + (i % 7).toInt), s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val plan = graft.operators.TrainingPipeline
      .temperaturePlan(docs, tau = 0.5, tokenBudget = 150L)
    // the executor is plan-shape-agnostic: a temperature plan keeps
    // exactly the md5-draw set its keep fractions dictate
    val kept = graft.operators.TrainingPipeline.mixtureExecute(docs, plan)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val fracs = graft.operators.TrainingPipeline.planKeepFractions(plan)
    assert(fracs.keySet == Set("src0", "src1", "src2"))
    assert(kept.nonEmpty && kept.size < 60)
    // the streaming executor's closure lift accepts it unchanged too
    val streamed = graft.streaming.StreamingOps
      .streamingMixtureExecute(docs, fracs) // batch frame through the
      .select(col("doc_id"))                // same map-only filter
      .collect().map(_.getLong(0)).toSet
    assert(streamed == kept)
  }

  test("mixturePlan: a zero-available-tokens source keeps 0, never NULL") {
    import spark.implicits._
    // source z has only NULL text (split() never yields 0 tokens, so
    // all-NULL is the only route to an empty source): available must
    // state 0 and the keep fraction must be 0 — not a silent NULL from
    // the sum or the division
    val docs = Seq(
      (1L, Some("a b c d"), "a"), (2L, Option.empty[String], "z"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.TrainingPipeline
      .mixturePlan(docs, Map("a" -> 0.5, "z" -> 0.5), tokenBudget = 8L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.isNullAt(4), r.getLong(4))).toMap
    assert(got("z")._1 == 0L, "available must be 0 for the empty source")
    assert(!got("z")._2, "keep_fraction_micro must not be NULL")
    assert(got("z")._3 == 0L)
  }

  test("mixtureExecute/mixtureAudit: the plan's fractions realize within tolerance") {
    import spark.implicits._
    def textOf(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    // many small docs per source so the hash sampler's realized fraction
    // concentrates; a: 400 docs x 5 tokens, b: 100 x 5, c untouched
    val docs = (
      (0L until 400L).map(i => (i, textOf(5), "a")) ++
      (400L until 500L).map(i => (i, textOf(5), "b")) ++
      (500L until 520L).map(i => (i, textOf(5), "c")))
      .toDF("doc_id", "text", "source")
    val weights = Map("a" -> 0.5, "b" -> 1.0)
    val budget = 1000L // a: desired 500 of 2000 avail (25%); b: 1000 > 500 avail
    val audit = graft.operators.TrainingPipeline
      .mixtureAudit(docs, weights, budget).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    graft.CacheTracker.releaseAll()
    // b is fully kept (fraction capped at 100%): realized = available
    assert(audit("b") == ((1000L, 500L, 500000L)))
    // c has weight 0: nothing kept
    assert(audit("c") == ((0L, 0L, 0L)))
    // a keeps ~25% of 400 docs: realized lands in a wide sampling band,
    // 500 +- 250 tokens (the audit's whole point is MEASURING this)
    val (desA, realA, _) = audit("a")
    assert(desA == 500L)
    assert(realA >= 250L && realA <= 750L, s"realized $realA")
    // execute is deterministic and subset-stable
    val plan = graft.operators.TrainingPipeline.mixturePlan(docs, weights, budget)
    val k1 = graft.operators.TrainingPipeline.mixtureExecute(docs, plan)
      .select("doc_id").as[Long].collect().toSet
    val k2 = graft.operators.TrainingPipeline
      .mixtureExecute(docs.repartition(7), plan)
      .select("doc_id").as[Long].collect().toSet
    assert(k1 == k2)
  }

  test("curriculumOrder: global bijection, bands non-increasing along pos") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val got = graft.operators.TrainingPipeline.curriculumOrder(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.CacheTracker.releaseAll()
    assert(got.map(_._3).sorted.toSeq == (1L to n).toSeq) // 1..N bijection
    val byPos = got.sortBy(_._3).map(_._2)
    assert(byPos.zip(byPos.tail).forall { case (a, b) => b <= a },
      "bands must be non-increasing along the curriculum")
    assert(byPos.distinct.length > 1, "fixture should span multiple bands")
    // deterministic across partitionings
    val again = graft.operators.TrainingPipeline
      .curriculumOrder(docs.repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.CacheTracker.releaseAll()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("lengthBatches: bucket integrity, batch caps, real padding cost") {
    import spark.implicits._
    def textOf(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    // lengths spread over buckets of width 4; bucket 1 (4..7 tokens) has
    // 5 docs, so with batchSize 3 it splits into batches of 3 and 2
    val docs = Seq(
      (1L, textOf(4)), (2L, textOf(5)), (3L, textOf(5)),
      (4L, textOf(6)), (5L, textOf(7)),
      (6L, textOf(10)), (7L, textOf(11)),
      (8L, textOf(2)))
      .toDF("doc_id", "text")
    val got = graft.operators.Packing.lengthBatches(docs, bucketWidth = 4, batchSize = 3)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    // bucket = len div 4
    assert(got(8L)._2 == 0L && got(1L)._2 == 1L && got(6L)._2 == 2L)
    // bucket 1 fills in (length, id) order: batch 0 = docs 1,2,3 — then
    // batch 1 = docs 4,5
    assert(got(1L)._3 == 0L && got(2L)._3 == 0L && got(3L)._3 == 0L)
    assert(got(4L)._3 == 1L && got(5L)._3 == 1L)
    // widths are per-BATCH maxima, not bucket bounds
    assert(got(1L)._4 == 5L && got(4L)._4 == 7L)
    // padding = width − own length
    assert(got(1L)._5 == 1L && got(2L)._5 == 0L && got(4L)._5 == 1L)
    // no batch exceeds batchSize
    val sizes = got.values.groupBy(v => (v._2, v._3)).values.map(_.size)
    assert(sizes.forall(_ <= 3))
  }

  test("pack_sequences spans tile the token stream without gaps") {
    val docs = Tables.documents(spark, sfDir)
    val m = Packing.packSequences(docs, seqLen = 128).collect()
    // offsets are contiguous in doc_id order
    val sorted = m.sortBy(_.getLong(0))
    var expectOffset = 0L
    sorted.foreach { r =>
      assert(r.getAs[Long]("start_offset") == expectOffset)
      expectOffset += r.getAs[Long]("n_tokens")
      val first = r.getAs[Long]("first_seq")
      val last = r.getAs[Long]("last_seq")
      assert(first == r.getAs[Long]("start_offset") / 128)
      assert(last >= first)
      // a doc's last token sits in last_seq
      if (r.getAs[Long]("n_tokens") > 0)
        assert(last == (r.getAs[Long]("start_offset") + r.getAs[Long]("n_tokens") - 1) / 128)
    }
    // stats rollup is consistent with the manifest
    val stats = Packing.packingStats(
      Packing.packSequences(docs, seqLen = 128), seqLen = 128).head()
    assert(stats.getAs[Long]("n_docs") == m.length.toLong)
    assert(stats.getAs[Long]("total_tokens") == expectOffset)
    assert(stats.getAs[Long]("n_sequences") == (expectOffset - 1) / 128 + 1)
  }
}
