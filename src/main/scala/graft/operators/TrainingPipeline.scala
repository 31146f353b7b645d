package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The composed training-data pipeline — the end-to-end flow the individual
  * operators exist for: exact dedup → quality floor → language filter →
  * token budget. One declarative plan up to admission; Catalyst fuses the
  * filters and the only wide shuffles are the dedup fingerprint groupBy and
  * the admission range-repartition.
  *
  * Token budget: documents are admitted in deterministic (quality desc,
  * doc_id) order until the cumulative token count exceeds the budget — the
  * standard "best docs first until the budget is spent" selection.
  *
  * The running sum is a DISTRIBUTED prefix sum, not a global window (which
  * Spark would execute on a single partition — the classic 100 TB
  * bottleneck). Pattern:
  *   1. range-repartition the narrow (doc_id, quality, n_tokens) projection
  *      on (quality desc, doc_id) and sort within partitions — partition i
  *      holds a contiguous, ordered slice of the admission order;
  *   2. one narrow pass computes per-partition token totals (one row per
  *      partition, collected — bounded by the partition count, like the
  *      boundary sample RangePartitioner itself collects);
  *   3. scanLeft those totals into per-partition start offsets, broadcast
  *      via closure, and a second narrow pass emits offset + local running
  *      sum per row. No row ever leaves its partition after step 1.
  * The narrow projection is materialized (localCheckpoint) between the
  * passes so neither recomputes the tokenization lineage.
  */
object TrainingPipeline {

  def select(
      spark: SparkSession,
      dir: String,
      minQuality: Double,
      lang: String,
      tokenBudget: Long): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    // keep one doc per distinct content (min doc_id wins, ≙ Dedup.exact)
    val keepers = Dedup.exact(docs).select(col("keeper_id").as("doc_id"))
    // all three per-doc metrics are functions of the same token array —
    // one projection, one semi join, instead of three self-joins
    val toks = TextAnalysis.tokens(col("text"))
    val scored = docs
      .select(
        col("doc_id"),
        TextAnalysis.qualityCol(toks).as("quality"),
        TextAnalysis.langPred(toks).as("pred_lang"),
        size(toks).as("n_tokens"))
      .join(keepers, Seq("doc_id"), "left_semi")
      .where(col("quality") >= minQuality && col("pred_lang") === lang)

    // Cache BEFORE the range shuffle: repartitionByRange runs a separate
    // boundary-sampling job over its child, so an uncached child pays the
    // tokenization + dedup lineage once for sampling and again for the
    // shuffle itself.
    val narrow = scored
      .select(col("doc_id").cast("long"), col("quality"),
        col("n_tokens").cast("long"))
      .as[(Long, Double, Long)]
      .persist()
    // admission order as contiguous ordered partition slices — ALSO cached,
    // so the sampling job and the range shuffle run exactly once: pass 1
    // materializes the cache and pass 2 reads the sorted blocks back
    // instead of re-shuffling (the r2 shape paid the shuffle + sampling
    // twice, once per pass)
    val ranged = narrow
      .repartitionByRange(col("quality").desc, col("doc_id"))
      .sortWithinPartitions(col("quality").desc, col("doc_id"))
      .persist()

    // pass 1: per-partition token totals (empty partitions emit 0 so the
    // offset array stays index-aligned with partition ids)
    val totals = ranged
      .mapPartitions { it =>
        var s = 0L; it.foreach(s += _._3)
        Iterator.single((TaskContext.getPartitionId(), s))
      }
      .collect()
      .sortBy(_._1)
      .map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // offsets(pid) = tokens before pid
    // pass 1 materialized `ranged`; the upstream narrow cache is now dead
    narrow.unpersist(blocking = false)

    // pass 2: local running sum + partition offset = global prefix sum
    ranged
      .mapPartitions { it =>
        var run = offsets(TaskContext.getPartitionId())
        it.map { case (id, q, n) => run += n; (id, q, n, run) }
      }
      .toDF("doc_id", "quality", "n_tokens", "cum_tokens")
      .where(col("cum_tokens") <= tokenBudget)
      .orderBy(col("cum_tokens"))
  }
}
