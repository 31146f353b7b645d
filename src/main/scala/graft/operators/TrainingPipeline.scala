package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The composed training-data pipeline — the end-to-end flow the individual
  * operators exist for: exact dedup → quality floor → language filter →
  * token budget. One declarative plan; Catalyst fuses the filters and the
  * only shuffles are the dedup fingerprint groupBy and the budget window.
  *
  * Token budget: documents are admitted in deterministic (quality desc,
  * doc_id) order until the cumulative token count exceeds the budget — the
  * standard "best docs first until the budget is spent" selection, as a
  * running-sum window.
  *
  * Scale note: the admission window is a GLOBAL order, which Spark computes
  * on a single partition — fine for the candidate set that survives the
  * filters, and the honest statement of the algorithm. At 100 TB the same
  * selection is a two-pass distributed prefix sum: range-partition by
  * (quality, doc_id), compute per-partition token totals, broadcast the
  * partition-prefix offsets, then filter locally.
  */
object TrainingPipeline {

  def select(
      spark: SparkSession,
      dir: String,
      minQuality: Double,
      lang: String,
      tokenBudget: Long): DataFrame = {
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
    val admission = Window.orderBy(col("quality").desc, col("doc_id"))
    scored
      .withColumn("cum_tokens",
        sum(col("n_tokens").cast("long")).over(
          admission.rowsBetween(Window.unboundedPreceding, 0)))
      .where(col("cum_tokens") <= tokenBudget)
      .select(col("doc_id"), col("quality"),
        col("n_tokens").cast("long").as("n_tokens"), col("cum_tokens"))
      .orderBy(col("cum_tokens"))
  }
}
