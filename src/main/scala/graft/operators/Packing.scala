package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the concatenate-and-chunk batching step of an LLM
  * pretraining pipeline: documents are concatenated in a deterministic
  * order and the token stream is cut into fixed-length windows
  * (sequences). Each document's placement is a pure function of the
  * running token offset, which is computed with the distributed
  * PrefixSum (range-partitioned two-pass), NOT a global window — so the
  * plan has no single-partition stage and survives 100 TB.
  *
  * Fully deterministic (whitespace token counts, doc_id order), so the
  * operator is oracle-checked against DuckDB's window-function twin.
  */
object Packing {

  /** Per-document packing manifest for windows of `seqLen` tokens:
    * (doc_id, n_tokens, start_offset, first_seq, last_seq) where
    * start_offset is the doc's position in the concatenated token stream
    * and first_seq/last_seq the sequence ids it spans (a doc longer than
    * seqLen spans several; an empty doc stays in its start sequence).
    */
  def packSequences(
      docs: DataFrame, seqLen: Int,
      order: Seq[org.apache.spark.sql.Column] = Seq(col("doc_id"))): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    // the prefix-sum projection deliberately drops document text (the
    // range shuffle must never carry it); caller-computed ORDER-CARRIER
    // columns named __* pass through so `order` can reference keys the
    // id alone can't express (e.g. the curriculum band)
    val passThrough = docs.columns.filter(_.startsWith("__")).map(col).toSeq
    val base = docs.select(
      (col("doc_id") +:
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens") +:
        passThrough): _*)
    PrefixSum.runningSum(base, order, col("n_tokens"), "cum_tokens")
      .select(
        col("doc_id"),
        col("n_tokens"),
        (col("cum_tokens") - col("n_tokens")).as("start_offset"),
        floor((col("cum_tokens") - col("n_tokens")) / seqLen).cast("long")
          .as("first_seq"),
        greatest(
          floor((col("cum_tokens") - 1) / seqLen),
          floor((col("cum_tokens") - col("n_tokens")) / seqLen)).cast("long")
          .as("last_seq"))
      .orderBy(col("doc_id"))
  }

  /** Packing-efficiency rollup: sequences produced, mean docs per
    * sequence boundary crossing, total tokens — the numbers a batching
    * job reports. Derived from the manifest, one aggregate.
    */
  def packingStats(manifest: DataFrame, seqLen: Int): DataFrame =
    manifest.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"),
      (floor((max(col("start_offset") + col("n_tokens")) - 1) / seqLen) + 1)
        .cast("long").as("n_sequences"),
      sum(when(col("last_seq") > col("first_seq"), 1L).otherwise(0L))
        .as("n_boundary_docs"))

  /** Length-bucketed batch assembly — the PADDED-batch counterpart of
    * [[packSequences]]'s concatenative packing: documents group into
    * fixed-width token-length buckets, each bucket fills batches of
    * `batchSize` in deterministic (length, id) order, and every row
    * reports the padding its batch costs it (batch width = the bucket
    * MAX length... computed per batch, so the padding number is the real
    * one, not the bucket bound). Minimizing padding by batching
    * similar-length sequences is the standard dynamic-batching move
    * when examples can't be concatenated (labeled pairs, instruction
    * tuning).
    *
    * Scale shape: bucket assignment is a narrow map; the batch index is
    * a row_number WINDOW PARTITIONED BY BUCKET (bounded partitions by
    * construction — bucket width caps membership spread, and a skewed
    * bucket still sorts only its own rows); per-batch max length is one
    * bucket+batch-keyed aggregate joined back to the bounded batch
    * table. No global window anywhere.
    */
  def lengthBatches(
      docs: DataFrame, bucketWidth: Int, batchSize: Int): DataFrame = {
    require(bucketWidth >= 1 && batchSize >= 1,
      s"bad knobs bucketWidth=$bucketWidth batchSize=$batchSize")
    val base = docs.select(
      col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("bucket", (col("n_tokens") / bucketWidth).cast("long"))
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("n_tokens"), col("doc_id"))
    val seated = base
      .withColumn("batch_idx",
        ((row_number().over(byBucket) - 1) / batchSize).cast("long"))
    val widths = seated
      .groupBy(col("bucket"), col("batch_idx"))
      .agg(max(col("n_tokens")).as("batch_width"))
    seated.join(widths, Seq("bucket", "batch_idx"))
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        col("batch_idx"), col("batch_width"),
        (col("batch_width") - col("n_tokens")).as("padding_tokens"))
      .orderBy(col("doc_id"))
  }
}
