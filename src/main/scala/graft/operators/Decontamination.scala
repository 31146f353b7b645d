package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination scan — the training-data hygiene step every
  * LLM pipeline runs before pretraining: find training documents that
  * share word n-grams with a held-out benchmark/eval set, so they can be
  * dropped (test-set leakage inflates eval scores).
  *
  * Scale shape: the same inverted-index equi-join as Dedup's n-gram
  * Jaccard — shingle the training side (one-pass WordShingles expression,
  * shuffle carries (shingle, doc_id) rows, never document pairs) and
  * equi-join against the benchmark's DISTINCT shingle set, which is small
  * by construction (benchmarks are tiny next to a 100 TB corpus) and
  * broadcasts. No cross product at any scale; a training doc that shares
  * nothing with the benchmark never leaves the map side.
  *
  * Exact and deterministic (no hashing), so the whole operator is
  * oracle-checked in DuckDB.
  */
object Decontamination {

  /** Per contaminated training doc: the number of distinct word n-grams it
    * shares with ANY benchmark doc and the contaminated fraction of its
    * own shingle set. Docs with zero overlap are omitted (at corpus scale
    * that is almost everything — the output is the quarantine list).
    */
  def scan(train: DataFrame, benchmark: DataFrame, n: Int): DataFrame = {
    val trainShingles = Dedup.shingles(train, n) // (doc_id, n_shingles, shingle), distinct per doc
    val benchShingles = Dedup.shingles(benchmark, n)
      .select(col("shingle")).distinct()
    trainShingles
      .join(broadcast(benchShingles), Seq("shingle"))
      // shingles are distinct within a doc, so count(*) = distinct overlap
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(
        col("doc_id"),
        col("n_shared"),
        round(col("n_shared").cast("double") / col("n_shingles"), 6)
          .as("contamination_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Winnow-fingerprint decontamination — the EDIT-ROBUST twin of `scan`:
    * word n-grams miss contamination that was lightly paraphrased or
    * re-tokenized, while winnowing fingerprints (character k-gram window
    * minima, TextAnalysis.winnowFingerprints) survive local edits by the
    * MOSS guarantee. Flags training docs sharing ≥ minShared fingerprints
    * with the benchmark's union fingerprint set.
    *
    * Same scale shape as `scan`: the training side explodes to
    * (fingerprint, doc_id) postings via the compiled one-pass expression;
    * the benchmark's distinct fingerprint set is small by construction
    * and broadcasts; map-side semi-join, no cross product. Exact integer
    * arithmetic → oracle-checked.
    */
  def winnowScan(
      train: DataFrame, benchmark: DataFrame,
      k: Int, w: Int, minShared: Int): DataFrame =
    winnowScanAgainst(train, winnowIndex(benchmark, k, w), minShared, k, w)

  /** The benchmark's winnow-fingerprint INDEX: one distinct-fp frame,
    * buildable once and persisted (plain parquet — it is just a column of
    * longs), so growing benchmark sets don't re-fingerprint the corpus'
    * counterpart scans. Benchmarks are tiny by construction, so the index
    * stays broadcast-sized however it is stored. The column is NAMED
    * `fp_k<k>_w<w>`: the (k, w) the index was built with travel in the
    * schema, so a scan against a mismatched-parameter index fails loudly
    * at plan time instead of silently reporting everything clean.
    */
  def winnowIndex(benchmark: DataFrame, k: Int, w: Int): DataFrame =
    TextAnalysis.winnowFingerprints(benchmark, k, w)
      .select(explode(col("fps")).as(s"fp_k${k}_w${w}")).distinct()

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram and winnow scans: flag training vectors within cosine
    * distance `eps` of ANY benchmark vector (paraphrased or translated
    * leakage that shares no surface n-grams still lands near the
    * benchmark in embedding space — the SemDeDup observation applied to
    * eval hygiene). Output: (vec_id, min_dist) per flagged training
    * vector, min over the benchmark set, rounded like every distance.
    *
    * Scale shape: the benchmark side is small by construction and
    * BROADCASTS; the scan is then map-only over the corpus (one cosine
    * per (vector, benchmark) pair inside the task, a bounded min — no
    * shuffle of the corpus at all). Exact arithmetic → oracle-checked.
    */
  def semanticScan(train: DataFrame, benchmark: DataFrame, eps: Double): DataFrame = {
    val bench = benchmark.select(col("embedding").as("bv"))
    train
      .select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(bench))
      .select(col("vec_id"),
        graft.functions.VectorFunctions.roundDist(
          graft.functions.VectorFunctions.cosine(col("embedding"), col("bv")))
          .as("d"))
      .groupBy(col("vec_id"))
      .agg(min(col("d")).as("min_dist"))
      .where(col("min_dist") <= eps)
      .orderBy(col("vec_id"))
  }

  /** INCREMENTAL winnow decontamination — the Dedup.incremental pattern
    * applied to benchmark hygiene: corpora grow batch by batch, and each
    * doc's contamination score depends only on (its own fingerprints ×
    * the index), so scanning ONLY the new arrivals against a persisted
    * [[winnowIndex]] produces exactly the batch scan's rows for those
    * docs (spec-gated equality on a split corpus). Pass the reloaded
    * index frame; nothing else from previous batches is needed. The
    * index must carry the schema-tagged column `fp_k<k>_w<w>` (what
    * winnowIndex writes) or a caller-asserted plain `fp` — a mismatched
    * (k, w) therefore fails loudly here rather than silently matching
    * nothing and reporting contaminated docs as clean.
    */
  def winnowScanAgainst(
      train: DataFrame, index: DataFrame, minShared: Int,
      k: Int = 12, w: Int = 6): DataFrame = {
    val tagged = s"fp_k${k}_w${w}"
    require(index.columns.contains(tagged) || index.columns.contains("fp"),
      s"winnowScanAgainst: index has columns [${index.columns.mkString(", ")}] " +
        s"but this scan was parameterized k=$k w=$w (expected column '$tagged'" +
        ") — the index was built with DIFFERENT winnow parameters; " +
        "rebuild it or pass the matching (k, w)")
    val fpCol = if (index.columns.contains(tagged)) tagged else "fp"
    val trainFps = TextAnalysis.winnowFingerprints(train, k, w)
      .select(col("doc_id"), size(col("fps")).as("n_fps"),
        explode(col("fps")).as("fp"))
    trainFps
      .join(broadcast(index.select(col(fpCol).as("fp"))), Seq("fp"))
      // fingerprints are distinct within a doc, so count(*) = overlap
      .groupBy(col("doc_id"), col("n_fps"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select(
        col("doc_id"),
        col("n_shared"),
        round(col("n_shared").cast("double") / col("n_fps"), 6)
          .as("contamination_ratio"))
      .orderBy(col("doc_id"))
  }
}
