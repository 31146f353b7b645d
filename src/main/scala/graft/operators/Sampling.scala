package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling — the reproducible-split
  * primitive a training pipeline needs (Spark's `sample()` is seed+
  * partitioning dependent, so two runs — or two engines — disagree).
  *
  * Mechanism: md5 of the key, first 8 hex chars, compared against a
  * hex-encoded threshold STRING. Lexicographic order on fixed-width hex
  * equals numeric order, md5 is bit-identical everywhere, and no integer
  * parsing is involved — so the same rows are selected by Spark, DuckDB,
  * or anything else, independent of partitioning. Membership is a pure
  * function of the key: stable under re-runs, appends, and repartitions
  * (per-key stickiness is exactly what training/eval splits need —
  * a document can never migrate between train and test).
  */
object Sampling {

  private val Denom = 4294967296L // 16^8

  private def hexThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0 + 1e-9, s"fraction $fraction")
    "%08x".format(math.min((fraction * Denom).toLong, Denom - 1))
  }

  // fraction >= 1 must admit EVERY hash — "h < ffffffff" would wrongly
  // exclude a key hashing to exactly ffffffff (1-in-4B, but wrong)
  private def below(h: Column, fraction: Double): Column =
    if (fraction >= 1.0) lit(true) else h < lit(hexThreshold(fraction))

  /** First 8 md5 hex chars of the key — the unit-interval draw. */
  def hashBucket(key: Column): Column = substring(md5(key.cast("string")), 1, 8)

  /** Keep ≈fraction of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.where(below(hashBucket(col(keyCol)), fraction))

  /** Disjoint, exhaustive train/val/test assignment by key. Fractions must
    * sum to ≤ 1; the remainder (hash ≥ train+val+test) is labeled "rest"
    * (empty when they sum to exactly 1).
    */
  def split(
      df: DataFrame,
      keyCol: String,
      trainFrac: Double,
      valFrac: Double,
      testFrac: Double): DataFrame = {
    require(trainFrac + valFrac + testFrac <= 1.0 + 1e-9)
    val h = hashBucket(col(keyCol))
    df.withColumn("split",
      when(below(h, trainFrac), "train")
        .when(below(h, trainFrac + valFrac), "val")
        .when(below(h, trainFrac + valFrac + testFrac), "test")
        .otherwise("rest"))
  }

  /** LEAKAGE-SAFE train/val/test split: assignment is a pure function of
    * the document's near-dup CLUSTER id, not its own id — an entire
    * cluster of near-duplicates lands on ONE side, so a test document can
    * never have a train-side near-duplicate. That contamination mode is
    * exactly what a per-document split cannot prevent: two 95%-similar
    * documents hash independently and straddle the boundary, and the
    * model is then evaluated on (a trivial variant of) its training data.
    *
    * Input: a (doc, cluster) frame — [[Dedup.dedupClusters]]'s output
    * shape, where every document is present and singletons carry their
    * own id as cluster label. Output keeps both columns and adds the
    * `split` label, keyed on the cluster with the same engine-portable
    * md5 discipline as [[split]].
    *
    * Scale shape: one narrow map over the cluster frame — the split adds
    * nothing to the clustering cost — and membership is stable under
    * appends: a NEW member of an existing cluster follows its cluster's
    * side instead of re-rolling the boundary.
    */
  def leakageSafeSplit(
      clusters: DataFrame,
      clusterCol: String,
      trainFrac: Double,
      valFrac: Double,
      testFrac: Double): DataFrame =
    split(clusters, clusterCol, trainFrac, valFrac, testFrac)

  /** Domain-mixture sampling — the data-mixing step of corpus assembly:
    * each group (source/domain) keeps its own deterministic fraction, so
    * the output matches target mixture weights while membership stays a
    * pure function of the key (stable under re-runs and appends, like
    * every sampler here). Groups absent from `weights` keep
    * `defaultFraction`. One narrow filter pass — the weight map rides the
    * closure as a CASE expression, nothing shuffles.
    */
  def mixtureSample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      weights: Map[String, Double],
      defaultFraction: Double): DataFrame = {
    val h = hashBucket(col(keyCol))
    val keep = weights.foldLeft(
      when(lit(false), lit(true))) { case (acc, (g, f)) =>
        acc.when(col(groupCol) === g, below(h, f))
      }.otherwise(below(h, defaultFraction))
    df.where(keep)
  }

  /** DuckDB predicate equivalent to mixtureSample (kept adjacent so the
    * two cannot drift).
    */
  def oracleMixturePredicate(
      keyCol: String,
      groupCol: String,
      weights: Map[String, Double],
      defaultFraction: Double): String = {
    val h = s"substr(md5(CAST($keyCol AS VARCHAR)), 1, 8)"
    val cases = weights.toSeq.sortBy(_._1).map { case (g, f) =>
      s"WHEN $groupCol = '$g' THEN ${belowSql(h, f)}"
    }.mkString(" ")
    s"CASE $cases ELSE ${belowSql(h, defaultFraction)} END"
  }

  private def belowSql(h: String, fraction: Double): String =
    if (fraction >= 1.0) "TRUE" else s"$h < '${hexThreshold(fraction)}'"

  /** The DuckDB predicate equivalent to deterministicSample — kept next to
    * the Scala so the two cannot drift.
    */
  def oracleSamplePredicate(keyCol: String, fraction: Double): String =
    belowSql(s"substr(md5(CAST($keyCol AS VARCHAR)), 1, 8)", fraction)

  /** DuckDB CASE expression equivalent to split(...)'s `split` column. */
  def oracleSplitCase(keyCol: String, trainFrac: Double, valFrac: Double, testFrac: Double): String = {
    val h = s"substr(md5(CAST($keyCol AS VARCHAR)), 1, 8)"
    s"""CASE WHEN ${belowSql(h, trainFrac)} THEN 'train'
       |     WHEN ${belowSql(h, trainFrac + valFrac)} THEN 'val'
       |     WHEN ${belowSql(h, trainFrac + valFrac + testFrac)} THEN 'test'
       |     ELSE 'rest' END""".stripMargin
  }

  /** WEIGHTED sampling without replacement, k per group — the
    * quality/length-weighted data-mixing step (sample long or high-quality
    * documents preferentially while keeping the draw reproducible).
    * Efraimidis & Spirakis 2006 ("Weighted random sampling with a
    * reservoir" — public) in the exponential-race form: each row draws
    * u ∈ (0,1) and races with key −ln(u)/w; the k SMALLEST keys per group
    * are exactly a weight-proportional without-replacement sample.
    *
    * Engine-portable determinism, the module's discipline throughout:
    * u = (first 8 md5 hex chars of key:seed, parsed base-16, + 0.5) / 2^32
    * — bit-identical in any engine; the race key rounds to 6 decimals
    * with (key, id) tie-break (the distance-rounding pattern;
    * cross-engine `ln` at 6 decimals is the bigram_surprisal precedent).
    *
    * Scale shape: one narrow projection, then the bounded `graft_topk`
    * aggregate per group — a map-side-combined k-heap, so the shuffle
    * carries k rows per (group, partition), never the corpus (the
    * knn_batch pattern). No window over the full frame.
    */
  def weightedSample(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      weightCol: String,
      k: Int,
      seed: Long): DataFrame = {
    val draw = substring(shuffleHash(col(keyCol), seed), 1, 8)
    val u = (conv(draw, 16, 10).cast("double") + lit(0.5)) / lit(Denom.toDouble)
    val esKey = round(-log(u) / col(weightCol), 6) + lit(0.0)
    df.where(col(weightCol) > 0)
      .select(col(groupCol), col(keyCol), esKey.as("es_key"))
      .groupBy(col(groupCol))
      .agg(graft.functions.VectorFunctions
        .topK(col("es_key"), col(keyCol), k).as("topk"))
      .select(col(groupCol), posexplode(col("topk")).as(Seq("pos", "r")))
      .select(
        col(groupCol),
        (col("pos") + 1).cast("long").as("rank"),
        col("r.vec_id").as(keyCol),
        col("r.distance").as("es_key"))
      .orderBy(col(groupCol), col("rank"))
  }

  /** DuckDB twin of weightedSample (adjacent so the two cannot drift):
    * rank by the identical race key with a per-group row_number.
    */
  def oracleWeightedSampleSql(
      table: String,
      keyCol: String,
      groupCol: String,
      weightCol: String,
      k: Int,
      seed: Long): String = {
    val h = s"substr(md5(CAST($keyCol AS VARCHAR) || ':$seed'), 1, 8)"
    val u = s"((('0x' || $h)::UBIGINT + 0.5) / ${Denom.toDouble})"
    s"""WITH keyed AS (
       |  SELECT $groupCol, $keyCol,
       |    round(-ln($u) / $weightCol, 6) + 0.0 AS es_key
       |  FROM $table WHERE $weightCol > 0),
       |ranked AS (
       |  SELECT $groupCol, $keyCol, es_key,
       |    row_number() OVER (PARTITION BY $groupCol
       |                       ORDER BY es_key, $keyCol) AS rank
       |  FROM keyed)
       |SELECT $groupCol, CAST(rank AS BIGINT) AS rank, $keyCol, es_key
       |FROM ranked WHERE rank <= $k
       |ORDER BY $groupCol, rank""".stripMargin
  }

  /** The shuffle-order sort key: md5(key || ':' || seed) — ONE definition
    * shared by shuffledOrder, the pack-order composition in
    * TrainingPipeline.assembleCorpus, and (via oracleShuffleHash) the
    * DuckDB twin, so the cross-engine permutation contract cannot drift.
    */
  def shuffleHash(key: Column, seed: Long): Column =
    md5(concat(key.cast("string"), lit(":" + seed)))

  /** DETERMINISTIC GLOBAL SHUFFLE ORDER — the "shuffle the corpus before
    * packing/training" step, reproducible across engines and runs: every
    * key gets a 1-based position in the ordering of
    * ([[shuffleHash]], key). Same engine-portable trick as the
    * sampling hash (md5 of a string, hex compared lexicographically), so
    * a DuckDB `row_number() over (order by md5(...), key)` states the
    * identical permutation.
    *
    * Scale shape: the position is a distributed prefix COUNT
    * ([[PrefixSum.runningSum]] of 1s over the hash order — range
    * repartition + two narrow passes), NOT a global row_number window;
    * the size gate picks the single-partition plan only when the frame
    * is genuinely small. Feeding `Packing.packSequences` with
    * shuffle-ordered doc ids is one `orderBy(pos)` away.
    */
  def shuffledOrder(df: DataFrame, keyCol: String, seed: Long): DataFrame = {
    val h = shuffleHash(col(keyCol), seed)
    PrefixSum.runningSum(
      df.select(col(keyCol), h.as("__h")),
      order = Seq(col("__h"), col(keyCol)),
      value = lit(1L),
      out = "pos")
      .select(col(keyCol), col("pos"))
  }

  /** The DuckDB ORDER BY expression twin of shuffledOrder's hash. */
  def oracleShuffleHash(keyCol: String, seed: Long): String =
    s"md5(CAST($keyCol AS VARCHAR) || ':$seed')"
}
