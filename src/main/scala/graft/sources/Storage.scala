package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Layout-aware parquet storage — the sources/sinks layer (SURVEY §2.2).
  *
  * The reference persists one msgpack+binary blob per process (reference
  * core/storage/engine.py:23-68) — a layout with no pruning and no
  * parallel reads. The Spark-native equivalents are table LAYOUTS that
  * make the 100 TB access patterns cheap:
  *
  *  - **Partitioned writes** (`writePartitioned`): directory-level
  *    partition pruning — a predicate on the partition column reads only
  *    matching directories. `spark.read` shows it as `PartitionFilters`
  *    with the pruned count; nothing else is even listed.
  *  - **Bucketed tables** (`writeBucketed`): pre-shuffled-on-disk layout.
  *    Two tables bucketed on the same key with the same bucket count join
  *    with ZERO exchange — the shuffle was paid once at write time, which
  *    is the right trade for a fact table joined every run.
  *
  * Both are plain open formats (parquet + catalog metadata), readable by
  * any engine — no custom binary format to maintain.
  */
object Storage {

  /** Write `df` partitioned by `partitionCols` (hive-style directories). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Z-ordered layout write: range-partition + sort on the Morton code of
    * two keys, so every output file covers a compact rectangle in
    * (a, b)-space and min/max file statistics prune on EITHER dimension —
    * the multi-dimensional clustering a single-column sort can't give
    * (sorting by `a` makes files tight on `a` and full-span on `b`).
    * The interleave is the codegen'd InterleaveBits expression; the
    * clustering-quality gate lives in ZOrderSpec.
    */
  /** Attach the clustering code: each dimension min-max scaled to 16 bits
    * BEFORE interleaving — raw-value interleaving is dominated by
    * whichever dimension has the larger magnitude (a day number ≈ 20000
    * owns all the high bits against a user id ≈ 100, and the layout
    * degenerates to a single-column sort). Scaling costs one small
    * aggregate over the frame at write time.
    */
  def withZCode(
      df: DataFrame,
      a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.functions.{greatest, lit, max => smax, min => smin}
    val r = df
      .agg(
        smin(a.cast("double")), smax(a.cast("double")),
        smin(b.cast("double")), smax(b.cast("double")))
      .head()
    def scaled(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      ((c.cast("double") - lit(lo)) / greatest(lit(hi - lo), lit(1.0)) * lit(65535.0))
        .cast("long")
    df.withColumn("zcode", graft.functions.VectorFunctions.zorder(
      scaled(a, r.getDouble(0), r.getDouble(1)),
      scaled(b, r.getDouble(2), r.getDouble(3))))
  }

  def zorderWrite(
      df: DataFrame,
      a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column,
      path: String,
      nFiles: Int): Unit =
    withZCode(df, a, b)
      .repartitionByRange(nFiles, col("zcode"))
      .sortWithinPartitions(col("zcode"))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Write `df` as a bucketed (+ sorted) catalog table. Bucketing requires
    * the catalog (saveAsTable): the bucket spec lives in table metadata.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      bucketCol: String,
      sortCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** True iff the EXECUTED plan contains a shuffle exchange — the assertion
    * helper for "this bucketed join does not shuffle". Forces execution and
    * descends through AQE wrappers/query stages (under adaptive execution
    * the top-level plan hides the materialized stages).
    */
  def hasShuffle(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    df.collect()
    def find(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case _: ShuffleExchangeLike => true
      case q: QueryStageExec => find(q.plan)
      case r: ReusedExchangeExec => find(r.child)
      case other => other.children.exists(find)
    }
    find(df.queryExecution.executedPlan)
  }

  /** Count of partition directories actually read after pruning, from the
    * executed plan's FileSourceScanExec metadata. Traverses AQE wrapper
    * nodes (AdaptiveSparkPlanExec / QueryStageExec hide the scan from a
    * plain `collect` — the hasShuffle lesson).
    */
  def prunedPartitionCount(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case r: ReusedExchangeExec => scans(r.child)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .headOption.flatMap(_.metrics.get("numPartitions").map(_.value))
  }

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
