package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A bucket-partitioned parquet STATE table — the storage backend that
  * moves a streaming loop's generation state out of executor memory
  * (the r14 composed soak held one checkpointed corpus frame per
  * generation; the 100 TB shape cannot). Rows live under `b=<bucket>/`
  * partition directories; readers prune to the buckets a delta
  * touches, and writers replace ONLY those buckets via a two-phase
  * stage-then-commit:
  *
  *   1. [[stage]] writes the buckets' NEW content to a staging
  *      directory (an eager action — every read of the CURRENT table
  *      the new content depends on completes here, before anything
  *      moves);
  *   2. [[commit]] swaps the affected bucket directories (delete old,
  *      move staged). A bucket the delta emptied is deleted even
  *      though the staged write produced no directory for it — the
  *      caller passes the full affected-bucket list, not just the
  *      non-empty ones.
  *
  * Several tables participating in one generation stage FIRST and
  * commit TOGETHER (the caller orders it), so no plan ever reads a
  * half-swapped table. This is the raw-parquet equivalent of a table
  * format's partition-level replace (Iceberg `replacePartitions`,
  * Delta `replaceWhere`); on a real cluster the same access pattern —
  * bucket-pruned read, bucket-scoped replace — runs through the table
  * format's transactional commit instead of directory renames.
  *
  * The staged frame is repartitioned BY the bucket column before the
  * write so each bucket directory holds one file per stage — without
  * it, every shuffle task writes a sliver into every bucket and the
  * table degrades to taskCount×bucketCount small files within a few
  * generations.
  *
  * Reference anchor: the durable Raft apply-loop state this pattern
  * scales (`distributed/node.py:298-309` — every applied mutation
  * lands in persistent storage, memory holds only the in-flight op).
  */
final class StateTable(spark: SparkSession, val path: String) {

  import StateTable.BucketCol

  private val fs = new Path(path).getFileSystem(
    spark.sparkContext.hadoopConfiguration)
  // schema captured at init so later reads skip footer inference and
  // survive a momentarily-empty table
  private var schema: Option[StructType] = None

  /** Full (re)write — the initial state, or a generation where the
    * delta invalidated every bucket (e.g. an index rebuild fallback).
    * `df` must already carry the bucket column.
    */
  def init(df: DataFrame, nBuckets: Int): Unit = {
    require(df.columns.contains(BucketCol),
      s"state frame must carry '$BucketCol'")
    df.repartition(nBuckets, col(BucketCol))
      .write.partitionBy(BucketCol).mode("overwrite").parquet(path)
    schema = Some(spark.read.parquet(path).schema)
  }

  /** The whole table, lazily — a streaming scan, never a cache. */
  def read(): DataFrame = schema match {
    case Some(s) => spark.read.schema(s).parquet(path)
    case None =>
      val df = spark.read.parquet(path)
      schema = Some(df.schema)
      df
  }

  /** Partition-pruned read: only the listed buckets' files are
    * scanned (`b` is a partition column, so the isin lands in the
    * file index, not a row filter).
    */
  def readBuckets(buckets: Seq[Int]): DataFrame =
    read().where(col(BucketCol).isin(buckets: _*))

  /** Phase 1: materialize `df` (which must carry the bucket column)
    * into a staging directory beside the table. Runs the action NOW —
    * all reads of the current table complete before any [[commit]]
    * moves directories.
    */
  def stage(df: DataFrame, nBuckets: Int): StateTable.Staged = {
    require(df.columns.contains(BucketCol),
      s"staged frame must carry '$BucketCol'")
    val dir = s"$path.staging-${UUID.randomUUID().toString.take(8)}"
    df.repartition(math.max(1, nBuckets), col(BucketCol))
      .write.partitionBy(BucketCol).mode("overwrite").parquet(dir)
    val bytes = fs.getContentSummary(new Path(dir)).getLength
    StateTable.Staged(dir, bytes)
  }

  /** Phase 2: replace each affected bucket's directory with its staged
    * content (or delete it, if the staged write emptied the bucket).
    * Returns the number of bucket directories written.
    */
  def commit(staged: StateTable.Staged, buckets: Seq[Int]): Int = {
    val tableRoot = new Path(path)
    val stagingRoot = new Path(staged.dir)
    var moved = 0
    buckets.foreach { b =>
      val live = new Path(tableRoot, s"$BucketCol=$b")
      val fresh = new Path(stagingRoot, s"$BucketCol=$b")
      if (fs.exists(live)) fs.delete(live, true)
      if (fs.exists(fresh)) {
        fs.rename(fresh, live)
        moved += 1
      }
    }
    fs.delete(stagingRoot, true)
    moved
  }

  /** Current on-disk size — the state-residence metric (disk holds
    * O(corpus); executor memory must not).
    */
  def diskBytes(): Long =
    if (fs.exists(new Path(path)))
      fs.getContentSummary(new Path(path)).getLength
    else 0L
}

object StateTable {
  /** The partition column every state frame carries. */
  val BucketCol = "b"

  final case class Staged(dir: String, bytes: Long)

  /** Bucket of an md5-hex fingerprint column: first 4 hex digits mod
    * nBuckets (deterministic, engine-independent).
    */
  def fpBucket(fp: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(conv(substring(fp, 1, 4), 16, 10).cast("int"), lit(nBuckets))

  /** Bucket of a long id column. */
  def idBucket(id: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(id.cast("long"), lit(nBuckets.toLong)).cast("int")
}
