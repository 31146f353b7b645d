package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.StateTable

/** The bucket-partitioned parquet state table: pruned reads hit only
  * the listed buckets' files, stage-then-commit replaces exactly the
  * affected buckets (including deleting one the delta emptied), and a
  * multi-table generation that stages everything before committing
  * anything never reads half-swapped state.
  */
class StateTableSpec extends SparkSpec {

  private val B = 8

  private def freshDir(): String =
    Files.createTempDirectory("state-table-spec").toString

  private def docs(n: Int) = {
    import spark.implicits._
    spark.range(n).select(
      col("id").as("doc_id"),
      concat(lit("text"), col("id")).as("text"),
      StateTable.idBucket(col("id"), B).as(StateTable.BucketCol))
  }

  test("init + read round-trips; pruned read scans only listed buckets") {
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(64), B)
    assert(t.read().count() == 64)
    val pruned = t.readBuckets(Seq(2, 5))
    assert(pruned.count() == 16)
    // partition pruning: the scanned files all live under b=2/ or b=5/
    val files = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty &&
      files.forall(f => f.contains("/b=2/") || f.contains("/b=5/")))
  }

  test("commit replaces only affected buckets and deletes emptied ones") {
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(64), B)
    // delta: rewrite bucket 1 (drop half its rows), empty bucket 3
    val next = t.readBuckets(Seq(1, 3))
      .where(col(StateTable.BucketCol) === 1 && col("doc_id") < 32)
    val staged = t.stage(next, 2)
    assert(staged.bytes > 0)
    t.commit(staged, Seq(1, 3))
    val after = t.read()
    assert(after.where(col(StateTable.BucketCol) === 3).count() == 0)
    assert(after.where(col(StateTable.BucketCol) === 1).count() == 4)
    // untouched buckets intact
    assert(after.where(col(StateTable.BucketCol) === 2).count() == 8)
    assert(after.count() == 64 - 8 - 4)
  }

  test("one staged file per bucket (repartition by bucket before write)") {
    val t = new StateTable(spark, freshDir() + "/docs")
    t.init(docs(256), B)
    val perBucket = t.read()
      .select(col(StateTable.BucketCol), input_file_name().as("f"))
      .groupBy(col(StateTable.BucketCol))
      .agg(countDistinct(col("f")).as("nf"))
      .collect().map(_.getLong(1))
    assert(perBucket.nonEmpty && perBucket.forall(_ == 1L))
  }

  test("stage-all-then-commit-all keeps cross-table reads consistent") {
    val dir = freshDir()
    val a = new StateTable(spark, dir + "/a")
    val b = new StateTable(spark, dir + "/b")
    a.init(docs(32), B)
    b.init(docs(32).withColumn("doc_id", col("doc_id") + 100)
      .withColumn(StateTable.BucketCol,
        StateTable.idBucket(col("doc_id"), B)), B)
    // generation: a' drops evens; b' = rows of b whose (doc_id-100) is
    // still in a' — b's staged plan READS table a, so it must run
    // before a's commit swaps directories
    val nextA = a.read().where(col("doc_id") % 2 === 1)
    val stagedA = a.stage(nextA, B)
    val nextB = b.read()
      .join(a.read().select((col("doc_id") + 100).as("doc_id")), Seq("doc_id"))
    val stagedB = b.stage(nextB, B)
    val all = (0 until B)
    a.commit(stagedA, all)
    b.commit(stagedB, all)
    assert(a.read().count() == 16)
    // b staged against the PRE-commit a (all 32 rows), so keeps all 32
    assert(b.read().count() == 32)
  }

  test("fp bucket is stable and in range") {
    val r = spark.range(100)
      .select(StateTable.fpBucket(md5(col("id").cast("string")), 16).as("b"))
      .agg(min("b"), max("b")).collect()(0)
    assert(r.getInt(0) >= 0 && r.getInt(1) < 16)
  }
}
