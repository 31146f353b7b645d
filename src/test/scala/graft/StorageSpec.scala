package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Storage

/** Layout-aware storage: partition pruning and shuffle-free bucketed joins
  * (SURVEY §2.2 — the scale-path replacements for the reference's
  * single-blob persistence).
  */
class StorageSpec extends SparkSpec {

  test("partitioned write prunes directories under a partition predicate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString
    val df = (0 until 1000).map(i => (i.toLong, i % 10, s"payload_$i"))
      .toDF("id", "bucket_day", "payload")
    Storage.writePartitioned(df, dir, "bucket_day")

    val pruned = spark.read.parquet(dir).where(col("bucket_day") === 3)
    // collect() executes THIS queryExecution, populating its scan metrics
    // (count() would plan a separate aggregate query)
    assert(pruned.collect().length == 100)
    // the scan must carry a partition filter — pruning happens at listing
    // time, not as a post-read filter
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") &&
      planStr.contains("bucket_day"), s"no partition filter in:\n$planStr")
    val n = Storage.prunedPartitionCount(pruned)
    assert(n.forall(_ == 1L), s"expected 1 partition read, got $n")
  }

  test("same-key bucketed tables join with zero shuffle exchanges") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val facts = (0 until 2000).map(i => (i.toLong % 100, s"f$i")).toDF("k", "fv")
      val dims = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "dv")
      Storage.writeBucketed(facts, "graft_facts_b", 8, "k", Seq("k"))
      Storage.writeBucketed(dims, "graft_dims_b", 8, "k", Seq("k"))
      val joined = spark.table("graft_facts_b")
        .join(spark.table("graft_dims_b"), "k")
      assert(joined.count() == 2000)
      assert(!Storage.hasShuffle(joined),
        joined.queryExecution.executedPlan.toString)

      // control: the same join from unbucketed data DOES shuffle
      val unbucketed = facts.join(dims, "k")
      assert(Storage.hasShuffle(unbucketed))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      Storage.dropTable(spark, "graft_facts_b")
      Storage.dropTable(spark, "graft_dims_b")
    }
  }
}
