package graft

import org.apache.spark.sql.functions._

import graft.index.{HnswPersistence, HnswSpark}

/** Executor-resident HNSW serving (VERDICT r2 item 2): shards built and
  * cached on executors, queries broadcast, per-shard top-k merged with the
  * map-side TopKByDistance aggregate. Gates:
  *  - row-identical to the collect()+broadcast path (searchDf);
  *  - saveResident → loadResident round-trips without the index ever
  *    passing through the driver, and serves identical rows.
  */
class HnswResidentSpec extends SparkSpec {

  private def queriesDf = Tables.embeddings(spark, sfDir)
    .where(col("vec_id") < 8)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.select(col("query_id").cast("long"), col("vec_id").cast("long"), col("distance"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(t => (t._1, t._3, t._2))
      .toSeq

  test("searchResident is row-identical to the broadcast path (searchDf)") {
    val emb = Tables.embeddings(spark, sfDir)
    val params = HnswSpark.Params(dim = 64)

    val broadcastIdx = HnswSpark.build(emb, params, numPartitions = 4)
    val bc = spark.sparkContext.broadcast(broadcastIdx)
    val viaBroadcast = canon(HnswSpark.searchDf(spark, bc, queriesDf, k = 10))

    val shards = HnswSpark.buildResident(emb, params, numPartitions = 4)
    try {
      assert(shards.count() == 4)
      val viaResident = canon(HnswSpark.searchResident(spark, shards, queriesDf, k = 10))
      assert(viaResident == viaBroadcast)
    } finally shards.unpersist(blocking = true)
  }

  test("saveResident -> loadResident round-trip serves identical rows") {
    val emb = Tables.embeddings(spark, sfDir)
    val params = HnswSpark.Params(dim = 64)
    val path = java.nio.file.Files.createTempDirectory("hnsw-resident").toString

    val shards = HnswSpark.buildResident(emb, params, numPartitions = 3)
    try {
      val before = canon(HnswSpark.searchResident(spark, shards, queriesDf, k = 10))
      HnswPersistence.saveResident(spark, shards, path)
      val reloaded = HnswPersistence.loadResident(spark, path)
      try {
        assert(reloaded.count() == shards.count())
        val after = canon(HnswSpark.searchResident(spark, reloaded, queriesDf, k = 10))
        assert(after == before)
      } finally reloaded.unpersist(blocking = true)
    } finally shards.unpersist(blocking = true)
  }

  test("duplicate query rows keep per-row cardinality (searchDf parity)") {
    val emb = Tables.embeddings(spark, sfDir)
    val shards = HnswSpark.buildResident(
      emb, HnswSpark.Params(dim = 64), numPartitions = 2)
    try {
      // the same query_id twice: searchDf emits k rows per INPUT ROW, so
      // the resident merge must too (grouping on query_id alone would
      // collapse the retry into one k-row result)
      val dup = queriesDf.where(col("query_id") === 0)
        .unionAll(queriesDf.where(col("query_id") === 0))
      assert(HnswSpark.searchResident(spark, shards, dup, k = 10).count() == 20)
    } finally shards.unpersist(blocking = true)
  }

  test("resident serving is planner-integrated (HnswResidentProbeExec in the plan)") {
    val emb = Tables.embeddings(spark, sfDir)
    val shards = HnswSpark.buildResident(
      emb, HnswSpark.Params(dim = 64), numPartitions = 2)
    try {
      val df = HnswSpark.searchResident(spark, shards, queriesDf, k = 5)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("HnswResidentProbe"),
        s"resident probe not served by the Catalyst operator:\n$plan")
    } finally shards.unpersist(blocking = true)
  }

  test("resident ef knob widens the beam through the DataFrame path") {
    val emb = Tables.embeddings(spark, sfDir)
    val shards = HnswSpark.buildResident(
      emb, HnswSpark.Params(dim = 64), numPartitions = 2)
    try {
      // same query set, ef clamped to k vs a wide beam: the wide beam's
      // result distance sum can only be <= (closer or equal neighbors)
      def distSum(ef: Option[Int]): Double =
        HnswSpark.searchResident(spark, shards, queriesDf, k = 10, ef = ef)
          .agg(sum(col("distance"))).head().getDouble(0)
      assert(distSum(Some(200)) <= distSum(Some(10)) + 1e-9)
    } finally shards.unpersist(blocking = true)
  }

  test("resident probe enforces the small-query-side contract loudly") {
    val emb = Tables.embeddings(spark, sfDir)
    val shards = HnswSpark.buildResident(
      emb, HnswSpark.Params(dim = 64), numPartitions = 2)
    val key = graft.plans.HnswProbe.MaxQueryRowsKey
    try {
      spark.conf.set(key, "5")
      // 8 query rows > bound of 5: the collect must fail with the contract
      // in the message instead of silently materializing the frame
      val e = intercept[IllegalStateException] {
        HnswSpark.searchResident(spark, shards, queriesDf, k = 10).count()
      }
      assert(e.getMessage.contains("query side exceeds 5 rows"))
      // at the bound it still serves (executeTake never over-collects)
      spark.conf.set(key, "8")
      assert(HnswSpark.searchResident(spark, shards, queriesDf, k = 10)
        .count() == 80L)
    } finally {
      spark.conf.unset(key)
      shards.unpersist(blocking = true)
    }
  }
}
