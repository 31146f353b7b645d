package graft

import org.apache.spark.sql.functions._

import graft.index.HnswSpark
import graft.plans.{GraftExtensions, HnswProbe, HnswProbeExec}

/** The custom probe operator: plans through HnswProbeStrategy, stays
  * narrow, and matches the Dataset-flatMap path row for row.
  */
class HnswProbePlanSpec extends SparkSpec {

  test("probe plans as HnswProbeExec and matches searchDf exactly") {
    GraftExtensions.install(spark)
    val emb = Tables.embeddings(spark, sfDir)
    val idx = HnswSpark.build(emb, HnswSpark.Params(dim = 64), numPartitions = 4)
    val bc = spark.sparkContext.broadcast(idx)
    val queries = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("qv"))

    val probed = HnswProbe(queries, bc, k = 10)
    // the operator is visible in the physical plan, and the plan is narrow
    // (no exchange): parallelism is the child's partitioning
    val executed = probed.queryExecution.executedPlan
    assert(executed.exists(_.isInstanceOf[HnswProbeExec]), executed.toString)
    assert(!executed.toString.contains("Exchange"), executed.toString)

    val viaPlan = probed.select(col("query_id"), col("vec_id"), col("distance"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaFlatMap = HnswSpark.searchDf(spark, bc, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaPlan == viaFlatMap)
    assert(viaPlan.size == 50) // 5 queries x k=10

    // query columns pass through; Catalyst can project above the operator
    assert(probed.columns.toSeq == Seq("query_id", "qv", "vec_id", "distance"))
  }
}
