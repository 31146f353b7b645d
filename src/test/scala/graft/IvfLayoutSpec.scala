package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Ivf

/** IVF as a partitioned parquet layout: the probe must (1) return the
  * same rows as the in-memory operator and (2) actually prune unprobed
  * cell directories at the scan (partition filters, not a post-filter).
  */
class IvfLayoutSpec extends SparkSpec {

  test("layout probe matches in-memory IVF and prunes partitions") {
    val emb = Tables.embeddings(spark, sfDir)
    val query = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val path = java.nio.file.Files.createTempDirectory("ivf-layout").toString

    Ivf.writeLayout(emb, nCentroids = 16, VectorFunctions.cosine, path)
    val fromLayout = Ivf.knnFromLayout(
      spark, path, query, k = 10, nProbe = 4, VectorFunctions.cosine)
    val inMemory = Ivf.knn(
      emb, query, k = 10, nCentroids = 16, nProbe = 4, VectorFunctions.cosine)
    val a = fromLayout.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = inMemory.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a == b)

    // the cell scan carries a cent_id partition filter — pruning happens
    // at file listing, before any row is read
    val plan = fromLayout.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cent_id#") || plan.contains("cent_id IN"),
      s"no partition filter on the cell scan:\n$plan")

    // and the pruned scan reads only the probed cells' rows
    val probedRows = Ivf.knnFromLayout(
      spark, path, query, k = 100000, nProbe = 4, VectorFunctions.cosine).count()
    val totalRows = emb.count()
    assert(probedRows < totalRows, s"probe read the whole corpus ($probedRows == $totalRows)")
  }
}
