package graft

import org.apache.spark.sql.SparkSession
import graft.index.HnswSpark

/** HNSW scale soak: build-throughput, serving latency, and recall@10 at
  * 100-400× fixture scale, for BOTH serving shapes. Prints one JSON line.
  * Usage:
  *   graft.Soak [nVectors] [dim] [nShards] [nQueries]
  * Synthetic seeded Gaussian vectors (not the driver fixtures — the point
  * is a corpus far larger than sf0.001's 500 embeddings).
  *
  * Shapes measured:
  *  - RESIDENT (buildResident/searchResident): shards stay on executors,
  *    queries broadcast — the 100 TB shape. build_resident_sec has no
  *    driver collect in it; query_resident_ms is a batched DataFrame probe
  *    amortized per query.
  *  - BROADCAST (build/searchAll): the collect()+broadcast shape, plus
  *    single-threaded and parallel point-lookup latency. build_sec at
  *    400× was historically dominated by the ~800 MB driver collect —
  *    that delta vs build_resident_sec is exactly what this soak exists
  *    to show.
  * Both paths produce identical result sets (same seeds, same shards;
  * HnswResidentSpec gates row-identity), so recall is reported once.
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 50000
    val dim = if (args.length > 1) args(1).toInt else 64
    val shards = if (args.length > 2) args(2).toInt else 8
    val nq = if (args.length > 3) args(3).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vecs: Array[(Long, Array[Double])] = {
      val rnd = new java.util.Random(7L)
      Array.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian())))
    }
    val df = spark.sparkContext.parallelize(vecs.toSeq, shards)
      .toDF("vec_id", "embedding")
    val queries = vecs.take(nq)

    // ---- executor-resident shape ----------------------------------------
    val tr0 = System.nanoTime()
    val resident = HnswSpark.buildResident(df, HnswSpark.Params(dim = dim), shards)
    val buildResidentSec = (System.nanoTime() - tr0) / 1e9

    val qDf = spark.sparkContext.parallelize(queries.toSeq, math.min(cpus.toInt, nq))
      .toDF("query_id", "qv")
    // warm-up materializes plan + broadcast, then one timed batched probe
    HnswSpark.searchResident(spark, resident, qDf, 10).count()
    val tr1 = System.nanoTime()
    val residentRows = HnswSpark.searchResident(spark, resident, qDf, 10)
      .collect()
    val qResidentMs = (System.nanoTime() - tr1) / 1e6 / nq
    val approx: Map[Long, Set[Long]] = residentRows
      .groupBy(_.getLong(0))
      .map { case (qid, rs) => qid -> rs.map(_.getLong(1)).toSet }
    resident.unpersist(blocking = false)

    // ---- broadcast shape (collect + driver-side probes) -----------------
    val t0 = System.nanoTime()
    val idx = HnswSpark.build(df, HnswSpark.Params(dim = dim), numPartitions = shards)
    val buildSec = (System.nanoTime() - t0) / 1e9

    // warm-up pass, then timed single-threaded serving loop
    queries.take(20).foreach { case (_, v) => HnswSpark.searchAll(idx.toSeq, v, 10) }
    val t1 = System.nanoTime()
    queries.foreach { case (_, v) => HnswSpark.searchAll(idx.toSeq, v, 10) }
    val qMs = (System.nanoTime() - t1) / 1e6 / nq

    // point-lookup latency with concurrent shard probing
    queries.take(20).foreach { case (_, v) => HnswSpark.searchAllPar(idx, v, 10) }
    val t2 = System.nanoTime()
    queries.foreach { case (_, v) => HnswSpark.searchAllPar(idx, v, 10) }
    val qParMs = (System.nanoTime() - t2) / 1e6 / nq

    // brute-force ground truth — O(nq·n), parallelized across queries
    val metricIdx = idx.head // distance impl carrier (metric/dim only)
    val truth: Map[Long, Set[Long]] =
      java.util.Arrays.stream(queries).parallel().map { case (qid, v) =>
        qid -> vecs.map { case (id, u) => (metricIdx.distance(v, u), id) }
          .sortBy(t => (t._1, t._2)).take(10).map(_._2).toSet
      }.toArray.map(_.asInstanceOf[(Long, Set[Long])]).toMap
    val recall = approx.map { case (qid, got) =>
      (got & truth(qid)).size / 10.0
    }.sum / nq

    println(
      s"""{"n":$n,"dim":$dim,"shards":$shards,""" +
      s""""build_resident_sec":${math.round(buildResidentSec * 100) / 100.0},""" +
      s""""query_resident_ms":${math.round(qResidentMs * 100) / 100.0},""" +
      s""""build_sec":${math.round(buildSec * 100) / 100.0},""" +
      s""""query_ms":${math.round(qMs * 100) / 100.0},""" +
      s""""query_par_ms":${math.round(qParMs * 100) / 100.0},""" +
      s""""recall_at_10":${math.round(recall * 1000) / 1000.0}}""")
    spark.stop()
  }
}
