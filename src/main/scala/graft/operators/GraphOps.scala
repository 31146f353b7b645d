package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edge-list graph algorithms over DataFrames — the join-based power
  * iteration family (Pregel-without-Pregel). First member: PageRank,
  * the standard authority score for curation over similarity graphs
  * (which documents sit at the center of a near-dup neighborhood; which
  * vectors are ANN hubs — the knn_graph_stats in-degree extreme, made
  * global and damped).
  *
  * All arithmetic is INTEGER micro-units: ranks live as longs in units
  * of 1/scale, every division is integral `div`, and contributions sum
  * as longs — associative and commutative, so the result is
  * partition-invariant and bit-identical to the DuckDB oracle's `//`
  * rendering (the same fixed-point discipline UnigramLm's EM uses).
  * Per iteration: r'(v) = (scale·(1−d)) div den div n
  *                       + (Σ_{u→v} r(u) div outdeg(u)) · num div den.
  * Truncation sheds mass deterministically (bounded by n per division
  * layer) — both engines shed identically.
  *
  * Scale shape: the edge list is repartitioned by src ONCE and persisted;
  * each iteration is then (edges ⋈ ranks on src) ⋈ outdeg + one groupBy —
  * ranks (node-count sized, far smaller than edges) moves to the edges'
  * partitioning, the edge frame itself never reshuffles across
  * iterations. On a 1000-executor cluster the same plan holds with the
  * edge list bucketed by src; iterations are a fixed small constant so
  * the lineage stays shallow (checkpoint between iterations at larger
  * iteration counts).
  *
  * Contract: the graph is CLOSED — every dst also appears as a src
  * (true for knnGraph output, where neighbors are assigned corpus
  * vectors). Edges into unknown nodes drop their contribution
  * deterministically at the node join.
  */
object GraphOps {

  def pageRank(
      edges: DataFrame,
      iterations: Int = 5,
      scale: Long = 1000000000L,
      dampNum: Long = 85,
      dampDen: Long = 100,
      srcCol: String = "src_id",
      dstCol: String = "nbr_id"): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(scale >= 1 && dampDen >= 1 && dampNum >= 0 && dampNum <= dampDen,
      "damping must satisfy 0 <= num <= den, scale >= 1")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
      .persist()
    graft.CacheTracker.register(e)
    val nodes = e.select(col("src").as("node_id")).distinct().persist()
    graft.CacheTracker.register(nodes)
    val nRow = nodes.agg(count(lit(1)).as("n"))
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("odeg"))
    val teleNum = scale * (dampDen - dampNum)
    var ranks = nodes.crossJoin(broadcast(nRow))
      .select(col("node_id"), expr(s"CAST($scale AS BIGINT) div n").as("r"))
    (1 to iterations).foreach { _ =>
      val inc = e
        .join(ranks.withColumnRenamed("node_id", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("r div odeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
      ranks = nodes
        .join(inc.withColumnRenamed("dst", "node_id"), Seq("node_id"), "left")
        .crossJoin(broadcast(nRow))
        .select(col("node_id"),
          (expr(s"(CAST($teleNum AS BIGINT) div $dampDen) div n") +
            expr(s"(coalesce(inc, CAST(0 AS BIGINT)) * $dampNum) div $dampDen"))
            .as("r"))
    }
    ranks.select(
      col("node_id").as("vec_id"),
      col("r").as("pr_micro"),
      (round(col("r").cast("double") / lit(scale.toDouble), 6) + lit(0.0)).as("pr"))
      .orderBy(col("vec_id"))
  }
}
