package graft

import org.apache.spark.sql.functions._

import graft.operators.Embeddings

/** Hard-negative mining invariants: the label exclusion, the bounded
  * per-anchor cut, brute-force parity, and the plan shape.
  */
class HardNegativesSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  private def anchors =
    emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))

  test("no mined negative shares its anchor's label or id") {
    val out = Embeddings.hardNegatives(emb, anchors, k = 10)
    val anchorLabels = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    val bad = out.join(anchorLabels, "query_id")
      .where(col("neg_label") === col("qlabel") ||
        col("vec_id") === col("query_id"))
      .count()
    assert(bad == 0)
  }

  test("k rows per anchor, ranks 1..k, distances non-decreasing") {
    val rows = Embeddings.hardNegatives(emb, anchors, k = 10).collect()
    val byAnchor = rows.groupBy(_.getLong(0))
    assert(byAnchor.keySet == Set(0L, 1L, 2L))
    byAnchor.values.foreach { g =>
      assert(g.length == 10)
      val sorted = g.sortBy(_.getLong(4))
      assert(sorted.map(_.getLong(4)).toSeq == (1L to 10L))
      val ds = sorted.map(_.getDouble(3))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
    }
  }

  test("matches a local brute-force mine for anchor 0") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val all = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Double]](1).toArray,
        r.getInt(2)))
    val (qid, qv, qlabel) = all.find(_._1 == 0L).get
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val prod = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (prod == 0.0) 1.0 else 1.0 - dot / prod
    }
    val want = all
      .filter { case (id, _, l) => l != qlabel && id != qid }
      .map { case (id, v, _) => (round6(cosine(v, qv)), id) }
      .sorted.take(10).map(_._2).toSeq
    val got = Embeddings.hardNegatives(emb, anchors, k = 10)
      .where(col("query_id") === 0).orderBy(col("rank"))
      .collect().map(_.getLong(1)).toSeq
    assert(got == want)
  }

  test("batch-hard triplets match a local brute-force mine") {
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val prod = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (prod == 0.0) 1.0 else 1.0 - dot / prod
    }
    val all = emb
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[scala.collection.Seq[Double]](1).toArray,
        r.getInt(2)))
    val got = Embeddings.batchHardTriplets(emb, anchors).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    got.foreach { row =>
      val (qid, qv, qlabel) = all.find(_._1 == row.getLong(0)).get
      val others = all.filter(_._1 != qid)
      val (pd, pid) = others.filter(_._3 == qlabel)
        .map { case (id, v, _) => (round6(cosine(v, qv)), id) }
        .maxBy { case (d, id) => (d, -id) }
      val (nd, nid) = others.filter(_._3 != qlabel)
        .map { case (id, v, _) => (round6(cosine(v, qv)), id) }
        .min
      assert((row.getLong(1), row.getDouble(2), row.getLong(3), row.getDouble(4)) ==
        (pid, pd, nid, nd))
      assert(row.getDouble(5) == round6(pd - nd))
    }
  }

  test("batch-hard triplets: a label-unique anchor gets a NULL positive side") {
    import spark.implicits._
    val tiny = Seq(
      (0L, Seq(1.0, 0.0), 42), // no other label-42 vector
      (1L, Seq(0.9, 0.1), 1),
      (2L, Seq(0.0, 1.0), 1)).toDF("vec_id", "embedding", "label")
    val a = tiny.where(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val row = Embeddings.batchHardTriplets(tiny, a).collect().head
    assert(row.isNullAt(1) && row.isNullAt(2) && row.isNullAt(5))
    assert(row.getLong(3) == 1L) // nearest different-label
  }

  test("plans as the bounded topk aggregate, never a ranking window") {
    val plan = Embeddings.hardNegatives(emb, anchors, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"), s"no map-side topk in:\n$plan")
    assert(!plan.contains("row_number"), s"window leaked into:\n$plan")
  }
}
