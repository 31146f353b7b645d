package graft

import org.apache.spark.sql.functions._

import graft.operators.Coreset

/** Gonzalez k-center: exact parity with a plain-Scala reference walk,
  * partitioning independence, and the covering contract.
  */
class CoresetSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  /** Plain-Scala Gonzalez with the same rounding/tie rules — an
    * independent statement of the algorithm (no Spark machinery).
    */
  private def reference(k: Int): Seq[(Long, Long, Double)] = {
    val rows = emb.select(col("vec_id"),
      col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      val raw = if (na * nb == 0) 1.0 else 1.0 - dot / (na * nb)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    }
    val md = scala.collection.mutable.Map.empty[Long, Double]
    var center = rows.head._2
    rows.foreach { case (id, v) => md(id) = cos(v, center) }
    val out = scala.collection.mutable.ArrayBuffer((1L, rows.head._1, 0.0))
    for (rank <- 2 to k) {
      val (pickId, pickMd) = md.toSeq.maxBy { case (id, d) => (d, -id) }
      out += ((rank.toLong, pickId, pickMd))
      center = rows.find(_._1 == pickId).get._2
      rows.foreach { case (id, v) => md(id) = math.min(md(id), cos(v, center)) }
    }
    out.toSeq
  }

  test("kCenter fails loudly (module-standard require) on an empty frame") {
    val e = intercept[IllegalArgumentException] {
      Coreset.kCenter(emb.where(col("vec_id") < 0), k = 3)
    }
    assert(e.getMessage.contains("kCenter on an empty frame"))
  }

  test("kCenter matches the plain-Scala reference walk exactly") {
    val got = Coreset.kCenter(emb, k = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == reference(6), s"got $got")
  }

  test("kCenter is partitioning-independent and radii are non-increasing") {
    val a = Coreset.kCenter(emb, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = Coreset.kCenter(
      emb.repartition(7), k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a == b)
    assert(a.map(_._2).distinct.size == 5, "picks must be distinct")
    val radii = a.drop(1).map(_._3) // rank-1 anchor is 0.0 by convention
    assert(radii.zip(radii.tail).forall { case (x, y) => y <= x },
      s"coverage curve must be non-increasing: $radii")
  }

  test("covering contract: every vector is within the next radius of a pick") {
    // after k picks, max over the corpus of min-dist-to-picks equals what
    // rank k+1 WOULD select — i.e. no vector is farther than the next
    // radius; check via one extra round
    val k = 5
    val both = Coreset.kCenter(emb, k + 1).collect()
    val nextRadius = both.last.getDouble(2)
    val picks = both.dropRight(1).map(_.getLong(1)).toSet
    val vecs = emb.select(col("vec_id"),
      col("embedding").cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na * nb == 0) 1.0 else 1.0 - dot / (na * nb)
    }
    val maxMin = vecs.map { case (_, v) =>
      picks.map(p => cos(v, vecs(p))).min
    }.max
    assert(maxMin <= nextRadius + 1e-6,
      s"uncovered vector at $maxMin > next radius $nextRadius")
  }
}
