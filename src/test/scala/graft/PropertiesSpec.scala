package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.index.HnswIndex

/** Property-style checks (SURVEY §5.2-2): metric axioms and kNN monotonicity
  * over seeded random samples on the in-memory implementation (the Catalyst
  * column forms are pinned to hand values in VectorFunctionsSpec; these pin
  * the algebra). Plain seeded loops — the scalatest/scalacheck bridge
  * artifact isn't in the offline cache, and determinism is better anyway.
  */
class PropertiesSpec extends AnyFunSuite {

  private val dim = 8
  private val trials = 200

  private def vecs(rng: Random, n: Int): Seq[Array[Double]] =
    Seq.fill(n)(Array.fill(dim)(rng.nextDouble() * 20.0 - 10.0))

  private def idx(metric: String) = new HnswIndex(dim, metric = metric)

  test("euclidean/manhattan: symmetry, non-negativity, identity") {
    val rng = new Random(11L)
    for (metric <- Seq("euclidean", "manhattan"); _ <- 1 to trials) {
      val m = idx(metric)
      val Seq(a, b) = vecs(rng, 2)
      assert(m.distance(a, b) >= 0.0)
      assert(m.distance(a, b) == m.distance(b, a))
      assert(m.distance(a, a) == 0.0)
    }
  }

  test("euclidean triangle inequality") {
    val rng = new Random(12L)
    val m = idx("euclidean")
    for (_ <- 1 to trials) {
      val Seq(a, b, c) = vecs(rng, 3)
      assert(m.distance(a, c) <= m.distance(a, b) + m.distance(b, c) + 1e-9)
    }
  }

  test("cosine is symmetric and bounded in [0, 2]") {
    val rng = new Random(13L)
    val m = idx("cosine")
    for (_ <- 1 to trials) {
      val Seq(a, b) = vecs(rng, 2)
      val d = m.distance(a, b)
      assert(d == m.distance(b, a))
      assert(d >= -1e-12 && d <= 2.0 + 1e-12)
    }
  }

  test("negated dot orders by similarity: more-aligned vectors rank closer") {
    val m = idx("dot_product")
    val q = Array.fill(dim)(1.0)
    assert(m.distance(q, q.map(_ * 2)) < m.distance(q, q))
    assert(m.distance(q, q) < m.distance(q, q.map(_ * -1)))
  }

  test("knn(k) is a prefix of knn(k+1) — search monotonicity") {
    val rng = new Random(14L)
    val index = new HnswIndex(dim, metric = "euclidean", seed = 3L)
    vecs(rng, 200).zipWithIndex.foreach { case (v, i) => index.insert(i.toLong, v) }
    for (_ <- 1 to 50) {
      val q = vecs(rng, 1).head
      val k = rng.nextInt(20) + 1
      val small = index.search(q, k, ef = Some(200)).map(_._1)
      val big = index.search(q, k + 1, ef = Some(200)).map(_._1)
      assert(big.take(k) == small)
    }
  }

  test("insert-then-delete returns the index to its prior visible state") {
    val rng = new Random(15L)
    val index = new HnswIndex(dim, metric = "euclidean", seed = 9L)
    vecs(rng, 50).zipWithIndex.foreach { case (v, i) => index.insert(i.toLong, v) }
    for (_ <- 1 to 25) {
      val q = vecs(rng, 1).head
      val before = index.search(q, 10).map(_._1)
      index.insert(999L, q)
      index.delete(999L)
      val after = index.search(q, 10).map(_._1)
      assert(before == after)
    }
  }

  // ---- round-11 algebra: SPS codec, KMV set estimates, Gonzalez ---------

  test("SPS codec: random parameter fuzz round-trips or quarantines, never lies") {
    val rng = new Random(41L)
    for (_ <- 1 to trials) {
      val spec = graft.operators.H264.SpsSpec(
        profileIdc = Seq(66, 77, 88, 100)(rng.nextInt(4)),
        levelIdc = 10 + rng.nextInt(52),
        widthMbsMinus1 = rng.nextInt(512),
        heightUnitsMinus1 = rng.nextInt(512),
        cropRight = rng.nextInt(8),
        cropBottom = rng.nextInt(8))
      val nal = graft.operators.H264.buildSps(spec)
      val got = graft.operators.H264.parseSps(nal)
      assert(got.contains(graft.operators.H264.SpsInfo(
        spec.profileIdc, spec.levelIdc, spec.codedWidth, spec.codedHeight)),
        s"$spec -> $got")
      // single-byte corruption never throws; it parses, differs, or Nones
      val pos = rng.nextInt(nal.length)
      val bad = nal.clone(); bad(pos) = (bad(pos) ^ (1 << rng.nextInt(8))).toByte
      graft.operators.H264.parseSps(bad) // must not throw
    }
  }

  test("escape/unescape is a bijection on random byte strings") {
    val rng = new Random(42L)
    for (_ <- 1 to trials) {
      val raw = Array.fill(rng.nextInt(64))((rng.nextInt(5) - 1).toByte)
      val escaped = graft.operators.H264.escapeRbsp(raw)
      assert(graft.operators.H264.unescapeRbsp(escaped).toSeq == raw.toSeq)
    }
  }

  test("Exp-Golomb style draws: KMV union-merge bounds hold on random sets") {
    // the merged k-min of two draw sets is the k-min of the union — the
    // Sketches.kmvSourceOverlap algebra, checked set-theoretically
    val rng = new Random(43L)
    val k = 16
    for (_ <- 1 to trials) {
      val a = Seq.fill(40)(rng.nextInt(1000).toLong).distinct.sorted.take(k)
      val b = Seq.fill(40)(rng.nextInt(1000).toLong).distinct.sorted.take(k)
      val merged = (a ++ b).distinct.sorted.take(k)
      val unionKmin = (a.toSet ++ b.toSet).toSeq.sorted.take(k)
      assert(merged == unionKmin)
    }
  }

  test("Gonzalez picks maximize the min-distance greedily on random sets") {
    val rng = new Random(44L)
    for (_ <- 1 to 20) {
      val pts = Seq.fill(40)(Array.fill(4)(rng.nextDouble()))
      def d(a: Array[Double], b: Array[Double]) =
        math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
      // greedy reference over euclidean (metric-agnostic property: each
      // pick's min-dist to previous picks is the max over candidates)
      var centers = List(pts.head)
      for (_ <- 1 until 5) {
        val next = pts.maxBy(p => centers.map(c => d(p, c)).min)
        val nextScore = centers.map(c => d(next, c)).min
        pts.foreach { p =>
          assert(centers.map(c => d(p, c)).min <= nextScore + 1e-12)
        }
        centers = next :: centers
      }
    }
  }
}
