package graft

import scala.util.Random

import graft.operators.{Dedup, Ranking, SemanticDedup}

/** Randomized differential specs for the round-5 operators: a
  * driver-side Scala mirror of each operator's EXACT arithmetic
  * (left-to-right sums, 6-decimal HALF_UP rounding, id tie-breaks) run
  * against the Spark plan on seeded random corpora — the CorpusStats
  * precedent. These catch divergence classes a fixed fixture can't
  * (tie geometry, zero vectors, singleton clusters, rounding-boundary
  * scores).
  */
class DifferentialSpec extends SparkSpec {

  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // left-to-right sums, matching ArrayDotProduct / ArrayL2Normalize
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(v, v))
    if (n == 0.0) v else v.map(_ / n)
  }

  test("semanticDedup equals the brute-force SemDeDup rule on random corpora") {
    for (seed <- 1 to 5) {
      val rng = new Random(seed * 101L)
      val n = 40 + rng.nextInt(60)
      val dim = 3
      val eps = 0.05 + rng.nextDouble() * 0.6
      val nCents = 1 + rng.nextInt(8)
      // small integer grid → plenty of exact ties and some zero vectors
      val rows = (0 until n).map(i =>
        (i.toLong, Array.fill(dim)((rng.nextInt(7) - 3).toFloat)))
      val got = SemanticDedup
        .semanticDedup(rows.toDF("vec_id", "embedding"), eps, nCents)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap

      // mirror: float→double cast, normalize, argmin by (round6 dist, id)
      val nv = rows.map { case (id, v) => id -> normalize(v.map(_.toDouble)) }.toMap
      val cents = rows.take(nCents).map { case (id, _) => id -> nv(id) }
      def cdist(a: Array[Double], b: Array[Double]) = round6(1.0 - dot(a, b))
      val assigned = nv.map { case (id, v) =>
        id -> cents.map { case (cid, cv) => (cdist(v, cv), cid) }.min._2
      }
      val expected = nv.keys.map { id =>
        val dup = nv.keys.exists(o =>
          o < id && assigned(o) == assigned(id) && cdist(nv(o), nv(id)) <= eps)
        id -> ((assigned(id), if (dup) 0 else 1))
      }.toMap
      assert(got == expected, s"seed=$seed n=$n eps=$eps nCents=$nCents")
    }
  }

  test("passageDedup equals a driver-side mirror on random corpora") {
    for (seed <- 1 to 5) {
      val rng = new Random(seed * 211L)
      val n = 20 + rng.nextInt(30)
      val w = 1 + rng.nextInt(3) // passage width 1-3
      // tiny vocabulary → guaranteed passage collisions across docs
      val rows = (0 until n).map { i =>
        val len = 1 + rng.nextInt(9)
        (i.toLong, Seq.fill(len)("t" + rng.nextInt(4)).mkString(" "))
      }
      import org.apache.spark.sql.functions.col
      val got = graft.operators.Dedup
        .passageDedup(rows.toDF("doc_id", "text"), w)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      graft.CacheTracker.releaseAll()

      // mirror: split, window, global-first-occurrence keeps, reassemble
      val passagesByDoc = rows.map { case (id, text) =>
        val toks = text.split(" ", -1)
        val nP = (toks.length - 1) / w + 1
        id -> (0 until nP).map(i =>
          toks.slice(i * w, math.min((i + 1) * w, toks.length)).mkString(" "))
      }
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = passagesByDoc.map { case (id, ps) =>
        val kept = ps.filter(p => seen.add(p)) // in (doc, pidx) order
        id -> ((ps.size.toLong, kept.size.toLong, kept.mkString(" ")))
      }.toMap
      assert(got == expected, s"seed=$seed n=$n w=$w")
    }
  }

  test("bm25TopTerms equals a driver-side mirror on random corpora") {
    for (seed <- 1 to 5) {
      val rng = new Random(seed * 211L)
      val vocab = ('a' to 'j').map(_.toString)
      val n = 10 + rng.nextInt(20)
      val rows = (0 until n).map(i =>
        (i.toLong, Seq.fill(2 + rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")))
      val topK = 1 + rng.nextInt(4)
      val got = Ranking.bm25TopTerms(rows.toDF("doc_id", "text"), topK)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
        .toSeq

      val toks = rows.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val nDocs = n.toDouble
      val avgdl = toks.values.map(_.size).sum.toDouble / n
      val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toDouble }
      val expected = toks.toSeq.sortBy(_._1).flatMap { case (id, ts) =>
        val dl = ts.size.toDouble
        val scored = ts.groupBy(identity).toSeq.map { case (t, xs) =>
          val tf = xs.size.toDouble
          val s = round6(
            math.log(1.0 + (nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
              ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))))
          (t, s)
        }
        scored.sortBy { case (t, s) => (-s, t) }.take(topK).zipWithIndex
          .map { case ((t, s), i) => (id, t, s, (i + 1).toLong) }
      }
      assert(got == expected, s"seed=$seed n=$n topK=$topK")
    }
  }

  test("rrfHybridSearch equals a driver-side mirror on random corpora") {
    for (seed <- 1 to 5) {
      val rng = new Random(seed * 401L)
      val vocab = ('a' to 'h').map(_.toString)
      val n = 12 + rng.nextInt(15)
      val docs = (0 until n).map(i =>
        (i.toLong, Seq.fill(2 + rng.nextInt(10))(vocab(rng.nextInt(vocab.size)))
          .mkString(" ")))
      val embs = (0 until n).map(i =>
        (i.toLong, Array.fill(3)((rng.nextInt(7) - 3).toFloat)))
      val legK = 1 + rng.nextInt(n + 3) // sometimes truncating, sometimes not
      val got = graft.operators.Hybrid.rrfHybridSearch(
        docs.toDF("doc_id", "text"), embs.toDF("vec_id", "embedding"),
        queryDocId = 0L, legK = legK, topN = n + 2)
        .collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
        .toSeq

      // lexical mirror: quantized microunit integer sum over query terms
      val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val qterms = toks(0L).distinct.toSet
      val nDocs = n.toDouble
      val avgdl = toks.values.map(_.size).sum.toDouble / n
      val dfm = toks.values.flatMap(_.distinct).groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toDouble }
      val lexScore = toks.flatMap { case (id, ts) =>
        val dl = ts.size.toDouble
        val micro = ts.filter(qterms).groupBy(identity).map { case (t, xs) =>
          val tf = xs.size.toDouble
          val term = math.log(1.0 + (nDocs - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
            ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
          BigDecimal(term * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }
        if (micro.isEmpty) None
        else Some(id -> round6(micro.sum / 1e6))
      }
      // vector mirror: full cosine formula (not the normalized form)
      val ev = embs.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
      val qv = ev(0L)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        val prod = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
        round6(if (prod == 0.0) 1.0 else 1.0 - dot(a, b) / prod) + 0.0
      }
      val lexRank = lexScore.toSeq.sortBy { case (id, s) => (-s, id) }
        .take(legK).zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val vecRank = ev.toSeq.map { case (id, v) => (id, cos(v, qv)) }
        .sortBy { case (id, d) => (d, id) }
        .take(legK).zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
      val expected = (lexRank.keySet ++ vecRank.keySet).toSeq.map { id =>
        val fused = round6(
          lexRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            vecRank.get(id).map(r => 1.0 / (60 + r)).getOrElse(0.0))
        (id, fused, lexRank.getOrElse(id, 0L), vecRank.getOrElse(id, 0L))
      }.sortBy { case (id, f, _, _) => (-f, id) }.take(n + 2)
      assert(got == expected, s"seed=$seed n=$n legK=$legK")
    }
  }

  test("substringDupStats equals a driver-side mirror on random corpora") {
    for (seed <- 1 to 5) {
      val rng = new Random(seed * 307L)
      val k = 6
      val n = 8 + rng.nextInt(12)
      // short alphabet + shared motifs → genuine cross-doc k-gram overlap
      val motifs = Seq("abcdefgh", "hgfedcba", "aabbccdd")
      val rows = (0 until n).map { i =>
        val parts = Seq.fill(1 + rng.nextInt(3))(
          if (rng.nextBoolean()) motifs(rng.nextInt(motifs.size))
          else Seq.fill(4 + rng.nextInt(8))(('a' + rng.nextInt(4)).toChar).mkString)
        (i.toLong, parts.mkString(""))
      }
      val got = Dedup.substringDupStats(rows.toDF("doc_id", "text"), k)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap

      // mirror of the polynomial rolling hash (base 257 mod 1e9+7)
      def kgrams(t: String): Set[Long] =
        if (t.length < k) Set.empty
        else (0 to t.length - k).map { i =>
          t.substring(i, i + k).foldLeft(0L)((acc, c) => (acc * 257 + c) % 1000000007L)
        }.toSet
      val sets = rows.map { case (id, t) => id -> kgrams(t) }.filter(_._2.nonEmpty)
      val expected = sets.map { case (id, s) =>
        val shared = s.count(fp => sets.exists { case (o, os) => o != id && os(fp) })
        id -> ((s.size.toLong, shared.toLong,
          round6(shared.toDouble / s.size)))
      }.toMap
      assert(got == expected, s"seed=$seed n=$n")
    }
  }
}
