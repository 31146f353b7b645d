package graft

import graft.operators.CorpusStats

/** Corpus composition analytics: cross-source shingle overlap and
  * per-doc first-seen novelty, verified against hand-computed sets.
  */
class CorpusStatsSpec extends SparkSpec {

  test("sourceOverlap counts shared distinct shingles across sources") {
    import spark.implicits._
    // srcA docs share "one two three" and "two three four" with srcB's
    // doc; srcC shares nothing. 3-gram sets:
    //   A: {one two three, two three four, three four five} (from 2 docs)
    //   B: {one two three, two three four, x y z}
    //   C: {p q r}
    val docs = Seq(
      (1L, "one two three four", "srcA"),
      (2L, "one two three four five", "srcA"),
      (3L, "one two three four", "srcB"),
      (4L, "x y z", "srcB"),
      (5L, "p q r", "srcC")
    ).toDF("doc_id", "text", "source")
    val got = CorpusStats.sourceOverlap(docs, 3).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // A = {123, 234, 345}, B = {123, 234, xyz}, C = {pqr}
    assert(got(("srcA", "srcB")) == ((2L, 0.5, 0.666667)))
    assert(!got.contains(("srcA", "srcC"))) // no shared shingle, no row
    assert(!got.contains(("srcB", "srcC")))
  }

  test("sourceOverlap enforces the source-cardinality contract loudly") {
    import spark.implicits._
    // per-document "sources": the quadratic misuse the guard exists for
    val manySources = (0 until 50)
      .map(i => (i.toLong, s"tok$i one two three", s"domain-$i"))
      .toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] {
      CorpusStats.sourceOverlap(manySources, 3, maxSources = 20)
    }
    assert(e.getMessage.contains("distinct sources exceeds"))
    // at or under the bound the operator runs normally
    assert(CorpusStats.sourceOverlap(manySources, 3, maxSources = 50)
      .columns.contains("containment"))
  }

  test("ngramNovelty marks first-seen shingles by min doc_id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "one two three four"),       // {123, 234} both first here
      (2L, "one two three four"),       // exact dup: 0 novel
      (3L, "one two three five six"),   // {123 seen, 235, 356} -> 2/3
      (4L, "a b c")                     // {abc} -> 1/1
    ).toDF("doc_id", "text")
    val got = CorpusStats.ngramNovelty(docs, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 0L, 0.0)))
    assert(got(3L) == ((3L, 2L, 0.666667)))
    assert(got(4L) == ((1L, 1L, 1.0)))
  }

  test("randomized differential: both ops equal driver-side brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val srcs = Seq("a", "b", "c", "d")
    val rows = (0L until 120L).map { i =>
      val toks = (0 until 3 + rnd.nextInt(10)).map(_ => s"t${rnd.nextInt(40)}")
      (i, toks.mkString(" "), srcs(rnd.nextInt(srcs.length)))
    }
    val docs = rows.toDF("doc_id", "text", "source")
    def shingleSet(t: String): Set[String] = {
      val toks = t.split(" ")
      if (toks.length < 3) Set(t)
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    // sourceOverlap brute force
    val bySrc = rows.groupBy(_._3).map { case (s, rs) =>
      s -> rs.flatMap(r => shingleSet(r._2)).toSet
    }
    val wantOverlap = (for {
      (sa, ssa) <- bySrc; (sb, ssb) <- bySrc
      if sa < sb; shared = (ssa & ssb).size if shared > 0
    } yield (sa, sb) -> (shared.toLong,
      BigDecimal(shared.toDouble / (ssa.size + ssb.size - shared))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      BigDecimal(shared.toDouble / math.min(ssa.size, ssb.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    val gotOverlap = CorpusStats.sourceOverlap(docs, 3).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(gotOverlap == wantOverlap)
    // ngramNovelty brute force
    val firstSeen = rows.flatMap(r => shingleSet(r._2).map(_ -> r._1))
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).min }
    val wantNovelty = rows.map { case (id, t, _) =>
      val ss = shingleSet(t)
      val novel = ss.count(firstSeen(_) == id).toLong
      id -> ((ss.size.toLong, novel,
        BigDecimal(novel.toDouble / ss.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toMap
    val gotNovelty = CorpusStats.ngramNovelty(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(gotNovelty == wantNovelty)
  }

  test("sourceReport: volumes, corpus-wide dup exposure, language spread") {
    import spark.implicits._
    val docs = Seq(
      // "shared text" appears in BOTH a and b -> dup rows in both sources
      (1L, "shared text here", "en", "a"),
      (2L, "shared text here", "en", "b"),
      (3L, "unique one two three", "en", "a"),
      (4L, "another unique doc", "de", "a"),
      // within-source exact pair in b
      (5L, "twice in b", "en", "b"),
      (6L, "twice in b", "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
    val got = CorpusStats.sourceReport(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("a") == ((3L, 10L, 1L, 2L))) // 3 docs, 10 tokens, 1 dup, en+de
    assert(got("b") == ((3L, 9L, 3L, 1L)))  // the shared doc + the b-pair
  }
}
