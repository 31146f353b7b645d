package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE merge learning vs an INDEPENDENT single-machine reference
  * implementation (shares no code with the operator), on the classic
  * worked vocabulary plus the fixture corpus.
  */
class BpeSpec extends SparkSpec {

  /** Reference BPE over a weighted word vocabulary: sliding pair counts,
    * ties (count desc, then lexicographic pair), merges applied greedily
    * left to right — Sennrich et al. 2016's algorithm restated directly.
    */
  private def refBpe(
      words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, n) =>
        // code-point symbolization (java.util.stream route — independent
        // of the operator's charAt walk): non-BMP chars stay whole
        (w.codePoints().toArray.toVector
          .map(cp => new String(Character.toChars(cp))) :+ Bpe.EndOfWord, n)
      }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) += n
          case _ => ()
        }
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) done = true
      else {
        val ((l, r), c) = eligible.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, c))
        vocab = vocab.map { case (syms, n) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              nb += (l + r); i += 2
            } else { nb += syms(i); i += 1 }
          }
          (nb.result(), n)
        }
        rank += 1
      }
    }
    out.result()
  }

  private def collectMerges(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
      r.getAs[String]("right"), r.getAs[Long]("pair_count"))).toSeq
    graft.CacheTracker.releaseAll()
    r
  }

  /** Run `f` with the DISTRIBUTED iteration path forced on. */
  private def forcedDistributed[A](f: => A): A = {
    spark.conf.set("spark.graft.bpe.localVocabMax", "0")
    try f finally spark.conf.unset("spark.graft.bpe.localVocabMax")
  }

  test("merges match the reference on the classic worked vocabulary (both paths)") {
    import spark.implicits._
    // Sennrich's example: low x5, lower x2, newest x6, widest x3
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val text = words.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = collectMerges(Bpe.bpeMerges(docs, k = 8))
    assert(got == refBpe(words, 8), s"got $got")
    // the size gate must not change the answer: distributed path parity
    assert(forcedDistributed { collectMerges(Bpe.bpeMerges(docs, k = 8)) } == got)
    // the famous first merges: (e,s) 9 then (es,t) 9
    assert(got.take(2).map(m => (m._2, m._3, m._4)) ==
      Seq(("e", "s", 9L), ("es", "t", 9L)))
    // encoding with the learned merges segments an UNSEEN word into
    // learned subwords
    val merges = got.map(m => (m._2, m._3))
    val lowest = Bpe.encodeWord("lowest", merges)
    assert(lowest.contains("est</w>") || lowest.contains("est"), lowest.toString)
    assert(lowest.head == "low" || lowest.head == "lo", lowest.toString)
  }

  test("non-BMP words: merge symbols are whole code points, never surrogate halves") {
    import spark.implicits._
    // 🍕 and 🎉 are non-BMP (surrogate pairs in UTF-16); repeated words
    // force merges through them
    val words = Map("🍕x" -> 5L, "🍕y" -> 4L,
      "a🎉" -> 3L, "b🎉" -> 3L)
    val text = words.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }.mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = collectMerges(Bpe.bpeMerges(docs, k = 4))
    assert(got.nonEmpty)
    assert(got == refBpe(words, 4), s"got $got")
    // every emitted symbol must be a VALID Unicode string: no unpaired
    // surrogates (the pre-fix UTF-16 symbolization split emoji in half)
    for ((_, l, r, _) <- got; s <- Seq(l, r); i <- 0 until s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c))
        assert(i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1)),
          s"unpaired high surrogate in merge symbol '$s'")
      if (Character.isLowSurrogate(c))
        assert(i > 0 && Character.isHighSurrogate(s.charAt(i - 1)),
          s"unpaired low surrogate in merge symbol '$s'")
    }
    // encode keeps the pizza glyph intact inside learned subwords
    val enc = Bpe.encodeWord("🍕x", got.map(m => (m._2, m._3)))
    assert(enc.mkString("") == "🍕x" + Bpe.EndOfWord, enc.toString)
  }

  test("encodeCorpus: per-token parity with driver-side encodeWord; ids dense and frequency-ranked") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low lower newest"),
      (2L, "newest newest widest low"),
      (3L, "the newest widest lowest")).toDF("doc_id", "text")
    val mergesDf = Bpe.bpeMerges(docs, k = 6)
    val merges = mergesDf.collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    val out = Bpe.encodeCorpus(docs, merges).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3),
        r.getLong(4)))
    graft.CacheTracker.releaseAll()
    // 1) reassembly: concatenating a token's subwords in spos order gives
    //    word + </w>, for every (doc, pos) — and the subword split equals
    //    encodeWord's, token by token
    val corpus = Seq(1L -> "low low lower newest", 2L -> "newest newest widest low",
      3L -> "the newest widest lowest")
    for ((d, text) <- corpus; (w, p) <- text.split(" ").zipWithIndex) {
      val got = out.filter(r => r._1 == d && r._2 == p).sortBy(_._3).map(_._4).toSeq
      assert(got == Bpe.encodeWord(w, merges), s"doc $d pos $p word '$w'")
    }
    // 2) subword ids: dense 1..V, one id per distinct subword, ranked by
    //    corpus frequency (ties lexicographic) — tokenizeCorpus's contract
    val byId = out.groupBy(_._5).view.mapValues(_.map(_._4).distinct).toMap
    assert(byId.values.forall(_.size == 1), "one subword per id")
    val ids = byId.keySet
    assert(ids == (1L to ids.size).toSet, s"ids not dense: $ids")
    val freq = out.groupBy(_._4).view.mapValues(_.size.toLong).toMap
    val expectedOrder = freq.toSeq.sortBy { case (s, n) => (-n, s) }.map(_._1)
    val actualOrder = byId.toSeq.sortBy(_._1).map(_._2.head)
    assert(actualOrder == expectedOrder,
      s"ids not frequency-ranked: $actualOrder vs $expectedOrder")
  }

  test("merges match the reference on the fixture corpus; counts are non-increasing") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val got = collectMerges(Bpe.bpeMerges(docs, k = 10))
    assert(got.size == 10)
    // distributed-path parity on a real corpus
    assert(forcedDistributed { collectMerges(Bpe.bpeMerges(docs, k = 10)) } == got)
    // the new-pair-count-bounded-by-parent argument: ranks never increase
    val counts = got.map(_._4)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b }, counts.toString)
    // independent reference over the driver-computed word counts
    val words = docs.where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == refBpe(words, 10))
  }
}
