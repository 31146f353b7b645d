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
      words.toSeq.map { case (w, n) => (w.map(_.toString).toVector :+ Bpe.EndOfWord, n) }
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
