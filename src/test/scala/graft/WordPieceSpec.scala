package graft

import org.apache.spark.sql.functions._

import graft.operators.WordPiece

/** WordPiece trainer + greedy encoder invariants: the ## conventions,
  * likelihood-vs-frequency merge selection, an independent reference
  * replay, local/distributed path parity, and the [UNK] rules.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("symbols: first bare, rest ##-prefixed, code-point aware") {
    assert(WordPiece.symbols("abc") == Vector("a", "##b", "##c"))
    assert(WordPiece.symbols("a") == Vector("a"))
    val emoji = new String(Character.toChars(0x1F600))
    assert(WordPiece.symbols(s"x$emoji") == Vector("x", "##" + emoji))
  }

  test("joined swallows the right ## and keeps the left status") {
    assert(WordPiece.joined("a", "##b") == "ab")
    assert(WordPiece.joined("##a", "##b") == "##ab")
    assert(WordPiece.joined("the", "##re") == "there")
  }

  test("likelihood scoring picks the cohesive pair over the frequent one") {
    // (x,##y) appears 3x but x is everywhere (score 3/(103*3));
    // (q,##z) appears only 2x but q and ##z appear ONLY there (score 1/2)
    val docs = (
      Seq.fill(100)("x") ++ Seq.fill(100)("y") ++
        Seq.fill(3)("xy") ++ Seq.fill(2)("qz"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val first = WordPiece.wordpieceMerges(docs, 1).collect().head
    assert((first.getString(1), first.getString(2)) == ("q", "##z"), first)
  }

  /** Independent naive reference: full recount each round, same score
    * and tie rules.
    */
  private def refMerges(
      words: Seq[(String, Long)], k: Int): Seq[(String, String)] = {
    var vocab = words.map { case (w, n) => (WordPiece.symbols(w), n) }
    val out = Seq.newBuilder[(String, String)]
    var done = false
    (1 to k).foreach { _ =>
      if (!done) {
        val pair = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        val sym = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        vocab.foreach { case (syms, n) =>
          syms.foreach(s => sym(s) += n)
          syms.zip(syms.drop(1)).foreach(p => pair(p) += n)
        }
        val elig = pair.filter(_._2 >= 2)
        if (elig.isEmpty) done = true
        else {
          val ((l, r), _) = elig.minBy { case ((a, b), n) =>
            (-(n.toDouble / (sym(a).toDouble * sym(b).toDouble)), a, b)
          }
          out += ((l, r))
          val fused = WordPiece.joined(l, r)
          vocab = vocab.map { case (syms, n) =>
            val nb = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                nb += fused; i += 2
              } else { nb += syms(i); i += 1 }
            }
            (nb.result(), n)
          }
        }
      }
    }
    out.result()
  }

  test("trainer matches the independent reference; both gate paths agree") {
    val docs = Tables.documents(spark, sfDir)
    val words = docs.where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = refMerges(words, 8)
    def ranks(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
    val local = ranks(WordPiece.wordpieceMerges(docs, 8))
    assert(local == want, s"local=$local want=$want")
    spark.conf.set("spark.graft.wordpiece.localVocabMax", "0")
    try {
      val dist = ranks(WordPiece.wordpieceMerges(docs, 8))
      assert(dist == want, s"dist=$dist want=$want")
    } finally spark.conf.unset("spark.graft.wordpiece.localVocabMax")
  }

  test("greedy encode: longest match wins, any gap voids to [UNK]") {
    val vocab = Set("t", "th", "the", "##e", "##he", "cust", "##omer", "c")
    assert(WordPiece.encodeWordGreedy("the", vocab) == Seq("the"))
    assert(WordPiece.encodeWordGreedy("customer", vocab) == Seq("cust", "##omer"))
    // 'thee': "the" + "##e"
    assert(WordPiece.encodeWordGreedy("thee", vocab) == Seq("the", "##e"))
    // missing continuation anywhere -> whole word [UNK]
    assert(WordPiece.encodeWordGreedy("cut", vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.encodeWordGreedy("x", vocab) == Seq(WordPiece.Unk))
  }

  test("fixed-vocab corpus face emits ordered pieces with dense ids") {
    val docs = Seq((1L, "the customer row"), (2L, "the the")).toDF("doc_id", "text")
    val vocab = Seq("t", "the", "c", "cust", "##omer", "r")
    val rows = WordPiece.encodeCorpusWithVocab(docs, vocab).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    // doc 1: the -> [the]; customer -> [cust, ##omer]; row -> [UNK] (no ##o)
    assert(byDoc(1L).map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq ==
      Seq((0, 0, "the"), (1, 0, "cust"), (1, 1, "##omer"), (2, 0, "[UNK]")))
    // "the" is the most frequent subword (3 occurrences) -> id 1
    val theId = rows.find(_.getString(3) == "the").get.getLong(4)
    assert(theId == 1L)
  }

  test("learnAndEncode reconstructs every word with zero [UNK]s") {
    val docs = Tables.documents(spark, sfDir)
    val out = WordPiece.learnAndEncode(docs, 8)
    assert(out.where(col("subword") === WordPiece.Unk).count() == 0)
    // concatenating a word's pieces (## stripped) restores the word —
    // the learned vocab contains the full corpus alphabet, so greedy
    // can always fall back to singles
    val words = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    val grouped = out.collect()
      .groupBy(r => (r.getLong(0), r.getInt(1)))
      .view.mapValues(_.sortBy(_.getInt(2))
        .map(_.getString(3).stripPrefix(WordPiece.ContPrefix)).mkString)
    grouped.foreach { case (key, joined) =>
      assert(joined == words(key), s"$key: $joined vs ${words(key)}")
    }
  }
}
