package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** piiScrub boundary behavior — the cases where an unguarded pattern
  * silently diverges: over-long dotted quads, phone shapes embedded in
  * longer digit runs, and version strings.
  */
class TextAnalysisSpec extends SparkSpec {

  private def scrubOne(text: String): (String, Long, Long, Long) = {
    import spark.implicits._
    val r = TextAnalysis.piiScrub(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("piiScrub redacts email, IP, and phone with typed placeholders") {
    val (t, e, i, p) = scrubOne(
      "mail a.user+tag@sub.example.org from 192.168.0.1 call 555-123-4567 ok")
    assert(t == "mail <EMAIL> from <IP> call <PHONE> ok")
    assert((e, i, p) == (1L, 1L, 1L))
  }

  test("piiScrub leaves an over-long dotted quad intact (no partial <IP>)") {
    // unguarded, this redacted the first 9 chars to '<IP>0'
    val (t, _, i, _) = scrubOne("build 1.2.3.4000 done")
    assert(t == "build 1.2.3.4000 done")
    assert(i == 0L)
  }

  test("piiScrub leaves phone shapes embedded in longer digit runs intact") {
    val (t1, _, _, p1) = scrubOne("serial 9555-123-45678 end")
    assert(t1 == "serial 9555-123-45678 end")
    assert(p1 == 0L)
    val (t2, _, _, p2) = scrubOne("serial 555-123-45678 end")
    assert(t2 == "serial 555-123-45678 end")
    assert(p2 == 0L)
  }

  test("piiScrub does not treat a version-prefixed quad as an IP") {
    val (t, _, i, _) = scrubOne("release v1.2.3.4 shipped")
    assert(t == "release v1.2.3.4 shipped")
    assert(i == 0L)
  }

  test("piiScrub handles punctuation-adjacent PII (boundary still matches)") {
    val (t, e, i, p) = scrubOne(
      "(10.0.0.7), phone: 555-123-4567. email: x@y.io.")
    // the email pattern's trailing [A-Za-z]{2,} stops before the final '.'
    assert(t == "(<IP>), phone: <PHONE>. email: <EMAIL>.")
    assert((e, i, p) == (1L, 1L, 1L))
  }

  test("piiScrub dotted-separator phones redact as phone, not IP") {
    val (t, _, i, p) = scrubOne("call 555.123.4567 now")
    assert(t == "call <PHONE> now")
    assert((i, p) == (0L, 1L))
  }

  test("winnowing: identical text yields identical fingerprints, and a " +
    "shared substring of length >= k + w - 1 yields a shared fingerprint") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over" // 30 chars >> k + w - 1 = 11
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"prefix one $shared suffix alpha"), // identical to 1
      (3L, s"completely different head $shared and another tail"),
      (4L, "nothing in common with the others zzz qqq xxx yyy www vvv")
    ).toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(docs, k = 8, w = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps(1L) == fps(2L)) // deterministic per content
    // the MOSS guarantee: docs 1 and 3 share the 30-char substring
    assert((fps(1L) & fps(3L)).nonEmpty)
    // sanity: unrelated docs share (almost surely) nothing
    assert((fps(1L) & fps(4L)).isEmpty)
    // fingerprints are sorted distinct minima
    val arr = TextAnalysis.winnowFingerprints(docs, 8, 4)
      .where(col("doc_id") === 1).head().getSeq[Long](1)
    assert(arr == arr.sorted && arr.distinct.length == arr.length)
  }

  test("winnowing: compiled expression matches a naive reference on random text") {
    import spark.implicits._
    // differential guard for the hand-written monotonic deque: compare
    // against a direct O(n·w) reference over random corpora and several
    // (k, w), including w > number of hashes
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefg h"
    val texts = (0 until 60).map { i =>
      val len = 1 + rnd.nextInt(120)
      (i.toLong, (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    def reference(text: String, k: Int, w: Int): Option[Seq[Long]] = {
      val M = 1000000007L
      val cps = text.codePoints().toArray
      val nH = cps.length - k + 1
      if (nH <= 0) None
      else {
        val hs = (0 until nH).map { i =>
          (0 until k).foldLeft(0L)((acc, j) => (acc * 257L + cps(i + j)) % M)
        }
        val span = math.min(w, nH)
        val mins = (0 until math.max(nH - w + 1, 1)).map(i => hs.slice(i, i + span).min)
        Some(mins.distinct.sorted)
      }
    }
    for ((k, w) <- Seq((8, 4), (12, 6), (3, 200), (5, 1))) {
      val got = TextAnalysis.winnowFingerprints(texts.toDF("doc_id", "text"), k, w)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      val want = texts.flatMap { case (id, t) => reference(t, k, w).map(id -> _) }.toMap
      assert(got == want, s"mismatch at k=$k w=$w")
    }
  }

  test("winnowing omits documents shorter than k characters") {
    import spark.implicits._
    val docs = Seq((1L, "tiny"), (2L, "long enough document text")).toDF("doc_id", "text")
    val ids = TextAnalysis.winnowFingerprints(docs, k = 8, w = 4)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L))
  }

  test("bigramSurprisal matches a hand computation") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    // corpus bigrams: "a b" x2, "a c" x1; C("a" as head) = 3
    // doc 1/2: -ln(2/3) = 0.405465; doc 3: -ln(1/3) = 1.098612
    val got = TextAnalysis.bigramSurprisal(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 1L, 0.405465), (2L, 1L, 0.405465), (3L, 1L, 1.098612)))
  }

  test("piiScrub counts are computed on the original text") {
    // a phone inside an email's local part: scrub redacts the whole email
    // first, but the count pass sees the original text, so n_phones = 1
    val (t, e, _, p) = scrubOne("reach 555-123-4567@corp.example.com today")
    assert(t == "reach <EMAIL> today")
    assert((e, p) == (1L, 1L))
  }

  test("vocabTable assigns dense frequency-ranked ids") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b a a"), (2L, "a c b")).toDF("doc_id", "text")
    // counts: a=3, b=2, c=1 → ids 1, 2, 3
    val got = TextAnalysis.vocabTable(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    graft.CacheTracker.releaseAll()
    assert(got == Seq(("a", 1L, 3L), ("b", 2L, 2L), ("c", 3L, 1L)))
    // fixture: ids are a 1..V bijection and counts are non-increasing
    val fix = TextAnalysis.vocabTable(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    graft.CacheTracker.releaseAll()
    assert(fix.map(_._1).sorted.toSeq == (1L to fix.length).toSeq)
    assert(fix.sortBy(_._1).map(_._2).toSeq.sliding(2).forall {
      case Seq(x, y) => x >= y; case _ => true
    })
  }

  test("tokenizeCorpus: dense ids above the cut, OOV 0 below, decode round-trips") {
    import spark.implicits._
    val docs = Seq(
      (1L, "b a a rare1"), (2L, "a c b rare2"), (3L, "c a b")).toDF("doc_id", "text")
    // counts: a=4, b=3, c=2, rare1=1, rare2=1; minCount=2 keeps a,b,c
    val enc = TextAnalysis.tokenizeCorpus(docs, minCount = 2L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    graft.CacheTracker.releaseAll()
    assert(enc == Seq(
      (1L, 0, 2L), (1L, 1, 1L), (1L, 2, 1L), (1L, 3, 0L),
      (2L, 0, 1L), (2L, 1, 3L), (2L, 2, 2L), (2L, 3, 0L),
      (3L, 0, 3L), (3L, 1, 1L), (3L, 2, 2L)))
    // surviving ids are a dense 1..V' prefix even with the cut
    val ids = enc.map(_._3).filter(_ > 0).distinct.sorted
    assert(ids == (1L to ids.length))
    // decode: joining non-OOV ids back through the cut vocab reproduces
    // the original tokens position for position
    val vocab = TextAnalysis.vocabTable(docs).where(col("n") >= 2)
      .collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    graft.CacheTracker.releaseAll()
    val decoded = enc.filter(_._3 > 0)
      .map { case (d, p, id) => (d, p, vocab(id)) }
    val original = Seq(
      (1L, "b a a rare1"), (2L, "a c b rare2"), (3L, "c a b"))
      .flatMap { case (d, t) =>
        t.split(" ").zipWithIndex.map { case (tok, p) => (d, p, tok) } }
      .filter { case (_, _, tok) => !tok.startsWith("rare") }
    assert(decoded == original)
  }

  test("chunking equals the exact slice formula across random (width, stride, n)") {
    import spark.implicits._
    val rng = new scala.util.Random(7L)
    for (trial <- 1 to 30) {
      // half the trials draw the sampled-window regime stride > width
      val width = 1 + rng.nextInt(20)
      val stride =
        if (trial % 2 == 0) 1 + rng.nextInt(width) // coverage regime
        else 1 + rng.nextInt(30)                   // any, incl. > width
      val n = 1 + rng.nextInt(100)
      val toks = (1 to n).map(i => s"t$i")
      val docs = Seq((1L, toks.mkString(" "))).toDF("doc_id", "text")
      val got = TextAnalysis.chunkDocuments(docs, width, stride)
        .collect().sortBy(_.getLong(1))
        .map(r => (r.getLong(1), r.getString(3)))
      val nChunks = math.min(
        (math.max(n - width, 0) + stride - 1) / stride, (n - 1) / stride) + 1
      assert(got.length == nChunks, s"w=$width s=$stride n=$n")
      got.foreach { case (i, chunk) =>
        val expected = toks.slice((i * stride).toInt,
          math.min(i * stride + width, n).toInt).mkString(" ")
        assert(chunk == expected, s"w=$width s=$stride n=$n chunk=$i")
        assert(chunk.nonEmpty, s"empty chunk at w=$width s=$stride n=$n i=$i")
      }
      // full coverage holds exactly in the stride <= width regime
      if (stride <= width)
        assert(got.flatMap(_._2.split(" ")).toSet == toks.toSet)
    }
  }

  test("chunkDocuments: stride <= width covers every token with the right overlap") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 40).map(i => s"t$i").mkString(" ")), // 40 tokens
      (2L, "one two three"),                           // shorter than width
      (3L, (1 to 16).map(i => s"u$i").mkString(" "))   // exactly one window
    ).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(docs, width = 16, stride = 12)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = chunks.groupBy(_._1)
    // nChunks = ceil(max(n-16,0)/12)+1: 40 -> 3, 3 -> 1, 16 -> 1
    assert(byDoc(1L).length == 3 && byDoc(2L).length == 1 && byDoc(3L).length == 1)
    // doc 2's single chunk is the whole (short) doc
    assert(byDoc(2L).head._4 == "one two three" && byDoc(2L).head._3 == 3L)
    // coverage: every token of doc 1 appears in some chunk
    val covered = byDoc(1L).flatMap(_._4.split(" ")).toSet
    assert(covered == (1 to 40).map(i => s"t$i").toSet)
    // overlap: consecutive chunks share exactly width - stride = 4 tokens
    val sorted = byDoc(1L).sortBy(_._2).map(_._4.split(" ").toSeq).toSeq
    sorted.sliding(2).foreach { case Seq(a, b) =>
      assert(a.takeRight(4) == b.take(4))
    }
    // the final chunk reaches the final token
    assert(sorted.last.last == "t40")
  }

  test("langConfusion cells sum to the corpus and match langId's argmax") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog", "en"),
      (2L, "le chat et le chien dans la maison", "fr"),
      (3L, "el perro y el gato en la casa", "es"),
      (4L, "mismatched label but english the a of", "de"))
      .toDF("doc_id", "text", "lang")
    val conf = graft.operators.TextAnalysis.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf.values.sum == 4L)
    // independent recomputation per doc via langId
    val preds = graft.operators.TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    val langs = Map(1L -> "en", 2L -> "fr", 3L -> "es", 4L -> "de")
    val want = langs.toSeq.map { case (id, l) => (l, preds(id)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(conf == want)
    // the planted mislabel shows up off-diagonal
    assert(conf.contains(("de", preds(4L))) && preds(4L) == "en")
  }
}
