package graft

import graft.operators.Dedup

/** substringDupStats semantics the oracle can't isolate: full-dup,
  * zero-dup, partial shared-substring coverage, and the short-doc
  * omission contract.
  */
class SubstringDupSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int = 20) =
    Dedup.substringDupStats(rows.toDF("doc_id", "text"), k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap

  test("identical docs are fully covered; a unique doc is not covered at all") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "completely unrelated content with no overlap whatsoever here"
    val got = run(Seq(1L -> a, 2L -> a, 3L -> b))
    assert(got(1L)._3 == 1.0 && got(2L)._3 == 1.0)
    assert(got(3L) == ((b.length - 19L, 0L, 0.0)))
  }

  test("a shared substring of length >= k yields >= len-k+1 shared k-grams") {
    val shared = "this exact sentence appears verbatim in both documents"
    val a = s"prefix alpha alpha one $shared suffix beta beta"
    val b = s"totally different start x $shared and another ending"
    val got = run(Seq(1L -> a, 2L -> b))
    val minShared = shared.length - 20 + 1
    assert(got(1L)._2 >= minShared && got(2L)._2 >= minShared)
    assert(got(1L)._3 < 1.0 && got(2L)._3 < 1.0)
  }

  test("docs shorter than k characters are omitted") {
    val got = run(Seq(1L -> "tiny", 2L -> "a document long enough to have twenty-grams"))
    assert(!got.contains(1L) && got.contains(2L))
  }
}
