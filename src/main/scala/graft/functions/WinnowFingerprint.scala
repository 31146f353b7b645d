package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint set of a text column in one imperative pass —
  * the compiled form of the MOSS scheme (rolling k-gram hash → w-window
  * minima → distinct, sorted).
  *
  * Replaces the nested `transform(..., aggregate(...))` HOF chain, which
  * is interpreted per element (≈ len·k lambda invocations per row — the
  * same per-element interpretation cost WordShingles exists to avoid).
  * This runs once per ROW: one code-point pass for the hashes, one
  * monotonic-deque pass for the window minima (O(len), not O(len·w)),
  * one sort+dedup for the set.
  *
  * Value semantics are BIT-IDENTICAL to the HOF form and the DuckDB
  * oracle SQL: hash of k-gram starting at code point i is
  * fold(acc = 0; acc ← (acc·257 + codepoint) mod 1e9+7) — positions and
  * characters count CODE POINTS, matching Spark's `substring`/`ascii`
  * and DuckDB's `substr`/`ascii` on the same text. Documents shorter
  * than k code points yield null (callers filter on length ≥ k).
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  private val M = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val nHash = cps.length - k + 1
    if (nHash <= 0) return null
    // k-gram polynomial hashes
    val hs = new Array[Long](nHash)
    var i = 0
    while (i < nHash) {
      var acc = 0L
      var j = 0
      while (j < k) {
        acc = (acc * 257L + cps(i + j)) % M
        j += 1
      }
      hs(i) = acc
      i += 1
    }
    // window minima via monotonic deque (indices of increasing hash)
    val nWin = math.max(nHash - w + 1, 1)
    val winSpan = math.min(w, nHash)
    val mins = new Array[Long](nWin)
    val deque = new Array[Int](nHash)
    var head = 0
    var tail = 0 // deque occupies [head, tail)
    i = 0
    while (i < nHash) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - winSpan) head += 1
      if (i >= winSpan - 1) mins(i - winSpan + 1) = hs(deque(head))
      i += 1
    }
    // distinct + ascending sort (array_sort(array_distinct(...)) parity)
    java.util.Arrays.sort(mins)
    var outLen = 0
    i = 0
    while (i < nWin) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(outLen) = mins(i); outLen += 1 }
      i += 1
    }
    val out = new Array[Any](outLen)
    i = 0
    while (i < outLen) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowFingerprint =
    copy(child = c)
}
