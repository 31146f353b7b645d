package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingles of a text column in one imperative pass.
  *
  * Replaces the `transform(sequence(...), i -> concat_ws(slice(...)))` +
  * `array_distinct` HOF chain, which is interpreted per element and was
  * measured at 3.3 s just to shingle 5 000 docs at sf0.1. This expression
  * runs once per ROW (CodegenFallback is fine at that granularity) and
  * allocates one builder per document instead of one array per gram.
  *
  * Semantics match the HOF form exactly (and the DuckDB oracle SQL):
  * tokens are split on a single space; gram i = tokens[i .. i+n-1] joined
  * by one space; documents with fewer than n tokens yield the whole text
  * as their single shingle; distinct keeps first-occurrence order.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    val toks = text.split(" ", -1)
    val grams = math.max(toks.length - (n - 1), 1)
    val seen = mutable.LinkedHashSet.empty[String]
    var i = 0
    while (i < grams) {
      val end = math.min(i + n, toks.length)
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen += sb.toString
      i += 1
    }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** All overlapping word n-grams of a TOKEN ARRAY column, multiplicity
  * and order preserved — the non-distinct sibling of [[WordShingles]]
  * for the bag-of-ngrams paths (DSIR features, repetition stats, bigram
  * surprisal). Replaces the `transform(sequence(...), i ->
  * concat_ws(" ", element_at(...)))` HOF chain, which evaluates
  * interpreted per gram with per-element boxing. Gram i =
  * tokens[i .. i+n-1] joined by one space — byte-identical to the HOF
  * form (UTF8String concat ≡ string concat; token elements are
  * non-null by the split contract). Callers keep the `size < n` guard
  * outside (the HOF form returned an EMPTY array for short or null
  * inputs; this expression is only evaluated on the ≥ n branch).
  */
case class WordNgrams(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      val g = new Array[UTF8String](n)
      var j = 0
      while (j < n) { g(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, g: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WordNgrams = copy(child = c)
}
