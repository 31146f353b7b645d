package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

/** Vector distance metrics as composable Column functions.
  *
  * Semantics mirror the reference's four metrics exactly
  * (reference: core/hnsw/graph.py:24-43):
  *   - euclidean: L2 norm of the difference               (graph.py:24-26)
  *   - cosine: 1 − a·b/(‖a‖‖b‖), **1.0 when either norm is 0** (graph.py:28-35)
  *   - manhattan: L1                                       (graph.py:37-39)
  *   - dot: **negated** dot product so smaller = closer    (graph.py:41-43)
  *
  * Everything is built from `zip_with`/`aggregate` — native Catalyst
  * higher-order functions that stay inside whole-stage codegen. No UDFs.
  * Summation is sequential over the array (same order DuckDB's `list_sum`
  * uses), and query outputs round distances to 6 decimals, so the DuckDB
  * oracle hash-matches despite engine-level fp differences.
  */
object VectorFunctions {

  private def binExpr(
      a: Column, b: Column,
      f: (org.apache.spark.sql.catalyst.expressions.Expression,
          org.apache.spark.sql.catalyst.expressions.Expression) =>
        org.apache.spark.sql.catalyst.expressions.Expression): Column =
    Bridge.column(
      f(Bridge.expression(a.cast("array<double>")),
        Bridge.expression(b.cast("array<double>"))))

  /** a·b — native codegen'd loop (ArrayMath.scala); same sequential sum
    * order as the zip_with/aggregate form and DuckDB's list_sum, so values
    * are bit-identical to the oracle.
    */
  def dot(a: Column, b: Column): Column = binExpr(a, b, ArrayDotProduct.apply)

  /** ‖a‖₂ */
  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** L2 distance (reference graph.py:24-26). */
  def euclidean(a: Column, b: Column): Column =
    sqrt(binExpr(a, b, ArraySumSquaredDiff.apply))

  /** L1 distance (reference graph.py:37-39). */
  def manhattan(a: Column, b: Column): Column =
    binExpr(a, b, ArraySumAbsDiff.apply)

  /** Negated dot product — smaller = closer, matching the reference's
    * ordering convention (reference graph.py:41-43).
    */
  def negDot(a: Column, b: Column): Column = -dot(a, b)

  /** Cosine distance with the reference's zero-vector guard: if either
    * norm is 0 the distance is exactly 1.0 (reference graph.py:33-34).
    */
  def cosine(a: Column, b: Column): Column = {
    val prod = norm2(a) * norm2(b)
    when(prod === lit(0.0), lit(1.0)).otherwise(lit(1.0) - dot(a, b) / prod)
  }

  /** Hash-stable distance output: round to 6 decimals and normalize -0.0 to
    * +0.0 (adding 0.0 is the IEEE-754 identity except on negative zero).
    * Spark's round (BigDecimal, HALF_UP) yields +0.0 where DuckDB's C round
    * can yield -0.0 — without this the oracle hash can diverge at exactly 0.
    */
  def roundDist(c: Column): Column = round(c, 6) + lit(0.0)

  /** Bounded top-k aggregate column (smallest distance, ties by id) —
    * see TopKByDistance for the scale rationale.
    */
  def topK(distance: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByDistance(
        Bridge.expression(distance), Bridge.expression(id), k)
        .toAggregateExpression())

  /** Bounded k-minimum-DISTINCT-values aggregate (KMinValues) — the
    * dedup-aware sibling of [[topK]] backing the KMV distinct sketch.
    */
  def kMinValues(value: Column, k: Int): Column =
    Bridge.column(
      KMinValues(Bridge.expression(value), k).toAggregateExpression())

  /** Distinct word-n-gram shingles (WordShingles expression). */
  def wordShingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  /** All overlapping word n-grams of a token array, multiplicity kept
    * (WordNgrams expression — the non-distinct shingle sibling).
    */
  def wordNgrams(toks: Column, n: Int): Column =
    Bridge.column(WordNgrams(Bridge.expression(toks), n))

  /** One-pass MinHash signature over a shingle array (MinHashSignature). */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingleSet), numHashes))

  /** Morton (Z-order) code of two LONG keys — multi-dimensional
    * clustering key for layout writes (InterleaveBits, codegen'd).
    */
  def zorder(a: Column, b: Column): Column =
    Bridge.column(InterleaveBits(
      Bridge.expression(a.cast("long")), Bridge.expression(b.cast("long"))))

  /** Metric lookup by name — the reference selects metrics by string name
    * too (reference core/hnsw/graph.py:65 `getattr(DistanceMetric, name)`).
    */
  def byName(name: String): (Column, Column) => Column = name match {
    case "euclidean"   => euclidean
    case "cosine"      => cosine
    case "manhattan"   => manhattan
    case "dot_product" => negDot
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  /** Dimension-validity predicate (reference api/rest/server.py:142-146
    * rejects mismatched dimensions with HTTP 400; here it's a filter).
    */
  def hasDim(v: Column, dim: Int): Column = size(v) === dim

  /** L2-normalized copy of the vector (zero vector passes through
    * unchanged rather than dividing by zero). Native one-pass expression —
    * the `transform` lambda form re-evaluates the norm per element (no
    * subexpression elimination inside HOF lambdas), i.e. O(dim²) per row.
    */
  def l2Normalize(a: Column): Column =
    Bridge.column(ArrayL2Normalize(Bridge.expression(a.cast("array<double>"))))
}
