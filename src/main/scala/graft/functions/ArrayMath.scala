package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-math hot path.
  *
  * The `zip_with`/`aggregate` higher-order forms are semantically identical
  * but run interpreted (HOFs don't participate in whole-stage codegen) —
  * measured at ~80 s on the 4M-pair near-dup join at sf0.1. These
  * expressions generate a tight scalar loop inside whole-stage codegen
  * (SURVEY §4.2's "custom Expression only as measured-bottleneck
  * escalation" — this is that escalation).
  *
  * Summation is sequential ascending-index, the same order as the HOF
  * forms and DuckDB's `list_sum`, so results are bit-identical and the
  * oracle hash contract is unaffected.
  */
abstract class ArrayPairFold extends BinaryExpression {
  // inputs are guaranteed ARRAY<DOUBLE> by the callers in VectorFunctions
  // (defensive .cast there); ExpectsInputTypes is private[sql] in Spark 4
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Java source for one loop step: accumulate into `s` from `$x`,`$y`. */
  protected def stepCode(x: String, y: String): String
  protected def step(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += step(xs.getDouble(i), ys.getDouble(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${stepCode(s"$a.getDouble($i)", s"$b.getDouble($i)")
            .replace("ACC", s).trim}
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ (reference graph.py:41-43 without the negation). */
case class ArrayDotProduct(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "graft_dot"
  protected def stepCode(x: String, y: String): String = s"ACC += $x * $y;"
  protected def step(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Σ (aᵢ−bᵢ)² — euclidean is sqrt of this (reference graph.py:24-26). */
case class ArraySumSquaredDiff(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "graft_sqdiff"
  protected def stepCode(x: String, y: String): String =
    s"double d = $x - $y; ACC += d * d;"
  protected def step(x: Double, y: Double): Double = { val d = x - y; d * d }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Σ |aᵢ−bᵢ| — manhattan (reference graph.py:37-39). */
case class ArraySumAbsDiff(left: Expression, right: Expression) extends ArrayPairFold {
  override def prettyName: String = "graft_absdiff"
  protected def stepCode(x: String, y: String): String =
    s"ACC += java.lang.Math.abs($x - $y);"
  protected def step(x: Double, y: Double): Double = math.abs(x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** L2-normalized copy of an ARRAY<DOUBLE> in ONE pass: Σx² (sequential
  * ascending, the graft_dot order), sqrt, divide. The Column-level
  * `transform(a, x -> x / sqrt(graft_dot(a, a)))` form re-evaluates the
  * norm subexpression PER ELEMENT — higher-order-function lambdas get no
  * subexpression elimination — making normalization O(dim²) per row; this
  * is the measured-bottleneck escalation for the pre-normalize paths
  * (knnGraph, embeddingNearDup). A zero vector passes through unchanged
  * (so 1 − dot keeps the reference's zero-norm cosine semantics,
  * core/hnsw/graph.py:33-34). Values are bit-identical to the HOF form
  * and to the DuckDB oracle's list_transform twin (same sum order, same
  * sqrt, same division).
  */
case class ArrayL2Normalize(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_l2normalize"

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData].toDoubleArray()
    var s = 0.0
    var i = 0
    while (i < xs.length) { s += xs(i) * xs(i); i += 1 }
    val norm = math.sqrt(s)
    if (norm != 0.0) {
      i = 0
      while (i < xs.length) { xs(i) = xs(i) / norm; i += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xs = ctx.freshName("xs")
      val s = ctx.freshName("s")
      val norm = ctx.freshName("norm")
      val i = ctx.freshName("i")
      s"""
         |double[] $xs = $a.toDoubleArray();
         |double $s = 0.0;
         |for (int $i = 0; $i < $xs.length; $i++) { $s += $xs[$i] * $xs[$i]; }
         |double $norm = java.lang.Math.sqrt($s);
         |if ($norm != 0.0) {
         |  for (int $i = 0; $i < $xs.length; $i++) { $xs[$i] = $xs[$i] / $norm; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($xs);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Jaccard similarity |A∩B| / |A∪B| of two string arrays (already-distinct
  * shingle sets). Used to verify a SMALL candidate-pair set in one
  * expression instead of streaming the exploded shingle table through a
  * join — right only when candidates ≪ corpus (LSH verification).
  * Interpreted eval (runs once per candidate pair).
  */
case class ArrayJaccard(left: Expression, right: Expression)
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[String](xs.numElements() * 2)
    var i = 0
    while (i < xs.numElements()) { setA.add(xs.getUTF8String(i).toString); i += 1 }
    var common = 0
    val seenB = new java.util.HashSet[String](ys.numElements() * 2)
    i = 0
    while (i < ys.numElements()) {
      val s = ys.getUTF8String(i).toString
      if (seenB.add(s) && setA.contains(s)) common += 1
      i += 1
    }
    val union = setA.size + seenB.size - common
    if (union == 0) 1.0 else common.toDouble / union
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Exact |A∩B| of two SORTED-ASCENDING DISTINCT long arrays via a
  * two-pointer merge — the whole-stage-codegen replacement for
  * `size(array_intersect(a, b))` on the ppjoin verify path. The
  * built-in allocates a hash set over one side plus the materialized
  * intersection array PER CANDIDATE PAIR; this walks both arrays once
  * with zero allocation. Value-identical to the built-in under the
  * caller's contract (WinnowFingerprint output: ascending, distinct,
  * no nulls — `array_intersect` on distinct inputs returns exactly the
  * common elements, and the merge counts exactly those).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val nx = xs.numElements()
    val ny = ys.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { c += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $nx = $a.numElements();
         |final int $ny = $b.numElements();
         |int $i = 0;
         |int $j = 0;
         |${ev.value} = 0L;
         |while ($i < $nx && $j < $ny) {
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x == $y) { ${ev.value}++; $i++; $j++; }
         |  else if ($x < $y) $i++;
         |  else $j++;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** Dense matrix–vector product with a LITERAL matrix (row-major flat,
  * dOut × dIn) — the random-projection hot path. The Column-level form
  * (dOut separate `zip_with`+`aggregate` passes) runs interpreted with
  * per-element boxing: measured 74 s for 1M × (256→32) at local[32];
  * this expression is the measured-bottleneck escalation (SURVEY §4.2),
  * a tight j×i loop in whole-stage codegen over primitive doubles.
  *
  * Summation per output dim is sequential ascending over the input —
  * the same order as the HOF form and the DuckDB oracle's per-(i,j) sum
  * — so values are bit-identical and the hash contract is unaffected.
  * Input vectors shorter than dIn are zero-padded by construction (the
  * loop stops at the vector's end); longer vectors ignore the tail.
  *
  * Each output is `round((Σ − offset[j]) / divisor, roundDecimals) + 0.0`
  * (offsets default to zero — subtracting literal 0.0 is the IEEE
  * identity, so the offset-free form is unchanged), with
  * rounding via `BigDecimal.valueOf(..).setScale(.., HALF_UP)` — the
  * exact double path of Spark's own `round()` — so folding the rounding
  * into the loop (instead of a per-element `transform`, which runs
  * interpreted) changes no observable value.
  */
case class ArrayMatVec(
    child: Expression, flat: Seq[Double], dIn: Int, dOut: Int,
    divisor: Double, roundDecimals: Int,
    offsets: Seq[Double] = Nil)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(dIn >= 1 && dOut >= 1 && flat.length == dIn * dOut,
    s"matrix shape mismatch: ${flat.length} != $dIn * $dOut")
  require(divisor != 0.0, "divisor must be nonzero")
  require(offsets.isEmpty || offsets.length == dOut,
    s"offsets length ${offsets.length} != dOut $dOut")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_matvec"

  @transient private lazy val m: Array[Double] = flat.toArray
  @transient private lazy val off0: Array[Double] =
    if (offsets.isEmpty) new Array[Double](dOut) else offsets.toArray

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), dIn)
    val out = new Array[Double](dOut)
    var j = 0
    while (j < dOut) {
      val off = j * dIn
      var s = 0.0
      var i = 0
      while (i < n) { s += xs.getDouble(i) * m(off + i); i += 1 }
      out(j) = java.math.BigDecimal.valueOf((s - off0(j)) / divisor)
        .setScale(roundDecimals, java.math.RoundingMode.HALF_UP)
        .doubleValue() + 0.0
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mRef = ctx.addReferenceObj("matvec", m, "double[]")
      val oRef = ctx.addReferenceObj("matvecOff", off0, "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dIn);
         |double[] $out = new double[$dOut];
         |for (int $j = 0; $j < $dOut; $j++) {
         |  int $off = $j * $dIn;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $mRef[$off + $i];
         |  }
         |  $out[$j] = java.math.BigDecimal.valueOf(($s - $oRef[$j]) / $divisor)
         |    .setScale($roundDecimals, java.math.RoundingMode.HALF_UP)
         |    .doubleValue() + 0.0;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Integer argmin against a LITERAL centroid matrix (row-major flat
  * longs): for an ARRAY<LONG> micro vector, the index and value of the
  * nearest of the k matrix rows by integer squared euclidean, ties to
  * the smaller row index (strict `<` in ascending loop order). The
  * k-means assignment hot loop as ONE codegen'd expression — the
  * crossJoin × HOF-aggregate form blew the row stream up k× AND ran
  * interpreted with boxing (measured 172 s/iteration at 1M×64×256; the
  * ArrayMatVec escalation applied to clustering). Vectors shorter than
  * `dim` compare only their observed prefix — the same min-length
  * semantics as the zip_with form and the oracle's dim-keyed join.
  */
case class ArgminSqDistMicro(
    child: Expression, flat: Seq[Long], k: Int, dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k >= 1 && dim >= 1 && flat.length == k * dim,
    s"matrix shape mismatch: ${flat.length} != $k * $dim")

  override def dataType: DataType = StructType(Seq(
    StructField("cent_id", LongType, nullable = false),
    StructField("sqdist", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_argmin_sqdist"

  @transient private lazy val m: Array[Long] = flat.toArray

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), dim)
    var bestJ = 0L
    var bestS = Long.MaxValue
    var j = 0
    while (j < k) {
      val off = j * dim
      var s = 0L
      var i = 0
      while (i < n) {
        val d = xs.getLong(i) - m(off + i)
        s += d * d
        i += 1
      }
      if (s < bestS) { bestS = s; bestJ = j.toLong }
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestJ, bestS))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mRef = ctx.addReferenceObj("argminCents", m, "long[]")
      val n = ctx.freshName("n")
      val bestJ = ctx.freshName("bestJ")
      val bestS = ctx.freshName("bestS")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val off = ctx.freshName("off")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |long $bestJ = 0L;
         |long $bestS = java.lang.Long.MAX_VALUE;
         |for (int $j = 0; $j < $k; $j++) {
         |  int $off = $j * $dim;
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $d = $a.getLong($i) - $mRef[$off + $i];
         |    $s += $d * $d;
         |  }
         |  if ($s < $bestS) { $bestS = $s; $bestJ = (long) $j; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions
         |  .GenericInternalRow(new Object[]{$bestJ, $bestS});
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
