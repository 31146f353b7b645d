package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) code: interleave the low 32 bits of two LONG keys —
  * bit i of `left` lands at output bit 2i, bit i of `right` at 2i+1.
  * Ordering data by this code clusters it along BOTH dimensions at once,
  * so min/max file statistics become selective for predicates on either
  * key — the standard multi-dimensional clustering trick for 100 TB
  * lakehouse layouts (see Storage-style range-partitioned writes).
  *
  * Codegen'd (magic-number bit spreading, branch-free, no loop) so it
  * sits inside whole-stage codegen in the write path. Deterministic pure
  * bit arithmetic — reproducible in DuckDB SQL, hence oracle-checkable.
  */
case class InterleaveBits(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.morton(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.InterleaveBits.morton($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): InterleaveBits = copy(left = l, right = r)
}

object InterleaveBits {
  /** Spread the low 32 bits of v to even bit positions (0,2,4,…,62). */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code of (a, b): a's bits even, b's bits odd. */
  def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}
