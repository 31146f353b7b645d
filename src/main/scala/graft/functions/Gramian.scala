package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense second-moment aggregate over a vector column: ONE pass
  * accumulates Σ vᵢvⱼ (upper triangle), Σ vᵢ, and n — everything the
  * covariance matrix X wants (cov = Σvᵢvⱼ/n − μᵢμⱼ) — into a bounded
  * dim(dim+1)/2 + dim + 1 buffer.
  *
  * This is THE scale shape for distributed PCA/whitening: per-partition
  * dense accumulation, merge = elementwise add, and the shuffle carries
  * one ~dim²/2-double buffer per partition instead of n·dim² exploded
  * (i, j, product) rows through a groupBy. At dim=64 the buffer is
  * 17 KB; at dim=1024, 4 MB — still per-partition, corpus-size-
  * independent, the mergeable-sketch argument applied to linear algebra.
  *
  * Output layout: array<double> of length dim(dim+1)/2 + dim + 1 —
  * upper triangle row-major (i ≤ j), then the dim sums, then n as a
  * double. Rows shorter than dim are zero-padded; longer ones ignore
  * the tail (the ArrayMatVec convention).
  *
  * Float caveat, stated: summation order depends on partitioning, so
  * raw entries can differ in the last ulps across partition counts —
  * consumers round to 6 decimals (the repo-wide surface discipline),
  * far above the ~1e−13 drift at any realistic per-partition count.
  */
case class GramianAggregate(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  require(dim >= 1, s"dim must be >= 1 (got $dim)")

  private val triLen = dim * (dim + 1) / 2
  private val bufLen = triLen + dim + 1

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val xs = v.asInstanceOf[ArrayData]
      val n = math.min(xs.numElements(), dim)
      var idx = 0
      var i = 0
      while (i < dim) {
        val xi = if (i < n) xs.getDouble(i) else 0.0
        var j = i
        while (j < dim) {
          if (xi != 0.0 && j < n) buf(idx) += xi * xs.getDouble(j)
          idx += 1
          j += 1
        }
        buf(triLen + i) += xi
        i += 1
      }
      buf(bufLen - 1) += 1.0
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(v => v: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramianAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramianAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramianAggregate =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_gramian"
}
