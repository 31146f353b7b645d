package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (distance, id) pairs with the
  * smallest distance (ties by id) per group, as a size-k max-heap.
  *
  * This is the scale-correct per-query kNN reducer: with
  * `groupBy(query_id).agg(topk(...))` the PARTIAL aggregation runs
  * map-side, so the shuffle carries at most `k × partitions` rows per
  * query instead of the full `corpus × queries` pair frame a ranking
  * window would move. Same bounded-heap idea the reference uses inside
  * its beam search (reference core/hnsw/graph.py:96-124, the size-ef
  * result heap), lifted to a distributed aggregate.
  *
  * The buffer is a pair of PRIMITIVE arrays (distances, ids) managed as
  * a manual binary max-heap: the original
  * `mutable.PriorityQueue[(Double, Long)]` boxed a tuple per INPUT row
  * (the candidate stream is corpus×probe sized — 16M rows per
  * fixture-scale graph build) just to compare against the heap head.
  * Ordering is java.lang.Double.compare then id — identical to the old
  * `Ordering.Tuple2[Double, Long]` (scala 2.13 TotalOrdering delegates
  * to Double.compare), so kept sets, tie-breaks and the ascending
  * output order are bit-identical.
  *
  * Output: array<struct<vec_id long, distance double>> ascending by
  * (distance, vec_id) — deterministic, so downstream explode keeps the
  * oracle contract.
  */
object TopKByDistance {
  /** Size-k max-heap over (distance, id) with lexicographic order:
    * root = the WORST kept pair. Plain arrays, no per-row allocation.
    */
  final class Buf(val k: Int) {
    val ds = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    // (d1,i1) < (d2,i2) lexicographically?
    @inline private def lt(d1: Double, i1: Long, d2: Double, i2: Long): Boolean = {
      val c = java.lang.Double.compare(d1, d2)
      c < 0 || (c == 0 && i1 < i2)
    }

    def insert(d: Double, i: Long): Unit = {
      if (size < k) {
        // push + sift up
        var j = size
        ds(j) = d; ids(j) = i
        size += 1
        while (j > 0) {
          val p = (j - 1) >> 1
          if (lt(ds(p), ids(p), ds(j), ids(j))) {
            val td = ds(p); ds(p) = ds(j); ds(j) = td
            val ti = ids(p); ids(p) = ids(j); ids(j) = ti
            j = p
          } else j = 0
        }
      } else if (lt(d, i, ds(0), ids(0))) {
        // replace root + sift down
        ds(0) = d; ids(0) = i
        var j = 0
        var done = false
        while (!done) {
          val l = 2 * j + 1
          val r = l + 1
          var m = j
          if (l < size && lt(ds(m), ids(m), ds(l), ids(l))) m = l
          if (r < size && lt(ds(m), ids(m), ds(r), ids(r))) m = r
          if (m == j) done = true
          else {
            val td = ds(m); ds(m) = ds(j); ds(j) = td
            val ti = ids(m); ids(m) = ids(j); ids(j) = ti
            j = m
          }
        }
      }
    }
  }
}

case class TopKByDistance(
    distance: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByDistance.Buf] {

  override def children: Seq[Expression] = Seq(distance, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("distance", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKByDistance.Buf =
    new TopKByDistance.Buf(k)

  override def update(
      buf: TopKByDistance.Buf, input: InternalRow): TopKByDistance.Buf = {
    val d = distance.eval(input)
    val i = id.eval(input)
    if (d != null && i != null)
      buf.insert(d.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: TopKByDistance.Buf, b2: TopKByDistance.Buf): TopKByDistance.Buf = {
    var j = 0
    while (j < b2.size) { b1.insert(b2.ds(j), b2.ids(j)); j += 1 }
    b1
  }

  override def eval(buf: TopKByDistance.Buf): Any = {
    // ascending (distance, vec_id) — the documented output order
    val idx = (0 until buf.size).sortBy(j => (buf.ds(j), buf.ids(j)))
    new GenericArrayData(idx.map { j =>
      InternalRow(buf.ids(j), buf.ds(j))
    }.toArray[Any])
  }

  override def serialize(buf: TopKByDistance.Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putDouble(buf.ds(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByDistance.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.insert(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByDistance =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByDistance =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByDistance =
    copy(distance = newChildren(0), id = newChildren(1))
  override def prettyName: String = "graft_topk"
}
