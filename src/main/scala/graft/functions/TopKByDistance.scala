package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
  * Output: array<struct<vec_id long, distance double>> ascending by
  * (distance, vec_id) — deterministic, so downstream explode keeps the
  * oracle contract.
  */
case class TopKByDistance(
    distance: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  // max-heap: head is the WORST kept pair (largest distance, then largest id)
  private val heapOrd: Ordering[(Double, Long)] = Ordering.Tuple2[Double, Long]

  override def children: Seq[Expression] = Seq(distance, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("distance", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](heapOrd)

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)], d: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((d, i))
    else if (heapOrd.lt((d, i), buf.head)) { buf.dequeue(); buf.enqueue((d, i)) }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow)
    : mutable.PriorityQueue[(Double, Long)] = {
    val d = distance.eval(input)
    val i = id.eval(input)
    if (d != null && i != null)
      insert(buf, d.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(
      b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)])
    : mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (d, i) => insert(b1, d, i) }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(heapOrd)
    new GenericArrayData(sorted.map { case (d, i) =>
      InternalRow(i, d)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (d, i) => bb.putDouble(d); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
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
