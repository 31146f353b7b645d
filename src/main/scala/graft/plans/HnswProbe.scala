package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.index.{HnswIndex, HnswSpark}

/** The HNSW probe as a FIRST-CLASS operator — the escalation path (c) of
  * SURVEY §4.2: a custom LogicalPlan + SparkStrategy + SparkPlan,
  * registered through SparkSessionExtensions, instead of a flatMap over a
  * typed Dataset (HnswSpark.searchDf).
  *
  * Semantics: for each input row, read the `qv` column (ARRAY<DOUBLE>),
  * probe every broadcast sub-index, emit the merged top-k as k rows of
  * (child columns..., vec_id, distance) — distances rounded exactly like
  * the exact operators (HnswSpark.roundDist6). Being a real operator (not
  * a lambda) keeps the probe visible to Catalyst: column pruning and
  * filters above it compose, EXPLAIN shows `HnswProbe k=...`, and the
  * node reports maxRows = child.maxRows * k for the optimizer.
  */
case class HnswProbePlan(
    child: LogicalPlan,
    index: Broadcast[Array[HnswIndex]],
    k: Int,
    ef: Option[Int],
    // constructor parameters (not body vals) so plan transformations via
    // copy() preserve the output exprIds — regenerating them would orphan
    // references already bound above this node
    vecIdAttr: AttributeReference =
      AttributeReference("vec_id", LongType, nullable = false)(),
    distanceAttr: AttributeReference =
      AttributeReference("distance", DoubleType, nullable = false)())
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ vecIdAttr :+ distanceAttr
  override def maxRows: Option[Long] = child.maxRows.map(_ * k)
  // every child column is semantically consumed (qv probes; the rest pass
  // through as this node's output) — without this, column pruning strips
  // qv from the child whenever the caller projects it away above
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(child.output)
  override protected def withNewChildInternal(c: LogicalPlan): HnswProbePlan =
    copy(child = c)
}

/** Physical operator: narrow (no shuffle, no sort) — each partition probes
  * the broadcast shards for its own rows. Parallelism = child partitions.
  */
case class HnswProbeExec(
    child: SparkPlan,
    index: Broadcast[Array[HnswIndex]],
    k: Int,
    ef: Option[Int],
    qvOrdinal: Int,
    output: Seq[Attribute]) extends UnaryExecNode {

  override def nodeName: String = s"HnswProbe k=$k shards=${index.value.length}"

  override protected def doExecute(): RDD[InternalRow] = {
    val bc = index
    val kk = k
    val efv = ef
    val ord = qvOrdinal
    val outAttrs = output
    child.execute().mapPartitions { rows =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      rows.flatMap { row =>
        if (row.isNullAt(ord)) Iterator.empty // null qv: no matches, no NPE
        else {
        val qv = row.getArray(ord).toDoubleArray()
        HnswSpark.searchAll(bc.value.toSeq, qv, kk, efv).iterator
          .map { case (id, d) =>
            val right = new GenericInternalRow(2)
            right.setLong(0, id)
            right.setDouble(1, HnswSpark.roundDist6(d))
            proj(joined(row, right)).copy(): InternalRow
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(c: SparkPlan): HnswProbeExec =
    copy(child = c)
}

/** DataFrame-facing constructor for the probe operator. */
object HnswProbe {
  /** queries must carry a `qv` ARRAY<DOUBLE> column; all query columns
    * pass through, plus (vec_id, distance) per result. Requires
    * HnswProbeStrategy to be registered (GraftExtensions / install).
    */
  def apply(
      queries: org.apache.spark.sql.DataFrame,
      index: Broadcast[Array[HnswIndex]],
      k: Int,
      ef: Option[Int] = None): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.graftbridge.Bridge.ofRows(
      queries.sparkSession,
      HnswProbePlan(queries.queryExecution.analyzed, index, k, ef))
}

/** Plans HnswProbePlan into HnswProbeExec, resolving the `qv` ordinal. */
object HnswProbeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: HnswProbePlan =>
      val ord = p.child.output.indexWhere(a => a.name == "qv" &&
        (a.dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }))
      require(ord >= 0,
        s"HnswProbe child must provide qv ARRAY<DOUBLE>; got ${p.child.output}")
      HnswProbeExec(planLater(p.child), p.index, p.k, p.ef, ord, p.output) :: Nil
    case _ => Nil
  }
}
