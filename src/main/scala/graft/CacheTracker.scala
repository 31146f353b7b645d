package graft

import org.apache.spark.sql.DataFrame

/** Registry for operator-internal persisted frames whose lifetime must
  * extend past the operator call (lazy consumers may execute the returned
  * plan much later — a harness builds several queries before running any,
  * so releasing eagerly or on-next-call evicts a cache a victim still
  * needs; measured as a 3s → 8.5s recompute regression).
  *
  * Contract: operators register; the SESSION OWNER releases. Bench and
  * Verify release after each query's action completes (the only point
  * where no registered frame can still be needed), keeping storage memory
  * flat across a 60-query run. Library users embedding the operators call
  * `releaseAll()` at their own pipeline boundaries.
  */
object CacheTracker {

  private val live =
    java.util.Collections.synchronizedList(new java.util.ArrayList[DataFrame]())
  private val liveRdds =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[org.apache.spark.rdd.RDD[_]]())

  def register(df: DataFrame): DataFrame = {
    live.add(df)
    df
  }

  def registerRdd[T](rdd: org.apache.spark.rdd.RDD[T]): org.apache.spark.rdd.RDD[T] = {
    liveRdds.add(rdd)
    rdd
  }

  /** Unpersist every registered frame/RDD. Safe once all frames returned
    * by operator calls so far have been fully executed (or abandoned).
    * An already-unpersisted entry (e.g. a caller that managed its own
    * lifetime, like the resident-serving specs) is a no-op.
    */
  def releaseAll(): Unit = {
    live.forEach(df => df.unpersist(blocking = false))
    live.clear()
    liveRdds.forEach(rdd => rdd.unpersist(blocking = false))
    liveRdds.clear()
  }
}
