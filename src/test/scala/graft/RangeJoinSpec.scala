package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Binned range join: equi-join plan shape and pruning exactness. */
class RangeJoinSpec extends SparkSpec {

  test("plans as a hash equi-join, never a nested-loop cross product") {
    val df = Relational.eventsInMaintenanceWindows(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Join"), plan)
  }

  test("binning only prunes: result equals the naive BETWEEN join") {
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("t_us"), col("value"))
    val hourUs = 3600L * 1000000L
    val ivs = ev.groupBy(col("event_type"))
      .agg(min(col("t_us")).as("t0"))
      .select(col("event_type"), explode(sequence(lit(0), lit(3))).as("k"), col("t0"))
      .select(col("event_type"), col("k").cast("long").as("k"),
        (col("t0") + col("k") * 6L * hourUs).as("w_start"),
        (col("t0") + col("k") * 6L * hourUs + hourUs).as("w_end"))
    val naive = ev.join(ivs, Seq("event_type"))
      .where(col("t_us") >= col("w_start") && col("t_us") < col("w_end"))
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val binned = Relational.eventsInMaintenanceWindows(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(binned == naive)
  }
}
