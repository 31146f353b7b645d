package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Independent cross-check of the sessionization operator: Spark's native
  * session_window (gap-merge windows) must agree with the lag/running-sum
  * implementation on session COUNTS and per-user totals. Two different
  * algorithms, same 30-minute-gap semantics — if they diverge, one of
  * them misreads the gap contract.
  */
class SessionWindowParitySpec extends SparkSpec {

  test("session_window agrees with the lag-based sessionization") {
    val events = Tables.events(spark, sfDir)
    val native = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("total_events"),
        round(sum(col("session_value")), 4).as("total_value"))
    val ours = Relational.userSessions(spark, sfDir)
      .select(col("user_id"), col("n_sessions"),
        round(col("avg_events_per_session") * col("n_sessions")).cast("long")
          .as("total_events"),
        col("total_value"))

    val n = native.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val o = ours.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(n.keySet == o.keySet)
    val diffs = n.keys.filter(k => n(k) != o(k)).take(5)
      .map(k => s"user $k native=${n(k)} ours=${o(k)}")
    assert(diffs.isEmpty, diffs.mkString("; "))
  }
}
