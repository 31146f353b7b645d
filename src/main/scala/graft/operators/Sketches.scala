package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch aggregates — the approximate-at-scale counterpart of the exact
  * event aggregates (Relational.hourlyEvents / eventPropStats). The
  * reference has nothing like this (its stats are exact counts over an
  * in-RAM dict, reference core/hnsw/graph.py:209-234); at 100 TB the
  * scale play is MERGEABLE sketches: aggregate once into a small sketch
  * table, then answer rollups by merging sketches instead of rescanning
  * events.
  *
  *  - distinct users: HLL sketches (Apache DataSketches via Spark's
  *    hll_sketch_agg), mergeable across any grouping with hll_union_agg.
  *  - value quantiles: percentile_approx (Greenwald-Khanna), with the
  *    accuracy knob exposed.
  *
  * Approximate answers cannot hash-match a DuckDB oracle (different
  * sketch implementations), so the contract is spec-gated relative error
  * vs the exact aggregates, mirroring the HNSW recall gate.
  */
object Sketches {

  /** Per-day sketch table: (day, hll_users BINARY, n_events, sum_value).
    * Small enough to keep hot; the input events scan happens once.
    */
  def dailyUserSketches(events: DataFrame, lgK: Int = 12): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        hll_sketch_agg(col("user_id"), lit(lgK)).as("hll_users"),
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))

  /** Roll the per-day sketch table up to total distinct users WITHOUT
    * touching the events table again — the mergeability payoff.
    */
  def totalDistinctUsers(daily: DataFrame): Long =
    daily
      .agg(hll_sketch_estimate(hll_union_agg(col("hll_users"))).as("est"))
      .collect()(0).getLong(0)

  /** Per-event-type value quantiles (p50/p95/p99) at a chosen accuracy.
    * `accuracy` is the Greenwald-Khanna knob: error ≤ 1/accuracy.
    */
  def valueQuantiles(events: DataFrame, accuracy: Int = 10000): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(percentile_approx(
        col("value"), array(lit(0.5), lit(0.95), lit(0.99)), lit(accuracy))
        .as("quantiles"))
      .select(
        col("event_type"),
        col("quantiles")(0).as("p50"),
        col("quantiles")(1).as("p95"),
        col("quantiles")(2).as("p99"))
      .orderBy(col("event_type"))
}
