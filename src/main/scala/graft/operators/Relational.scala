package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational / time-series coverage queries over the TPC-H-ish and events
  * fixtures. The reference has exactly one relational aggregation
  * (get_stats, reference core/hnsw/graph.py:209-234); everything else here
  * is the extension surface SURVEY §2.5 plans (joins, windows, set ops,
  * sessionization) — each shaped the way it should run at 100 TB.
  */
object Relational {

  /** TPC-H Q1-style pricing summary. Scale: partial aggregation before the
    * shuffle; group key space is 6 rows, so the shuffle is trivial
    * regardless of input size. Filter is pushed to the parquet scan.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Revenue per nation × market segment: lineitem ⋈ orders ⋈ customer ⋈
    * nation. Scale: the two dimension sides (customer, nation) broadcast;
    * the lineitem⋈orders join shuffles on the shared orderkey — at 100 TB
    * both big tables would be bucketed on orderkey to make it co-located.
    */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"), col("c_mktsegment"))
  }

  /** Top-3 orders per customer by total price — ranking window; ties
    * broken by orderkey for cross-engine determinism.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 4).as("o_totalprice"), col("rank"))
      .orderBy(col("o_custkey"), col("rank"))
  }

  /** Hourly tumbling-window event aggregate — the batch form of the
    * streaming windowed agg (Structured Streaming uses the same plan with
    * a watermark). Hour emitted as epoch seconds to sidestep engine
    * timestamp-rendering differences.
    */
  def hourlyEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour_epoch"), col("event_type"))

  /** Gap-based sessionization (30-minute inactivity): per-user lag →
    * session-start flags → running sum = session id, then per-session
    * aggregates rolled up per user. Two window passes over one shuffle
    * on user_id — the canonical scalable sessionization plan.
    */
  def userSessions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // gap in exact microseconds — unix_timestamp would truncate to seconds
    // and disagree with the oracle's epoch_us on sub-second gaps
    val gapMicros = 30L * 60L * 1000000L
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMicros, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("session_value"))
      .groupBy(col("user_id"))
      .agg(
        max(col("session_id")).as("n_sessions"),
        round(avg(col("n_events")), 6).as("avg_events_per_session"),
        round(sum(col("session_value")), 4).as("total_value"))
      .orderBy(col("user_id"))
  }

  /** Rolling event-time window aggregate — the time-series pattern the
    * session/as-of family doesn't cover: for EVERY event, statistics of
    * the same user's activity in the strictly-preceding hour (count,
    * value sum) — rate-limit/anomaly features, computed with a RANGE
    * frame over exact epoch microseconds so sub-second timestamps bound
    * the frame identically in any engine.
    *
    * Scale shape: ONE shuffle on user_id, then a per-user ordered range
    * frame — state per key is the in-frame rows, never the partition;
    * no global window exists. The (−1 micro) upper bound makes the
    * frame strictly prior, so the feature is causal (no self-count,
    * usable at serving time).
    */
  def rollingUserActivity(spark: SparkSession, dir: String): DataFrame =
    rollingUserActivityOf(Tables.events(spark, dir))

  def rollingUserActivityOf(
      events: DataFrame, windowMicros: Long = 3600L * 1000000L): DataFrame = {
    val byUserRange = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-windowMicros, -1)
    events
      .select(col("event_id"), col("user_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("n_prev_hour",
        count(lit(1)).over(byUserRange).cast("long"))
      .withColumn("value_prev_hour",
        round(coalesce(sum(col("value")).over(byUserRange), lit(0.0)), 4) + 0.0)
      .select(col("event_id"), col("user_id"), col("n_prev_hour"),
        col("value_prev_hour"))
      .orderBy(col("event_id"))
  }

  /** As-of join — the canonical operator Spark lacks natively (the brief's
    * example of a custom-operator candidate). For every `purchase` event,
    * attach the most recent strictly-prior `click` by the same user.
    *
    * Implementation is the scalable single-shuffle union trick rather than
    * a range join: tag both streams, union, one window per user ordered by
    * (ts, event_id), carry the last click forward with
    * `last(..., ignoreNulls)` over rows (unbounded preceding, -1) —
    * "-1" makes the match strictly prior. One shuffle on user_id, no
    * per-row probing, no cross product; the same plan shape works at any
    * scale because state per key is one row.
    */
  def asofPurchaseClicks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .where(col("event_type").isin("purchase", "click"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("prior_click",
        last(
          when(col("event_type") === "click",
            struct(col("event_id").as("click_id"), col("ts").as("click_ts"))),
          ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        unix_micros(col("ts")).as("purchase_ts_us"),
        col("prior_click.click_id").as("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("prior_click.click_ts")))
          .as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  /** Range join — the second canonical operator Spark lacks natively (the
    * brief names it next to as-of join). Joining events into time
    * intervals with a raw `ts BETWEEN start AND end` predicate plans as a
    * BroadcastNestedLoopJoin — a cross product that dies at scale. The
    * scalable shape is the BINNED range join: pick a bin width ≥ the
    * longest interval, map each event to ONE bin, explode each interval to
    * the (≤ 2) bins it can overlap, equi-join on the bin key, then apply
    * the exact range predicate. The shuffle key is the bin — no cross
    * product, and the plan is a plain hash join at any scale.
    *
    * Intervals here are derived deterministically from the data (per
    * event_type: four 1-hour windows every 6 hours from the type's first
    * event) so DuckDB reproduces them exactly and the whole operator is
    * oracle-checked; binning only PRUNES, so output equals the naive
    * BETWEEN join.
    */
  def eventsInMaintenanceWindows(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("value"))
    val hourUs = 3600L * 1000000L
    val intervals = ev
      .groupBy(col("event_type"))
      .agg(min(unix_micros(col("ts"))).as("t0"))
      .select(col("event_type"), explode(sequence(lit(0), lit(3))).as("k"),
        col("t0"))
      .select(
        col("event_type"), col("k").cast("long").as("k"),
        (col("t0") + col("k") * 6L * hourUs).as("w_start"),
        (col("t0") + col("k") * 6L * hourUs + hourUs).as("w_end"))
    // bin width = interval length (1h) → an interval spans ≤ 2 bins
    val binnedEvents = ev
      .select(col("event_type"), unix_micros(col("ts")).as("t_us"), col("value"))
      .withColumn("bin", floor(col("t_us") / hourUs))
    val binnedIntervals = intervals
      .withColumn("bin", explode(array(
        floor(col("w_start") / hourUs), floor((col("w_end") - 1) / hourUs))))
      .distinct()
    binnedEvents
      .join(binnedIntervals, Seq("event_type", "bin"))
      .where(col("t_us") >= col("w_start") && col("t_us") < col("w_end"))
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .orderBy(col("event_type"), col("k"))
  }

  /** Set-operation coverage (union / intersect / except — SURVEY §2.5
    * lists them as absent in the reference; here they're one-line Spark
    * ops). Emits one count per operation for a compact oracle check.
    */
  def customerSetOps(spark: SparkSession, dir: String): DataFrame = {
    val withOrders = Tables.orders(spark, dir).select(col("o_custkey").as("custkey"))
    val building = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val allCust = Tables.customer(spark, dir).select(col("c_custkey").as("custkey"))
    // One declarative plan: each set op reduced to a count-aggregate and the
    // three single-row aggregates unioned — zero driver-side actions, so this
    // is one Spark job regardless of input size (mirrors its own oracle SQL).
    def counted(op: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
    counted("building_with_orders", building.intersect(withOrders))
      .unionAll(counted("customers_without_orders", allCust.except(withOrders)))
      .unionAll(counted("union_distinct", building.union(withOrders).distinct()))
      .orderBy(col("op"))
  }

  /** ROLLUP aggregate: per (returnflag, linestatus) revenue with subtotal
    * and grand-total rows; grouping keys coalesced to 'ALL' so both
    * engines emit identical rows.
    */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("revenue"), col("n_items"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** String scalar-function coverage (upper/substr/replace/reverse/lpad/
    * instr) — all chosen for byte-identical cross-engine behavior on the
    * fixture's ASCII text.
    */
  def stringFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        upper(substring(col("text"), 1, 20)).as("prefix_upper"),
        reverse(substring(col("text"), 1, 10)).as("prefix_rev"),
        lpad(col("doc_id").cast("string"), 6, "0").as("padded_id"),
        ((length(col("text")) - length(regexp_replace(col("text"), "spark", "")))
          / 5).cast("long").as("n_spark"),
        instr(col("text"), "merge").cast("long").as("merge_pos"))
      .orderBy(col("doc_id"))

  /** Date-part extraction coverage over order dates. weekday()+1 matches
    * DuckDB's isodow (1=Mon..7=Sun) — Spark's dayofweek starts at Sunday
    * and would hash-mismatch.
    */
  def dateParts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .where(col("o_orderkey") < 400)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        (weekday(col("o_orderdate")) + 1).as("isodow"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("epoch_days"))
      .orderBy(col("o_orderkey"))

  /** Semi/anti join coverage: EXISTS and NOT EXISTS as left_semi /
    * left_anti (SURVEY §2.5 absences, first-class here).
    */
  def semiAntiJoins(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir)
      .where(col("o_totalprice") > 300000)
      .select(col("o_custkey").as("c_custkey"))
    val semi = Tables.customer(spark, dir)
      .join(broadcast(bigOrders), Seq("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("n"))
      .select(lit("customers_with_big_orders").as("op"), col("n"))
    // Distinct-first shrinks the anti-join probe side to the supplier-key
    // cardinality via map-side partial aggregation (the shuffle carries
    // distinct suppkeys, never the lineitem row count), then broadcasts it.
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("s_suppkey")).distinct()
    val anti = Tables.supplier(spark, dir)
      .join(broadcast(li), Seq("s_suppkey"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("suppliers_without_lineitems").as("op"), col("n"))
    // Single declarative plan (union of two count-aggregates) — no eager
    // driver-side .count() actions, so both joins run inside one job.
    semi.unionAll(anti).orderBy(col("op"))
  }

  /** JSON prop extraction + aggregate: props is a JSON string column
    * (≙ the reference's schemaless metadata, api/rest/server.py:75);
    * extract a typed field and aggregate by it.
    */
  def eventPropStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("k")), 6).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
}
