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

  /** Mergeable Misra-Gries frequent-items summary over token streams: at
    * most k counters per partial; any item with true frequency
    * > N/(k+1) is GUARANTEED to survive every decrement (classic MG
    * bound, preserved under the subtract-(k+1)-th-largest merge of
    * Agarwal et al.'s mergeable-summaries construction). Runs as an
    * object-hash aggregate (same engine class as collect_set /
    * hll_sketch_agg) with map-side partials, so the full token shuffle
    * never happens — only ≤ k survivors per partial move.
    */
  private class MgTokens(k: Int) extends org.apache.spark.sql.expressions
      .Aggregator[String, Map[String, Long], Seq[String]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      b.get(tok) match {
        case Some(c) => b.updated(tok, c + 1L)
        case None if b.size < k => b.updated(tok, 1L)
        case None => // decrement-all: charges 1 error unit to every item
          b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
      }
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val s = y.foldLeft(x) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (s.size <= k) s
      else { // subtract the (k+1)-th largest count, keep positives
        val d = s.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
        s.flatMap { case (t, c) => if (c > d) Some(t -> (c - d)) else None }
      }
    }
    override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Exact heavy hitters via sketch-prune + exact-verify — the pattern
    * that keeps an approximate structure out of the ANSWER: the MG
    * sketch yields ≤ k candidate tokens (a guaranteed SUPERSET of every
    * token with frequency > N/(k+1), whatever the partition merge
    * order), a second pass recounts ONLY those candidates through a
    * broadcast semi-join, and the exact threshold filter discards the
    * order-dependent extras. Output — all tokens with
    * cnt·(k+1) > N, with exact counts — is therefore DETERMINISTIC and
    * DuckDB-oracle-checkable, unlike raw sketch contents. At scale this
    * replaces a full distinct-token shuffle with (≤ k survivors per
    * map-side partial) + (one aggregate filtered to ≤ k tokens).
    */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"heavyHitters needs k >= 1 (got $k)")
    val toks = docs.select(
      explode(TextAnalysis.tokens(col("text"))).as("token"))
    val mg = udaf(new MgTokens(k), org.apache.spark.sql.Encoders.STRING)
    val cand = toks.agg(mg(col("token")).as("cands"))
      .select(explode(col("cands")).as("token"))
    // total token count from the UN-exploded docs — one narrow pass
    val total = docs.agg(
      sum(size(TextAnalysis.tokens(col("text")))).cast("long").as("n_total"))
    toks.join(broadcast(cand), Seq("token")) // ≤ k candidates: broadcast
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .where(col("cnt") * lit(k + 1L) > col("n_total"))
      .select(col("token"), col("cnt"))
      .orderBy(col("cnt").desc, col("token"))
  }
}
