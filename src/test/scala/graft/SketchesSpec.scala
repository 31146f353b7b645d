package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Sketch aggregates: mergeability and bounded error vs exact answers. */
class SketchesSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sfDir)

  test("merged daily HLL sketches estimate total distinct users within 5%") {
    val daily = Sketches.dailyUserSketches(events)
    val est = Sketches.totalDistinctUsers(daily)
    val exact = events.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val relErr = math.abs(est - exact).toDouble / exact
    assert(relErr <= 0.05, s"est=$est exact=$exact relErr=$relErr")
    // the rollup consumed the sketch table only — one row per day
    assert(daily.count() <= events.select(to_date(col("ts"))).distinct().count())
  }

  test("approx quantiles land inside a ±2-percentile exact band per type") {
    val approx = Sketches.valueQuantiles(events).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // GK bounds RANK error, and percentile_approx returns a real element
    // (no interpolation, unlike exact percentile) — so the correct gate is
    // a quantile band, not a value tolerance
    val bands = events.groupBy(col("event_type"))
      .agg(expr(
        "percentile(value, array(0.48, 0.52, 0.93, 0.97, 0.97, 1.0))").as("b"))
      .collect()
      .map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Double]]("b").toIndexedSeq)
      .toMap
    bands.foreach { case (tpe, b) =>
      val qs = approx(tpe)
      Seq((qs(0), b(0), b(1), "p50"), (qs(1), b(2), b(3), "p95"),
          (qs(2), b(4), b(5), "p99")).foreach { case (v, lo, hi, name) =>
        assert(v >= lo - 1e-9 && v <= hi + 1e-9, s"$tpe $name=$v outside [$lo, $hi]")
      }
      assert(qs(0) <= qs(1) && qs(1) <= qs(2))
    }
  }
}
