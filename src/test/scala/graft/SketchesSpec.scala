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

  test("heavyHitters: sketch-pruned exact answer equals brute force (zipf)") {
    import spark.implicits._
    // zipf-ish corpus with vocab (1000 tokens) >> k (20): token z0
    // dominates, a long tail keeps the MG decrement path busy — the
    // regime where the sketch actually prunes
    val rnd = new scala.util.Random(7)
    val docs = (0L until 200L).map { i =>
      val toks = (0 until 40).map { _ =>
        val r = rnd.nextDouble()
        if (r < 0.30) "z0" else if (r < 0.45) "z1" else if (r < 0.55) "z2"
        else s"t${rnd.nextInt(1000)}"
      }
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val k = 20
    val got = Sketches.heavyHitters(docs, k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // brute force: exact counts, threshold cnt*(k+1) > N
    val counts = docs.collect().flatMap(_.getString(1).split(" "))
      .groupBy(identity).map { case (t, a) => (t, a.length.toLong) }
    val n = counts.values.sum
    val want = counts.toSeq.filter { case (_, c) => c * (k + 1) > n }
      .sortBy { case (t, c) => (-c, t) }
    assert(want.nonEmpty, "fixture produced no heavy hitters")
    assert(got == want)
    // determinism across partitioning: same answer from a repartitioned
    // input (different MG merge order, same verified output)
    val got16 = Sketches.heavyHitters(docs.repartition(16), k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got16 == got)
    // empty corpus: no candidates, no division-by-zero, empty result
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Sketches.heavyHitters(empty, k).collect().isEmpty)
    // small k hammers the full-sketch drop/compaction/resurrect paths:
    // base bumps fire for nearly every tail token once the k counters
    // hold the heavy items — answers must still match brute force
    for (k2 <- Seq(3, 5)) {
      val g = Sketches.heavyHitters(docs, k2).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val w = counts.toSeq.filter { case (_, c) => c * (k2 + 1) > n }
        .sortBy { case (t, c) => (-c, t) }
      assert(g == w, s"k=$k2")
    }
  }

  test("cms: estimates never undercount and recover exact counts when wide") {
    val docs = Tables.documents(spark, sfDir)
    val narrow = Sketches.cmsTokenEstimates(docs, depth = 4, width = 32, topK = 25)
      .collect()
    assert(narrow.nonEmpty)
    narrow.foreach { r =>
      assert(r.getLong(3) >= 0, s"undercount for ${r.getString(0)}")
      assert(r.getLong(2) == r.getLong(1) + r.getLong(3))
    }
    // a sketch much wider than the 31-token vocabulary: no collisions,
    // every estimate exact
    val wide = Sketches.cmsTokenEstimates(docs, depth = 4, width = 4096, topK = 25)
      .collect()
    wide.foreach(r => assert(r.getLong(3) == 0, s"collision at ${r.getString(0)}"))
  }

  test("cms: planted corpus estimates match hand counts at a wide width") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Sketches.cmsTokenEstimates(docs, depth = 2, width = 1024, topK = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("a" -> (3L, 3L), "b" -> (2L, 2L), "c" -> (1L, 1L)))
  }

  test("cms: cell table is the sketch size, not the vocabulary") {
    // depth 4 x width 8 caps the aggregate key space at 32 cells no
    // matter the corpus; estimates still one row per probe token
    val out = Sketches.cmsTokenEstimates(
      Tables.documents(spark, sfDir), depth = 4, width = 8, topK = 5)
    assert(out.count() == 5)
    out.collect().foreach(r => assert(r.getLong(3) >= 0))
  }

  test("kmv: exact below k, estimator formula above, duplicates ignored") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // 3 distinct users, heavy duplication, k = 8 > 3 -> exact passthrough
    val small = (1 to 50).map(i => (ts, (i % 3).toLong)).toDF("ts", "user_id")
    val row = Sketches.kmvDailyUsers(small, k = 8).collect().head
    assert(row.getLong(1) == 3L && row.getLong(2) == 3L)
    assert(row.getDouble(3) == 3.0)
    // above k: replay the (k-1)/kth formula against the collected draws
    val big = (1 to 500).map(i => (ts, i.toLong)).toDF("ts", "user_id")
    val k = 16
    val got = Sketches.kmvDailyUsers(big, k = k).collect().head
    def draw(u: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    val kth = (1L to 500L).map(draw).distinct.sorted.apply(k - 1)
    val want = BigDecimal((k - 1).toDouble / (kth.toDouble / 4294967296.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    assert(got.getLong(1) == 500L && got.getLong(2) == k.toLong)
    assert(got.getDouble(3) == want)
  }

  test("kmv: daily estimates land within 30% of exact on the fixture") {
    val out = Sketches.kmvDailyUsers(Tables.events(spark, sfDir), k = 64)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val exact = r.getLong(1).toDouble
      val est = r.getDouble(3)
      assert(math.abs(est - exact) <= 0.3 * exact + 1.0,
        s"day ${r.get(0)}: est $est vs exact $exact")
    }
  }

  test("kmv: plans as a map-side partial aggregate") {
    val plan = Sketches.kmvDailyUsers(Tables.events(spark, sfDir), k = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_kmin"), s"no map-side kmin in:\n$plan")
  }

  test("hist quantiles: within one bin width of exact; single-bin edge") {
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
    val nBins = 256
    val got = Sketches.histQuantiles(events, nBins).collect()
    assert(got.nonEmpty)
    // exact quantiles + range per type, computed locally
    val byType = events.select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted)
    got.foreach { r =>
      val vs = byType(r.getString(0))
      val width = (vs.last - vs.head) / nBins
      def exact(q: Double) = vs((math.ceil(q * vs.length) - 1).toInt.max(0))
      assert(math.abs(r.getDouble(2) - exact(0.50)) <= width + 1e-6)
      assert(math.abs(r.getDouble(3) - exact(0.95)) <= width + 1e-6)
      assert(math.abs(r.getDouble(4) - exact(0.99)) <= width + 1e-6)
      assert(r.getLong(1) == vs.length)
    }
    // constant-valued group: every estimate is that constant
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val const = (1 to 40)
      .map(i => (ts, i.toLong, "flat", 7.5)).toDF("ts", "user_id", "event_type", "value")
    val flat = Sketches.histQuantiles(const, nBins).collect().head
    assert((flat.getDouble(2), flat.getDouble(3), flat.getDouble(4)) == (7.5, 7.5, 7.5))
  }

  test("kmv pair overlap: estimates track exact set algebra on the fixture") {
    val docs = Tables.documents(spark, sfDir)
    val got = Sketches.kmvSourceOverlap(docs, n = 3, k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    graft.CacheTracker.releaseAll()
    // exact per-source distinct shingle sets, locally
    val sets = docs.select(col("source"),
      graft.functions.VectorFunctions.wordShingles(col("text"), 3).as("ss"))
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.flatMap(_.getSeq[String](1)).toSet).toMap
    assert(got.nonEmpty)
    got.foreach { case ((sa, sb), (jEst, uEst, iEst)) =>
      val (a, b) = (sets(sa), sets(sb))
      val u = (a ++ b).size.toDouble
      val i = (a & b).size.toDouble
      // KMV at k=64: σ ≈ 1/√62 ≈ 13% on union; Jaccard is a ratio of two
      // sketch reads — gate generously but meaningfully
      assert(math.abs(uEst - u) <= 0.40 * u + 2.0, s"$sa×$sb union $uEst vs $u")
      assert(math.abs(jEst - i / u) <= 0.20 + 0.25 * (i / u), s"$sa×$sb j $jEst vs ${i / u}")
      assert(math.abs(iEst - i) <= 0.25 * u + 2.0, s"$sa×$sb inter $iEst vs $i")
    }
  }

  test("kmv pair overlap: identical sources estimate J=1; disjoint J=0") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (
      (1 to 30).map(i => (i.toLong, text + " " + (i % 5), "a")) ++
      (31 to 60).map(i => (i.toLong, text + " " + (i % 5), "b")) ++ // = source a
      (61 to 90).map(i => (i.toLong, s"completely different words number ${i % 7} here", "c"))
    ).toDF("doc_id", "text", "source")
    val out = Sketches.kmvSourceOverlap(docs, n = 3, k = 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(4))).toMap
    graft.CacheTracker.releaseAll()
    val (jab, _) = out(("a", "b"))
    assert(jab == 1.0, s"identical shingle sets must read J=1, got $jab")
    val (jac, iac) = out(("a", "c"))
    assert(jac == 0.0 && iac == 0.0, s"disjoint sets must read 0, got $jac/$iac")
  }
}
