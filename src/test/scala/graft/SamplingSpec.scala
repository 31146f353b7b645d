package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling: stability, key-stickiness, split disjointness. */
class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("sample is identical across runs and approximates the fraction") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.25)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val b = Sampling.deterministicSample(docs.repartition(7), "doc_id", 0.25)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a == b) // partitioning-independent, unlike df.sample()
    val frac = a.size.toDouble / docs.count()
    assert(math.abs(frac - 0.25) < 0.08, s"got $frac")
  }

  test("split is disjoint, exhaustive, and sticky per key") {
    val s = Sampling.split(docs, "doc_id", 0.8, 0.1, 0.1)
    assert(s.count() == docs.count())
    assert(s.where(!col("split").isin("train", "val", "test")).count() == 0)
    // a key's split never depends on the rest of the data: subsetting the
    // table must not move any row between splits
    val subset = Sampling.split(docs.where(col("doc_id") % 3 === 0), "doc_id", 0.8, 0.1, 0.1)
      .select(col("doc_id"), col("split").as("split2"))
    val moved = s.join(subset, "doc_id").where(col("split") =!= col("split2")).count()
    assert(moved == 0)
  }

  test("mixture sample applies per-group fractions; membership stays sticky") {
    val mixed = Sampling.mixtureSample(
      docs, "doc_id", "source",
      weights = Map("src1" -> 1.0, "src2" -> 0.0),
      defaultFraction = 0.25)
    val bySource = mixed.groupBy(col("source")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val perSource = docs.groupBy(col("source")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySource("src1") == perSource("src1")) // weight 1.0 keeps all
    assert(!bySource.contains("src2"))            // weight 0.0 drops all
    // default-weight groups: the kept set equals the plain 0.25 sample
    val viaPlain = Sampling.deterministicSample(
      docs.where(col("source") === "src3"), "doc_id", 0.25)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val viaMix = mixed.where(col("source") === "src3")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(viaMix == viaPlain)
  }

  test("a smaller fraction's sample is a subset of a larger one's") {
    val small = Sampling.deterministicSample(docs, "doc_id", 0.1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val big = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(small.subsetOf(big)) // nested samples: thresholds on one hash
  }

  test("fraction 1.0 keeps every row; splits summing to 1 have no rest") {
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count() == docs.count())
    val s = Sampling.split(docs, "doc_id", 1.0, 0.0, 0.0)
    assert(s.where(col("split") =!= "train").count() == 0)
  }

  test("shuffledOrder is a deterministic non-identity permutation; seeds differ") {
    val n = docs.count()
    val a = Sampling.shuffledOrder(docs.select(col("doc_id")), "doc_id", 42L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    graft.CacheTracker.releaseAll()
    // positions are exactly 1..N (a bijection)
    assert(a.values.toSeq.sorted == (1L to n).toSeq)
    // deterministic across runs
    val a2 = Sampling.shuffledOrder(docs.select(col("doc_id")), "doc_id", 42L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    graft.CacheTracker.releaseAll()
    assert(a == a2)
    // actually shuffles (not the identity on any realistic corpus)
    assert(a.count { case (id, pos) => pos == id + 1 } < n / 2)
    // a different seed gives a different permutation
    val b = Sampling.shuffledOrder(docs.select(col("doc_id")), "doc_id", 7L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pos")).toMap
    graft.CacheTracker.releaseAll()
    assert(a != b)
  }

  test("weightedSample equals a direct local recount of the race keys") {
    val docs = Tables.documents(spark, sfDir)
    val got = Sampling.weightedSample(docs, "doc_id", "source", "n_chars",
      k = 5, seed = 42L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // independent recount: same md5 draw, same key formula, local sort
    val rows = docs.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def esKey(id: Long, w: Long): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:42".getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
      val k = BigDecimal(-math.log(u) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      k + 0.0
    }
    val want = rows.filter(_._3 > 0)
      .map { case (id, src, w) => (src, id, esKey(id, w)) }
      .groupBy(_._1).toSeq.flatMap { case (src, g) =>
        g.sortBy { case (_, id, k) => (k, id) }.take(5).zipWithIndex
          .map { case ((_, id, k), i) => (src, i + 1L, id, k) }
      }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }

  test("weightedSample prefers heavy rows: planted heavy doc always drawn") {
    import spark.implicits._
    // one row with overwhelming weight among 200 light rows per group
    val df = (0L until 200L).map(i => (i, "g", if (i == 7L) 1000000L else 1L))
      .toDF("doc_id", "source", "n_chars")
    val got = Sampling.weightedSample(df, "doc_id", "source", "n_chars",
      k = 3, seed = 7L).select("doc_id").as[Long].collect()
    assert(got.contains(7L), s"heavy doc missing from $got")
  }

  test("weightedSample plans as the bounded topk aggregate, not a window") {
    val docs = Tables.documents(spark, sfDir)
    val plan = Sampling.weightedSample(docs, "doc_id", "source", "n_chars",
      k = 5, seed = 42L).queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"), s"no map-side topk in:\n$plan")
    assert(!plan.contains("row_number"), s"window leaked into:\n$plan")
  }

  test("leakageSafeSplit keeps every near-dup cluster on one side") {
    import spark.implicits._
    // synthetic cluster frame with multi-member clusters straddling the
    // hash space: members of one cluster MUST share a split label
    val clusters = (0L until 300L).map(d => (d, d % 37L))
      .toDF("doc_id", "cluster_id")
    val s = Sampling.leakageSafeSplit(clusters, "cluster_id", 0.8, 0.1, 0.1)
    assert(s.count() == 300L)
    assert(s.where(!col("split").isin("train", "val", "test")).count() == 0)
    val splitsPerCluster = s.groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("k"))
      .where(col("k") > 1).count()
    assert(splitsPerCluster == 0, "a cluster straddles the split boundary")
    // and the label is exactly split() on the cluster key (one hash
    // discipline, no second code path)
    val viaSplit = Sampling.split(clusters, "cluster_id", 0.8, 0.1, 0.1)
      .select(col("doc_id"), col("split").as("split2"))
    assert(s.join(viaSplit, "doc_id")
      .where(col("split") =!= col("split2")).count() == 0)
  }

  test("leakageSafeSplit composed with dedupClusters: no cross-split near-dup pair") {
    import spark.implicits._
    // corpus with PLANTED near-duplicates (same 3-gram shingle sets) plus
    // unique fillers; any near-dup pair split apart is contamination
    val dupBase = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = ((0L until 40L).map { i =>
      if (i % 4 == 0) (i, s"$dupBase tail${i / 4 % 3}")
      else (i, s"unique text number $i with filler words ${i * 31} and ${i * 17}")
    }).toDF("doc_id", "text")
    val clustered = graft.operators.Dedup.dedupClusters(docs, n = 3, threshold = 0.3)
    val s = Sampling.leakageSafeSplit(clustered, "cluster_id", 0.6, 0.2, 0.2)
    val pairs = graft.operators.Dedup
      .ngramJaccardPairs(docs, n = 3, threshold = 0.3)
      .select(col("doc_a"), col("doc_b"))
    val sa = s.select(col("doc_id").as("doc_a"), col("split").as("split_a"))
    val sb = s.select(col("doc_id").as("doc_b"), col("split").as("split_b"))
    val contaminated = pairs.join(sa, "doc_a").join(sb, "doc_b")
      .where(col("split_a") =!= col("split_b")).count()
    assert(contaminated == 0, "near-dup pair straddles the split")
    graft.CacheTracker.releaseAll()
  }
}
