package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** MinHash-LSH / SimHash gates: approximate candidates must cover the exact
  * high-similarity pairs (they are recall-gated here, not DuckDB-checked).
  */
class DedupSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sfDir)

  test("minhash LSH finds the exact jaccard>=0.8 pairs (recall >= 0.9)") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, n = 3, numHashes = 32, bands = 8, threshold = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall < 0.9 (exact=${exact.size}, lsh=${lsh.size})")
    // LSH output is verified-exact, so no false positives above threshold
    assert((lsh diff exact).isEmpty)
  }

  test("simhashPairs: banded join finds pairs a naive hamming scan finds") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark table scan merge join filter window group"),
      (2L, "spark table scan merge join filter window group"),   // identical → 0 bits
      (3L, "spark table scan merge join filter window batch"),   // near
      (4L, "utterly unrelated totally different words here now")
    ).toDF("doc_id", "text")
    val banded = Dedup.simhashPairs(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // naive: all pairs by hamming over the same signatures
    val sigs = Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h)).toSet
    assert(banded == naive)
    assert(banded.contains((1L, 2L, 0)))
  }

  test("portable minhash LSH finds the exact jaccard>=0.3 pairs (recall >= 0.9)") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairsPortable(
      docs, n = 3, numHashes = 16, bands = 4, threshold = 0.3)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"portable LSH recall $recall < 0.9")
    // verified-exact: no false positives above threshold
    assert((lsh diff exact).isEmpty)
  }

  test("portable simhash pairs: pigeonhole banding equals a naive hamming scan") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark table scan merge join filter window group"),
      (2L, "spark table scan merge join filter window group"),   // identical → 0 bits
      (3L, "spark table scan merge join filter window batch"),   // near
      (4L, "utterly unrelated totally different words here now")
    ).toDF("doc_id", "text")
    val banded = Dedup.simhashPairsPortable(df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive: all pairs by hamming over the same portable chunk signatures
    val sigs = Dedup.simhashChunksPortable(df).collect()
      .map(r => r.getLong(0) -> (1 to 4).map(r.getLong).toVector).toMap
    val naive = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = sigs(a).zip(sigs(b))
        .map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
      if h <= 3L
    } yield (a, b, h)).toSet
    assert(banded == naive)
    assert(banded.contains((1L, 2L, 0L)))
    // identical text → identical chunks; different text → different
    assert(sigs(1L) == sigs(2L) && sigs(1L) != sigs(4L))
    // chunks stay inside unsigned 16 bits — the signed-BIGINT-safe pack
    assert(sigs.values.flatten.forall(c => c >= 0L && c < 65536L))
  }

  test("simhash: identical normalized text gets identical signature") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark table scan merge join"),
      (2L, "spark table scan merge join"),
      (3L, "completely different words entirely here")
    ).toDF("doc_id", "text")
    val sigs = Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("connected components: chains close transitively, singletons self-label") {
    import spark.implicits._
    // 0-1-2-3 is a path (NOT a clique — forces multi-round propagation),
    // 10-11 a pair, 20 a singleton
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val vertices = Seq(0L, 1L, 2L, 3L, 10L, 11L, 20L).toDF("doc_id")
    val got = graft.operators.Dedup.connectedComponents(vertices, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
    // keep-one-per-cluster face: keepers are exactly the min labels
    assert(got.filter { case (d, c) => d == c }.keySet == Set(0L, 10L, 20L))
  }

  test("connected components: 50-link chain converges in O(log diameter) rounds") {
    import spark.implicits._
    // worst case for plain propagation: one 51-vertex path (diameter 50)
    // would need 50 one-hop rounds; pointer jumping doubles reach per
    // round, so ceil(log2(50)) + slack bounds it at 7. Gate forced to 0:
    // this spec is ABOUT the distributed rounds.
    val pairs = (0L until 50L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val vertices = (0L to 50L).toDF("doc_id")
    spark.conf.set(Dedup.CcLocalMaxVerticesKey, "0")
    val (labels, stats) =
      try graft.operators.Dedup.connectedComponentsWithStats(vertices, pairs)
      finally spark.conf.unset(Dedup.CcLocalMaxVerticesKey)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall(_._2 == 0L)) // one component, min label 0
    assert(stats.rounds <= 7, s"took ${stats.rounds} rounds for a 50-link chain")
    // telemetry shape: one count per round, converging to exactly 0
    assert(stats.changedPerRound.length == stats.rounds)
    assert(stats.changedPerRound.last == 0L)
    assert(stats.changedPerRound.init.forall(_ > 0L))
  }

  test("CC gate parity: local union-find equals the distributed rounds") {
    import spark.implicits._
    // random graph with chains, cliques, and singletons
    val rnd = new scala.util.Random(11)
    val pairs = ((0L until 60L).flatMap { i =>
      if (rnd.nextDouble() < 0.6) Some((i, (i + 1 + rnd.nextInt(5)).min(79L)))
      else None
    } ++ Seq((70L, 71L), (71L, 72L))).toDF("doc_a", "doc_b")
    val vertices = (0L to 80L).toDF("doc_id")
    def run = Dedup.connectedComponentsWithStats(vertices, pairs)
    val (localLabels, localStats) = run // 81 vertices < default gate
    assert(localStats.rounds == 0, "local path should report rounds=0")
    spark.conf.set(Dedup.CcLocalMaxVerticesKey, "0")
    val (distLabels, distStats) =
      try run finally spark.conf.unset(Dedup.CcLocalMaxVerticesKey)
    assert(distStats.rounds > 0)
    val l = localLabels.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val d = distLabels.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(l == d)
  }

  test("prefix filter bounds the hot-shingle posting list (candidate reduction)") {
    import spark.implicits._
    // 60 docs all opening with the same stop phrase (one ultra-common
    // 3-gram, df=60) then unique filler: WITHOUT the prefix filter every
    // pair shares that shingle -> C(60,2)=1770 candidates, the posting-
    // list square the VERDICT flagged. With rarest-first ordering the hot
    // shingle sorts last in every doc and falls outside every prefix.
    val stop = "in the united states"
    val docs = (0 until 60).map { i =>
      val filler = (0 until 12).map(j => s"tok${i}_$j").mkString(" ")
      (i.toLong, s"$stop $filler")
    }.toDF("doc_id", "text")
    val prefixLen = (sa: org.apache.spark.sql.Column) =>
      floor((lit(1.0) - 0.5) * sa).cast("int") + lit(1)
    val nCand = Dedup.candidatePairs(docs, 3, prefixLen, (_, _) => lit(1)).count()
    assert(nCand == 0L, s"hot shingle leaked into prefixes: $nCand candidates")
    // and the threshold output agrees: no pair reaches jaccard 0.5
    assert(Dedup.ngramJaccardPairs(docs, 3, 0.5).count() == 0L)
  }

  test("prefix filter is lossless: ngramJaccardPairs equals brute force") {
    import spark.implicits._
    // mixed corpus: a shared stop phrase, two planted near-dup pairs, and
    // unique fillers — the prefix-filtered path must find EXACTLY the
    // brute-force threshold pairs (no candidate loss at the boundary)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = (Seq(
      (100L, s"in the united states $base"),
      (101L, s"in the united states $base extra"), // near-dup of 100
      (102L, s"$base lambda mu"),                  // near-dup of 100 too
      (103L, "in the united states completely different words here now")
    ) ++ (0 until 40).map { i =>
      val filler = (0 until 10).map(j => s"w${i}_$j").mkString(" ")
      (i.toLong, s"in the united states $filler")
    }).toDF("doc_id", "text")
    val t = 0.3
    // force the prefix-filtered scale path (the gate would take the
    // legacy path for a 44-doc frame)
    spark.conf.set(Dedup.PrefixJoinMinDocsKey, "1")
    val got =
      try Dedup.ngramJaccardPairs(docs, 3, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      finally spark.conf.unset(Dedup.PrefixJoinMinDocsKey)
    // brute force driver-side over the same distinct word-3-gram sets
    val sets = docs.collect().map { r =>
      val toks = r.getString(1).split(" ")
      val ss =
        if (toks.length < 3) Set(r.getString(1))
        else toks.sliding(3).map(_.mkString(" ")).toSet
      (r.getLong(0), ss)
    }
    val want = (for {
      (ida, ssa) <- sets; (idb, ssb) <- sets if ida < idb
      common = (ssa & ssb).size
      j = BigDecimal(common.toDouble / (ssa.size + ssb.size - common))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= t
    } yield (ida, idb, j)).toSet
    assert(want.nonEmpty, "fixture produced no true pairs")
    assert(got == want)
  }

  test("winnowPairs finds edit-robust near-dups and honors the overlap floor") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "cunning red vixen watches from the tall grass near the river bank"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("lazy", "very lazy")), // one local edit
      (3L, "completely unrelated text with different words entirely " +
        "nothing shared here at all zzz qqq www vvv uuu ttt sss rrr")
    ).toDF("doc_id", "text")
    val got = Dedup.winnowPairs(docs, k = 8, w = 4, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((1L, 2L)))
    // the count equals the exact fingerprint-set intersection
    val fps = graft.operators.TextAnalysis.winnowFingerprints(docs, 8, 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(got.head._3 == (fps(1L) & fps(2L)).size.toLong)
  }

  test("winnowPairs gate parity: legacy and prefix paths agree") {
    val docs = Tables.documents(spark, sfDir)
    def run = Dedup.winnowPairs(docs, k = 12, w = 6, minShared = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val prefix = run // winnowPairs defaults to the prefix path at any size
    spark.conf.set(Dedup.PrefixJoinMinDocsKey, "1000000") // force legacy
    try assert(run == prefix)
    finally spark.conf.unset(Dedup.PrefixJoinMinDocsKey)
  }

  test("q-extended prefix is lossless across floors on a random corpus") {
    import spark.implicits._
    // seeded random token soup over a small vocab (forces heavy cross-doc
    // fingerprint sharing — the regime where the q-extension actually
    // prunes); the prefix path (q = min(8, minShared)) must emit exactly
    // the legacy join's pairs at every floor, including floors at and
    // below q where the extension saturates
    val rnd = new scala.util.Random(42)
    val docs = (0L until 80L).map { i =>
      val toks = (0 until 30).map(_ => s"w${rnd.nextInt(25)}")
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    for (minShared <- Seq(2, 5, 12)) {
      def run = Dedup.winnowPairs(docs, k = 6, w = 3, minShared = minShared)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val prefix = run // default: prefix path
      spark.conf.set(Dedup.PrefixJoinMinDocsKey, "1000000") // force legacy
      try assert(run == prefix, s"mismatch at minShared=$minShared")
      finally spark.conf.unset(Dedup.PrefixJoinMinDocsKey)
      assert(prefix.nonEmpty || minShared > 2,
        s"fixture produced no pairs at minShared=$minShared")
    }
  }

  test("q-extension on a hashed (string) join is lossless vs brute force") {
    import spark.implicits._
    // exercises the hashedKey && q > 1 branch directly (no current query
    // routes there): string shingle sets, overlap floor 4, q = 3 — the
    // collision-safe count filter must keep exactly the brute-force
    // pairs with >= 4 shared shingles
    val rnd = new scala.util.Random(9)
    // planted groups of 4 sharing a 12-token core (10 shared interior
    // trigrams) + random tail docs that rarely overlap
    val docs = ((0L until 40L).map { i =>
      ((0 until 12).map(j => s"c${i / 4}_$j") :+ s"tail$i").mkString(" ")
    } ++ (0 until 20).map { _ =>
      (0 until 14).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
    }).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val o = 4
    val sets = docs.select(col("doc_id"),
      graft.functions.VectorFunctions.wordShingles(col("text"), 3).as("ss"))
    val cand = Dedup.setCandidatePairs(sets,
        sa => greatest(sa - lit(o - 1), lit(1)), (_, _) => lit(o), q = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over the same distinct shingle sets
    val ss = docs.collect().map { r =>
      (r.getLong(0), r.getString(1).split(" ").sliding(3).map(_.mkString(" ")).toSet)
    }
    val want = (for {
      (a, sa) <- ss; (b, sb) <- ss if a < b && (sa & sb).size >= o
    } yield (a, b)).toSet
    assert(want.nonEmpty, "fixture produced no qualifying pairs")
    assert(want.subsetOf(cand), s"candidates lost ${(want -- cand).size} true pairs")
  }

  test("CC paths agree on dropping edges with out-of-set endpoints") {
    import spark.implicits._
    // an edge touching a vertex absent from `vertices` contributes
    // nothing in the distributed rounds (it never joins the label
    // table) — the local union-find must drop it identically instead of
    // unioning through the unknown id
    val vertices = Seq(5L, 6L, 7L).toDF("doc_id")
    val pairs = Seq((1L, 5L), (1L, 6L)).toDF("doc_a", "doc_b") // 1 unknown
    def labelsOf = Dedup.connectedComponents(vertices, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val local = labelsOf // 3 vertices < gate
    spark.conf.set(Dedup.CcLocalMaxVerticesKey, "0")
    val dist = try labelsOf finally spark.conf.unset(Dedup.CcLocalMaxVerticesKey)
    assert(local == dist)
    assert(local == Seq((5L, 5L), (6L, 6L), (7L, 7L))) // nobody merged
  }

  test("gate parity: legacy and prefix paths emit identical pairs (both ops)") {
    val docs = Tables.documents(spark, sfDir)
    def collectJacc = Dedup.ngramJaccardPairs(docs, 3, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def collectFuzzy = Dedup.editDistancePairs(docs, 3, maxDist = 60, minShared = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val (legacyJ, legacyF) = (collectJacc, collectFuzzy) // 500 docs < gate
    spark.conf.set(Dedup.PrefixJoinMinDocsKey, "1")
    try {
      assert(collectJacc == legacyJ)
      assert(collectFuzzy == legacyF)
    } finally spark.conf.unset(Dedup.PrefixJoinMinDocsKey)
  }

  test("editDistancePairs: banded levenshtein equals the unbanded verify") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog"), // d=2
      (3L, "the quick brown fox jumps over the lazy cat"),  // d=3 vs 1
      (4L, "completely different content with no overlap at all")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.editDistancePairs(docs, n = 3, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // 1-2 (d=2), 1-3 (d=3), 2-3 (d=5: ed->s + cat); 4 shares no shingle
    assert(got == Seq((1L, 2L, 2L), (1L, 3L, 3L), (2L, 3L, 5L)))
  }

  test("embeddingNearDup splits a planted dense cluster across salt keys") {
    import spark.implicits._
    // 100 near-identical vectors: the whole C(100,2) pair square lands in
    // ONE 1-D projection bucket — the hot-bucket skew VERDICT r4 flagged
    val emb = (0 until 100).map { i =>
      (i.toLong, Array.tabulate(8)(j => if (j == 0) 1.0 else 0.0001 * i))
    }.toDF("vec_id", "embedding")
    val (a, _) = Dedup.nearDupSides(emb, 0.5, 8, "vec_id", "embedding")
    // the mechanism: side a of the hot bucket spreads over >1 salt key,
    // so the bucket's square is processed by that many tasks, not one
    val maxSalts = a.groupBy(col("probe"))
      .agg(countDistinct(col("__salt")).as("ns"))
      .agg(max(col("ns"))).head().getLong(0)
    assert(maxSalts > 1L, s"hot bucket not salted (distinct salts = $maxSalts)")
    // and the salted join is still pair-complete on the dense cluster
    assert(Dedup.embeddingNearDup(emb, 0.5, 8).count() == 100L * 99 / 2)
  }

  test("embeddingNearDup: tight threshold engages bucket pruning") {
    import spark.implicits._
    // two well-separated clusters of 50 + 50 isotropic-noise vectors: at
    // a near-dup-tight threshold the bucket width falls below the
    // projection spread, so cross-cluster pairs never meet in a bucket —
    // the candidate join volume must be well under the full pair square
    val rnd = new scala.util.Random(3)
    val emb = ((0 until 50).map { i =>
      (i.toLong, Array.tabulate(16)(j =>
        (if (j == 0) 10.0 else 0.0) + rnd.nextGaussian() * 0.05))
    } ++ (0 until 50).map { i =>
      ((100 + i).toLong, Array.tabulate(16)(j =>
        (if (j == 1) 10.0 else 0.0) + rnd.nextGaussian() * 0.05))
      // +e1 projects to −1/√16 under the alternating ±1/√dim direction,
      // +e0 to +1/√16 — distinct buckets at width √(2·0.02) = 0.2
    }).toDF("vec_id", "embedding")
    val t = 0.02
    val (a, b) = Dedup.nearDupSides(emb, t, 16, "vec_id", "embedding")
    val candidates = a.join(b, Seq("probe", "__salt"))
      .where(col("id_a") < col("id_b")).count()
    val allPairs = 100L * 99 / 2
    assert(candidates <= allPairs / 2,
      s"bucketing pruned nothing at tight t: $candidates of $allPairs")
    // within-cluster pairs all survive the exact check (distance ~0)
    assert(Dedup.embeddingNearDup(emb, t, 16).count() == 2L * (50L * 49 / 2))
  }

  test("embeddingNearDup bucket join equals naive threshold self-join") {
    val emb = Tables.embeddings(spark, sfDir)
    val bucketed = Dedup.embeddingNearDup(emb, threshold = 0.55, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive: all pairs via cross join
    import graft.functions.VectorFunctions
    val a = emb.select(col("vec_id").as("id_a"),
      VectorFunctions.l2Normalize(col("embedding")).as("va"))
    val b = emb.select(col("vec_id").as("id_b"),
      VectorFunctions.l2Normalize(col("embedding")).as("vb"))
    val naive = a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(VectorFunctions.cosine(col("va"), col("vb")), 6).as("d"))
      .where(col("d") <= 0.55)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
  }

  test("passageDedup keeps first occurrences only and reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),   // passages of 2: "a b", "c d", "e f" — all first
      (2L, "c d x y a b"),   // "c d" and "a b" already seen → keeps "x y"
      (3L, "z z z z")        // intra-doc dup: second "z z" dropped
    ).toDF("doc_id", "text")
    val got = Dedup.passageDedup(docs, passageTokens = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    graft.CacheTracker.releaseAll()
    assert(got(1L) == ((3L, 3L, "a b c d e f")))
    assert(got(2L) == ((3L, 1L, "x y")))
    assert(got(3L) == ((2L, 1L, "z z")))
  }

  test("passageDedup fails loudly outside the packed-key domain") {
    import spark.implicits._
    // a hash-style doc id past 2^42: the packed long would wrap and
    // silently elect a wrong first occurrence — must raise instead
    val docs = Seq((Long.MaxValue / (1L << 21) + 7L, "a b c d"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.passageDedup(docs, passageTokens = 2).collect()
    }
    graft.CacheTracker.releaseAll()
    def msgs(x: Throwable): Iterator[String] =
      Iterator.iterate[Throwable](x)(_.getCause).takeWhile(_ != null).take(5)
        .flatMap(c => Option(c.getMessage))
    assert(msgs(e).exists(_.contains("packed-key domain")), s"unexpected error: $e")
  }

  test("passageDedup conserves distinct passages on the fixture corpus") {
    val docs = Tables.documents(spark, sfDir)
    val out = Dedup.passageDedup(docs, passageTokens = 3).persist()
    // every doc keeps at most what it had, and the kept total across the
    // corpus is exactly the number of DISTINCT passages (each kept once)
    assert(out.where(col("n_kept") > col("n_passages")).count() == 0)
    val keptTotal = out.agg(sum(col("n_kept"))).head().getLong(0)
    val distinctPassages = docs.where(col("text").isNotNull)
      .select(posexplode(transform(
        sequence(lit(0), floor((size(split(col("text"), " ")) - 1) / 3).cast("int")),
        i => array_join(slice(split(col("text"), " "),
          (i * 3 + 1).cast("int"), lit(3)), " "))).as(Seq("pidx", "passage")))
      .select(col("passage")).distinct().count()
    assert(keptTotal == distinctPassages)
    // the 3-token windows over the small fixture vocabulary do collide:
    // the operator is genuinely exercised, not vacuously all-kept
    assert(out.where(col("n_kept") < col("n_passages")).count() > 0)
    out.unpersist(blocking = false)
    graft.CacheTracker.releaseAll()
  }

  test("bloom-prefiltered incremental dedup equals the plain path exactly") {
    val batch = docs.where(col("doc_id") >= 250)
    val hist = docs.where(col("doc_id") < 250)
      .select(operators.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val plain = Dedup.incremental(batch, hist)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    // across fpp extremes: a tight filter (few false positives) and a
    // deliberately saturated one (high fpp — everything becomes a maybe)
    // must both verify away to the same exact answer
    for (fpp <- Seq(0.01, 0.5)) {
      val got = Dedup.incrementalBloom(batch, hist, 100000L, fpp)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(got === plain, s"fpp=$fpp diverged")
    }
  }

  test("bloom incremental: planted duplicates are dropped, empty history passes all") {
    import spark.implicits._
    val hist = Seq("aa bb", "cc dd").toDF("text")
      .select(operators.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val batch = Seq(
      (10L, "aa bb"),   // known dup -> dropped
      (11L, "ee ff"),   // new
      (12L, "ee ff"),   // in-batch dup -> min id wins
      (13L, "cc dd"))   // known dup -> dropped
      .toDF("doc_id", "text")
    val got = Dedup.incrementalBloom(batch, hist, 1000L, 0.01)
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(11L))
    val emptyHist = hist.where(lit(false))
    val all = Dedup.incrementalBloom(batch, emptyHist, 1000L, 0.01)
      .select("doc_id").as[Long].collect().toSeq
    assert(all === Seq(10L, 11L, 13L))
  }

  test("bloom incremental: the probe is a Filter below the join, not a join condition") {
    val batch = docs.where(col("doc_id") >= 250)
    val hist = docs.where(col("doc_id") < 250)
      .select(operators.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val plan = Dedup.incrementalBloom(batch, hist, 100000L, 0.01)
      .queryExecution.executedPlan.toString
    // the map-only pre-prune must appear (might_contain over the batch)…
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    // …and the anti-join must still be there for the exact verify
    assert(plan.contains("LeftAnti"), s"no exact anti-join in plan:\n$plan")
  }

  test("sorted neighborhood: window semantics, candidate bound, brute-force parity") {
    import spark.implicits._
    // keys sort as: a-dup1, a-dup2, filler-b, filler-c, filler-d, z-dup1,
    // z-dup2 — the a-pair and z-pair are rank-adjacent; a-dup vs z-dup is
    // far outside any reasonable window
    val docs = Seq(
      (1L, "apple banana cherry date elderberry fig"),
      (2L, "apple banana cherry date elderberry grape"),
      (3L, "bland filler text number one here now"),
      (4L, "calm filler text number two here now"),
      (5L, "dull filler text number three here now"),
      (6L, "zebra yak xerus wolf vole urchin"),
      (7L, "zebra yak xerus wolf vole tapir"))
      .toDF("doc_id", "text")
    val got = operators.Dedup
      .sortedNeighborhoodPairs(docs, n = 3, window = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.CacheTracker.releaseAll()
    assert(got.contains((1L, 2L)) && got.contains((6L, 7L)))
    // the fillers share "text number"-adjacent shingles only — below 0.3
    assert(got == Set((1L, 2L), (6L, 7L)))
    // brute-force parity within the window: every in-window pair ≥ 0.3
    // must be reported (window=3 ⇒ rank distance ≤ 2)
    val ranked = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (id, t) => (t.toLowerCase.trim, id) }.map(_._1)
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (for {
      i <- ranked.indices; j <- (i + 1) until math.min(i + 3, ranked.length)
      a = ranked(i); b = ranked(j)
      (sa, sb) = (sh(texts(a)), sh(texts(b)))
      jac = (sa & sb).size.toDouble / (sa | sb).size
      if jac >= 0.3
    } yield (math.min(a, b), math.max(a, b))).toSet
    assert(got == want)
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    import spark.implicits._
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("doc_id", "text")
    val v2 = Seq((2L, "beta"), (3L, "GAMMA  "), (4L, "delta"), (5L, "Gamma x"))
      .toDF("doc_id", "text")
    val got = operators.Versioning.snapshotDiff(v1, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1 removed; 2 unchanged (absent); 3 unchanged — the fingerprint
    // normalizes case and trim, so "GAMMA  " == "gamma"; 4 and 5 added
    assert(got == Map(1L -> "removed", 4L -> "added", 5L -> "added"))
    val changed = operators.Versioning.snapshotDiff(
      v1, Seq((3L, "gamma prime")).toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(changed(3L) == "changed")
  }
}
