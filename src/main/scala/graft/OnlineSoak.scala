package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Ivf, ProductQuantization}

/** The COMPOSED online-ingest soak — every streaming curation face the
  * engine ships, chained in ONE foreachBatch loop the way a live
  * training-data service would run them:
  *
  *   mutation stream → visibility fold → incremental exact dedup (with
  *   delete-aware keeper re-resolution) → quality gate → DSIR quality
  *   score under a fixed model → mixture keep-draw → residual-PQ encode
  *   (fixed codebooks) → incremental kNN-graph refresh
  *
  * The parts are individually parity-gated (StreamingSpec, the
  * knn_graph_refreshed oracle); the COMPOSITION is where state leaks and
  * plan nesting historically hid, so the soak measures, per generation:
  * wall latency, cached-storage bytes, live RDD count, and this JVM's
  * on-disk block files (the r13 scoped leak metric) — and at the end
  * replays the ENTIRE mutation log through the equivalent BATCH pipeline
  * and asserts set identity of the curated corpus, the code table, and
  * the graph edges.
  *
  * Dedup rule (shared verbatim by both paths): a document is curated iff
  * it is the minimum-doc_id LIVE document for its text fingerprint AND
  * it passes the row gates (≥20 distinct tokens, DSIR logw ≥ −5 under the
  * fixed model, per-source md5 mixture draw). A deleted keeper's
  * shadowed duplicate is re-promoted — the visible corpus retains every
  * live row, and keeper re-resolution touches only the fingerprints the
  * batch touched (delta-bounded: the affected-fingerprint frame is
  * mutation-sized, never corpus-sized).
  *
  * Usage: graft.OnlineSoak [n] [gens] [perGen]   (500000, 25, 5000)
  */
object OnlineSoak {

  private val Dim = 64
  private val Buckets = 64
  /** Fixed DSIR model: lr(b) = ((37b + 11) % 21 − 10) / 10 ∈ [−1, 1],
    * mean ≈ 0 over the bucket cycle; the in-doc n-gram sequences are
    * arithmetic mod the vocab, so per-doc logw is left-skewed — the
    * −5 gate keeps a bit over half rather than the iid-normal 50%.
    */
  private val LrModel: Map[Long, Double] =
    (0L until Buckets).map(b => b -> (((b * 37 + 11) % 21 - 10) / 10.0)).toMap
  private val MixRates = Map(
    "src0" -> 1.0, "src1" -> 0.8, "src2" -> 0.5, "src3" -> 0.25)

  /** Closed-form text for (doc_id, ver): 60 tokens over a 5k vocabulary;
    * ids ≡ 0 (mod 17) are junk (one token repeated — the quality-gate
    * population, 7 fingerprint groups); at ver 0, ids ≡ 1 (mod 100)
    * duplicate their predecessor's text (the planted exact-dup pairs).
    * A change (ver > 0) rewrites content — re-texting a dup member
    * legitimately breaks its duplication.
    */
  private def textCol(docId: org.apache.spark.sql.Column,
      ver: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val contentKey =
      when(docId % 100 === 1 && ver === 0, docId - 1).otherwise(docId)
    when(docId % 17 === 0,
      concat_ws(" ", array_repeat(
        concat(lit("junk"), docId % 7), 60)))
      .otherwise(concat_ws(" ",
        // a unique leading token pins the fingerprint to (contentKey,
        // ver): without it, ids congruent mod the vocab share the whole
        // token sequence and dedup collapses the corpus 100×
        concat(lit("d"), contentKey, lit("v"), ver),
        concat_ws(" ", transform(
          sequence(lit(0), lit(59)),
          j => concat(lit("t"),
            pmod(contentKey * 31 + ver * 7919 + j * 13, lit(5000)))))))
  }

  private def vecCol(docId: org.apache.spark.sql.Column,
      ver: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(Dim - 1)),
      i => (pmod(xxhash64(docId, ver, i), lit(2001)) - 1000)
        .cast("double") / 1000.0)

  /** Materialize (doc_id, ver) rows into full visible-corpus rows. */
  private def enrich(rows: DataFrame): DataFrame =
    rows.select(
      col("doc_id"), col("ver"),
      concat(lit("src"), col("doc_id") % 4).as("source"),
      textCol(col("doc_id"), col("ver")).as("text"),
      vecCol(col("doc_id"), col("ver")).as("embedding"))
      .withColumn("fp", md5(col("text")))

  /** The row gates, identical in both paths: ≥20 distinct tokens, DSIR
    * logw ≥ −5 under the fixed model (the streamingDsirScore math), and
    * the per-source md5 mixture draw.
    */
  private def gateRows(rows: DataFrame): DataFrame = {
    val q = rows.where(
      size(array_distinct(split(col("text"), " "))) >= 20)
    val scored = graft.streaming.StreamingOps.streamingDsirScore(
      q.select(col("doc_id"), col("text")), LrModel, Buckets)
      .where(col("logw") >= -5.0).select(col("doc_id"))
    val draw = conv(substring(
      md5(concat(lit("mix:"), col("doc_id"))), 1, 8), 16, 10)
      .cast("double") / 4294967296.0
    val rate = element_at(typedlit(MixRates), col("source"))
    q.join(scored, Seq("doc_id")).where(draw < rate)
  }

  /** Keeper resolution over a visible frame: min doc_id per fp. */
  private def keepers(visible: DataFrame): DataFrame =
    visible.join(
      visible.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id")),
      Seq("fp", "doc_id"))

  /** The whole batch pipeline: visible → keepers → gates. */
  private def curate(visible: DataFrame): DataFrame = gateRows(keepers(visible))

  private def release(df: DataFrame): Unit =
    org.apache.spark.sql.graftbridge.Bridge.checkpointRdd(df)
      .foreach(_.unpersist(blocking = false))

  private def blockFileCount(): Long = {
    def cnt(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).map(_.map(cnt).sum).getOrElse(0L)
      else 1L
    org.apache.spark.sql.graftbridge.Bridge.localBlockDirs().map(cnt).sum
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 500000L
    val gens = if (args.length > 1) args(1).toInt else 25
    val perGen = if (args.length > 2) args(2).toInt else 5000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nPart = cpus.toInt
    val (k, nProbe) = (8, 4)
    // recovered task retries, surfaced as a NUMBER instead of stderr
    // noise: the ContextCleaner and broadcast-exchange threads race
    // cached-block release occasionally (Spark recomputes from lineage
    // and the job succeeds); a soak claiming composed correctness
    // should report how often that happened rather than hide it
    val taskRetries = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.reason != org.apache.spark.Success) taskRetries.incrementAndGet()
      })

    // ---- initial state -------------------------------------------------
    val t0 = System.nanoTime()
    val visible0 = enrich(spark.range(0, n, 1, nPart)
      .select(col("id").as("doc_id"), lit(0L).as("ver")))
      .localCheckpoint(true)
    val curated0 = curate(visible0).localCheckpoint(true)
    val nCents = math.max(16,
      math.sqrt(curated0.count().toDouble).toInt)
    val curEmb = curated0
      .select(col("doc_id").as("vec_id"), col("embedding"))
    // codebooks are fit ONCE on the initial curated corpus and stay
    // fixed — the serving pattern that makes the encode a pure row map
    val rm = ProductQuantization.fitResidual(curEmb, Dim,
      kCoarse = 64, coarseIters = 2, m = 4, kSub = 16, pqIters = 2)
    val codes0 = ProductQuantization.encodeResidual(curEmb, rm)
      .localCheckpoint(true)
    val g0 = Ivf.knnGraphBuild(curEmb, k, nCents, nProbe)
    val graph0 = Ivf.KnnGraphState(
      g0.ranked.localCheckpoint(true), g0.edges.localCheckpoint(true))
    graft.CacheTracker.releaseAll()
    // state crosses the micro-batch thread and the driver loop — same
    // AtomicReference discipline as streamingGraphRefresh
    val state = new java.util.concurrent.atomic.AtomicReference(
      (visible0, curated0, codes0, graph0))
    val buildSec = (System.nanoTime() - t0) / 1e9

    // ---- the one foreachBatch loop -------------------------------------
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Long, Long)] // seq, op, id, ver
    val pendingRelease = new java.util.concurrent.atomic.AtomicReference(
      Seq.empty[DataFrame])
    val genSec = scala.collection.mutable.ArrayBuffer.empty[Double]
    val storage = scala.collection.mutable.ArrayBuffer.empty[Long]
    val liveRdds = scala.collection.mutable.ArrayBuffer.empty[Int]
    val diskFiles = scala.collection.mutable.ArrayBuffer.empty[Long]
    val query = stream.toDF().toDF("seq", "op", "doc_id", "ver")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (pv, pc, pk, pg) = state.get()
        // in-batch resolution: the latest op per doc wins
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("seq").desc)
        val resolved = batch
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        val touched = resolved.select(col("doc_id")).distinct()
        val adds = enrich(resolved.where(col("op") === "add")
          .select(col("doc_id"), col("ver")))
        // affected fingerprints: the touched docs' OLD rows + the adds
        val affectedFps = pv.join(broadcast(touched), Seq("doc_id"))
          .select(col("fp"))
          .unionByName(adds.select(col("fp"))).distinct()
        // coalesce after every union: union CONCATENATES partition lists,
        // so an unbounded run would grow the state's task count by the
        // batch's partitions every generation (measured: ~800 partitions
        // by gen 25, with per-gen wall creeping from task overhead) —
        // coalesce merges map-side, no shuffle, count pinned at nPart
        val nextVisible = pv
          .join(broadcast(touched), Seq("doc_id"), "left_anti")
          .unionByName(adds)
          .coalesce(nPart)
          .localCheckpoint(true)
        // keeper re-resolution over ONLY the affected fingerprints
        val affectedRows = nextVisible
          .join(broadcast(affectedFps), Seq("fp"))
        val curatedAdd = gateRows(keepers(affectedRows))
        val nextCurated = pc
          .join(broadcast(affectedFps), Seq("fp"), "left_anti")
          .unionByName(curatedAdd)
          .coalesce(nPart)
          .localCheckpoint(true)
        // code table: drop the affected docs' codes, encode the new rows
        val removedIds = pc.join(broadcast(affectedFps), Seq("fp"))
          .select(col("doc_id").as("vec_id"))
        val nextCodes = pk
          .join(broadcast(removedIds), Seq("vec_id"), "left_anti")
          .unionByName(ProductQuantization.encodeResidual(
            curatedAdd.select(col("doc_id").as("vec_id"), col("embedding")),
            rm))
          .coalesce(nPart)
          .localCheckpoint(true)
        val ng = Ivf.knnGraphRefresh(pg,
          nextCurated.select(col("doc_id").as("vec_id"), col("embedding")),
          k, nCents, nProbe)
        val nextGraph = Ivf.KnnGraphState(
          ng.ranked.localCheckpoint(true), ng.edges.localCheckpoint(true))
        state.set((nextVisible, nextCurated, nextCodes, nextGraph))
        // release checkpointed blocks DEFERRED BY ONE GENERATION — the
        // r13 lesson (Dataset.unpersist alone leaves local-checkpoint
        // blocks to the ContextCleaner, one corpus-sized leak per gen)
        // plus a r14 one: releasing gen g−1 at the END of gen g raced
        // Spark's asynchronous broadcast-exchange threads, which can
        // still be draining blocks of the batch that just committed —
        // the run recovered via recompute but logged "Block does not
        // exist" retries. Holding exactly TWO generations (release g−2
        // when g commits) keeps storage O(1) and the race window empty.
        val retire = Seq(pv, pc, pk, pg.ranked, pg.edges)
        pendingRelease.getAndSet(retire).foreach(release)
        graft.CacheTracker.releaseAll()
      }
      .start()
    try {
      for (g <- 1 to gens) {
        val rows = (0 until perGen).map { j =>
          val seq = g.toLong * 1000000 + j
          if (j < 3000)
            (seq, "add", n + (g - 1).toLong * perGen + j, g.toLong)
          else if (j < 4000)
            (seq, "delete", (g.toLong * 7919 + j * 13) % n, 0L)
          else
            (seq, "add", (g.toLong * 104729 + j * 31) % n, g.toLong)
        }
        val t = System.nanoTime()
        stream.addData(rows)
        query.processAllAvailable()
        genSec += (System.nanoTime() - t) / 1e9
        storage += spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum
        liveRdds += spark.sparkContext.getPersistentRDDs.size
        System.gc() // outside the timed window: leaked vs cleaner-lag
        Thread.sleep(200)
        diskFiles += blockFileCount()
      }
    } finally query.stop()

    // ---- end-of-run parity: replay the WHOLE log through the batch
    // pipeline (initial corpus = seq 0 adds) and compare state sets ----
    val (_, curated, codes, graph) = state.get()
    val t1 = System.nanoTime()
    val logRows = spark.range(0, gens.toLong * perGen, 1, nPart).select(
      (col("id") / perGen + 1).cast("long").as("g"),
      (col("id") % perGen).cast("long").as("j"))
      .select(
        (col("g") * 1000000 + col("j")).as("seq"),
        when(col("j") < 3000, lit("add"))
          .when(col("j") < 4000, lit("delete"))
          .otherwise(lit("add")).as("op"),
        when(col("j") < 3000, lit(n) + (col("g") - 1) * perGen + col("j"))
          .when(col("j") < 4000, (col("g") * 7919 + col("j") * 13) % n)
          .otherwise((col("g") * 104729 + col("j") * 31) % n).as("doc_id"),
        when(col("j") >= 3000 && col("j") < 4000, lit(0L))
          .otherwise(col("g")).as("ver"))
    val fullLog = spark.range(0, n, 1, nPart)
      .select(lit(0L).as("seq"), lit("add").as("op"),
        col("id").as("doc_id"), lit(0L).as("ver"))
      .unionByName(logRows)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("seq").desc)
    val visibleB = enrich(fullLog
      .withColumn("rn", row_number().over(wAll)).where(col("rn") === 1)
      .where(col("op") === "add").select(col("doc_id"), col("ver")))
      .persist()
    val curatedB = curate(visibleB).persist()
    val curCols = Seq("doc_id", "ver", "source", "fp").map(col)
    val curMissing = curatedB.select(curCols: _*)
      .except(curated.select(curCols: _*)).count()
    val curExtra = curated.select(curCols: _*)
      .except(curatedB.select(curCols: _*)).count()
    val codesB = ProductQuantization.encodeResidual(
      curatedB.select(col("doc_id").as("vec_id"), col("embedding")), rm)
    val codeMissing = codesB.except(codes).count()
    val codeExtra = codes.except(codesB).count()
    val gB = Ivf.knnGraphBuild(
      curatedB.select(col("doc_id").as("vec_id"), col("embedding")),
      k, nCents, nProbe)
    val edgeMissing = gB.edges.except(graph.edges).count()
    val edgeExtra = graph.edges.except(gB.edges).count()
    val paritySec = (System.nanoTime() - t1) / 1e9
    val curatedCount = curated.count()
    val parityOk = curMissing == 0 && curExtra == 0 &&
      codeMissing == 0 && codeExtra == 0 &&
      edgeMissing == 0 && edgeExtra == 0
    require(parityOk,
      s"composed parity broke: curated -$curMissing/+$curExtra, " +
        s"codes -$codeMissing/+$codeExtra, edges -$edgeMissing/+$edgeExtra")
    val sorted = genSec.sorted
    def pct(p: Double) =
      sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
    println(
      s"""{"mode":"onlineloop","n":$n,"gens":$gens,"per_gen":$perGen,""" +
      s""""build_sec":${f"$buildSec%.1f"},""" +
      s""""gen_sec":[${genSec.map(x => f"$x%.1f").mkString(",")}],""" +
      s""""gen_p50_sec":${f"${pct(0.5)}%.1f"},""" +
      s""""gen_p99_sec":${f"${pct(0.99)}%.1f"},""" +
      s""""storage_mb":[${storage.map(_ / 1000000).mkString(",")}],""" +
      s""""live_rdds":[${liveRdds.mkString(",")}],""" +
      s""""disk_block_files":[${diskFiles.mkString(",")}],""" +
      s""""curated_count":$curatedCount,""" +
      s""""parity_sec":${f"$paritySec%.1f"},""" +
      s""""task_retries":${taskRetries.get()},""" +
      s""""composed_parity":$parityOk}""")
    spark.stop()
  }
}
