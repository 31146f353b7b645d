package graft

import org.apache.spark.sql.SparkSession

/** In-window A/B harness: cross-window bench totals on this VM are noise
  * (seconds-long host bursts), so variant comparisons run INTERLEAVED in
  * ONE JVM — seven reps per side, A/B order alternating per rep to kill
  * warm-cache bias, median of the seven — and the decision is the
  * in-window delta only (median-of-3 proved too noisy: it flipped the
  * sign of a ~20% effect run to run).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... java ... graft.AbBench
  * Prints one JSON line per (query, variant) with the median seconds.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (args.contains("explain")) {
      // plan probe: does exchange reuse already dedupe the self-join
      // sides when the prefix persist is off?
      for (setting <- Seq("true", "false")) {
        spark.conf.set("spark.graft.dedup.prefixPersist", setting)
        val df = SparkEntry.queries("winnow_pairs")(spark, sfDir)
        df.count()
        val plan = df.queryExecution.executedPlan.toString
        println(s"persist=$setting reused=" +
          "ReusedExchange".r.findAllIn(plan).length +
          " exchanges=" + "Exchange".r.findAllIn(plan).length +
          " inmem=" + "InMemoryTableScan".r.findAllIn(plan).length)
        CacheTracker.releaseAll()
      }
      spark.stop()
      return
    }
    // (experiment, conf key, query names)
    val experiments = Seq(
      ("prefixPersist", "spark.graft.dedup.prefixPersist",
        Seq("winnow_pairs", "fuzzy_pairs", "dedup_ngram_jaccard")))

    // warmup + page cache
    try SparkEntry.queries("knn_cosine")(spark, sfDir).count()
    catch { case _: Throwable => () }
    Seq(Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir))
      .foreach(t => try t.foreach(_ => ()) catch { case _: Throwable => () })

    val samples = scala.collection.mutable.Map
      .empty[(String, String, String), Vector[Double]].withDefaultValue(Vector.empty)
    for {
      rep <- 0 until 7
      (exp, confKey, queries) <- experiments
      setting <- (if (rep % 2 == 0) Seq("true", "false") else Seq("false", "true"))
      name <- queries
    } {
      spark.conf.set(confKey, setting)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable => println(s"ERR $name: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      CacheTracker.releaseAll()
      samples((exp, setting, name)) = samples((exp, setting, name)) :+ dt
      spark.conf.unset(confKey)
    }
    for (((exp, setting, name), v) <- samples.toSeq.sortBy(_._1)) {
      val med = v.sorted.apply(v.length / 2)
      println(f"""{"experiment":"$exp","setting":$setting,"query":"$name","median_sec":$med%.3f,"reps":[${v.map(x => f"$x%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
