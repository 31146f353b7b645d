package graft

import org.apache.spark.sql.functions._

import graft.operators.{BinaryQuantization, Knn}
import graft.functions.VectorFunctions

/** 1-bit sign quantization invariants: packing parity against a plain
  * Scala reference, Hamming algebra, partial-word / constant-vector
  * edges, and two-stage ANN recall.
  */
class BinaryQuantizationSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  /** Plain-Scala reference packing: bit j of word w = dim w*32+j above
    * the vector's sequential-sum mean, LSB-first.
    */
  private def refWords(v: Seq[Double], nWords: Int): Seq[Long] = {
    val mu = v.foldLeft(0.0)(_ + _) / v.size
    (0 until nWords).map { w =>
      (0 until BinaryQuantization.BitsPerWord).foldLeft(0L) { (acc, j) =>
        val i = w * BinaryQuantization.BitsPerWord + j
        if (i < v.size && v(i) > mu) acc + (1L << j) else acc
      }
    }
  }

  test("packed words match the plain-Scala reference on real fixtures") {
    val rows = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .orderBy(col("vec_id")).limit(20).collect()
    val got = BinaryQuantization.bqEncode(emb, dim = 64)
      .orderBy(col("vec_id")).limit(20).collect()
    rows.zip(got).foreach { case (r, g) =>
      val v = r.getAs[scala.collection.Seq[Double]](1).toSeq
      assert(g.getAs[scala.collection.Seq[Long]]("words").toSeq == refWords(v, 2),
        s"vec_id=${r.getLong(0)}")
    }
  }

  test("words fit 32 bits and n_set sums to the above-mean dim count") {
    val enc = BinaryQuantization.bqEncode(emb, dim = 64)
    assert(enc.where(exists(col("words"), w => w < 0L || w >= (1L << 32))).count() == 0)
    val stats = BinaryQuantization.bqStats(emb, dim = 64)
      .groupBy(col("vec_id")).agg(sum(col("n_set")).as("n_set"))
    val above = emb
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("mu", aggregate(col("v"), lit(0.0), _ + _) / size(col("v")))
      .select(col("vec_id"),
        size(filter(col("v"), x => x > col("mu"))).cast("long").as("expect"))
    val mismatches = stats.join(above, "vec_id")
      .where(col("n_set") =!= col("expect")).count()
    assert(mismatches == 0)
  }

  test("hamming: zero on self, symmetric, equals brute-force bit diff") {
    import spark.implicits._
    val pairs = Seq(
      (Seq(5L, 0L), Seq(5L, 0L), 0L),
      (Seq(0xFFL, 0L), Seq(0L, 0L), 8L),
      (Seq(0xF0F0L, 3L), Seq(0x0F0FL, 1L), 17L))
    pairs.foreach { case (a, b, want) =>
      val df = Seq((a, b)).toDF("a", "b")
      val d = df.select(
        BinaryQuantization.hamming(col("a"), col("b")).as("d"),
        BinaryQuantization.hamming(col("b"), col("a")).as("dr")).collect().head
      assert(d.getLong(0) == want && d.getLong(1) == want)
    }
  }

  test("partial word: 5-dim vector uses one word, upper bits zero") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, -1.0, 2.0, -2.0, 0.5))).toDF("vec_id", "embedding")
    // mean 0.1 -> bits set at dims 0, 2, 4 -> word = 1 + 4 + 16 = 21
    val words = BinaryQuantization.bqEncode(df, dim = 5)
      .collect().head.getAs[scala.collection.Seq[Long]]("words")
    assert(words.toSeq == Seq(21L))
  }

  test("constant vector packs to all-zero words (strict > against own mean)") {
    import spark.implicits._
    val df = Seq((1L, Seq.fill(64)(0.25))).toDF("vec_id", "embedding")
    val words = BinaryQuantization.bqEncode(df, dim = 64)
      .collect().head.getAs[scala.collection.Seq[Long]]("words")
    assert(words.toSeq == Seq(0L, 0L))
  }

  test("batch face: query 0's rows equal the single-query face") {
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val single = BinaryQuantization.bqKnn(emb, q, k = 10, candFactor = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val batchQ = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val batch = BinaryQuantization.bqKnnBatch(emb, batchQ, k = 10, candFactor = 8)
      .where(col("query_id") === 0).orderBy(col("rank"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(batch == single)
    // every query yields exactly k ranked rows
    val counts = BinaryQuantization.bqKnnBatch(emb, batchQ, k = 10, candFactor = 8)
      .groupBy(col("query_id")).count().collect()
    assert(counts.length == 5 && counts.forall(_.getLong(1) == 10))
  }

  test("batch face plans as bounded topk aggregates, never a window") {
    val batchQ = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val plan = BinaryQuantization.bqKnnBatch(emb, batchQ, k = 10, candFactor = 8)
      .queryExecution.executedPlan.toString
    // candidate cut (k*candFactor=80) and rerank (k=10), both map-side
    assert("partial_graft_topk\\([^)]*, 80,".r.findAllIn(plan).nonEmpty, plan)
    assert("partial_graft_topk\\([^)]*, 10,".r.findAllIn(plan).nonEmpty, plan)
    assert(!plan.contains("row_number"), s"window leaked into:\n$plan")
  }

  test("bq->sq8 composition: survivors only, SQ8 distances, covers to pure sq8") {
    import graft.operators.Quantization
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val res = BinaryQuantization.bqSq8Knn(emb, q, k = 10, candFactor = 8)
      .collect()
    assert(res.length == 10)
    // every returned distance is the SQ8 asymmetric euclidean for its id
    val sq8All = Quantization.sq8Knn(emb, q, k = 1000)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    res.foreach { r =>
      assert(sq8All(r.getLong(0)) == r.getAs[Double]("distance"),
        s"id ${r.getLong(0)}")
    }
    // candFactor covering the corpus: the composition IS sq8Knn
    val n = emb.count().toInt
    val full = BinaryQuantization
      .bqSq8Knn(emb, q, k = 10, candFactor = (n + 9) / 10)
      .collect().map(r => (r.getLong(0), r.getAs[Double]("distance")))
    val sq8Top = Quantization.sq8Knn(emb, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(full.toSeq == sq8Top.toSeq)
  }

  test("two-stage bq ANN recalls >= 6 of the exact cosine top-10") {
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qv"))
    val exact = Knn.knn(emb, q, 10, VectorFunctions.cosine)
      .collect().map(_.getLong(0)).toSet
    val bq = BinaryQuantization.bqKnn(emb, q, k = 10, candFactor = 8)
      .collect().map(_.getLong(0)).toSet
    assert((exact & bq).size >= 6, s"exact=$exact bq=$bq")
    // the query itself is in the corpus: hamming 0, distance 0, always kept
    assert(bq.contains(0L))
  }

  test("candFactor sizing rule: weighted occupancy, monotone, loud ceiling") {
    import BinaryQuantization.candFactorFor
    // uniform 10 cells of 100: a random query's cluster holds 100 rows;
    // recall 0.5 of a top-10 needs a 50-row shortlist -> candFactor 5
    assert(candFactorFor(Seq.fill(10)(100L), k = 10, targetRecall = 0.5) == 5)
    // skew matters MEMBERSHIP-weighted: (900,100) -> a random row sits
    // in the 900-cell with p=0.9, occupancy 0.9*900 + 0.1*100 = 820
    assert(candFactorFor(Seq(900L, 100L), k = 10, targetRecall = 0.2) == 17)
    // monotone in the target
    val cfs = Seq(0.1, 0.3, 0.6, 0.9)
      .map(t => candFactorFor(Seq.fill(4)(1000L), 10, t, maxCandFactor = 1000))
    assert(cfs == cfs.sorted && cfs.distinct.size == cfs.size)
    // floor at 1 for tiny clusters
    assert(candFactorFor(Seq.fill(100)(2L), k = 10, targetRecall = 0.9) == 1)
    // above the cost ceiling the rule REFUSES with the wrong-tool signal
    val e = intercept[IllegalArgumentException] {
      candFactorFor(Seq(100000L), k = 10, targetRecall = 0.5,
        maxCandFactor = 64)
    }
    assert(e.getMessage.contains("PQ/SQ8"), e.getMessage)
    // the measured face is deterministic on the fixture and feeds the rule
    val a = BinaryQuantization.autoCandFactor(emb, k = 10,
      targetRecall = 0.5, kCells = 8, iterations = 2)
    val b = BinaryQuantization.autoCandFactor(emb, k = 10,
      targetRecall = 0.5, kCells = 8, iterations = 2)
    assert(a == b && a >= 1)
  }
}
