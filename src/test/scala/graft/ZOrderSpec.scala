package graft

import org.apache.spark.sql.functions._

import graft.functions.{InterleaveBits, VectorFunctions}
import graft.sources.Storage

/** Morton clustering: expression correctness + the layout property it
  * exists for — z-ordered files are tight on BOTH dimensions, while a
  * single-column sort is tight on one and full-span on the other.
  */
class ZOrderSpec extends SparkSpec {

  test("morton interleave: bit i of a at 2i, bit i of b at 2i+1") {
    assert(InterleaveBits.morton(0L, 0L) == 0L)
    assert(InterleaveBits.morton(1L, 0L) == 1L)
    assert(InterleaveBits.morton(0L, 1L) == 2L)
    assert(InterleaveBits.morton(3L, 3L) == 15L)
    assert(InterleaveBits.morton(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(InterleaveBits.morton(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
    // monotone in each arg with the other fixed (locality property)
    val xs = Seq(0L, 1L, 5L, 100L, 65535L)
    xs.sliding(2).foreach { case Seq(a, b) =>
      assert(InterleaveBits.morton(a, 7L) < InterleaveBits.morton(b, 7L))
      assert(InterleaveBits.morton(7L, a) < InterleaveBits.morton(7L, b))
    }
  }

  test("zorder expression matches the scala impl through codegen") {
    import spark.implicits._
    val rows = Seq((3L, 5L), (1499L, 19752L), (0L, 0L), (65535L, 1L))
    val got = rows.toDF("a", "b")
      .select(VectorFunctions.zorder(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == rows.map { case (a, b) => InterleaveBits.morton(a, b) })
  }

  test("z-ordered layout is tight on BOTH dims; single-sort is not") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id").cast("long").as("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))

    // span fraction of each dimension covered by an average range partition
    def spanFractions(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val parts = df
        .withColumn("pid", spark_partition_id())
        .groupBy(col("pid"))
        .agg(min("user_id").as("u0"), max("user_id").as("u1"),
          min("day").as("d0"), max("day").as("d1"))
        .collect()
      val (uMin, uMax) = (parts.map(_.getAs[Long]("u0")).min, parts.map(_.getAs[Long]("u1")).max)
      val (dMin, dMax) = (parts.map(_.getAs[Long]("d0")).min, parts.map(_.getAs[Long]("d1")).max)
      val uSpan = math.max(uMax - uMin, 1L).toDouble
      val dSpan = math.max(dMax - dMin, 1L).toDouble
      (parts.map(p => (p.getAs[Long]("u1") - p.getAs[Long]("u0")) / uSpan).sum / parts.length,
        parts.map(p => (p.getAs[Long]("d1") - p.getAs[Long]("d0")) / dSpan).sum / parts.length)
    }

    val n = 8
    val zed = Storage.withZCode(ev, col("user_id"), col("day"))
      .repartitionByRange(n, col("zcode"))
    val byDay = ev.repartitionByRange(n, col("day"))

    val (zU, zD) = spanFractions(zed)
    val (sU, sD) = spanFractions(byDay)
    // single-dim sort: day tight, user_id ~full span per partition
    assert(sU > 0.9, s"expected full user span under day sort, got $sU")
    // z-order: BOTH dims partial
    assert(zU < 0.75, s"z-order user span fraction $zU not < 0.75")
    assert(zD < 0.75, s"z-order day span fraction $zD not < 0.75")
    assert(zU < sU, s"z-order ($zU) should beat day-sort ($sU) on user span")
  }

  test("zorderWrite round-trips and keeps the code column sorted per file") {
    val path = java.nio.file.Files.createTempDirectory("zorder").toString
    Storage.zorderWrite(
      Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day")),
      col("user_id"), col("day"), path, nFiles = 4)
    val back = spark.read.parquet(path)
    assert(back.count() == Tables.events(spark, sfDir).count())
    assert(back.columns.contains("zcode"))
  }
}
