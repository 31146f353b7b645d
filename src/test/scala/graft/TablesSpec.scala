package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Loader contract under fixture regeneration: the driver rewrites the
  * parquet fixtures between rounds and has already shipped `events.ts` in
  * two different physical shapes (INT64 nanos, then TIMESTAMP(MICROS)
  * NTZ). `Tables.events` must normalize every shape it has ever seen —
  * plus the plausible next one (µs adjusted-to-UTC) — to the SAME UTC
  * instants, or every events consumer fails at analysis like round 9's
  * benchmark did.
  */
class TablesSpec extends SparkSpec {

  // one event at 2026-01-02T03:04:05.123456 UTC and one at the epoch
  private val micros = Seq(1767323045123456L, 0L)

  private def writeVariant(kind: String): String = {
    val dir = Files.createTempDirectory(s"graft-events-$kind").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/events.parquet"
    val base = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    kind match {
      case "nanos_int64" =>
        // the original fixture generation: TIMESTAMP(NANOS) arrives in
        // Spark as a plain LongType column (legacy nanosAsLong read), so
        // the loader-visible shape IS an int64 nanos column
        val rows = base.map { case (id, us) => Row(id, us * 1000L) }
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("ts", LongType)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema)
          .write.mode("overwrite").parquet(path)
      case "micros_ntz" =>
        // the current generation: TIMESTAMP(MICROS) isAdjustedToUTC=false
        val rows = base.map { case (id, us) =>
          Row(id, java.time.LocalDateTime.ofEpochSecond(
            us / 1000000L, (us % 1000000L).toInt * 1000,
            java.time.ZoneOffset.UTC))
        }
        val schema = StructType(Seq(
          StructField("event_id", LongType),
          StructField("ts", TimestampNTZType)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema)
          .write.mode("overwrite").parquet(path)
      case "micros_utc" =>
        // a plausible future generation: µs adjusted to UTC (Spark's own
        // default TimestampType writer output)
        val rows = base.map { case (id, us) =>
          val t = new Timestamp(us / 1000L)
          t.setNanos((us % 1000000L).toInt * 1000)
          Row(id, t)
        }
        val schema = StructType(Seq(
          StructField("event_id", LongType), StructField("ts", TimestampType)))
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), schema)
          .write.mode("overwrite").parquet(path)
    }
    dir.getAbsolutePath
  }

  test("events loader normalizes every shipped ts shape to the same UTC instants") {
    val shapes = Seq("nanos_int64", "micros_ntz", "micros_utc")
    val results = shapes.map { kind =>
      val df = Tables.events(spark, writeVariant(kind))
      assert(df.schema("ts").dataType === TimestampType,
        s"$kind must normalize to session-zone TIMESTAMP")
      kind -> df.selectExpr("event_id", "unix_micros(ts) AS us")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    results.foreach { case (kind, got) =>
      assert(got === expected, s"shape $kind drifted from the fixture instants")
    }
  }

  test("real fixture loads and carries non-null UTC timestamps") {
    val df = Tables.events(spark, sfDir)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.filter("ts IS NULL").count() === 0L)
  }

  // ---- generalized drift defense (round-11: every table, not just events)

  private def writeDrifted(name: String, df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory(s"graft-drift-$name").toFile
    dir.deleteOnExit()
    df.coalesce(1).write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/$name.parquet")
    dir.getAbsolutePath
  }

  test("embeddings loader absorbs float/double element drift, widened label, reordered + extra columns") {
    import spark.implicits._
    val canonical = Seq(
      (1L, Seq(0.5, 0.25), 3), (2L, Seq(1.0, -0.5), 4))
    // variant A: double elements (future drift), label widened to int64,
    // columns REORDERED, plus an unknown extra column
    val a = canonical
      .map { case (id, e, l) => (l.toLong, e, "junk", id) }
      .toDF("label", "embedding", "extra", "vec_id")
    // variant B: the current generation (float elements, int32 label)
    val b = canonical
      .map { case (id, e, l) => (id, e.map(_.toFloat), l) }
      .toDF("vec_id", "embedding", "label")
    val out = Seq(writeDrifted("embeddings", a), writeDrifted("embeddings", b))
      .map { d =>
        val df = Tables.embeddings(spark, d)
        assert(df.columns.toSeq === Seq("vec_id", "embedding", "label"))
        assert(df.schema("embedding").dataType ===
          ArrayType(DoubleType, containsNull = true))
        assert(df.schema("label").dataType === IntegerType)
        df.orderBy("vec_id").collect()
          .map(r => (r.getLong(0), r.getSeq[Double](1), r.getInt(2))).toSeq
      }
    assert(out.head === out(1), "drifted variants must load identically")
  }

  test("TPC-H loader restores canonical int widths and column order after drift") {
    import spark.implicits._
    // nation with widened keys and shuffled column order
    val drifted = Seq((0L, 0L, "ALGERIA"), (1L, 1L, "ARGENTINA"))
      .toDF("n_regionkey", "n_nationkey", "n_name")
    val df = Tables.nation(spark, writeDrifted("nation", drifted))
    assert(df.columns.toSeq === Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(df.schema("n_nationkey").dataType === IntegerType)
    assert(df.schema("n_regionkey").dataType === IntegerType)
    assert(df.orderBy("n_nationkey").collect().map(_.getString(1)).toSeq ===
      Seq("ALGERIA", "ARGENTINA"))
  }

  test("schemaNotes: silent for absorbable drift, loud for missing/extra/inconvertible") {
    val canonicalNation = StructType(Seq(
      StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    assert(Tables.schemaNotes("nation", canonicalNation).isEmpty)
    val widened = StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    assert(Tables.schemaNotes("nation", widened).isEmpty, "numeric width is absorbable")
    val broken = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", ArrayType(IntegerType)), // not convertible
      StructField("n_comment", StringType)))      // extra; n_regionkey missing
    val notes = Tables.schemaNotes("nation", broken)
    assert(notes.exists(_.contains("n_regionkey MISSING")))
    assert(notes.exists(_.contains("n_comment unknown extra")))
    assert(notes.exists(_.contains("n_name type")))
  }

  test("fixtureDrift canary: clean on the real fixtures") {
    assert(Tables.fixtureDrift(spark, sfDir) === Seq.empty)
  }
}
