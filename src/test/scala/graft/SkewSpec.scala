package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting must be a pure performance transform: identical results to the
  * unsalted plan.
  */
class SkewSpec extends SparkSpec {

  test("saltedJoin equals plain join on a skewed key") {
    import spark.implicits._
    // 10k rows, 90% on key 1 — the hot-key shape salting exists for
    val big = spark.range(10000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 7).as("k"))
    val small = Seq((0L, "zero"), (1L, "hot"), (2L, "two"), (3L, "three"))
      .toDF("k", "label")
    val salted = Skew.saltedJoin(big, small, key = "k", entropy = "id", saltFactor = 8)
      .select("id", "k", "label")
    val plain = big.join(small, Seq("k")).select("id", "k", "label")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedCount equals plain count per key") {
    val big = spark.range(20000)
      .select(col("id"), (col("id") % 3).as("k"))
    val salted = Skew.saltedCount(big, key = "k", entropy = "id", saltFactor = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = big.groupBy("k").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
