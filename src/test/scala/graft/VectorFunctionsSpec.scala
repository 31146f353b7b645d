package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Distance-metric edge semantics from FIXTURES.md §B
  * (reference core/hnsw/graph.py:24-43).
  */
class VectorFunctionsSpec extends SparkSpec {

  private def eval(c: org.apache.spark.sql.Column): Double =
    spark.range(1).select(c.as("v")).head().getDouble(0)

  private def arr(xs: Double*) = array(xs.map(lit): _*)

  test("euclidean matches hand-computed value") {
    assert(math.abs(eval(euclidean(arr(1, 2, 3), arr(4, 6, 3))) - 5.0) < 1e-12)
  }

  test("manhattan matches hand-computed value") {
    assert(math.abs(eval(manhattan(arr(1, -2), arr(-2, 2))) - 7.0) < 1e-12)
  }

  test("dot is negated: identical unit vectors give -1") {
    assert(math.abs(eval(negDot(arr(1, 0), arr(1, 0))) - (-1.0)) < 1e-12)
  }

  test("cosine of identical vectors is 0") {
    assert(math.abs(eval(cosine(arr(3, 4), arr(3, 4)))) < 1e-12)
  }

  test("cosine with a zero vector is exactly 1.0 (reference graph.py:33-34)") {
    assert(eval(cosine(arr(0, 0), arr(1, 2))) == 1.0)
    assert(eval(cosine(arr(1, 2), arr(0, 0))) == 1.0)
    assert(eval(cosine(arr(0, 0), arr(0, 0))) == 1.0)
  }

  test("cosine of opposite vectors is 2") {
    assert(math.abs(eval(cosine(arr(1, 0), arr(-1, 0))) - 2.0) < 1e-12)
  }

  test("l2Normalize produces unit norm; zero vector passes through") {
    assert(math.abs(eval(norm2(l2Normalize(arr(3, 4)))) - 1.0) < 1e-12)
    assert(eval(norm2(l2Normalize(arr(0, 0)))) == 0.0)
  }

  test("hasDim validates dimension (reference server.py:142-146)") {
    val df = spark.range(1).select(arr(1, 2, 3).as("v"))
    assert(df.where(hasDim(col("v"), 3)).count() == 1)
    assert(df.where(hasDim(col("v"), 128)).count() == 0)
  }

  test("SortedIntersectCount equals size(array_intersect) on sorted distinct longs") {
    // the ppjoin verify replacement: identical to the built-in on the
    // caller's contract (ascending, distinct), through codegen — the
    // frame below is wide enough that the projection compiles
    val bridge = org.apache.spark.sql.graftbridge.Bridge
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      def set() = rnd.shuffle((0L until 400L).toVector)
        .take(rnd.nextInt(80)).distinct.sorted
      (i.toLong, set(), set())
    } :+ ((200L, Vector.empty[Long], Vector(1L, 2L))) :+
      ((201L, Vector(5L), Vector(5L)))
    import spark.implicits._
    val df = rows.toDF("id", "a", "b")
    def cnt(c: org.apache.spark.sql.Column) = c.cast("long")
    val got = df.select(col("id"),
      bridge.column(graft.functions.SortedIntersectCount(
        bridge.expression(col("a")), bridge.expression(col("b")))).as("tp"),
      cnt(size(array_intersect(col("a"), col("b")))).as("ai"))
    assert(got.where(col("tp") =!= col("ai")).count() == 0)
  }
}
