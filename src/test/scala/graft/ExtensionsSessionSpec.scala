package graft

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

/** GraftExtensions as the single integration point: a session built with
  * the extension gets the SQL function surface AND the HOF rewrite rule
  * without any further registration calls.
  */
class ExtensionsSessionSpec extends SparkSpec {

  test("a withExtensions session exposes graft_* SQL functions and the rewrite") {
    val base = spark // force the shared session to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions().apply _)
      .getOrCreate()
    try {
      assert(s2 ne base) // extensions demand a fresh session over the same context
      val v = s2.sql("SELECT graft_dot(array(1.0,2.0), array(3.0,4.0)) AS d")
        .collect()(0).getDouble(0)
      assert(v == 11.0)
      val sh = s2.sql("SELECT graft_shingles('a b c d', 3) AS s")
        .collect()(0).getAs[scala.collection.Seq[String]](0)
      assert(sh == Seq("a b c", "b c d"))
      // the optimizer rule is active without GraftExtensions.install
      val dir = java.nio.file.Files.createTempDirectory("graft_ext").toString
      import s2.implicits._
      Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
        .write.mode("overwrite").parquet(dir)
      val q = s2.read.parquet(dir).selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, t) -> s + t) AS v")
      assert(q.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.functions.ArrayDotProduct])))
      assert(q.collect()(0).getDouble(0) == 11.0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
