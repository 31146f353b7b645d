package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{ArrayDotProduct, ArraySumAbsDiff, ArraySumSquaredDiff}
import graft.plans.GraftExtensions

/** HofVectorMathRewrite: lambda-form vector folds become the native
  * codegen'd expressions, with identical results.
  */
class HofRewriteSpec extends SparkSpec {

  private def optimizedHas(df: DataFrame, p: Class[_]): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists(p.isInstance(_)))

  private lazy val df = {
    import spark.implicits._
    GraftExtensions.install(spark)
    // parquet round-trip: over a LocalRelation the optimizer constant-folds
    // the whole projection away before the rewrite is observable
    val dir = java.nio.file.Files.createTempDirectory("graft_hof").toString
    Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
        (Seq(0.5, 0.0, -1.0), Seq(1.0, -2.0, 3.0))).toDF("a", "b")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).orderBy(col("a")(0).desc) // (1,2,3) row first
  }

  test("dot lambda rewrites to graft_dot and matches the HOF value") {
    val q = df.selectExpr("aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, t) -> s + t) AS v")
    assert(optimizedHas(q, classOf[ArrayDotProduct]), q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(_.getDouble(0)).toSeq == Seq(32.0, -2.5))
  }

  test("squared-diff lambda rewrites to graft_sqdiff") {
    val q = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D, (s, t) -> s + t) AS v")
    assert(optimizedHas(q, classOf[ArraySumSquaredDiff]), q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(_.getDouble(0)).toSeq == Seq(27.0, 20.25))
  }

  test("abs-diff lambda rewrites to graft_absdiff") {
    val q = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0D, (s, t) -> s + t) AS v")
    assert(optimizedHas(q, classOf[ArraySumAbsDiff]), q.queryExecution.optimizedPlan.toString)
    assert(q.collect().map(_.getDouble(0)).toSeq == Seq(9.0, 6.5))
  }

  test("non-matching lambdas are left alone") {
    val q = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y + 1.0), 0D, (s, t) -> s + t) AS v")
    assert(!optimizedHas(q, classOf[ArrayDotProduct]))
    val q2 = df.selectExpr( // non-zero seed must not rewrite
      "aggregate(zip_with(a, b, (x, y) -> x * y), 1D, (s, t) -> s + t) AS v")
    assert(!optimizedHas(q2, classOf[ArrayDotProduct]))
  }
}
