package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.Bridge

/** SQL-surface registration: exposes the engine's native expressions to
  * `spark.sql(...)` users, so the library is callable from plain SQL, not
  * only the Column API:
  *
  *   SELECT graft_dot(a.embedding, b.embedding)        -- O4 dot (unnegated)
  *   SELECT sqrt(graft_sqdiff(a, b))                   -- O1 euclidean
  *   SELECT graft_absdiff(a, b)                        -- O3 manhattan
  *   SELECT graft_shingles(text, 3)                    -- word trigram set
  *   SELECT graft_minhash(graft_shingles(text, 3), 32) -- MinHash signature
  *
  * The literal-int arguments (n, numHashes) must be foldable literals.
  */
object GraftSqlFunctions {

  private def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e.eval(null) match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"expected integer literal, got $other")
    }

  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_dot",
      es => ArrayDotProduct(es(0), es(1)))
    Bridge.registerFunction(spark, "graft_sqdiff",
      es => ArraySumSquaredDiff(es(0), es(1)))
    Bridge.registerFunction(spark, "graft_absdiff",
      es => ArraySumAbsDiff(es(0), es(1)))
    Bridge.registerFunction(spark, "graft_shingles",
      es => WordShingles(es(0), intLit(es(1))))
    Bridge.registerFunction(spark, "graft_minhash",
      es => MinHashSignature(es(0), intLit(es(1))))
  }
}
