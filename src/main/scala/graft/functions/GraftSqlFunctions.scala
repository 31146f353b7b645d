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
  *   SELECT graft_zorder(user_id, day)                 -- Morton clustering code
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

  /** SQL numeric-array literals arrive as DECIMAL arrays; the natives read
    * doubles, and ExpectsInputTypes (implicit coercion) is private[sql] —
    * so cast defensively here, exactly as the Column API callers do.
    */
  private def asDoubles(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))

  /** Name → expression builder, shared by runtime registration (below) and
    * session-extension injection (plans.GraftExtensions).
    */
  val builders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "graft_dot" -> (es => ArrayDotProduct(asDoubles(es(0)), asDoubles(es(1)))),
    "graft_sqdiff" -> (es => ArraySumSquaredDiff(asDoubles(es(0)), asDoubles(es(1)))),
    "graft_absdiff" -> (es => ArraySumAbsDiff(asDoubles(es(0)), asDoubles(es(1)))),
    "graft_l2normalize" -> (es => ArrayL2Normalize(asDoubles(es(0)))),
    "graft_shingles" -> (es => WordShingles(es(0), intLit(es(1)))),
    "graft_minhash" -> (es => MinHashSignature(es(0), intLit(es(1)))),
    "graft_zorder" -> (es => InterleaveBits(
      org.apache.spark.sql.catalyst.expressions.Cast(
        es(0), org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.catalyst.expressions.Cast(
        es(1), org.apache.spark.sql.types.LongType))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      Bridge.registerFunction(spark, name, b)
    }
}
