package graft

import graft.functions.GraftSqlFunctions

/** The SQL registration surface: graft expressions callable from
  * spark.sql(...) and agreeing with the Column API.
  */
class SqlFunctionsSpec extends SparkSpec {

  test("registered functions evaluate from plain SQL") {
    GraftSqlFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS dot,
        |  sqrt(graft_sqdiff(array(1D, 2D), array(4D, 6D))) AS euclid,
        |  graft_absdiff(array(1D, -2D), array(-2D, 2D)) AS manhattan,
        |  graft_shingles('a b c d', 3) AS sh,
        |  size(graft_minhash(graft_shingles('a b c d', 3), 8)) AS sig_len,
        |  graft_zorder(3, 3) AS z
        |""".stripMargin).head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-12)
    assert(r.getDouble(2) == 7.0)
    assert(r.getSeq[String](3) == Seq("a b c", "b c d"))
    assert(r.getInt(4) == 8)
    assert(r.getLong(5) == 15L) // bits of 3 interleaved with 3 → 0b1111
  }

  test("SQL path agrees with the Column API on fixture data") {
    GraftSqlFunctions.register(spark)
    Tables.embeddings(spark, sfDir).limit(50).createOrReplaceTempView("e_sql")
    val sql = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS d FROM e_sql")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val colApi = Tables.embeddings(spark, sfDir).limit(50)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        graft.functions.VectorFunctions.dot(
          org.apache.spark.sql.functions.col("embedding"),
          org.apache.spark.sql.functions.col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sql == colApi)
  }
}
