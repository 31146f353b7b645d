package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Knn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is an operator from SURVEY.md §2 (or a planned
  * extension op); every exact operator also registers equivalent DuckDB SQL
  * in `oracleSql`. Approximate operators (HNSW/LSH) are recall-gated in
  * ScalaTest instead and register rows-only checks (no oracle entry).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact cosine kNN — the reference's `POST /search` hot path
    * (reference api/rest/server.py:159-186) as a Spark top-k plan.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_cosine")(spark, "/root/testdata/sf0.001")

  // ---- shared query fixtures (deterministic; FIXTURES.md rules) ----------

  /** Single query vector: the embedding of vec_id 0 — deterministic and
    * readable identically by DuckDB from the same parquet.
    */
  private def queryVec(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .where(col("vec_id") === 0)
      .select(col("embedding").as("qv"))

  /** Query batch: the five lowest vec_ids. */
  private def queryBatch(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  private def knnByMetric(metric: String)(spark: SparkSession, dir: String): DataFrame =
    Knn.knn(
      Tables.embeddings(spark, dir),
      queryVec(spark, dir),
      k = 10,
      metric = VectorFunctions.byName(metric))

  // ---- the query surface -------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O2+O5+A2: the reference search default (metric=cosine, k=10;
    // api/rest/server.py:93-99 defaults, :33 k default)
    "knn_cosine" -> ((s, d) => knnByMetric("cosine")(s, d)),
    // O1: euclidean metric variant (graph.py:24-26)
    "knn_euclidean" -> ((s, d) => knnByMetric("euclidean")(s, d)),
    // O3: manhattan metric variant (graph.py:37-39)
    "knn_manhattan" -> ((s, d) => knnByMetric("manhattan")(s, d)),
    // O4: negated-dot metric variant (graph.py:41-43)
    "knn_dot" -> ((s, d) => knnByMetric("dot_product")(s, d)),
    // A2 metadata join (server.py:170-177)
    "knn_with_metadata" -> ((s, d) =>
      Knn.knnWithMetadata(
        Tables.embeddings(s, d),
        queryVec(s, d),
        metadata = Tables.embeddings(s, d).select(col("vec_id"), col("label")),
        k = 10,
        metric = VectorFunctions.cosine)),
    // batched A2 (generalizes server.py:202-230's sequential loop)
    "knn_batch" -> ((s, d) =>
      Knn.knnBatch(
        Tables.embeddings(s, d),
        queryBatch(s, d),
        k = 10,
        metric = VectorFunctions.cosine)
        .withColumn("rank", col("rank").cast("long"))),
    // extension: predicate + top-k (SURVEY §2.5)
    "filtered_knn" -> ((s, d) =>
      Knn.filteredKnn(
        Tables.embeddings(s, d),
        queryVec(s, d),
        predicate = col("label") === 3,
        k = 10,
        metric = VectorFunctions.cosine)),
    // extension: all within radius (SURVEY §2.5)
    "range_search" -> ((s, d) =>
      Knn.rangeSearch(
        Tables.embeddings(s, d),
        queryVec(s, d),
        radius = 0.75,
        metric = VectorFunctions.cosine)),
    // O9+A3: delete as anti-join (graph.py:191-207)
    "delete" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Knn.delete(emb, emb.where(col("vec_id") % 7 === 0).select(col("vec_id")))
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))
    }),
    // O10+A5: stats aggregate (graph.py:209-234)
    "stats" -> ((s, d) => Knn.stats(Tables.embeddings(s, d))),
  )

  // ---- DuckDB oracle SQL -------------------------------------------------

  private object Sql {
    val E = "embeddings"
    def dot(a: String, b: String): String =
      s"list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2]))"
    def norm(a: String): String =
      s"sqrt(list_sum(list_transform($a, x -> x * x)))"
    def dist(metric: String, a: String, b: String): String = metric match {
      case "euclidean" =>
        s"sqrt(list_sum(list_transform(list_zip($a, $b), p -> (p[1] - p[2]) * (p[1] - p[2]))))"
      case "manhattan" =>
        s"list_sum(list_transform(list_zip($a, $b), p -> abs(p[1] - p[2])))"
      case "dot_product" => s"-${dot(a, b)}"
      case "cosine" =>
        s"CASE WHEN ${norm(a)} * ${norm(b)} = 0 THEN 1.0 " +
          s"ELSE 1.0 - ${dot(a, b)} / (${norm(a)} * ${norm(b)}) END"
    }
    /** WITH clause providing q(qv) = the vec_id-0 embedding as DOUBLE[]. */
    val withQ = s"WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM $E WHERE vec_id = 0)"
    def knnSql(metric: String): String =
      s"""$withQ
         |SELECT e.vec_id, round(${dist(metric, "e.embedding::DOUBLE[]", "q.qv")}, 6) AS distance
         |FROM $E e, q
         |ORDER BY distance, vec_id
         |LIMIT 10""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "knn_cosine" -> Sql.knnSql("cosine"),
    "knn_euclidean" -> Sql.knnSql("euclidean"),
    "knn_manhattan" -> Sql.knnSql("manhattan"),
    "knn_dot" -> Sql.knnSql("dot_product"),
    "knn_with_metadata" ->
      s"""${Sql.withQ},
         |topk AS (
         |  SELECT e.vec_id, round(${Sql.dist("cosine", "e.embedding::DOUBLE[]", "q.qv")}, 6) AS distance
         |  FROM ${Sql.E} e, q
         |  ORDER BY distance, vec_id
         |  LIMIT 10)
         |SELECT t.vec_id, t.distance, m.label
         |FROM topk t LEFT JOIN ${Sql.E} m USING (vec_id)
         |ORDER BY t.distance, t.vec_id""".stripMargin,
    "knn_batch" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM ${Sql.E} WHERE vec_id < 5),
         |pairs AS (
         |  SELECT q.query_id, e.vec_id,
         |         round(${Sql.dist("cosine", "e.embedding::DOUBLE[]", "q.qv")}, 6) AS distance
         |  FROM ${Sql.E} e, q),
         |ranked AS (
         |  SELECT query_id, vec_id, distance,
         |         row_number() OVER (PARTITION BY query_id ORDER BY distance, vec_id) AS rank
         |  FROM pairs)
         |SELECT query_id, vec_id, distance, rank FROM ranked WHERE rank <= 10""".stripMargin,
    "filtered_knn" ->
      s"""${Sql.withQ}
         |SELECT e.vec_id, round(${Sql.dist("cosine", "e.embedding::DOUBLE[]", "q.qv")}, 6) AS distance
         |FROM ${Sql.E} e, q
         |WHERE e.label = 3
         |ORDER BY distance, vec_id
         |LIMIT 10""".stripMargin,
    "range_search" ->
      s"""${Sql.withQ}
         |SELECT vec_id, distance FROM (
         |  SELECT e.vec_id, round(${Sql.dist("cosine", "e.embedding::DOUBLE[]", "q.qv")}, 6) AS distance
         |  FROM ${Sql.E} e, q)
         |WHERE distance <= 0.75
         |ORDER BY distance, vec_id""".stripMargin,
    "delete" ->
      s"""SELECT vec_id, label FROM ${Sql.E}
         |WHERE vec_id NOT IN (SELECT vec_id FROM ${Sql.E} WHERE vec_id % 7 = 0)
         |ORDER BY vec_id""".stripMargin,
    "stats" ->
      s"""SELECT label, count(*) AS n_vectors,
         |       round(avg(${Sql.norm("embedding::DOUBLE[]")}), 6) AS avg_norm,
         |       min(vec_id) AS min_id, max(vec_id) AS max_id
         |FROM ${Sql.E}
         |GROUP BY label
         |ORDER BY label""".stripMargin,
  )
}
