package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Knn

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` has a DuckDB-equivalent entry in `oracleSql`
  * (same column names, floats rounded identically on both sides) unless
  * the operator is not SQL-expressible, in which case the driver records
  * a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_cosine")(spark, "/root/testdata/sf0.001")

  /** The query vector: embedding of vec_id 0 (deterministic, exists at
    * every scale factor). */
  private def queryVec(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "knn_cosine" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Knn.knn(emb, "embedding", queryVec(s, dir), 10, Knn.Cosine, "vec_id")
        .select(col("vec_id"), col("label"), round(col("dist"), 5).as("dist"))
    }),

    "knn_euclidean" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Knn.knn(emb, "embedding", queryVec(s, dir), 10, Knn.Euclidean, "vec_id")
        .select(col("vec_id"), col("label"), round(col("dist"), 5).as("dist"))
    }),

    "radius_search" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Knn.radius(emb, "embedding", queryVec(s, dir), 0.45, Knn.Cosine)
        .select(col("vec_id"), col("label"), round(col("dist"), 5).as("dist"))
    }),

    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          count(lit(1)).as("cnt"))
    })
  )

  /** The shared distance expression both engines compute: double-cast
    * lists, sequential dot-product folds, clamped acos. */
  private val cosDistSql =
    """acos(least(greatest(
      |  list_dot_product(CAST(embedding AS DOUBLE[]), qvec) /
      |  (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) *
      |   sqrt(list_dot_product(qvec, qvec))), -1.0), 1.0)) / pi()""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "knn_cosine" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, round(d, 5) AS dist FROM (
         |  SELECT vec_id, label, $cosDistSql AS d FROM embeddings, q)
         |ORDER BY d, vec_id LIMIT 10""".stripMargin,

    "knn_euclidean" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id, label, round(d, 5) AS dist FROM (
        |  SELECT vec_id, label, list_distance(CAST(embedding AS DOUBLE[]), qvec) AS d
        |  FROM embeddings, q)
        |ORDER BY d, vec_id LIMIT 10""".stripMargin,

    "radius_search" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, round(d, 5) AS dist FROM (
         |  SELECT vec_id, label, $cosDistSql AS d FROM embeddings, q)
         |WHERE d <= 0.45""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
