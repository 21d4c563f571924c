package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Quantization, Vectors}
import graft.operators.{Crud, Knn}
import graft.query.FilterCompiler

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

    "knn_batch" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Knn.knnBatch(emb, "embedding", qs, 5, Knn.Cosine, "vec_id")
        .select(col("qid"), col("vec_id"), col("rank"),
          round(col("dist"), 5).as("dist"))
    }),

    "list_records" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Knn.listRecords(docs, "doc_id", Some(col("n_chars") >= 200), 20, 10)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),

    "quantize" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val err = Quantization.reconstructionError(col("embedding"), 8)
      emb.select(col("vec_id"),
        round(array_max(err), 7).as("max_err"),
        round(aggregate(err, lit(0.0), (a, x) => a + x) / size(col("embedding")), 7).as("mean_err"))
    }),

    "upsert_crud" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val base = docs.select(col("doc_id"), col("source"), col("n_chars"),
        lit(0L).as("version"))
      val upd = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), lit("updated").as("source"), col("n_chars"),
          lit(1L).as("version"))
      val tombstones = docs.filter(col("doc_id") % 17 === 0).select(col("doc_id"))
      Crud.delete(Crud.upsert(base, upd, "doc_id", "version"), tombstones, "doc_id")
    }),

    "collection_stats" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val sample = emb.filter(col("vec_id") < 32)
        .select(col("vec_id"), col("embedding"))
      val a = sample.select(col("vec_id").as("i"), col("embedding").as("va"))
      val b = sample.select(col("vec_id").as("j"), col("embedding").as("vb"))
      val pairs = a.join(broadcast(b), col("i") < col("j"))
        .select(Vectors.angularDist(col("va"), col("vb")).as("d"))
      val pairAgg = pairs.agg(count(lit(1)).as("n_pairs"),
        round(avg(col("d")), 5).as("avg_dist"))
      val tableAgg = emb.agg(count(lit(1)).as("n_records"),
        first(size(col("embedding"))).cast("bigint").as("dims"))
      tableAgg.crossJoin(pairAgg)
    }),

    "filter_dsl" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pred = FilterCompiler.compile(
        """(lang IN ["en", "de"] AND n_chars >= 300) OR
          |(source == "src0" AND text CONTAINS "vector")""".stripMargin, docs)
      docs.filter(pred).select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
    }),

    "filter_json" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val pred = FilterCompiler.compileJson("k >= 50 AND k < 90", col("props"))
      ev.filter(pred).select(col("event_id"), col("event_type"),
        round(col("value"), 5).as("value"))
    }),

    "knn_filtered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val pred = FilterCompiler.compile("label IN [1, 2, 3]", emb)
      Knn.knn(emb.filter(pred), "embedding", queryVec(s, dir), 10, Knn.Cosine, "vec_id")
        .select(col("vec_id"), col("label"), round(col("dist"), 5).as("dist"))
    }),

    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          count(lit(1)).as("cnt"))
    }),

    "q3_join" -> ((s, dir) => {
      val cutoff = lit("1998-06-01").cast("timestamp")
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < cutoff)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > cutoff)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("_rev"))
        .orderBy(col("_rev").desc, col("l_orderkey"))
        .limit(10)
        .select(col("l_orderkey"), col("o_orderdate"), round(col("_rev"), 2).as("revenue"))
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

    "knn_batch" ->
      s"""WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |           FROM embeddings WHERE vec_id < 5),
         |d AS (SELECT q.qid, e.vec_id, $cosDistSql AS d FROM embeddings e, q),
         |r AS (SELECT qid, vec_id, d,
         |        row_number() OVER (PARTITION BY qid ORDER BY d, vec_id) AS rank
         |      FROM d)
         |SELECT qid, vec_id, rank, round(d, 5) AS dist FROM r WHERE rank <= 5""".stripMargin,

    "list_records" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE n_chars >= 200 ORDER BY doc_id LIMIT 20 OFFSET 10""".stripMargin,

    "quantize" ->
      """SELECT vec_id,
        |  round(list_max(err), 7) AS max_err,
        |  round(list_sum(err) / len(err), 7) AS mean_err
        |FROM (
        |  SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> abs(x - (round((least(greatest(x, -1.0), 1.0) + 1.0) / 2.0 * 255.0) / 255.0 * 2.0 - 1.0))) AS err
        |  FROM embeddings)""".stripMargin,

    "upsert_crud" ->
      """WITH base AS (SELECT doc_id, source, n_chars, 0 AS version FROM documents),
        |upd AS (SELECT doc_id, 'updated' AS source, n_chars, 1 AS version
        |        FROM documents WHERE doc_id % 10 = 0),
        |merged AS (SELECT * FROM base UNION ALL SELECT * FROM upd),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY version DESC) AS rn
        |           FROM merged)
        |SELECT doc_id, source, n_chars, version FROM ranked
        |WHERE rn = 1 AND doc_id % 17 <> 0""".stripMargin,

    "collection_stats" ->
      """WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |           FROM embeddings WHERE vec_id < 32),
         |p AS (SELECT acos(least(greatest(
         |        list_dot_product(a.v, b.v) /
         |        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
         |        -1.0), 1.0)) / pi() AS d
         |      FROM s a, s b WHERE a.vec_id < b.vec_id)
         |SELECT (SELECT count(*) FROM embeddings) AS n_records,
         |       (SELECT len(embedding) FROM embeddings WHERE vec_id = 0) AS dims,
         |       (SELECT count(*) FROM p) AS n_pairs,
         |       (SELECT round(avg(d), 5) FROM p) AS avg_dist""".stripMargin,

    "filter_dsl" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |WHERE (lang IN ('en', 'de') AND n_chars >= 300)
        |   OR (source = 'src0' AND text LIKE '%vector%')""".stripMargin,

    "filter_json" ->
      """SELECT event_id, event_type, round(value, 5) AS value FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) >= 50
        |  AND CAST(json_extract_string(props, '$.k') AS DOUBLE) < 90""".stripMargin,

    "knn_filtered" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
         |SELECT vec_id, label, round(d, 5) AS dist FROM (
         |  SELECT vec_id, label, $cosDistSql AS d
         |  FROM embeddings, q WHERE label IN (1, 2, 3))
         |ORDER BY d, vec_id LIMIT 10""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join" ->
      """SELECT l_orderkey, o_orderdate, round(rev, 2) AS revenue FROM (
        |  SELECT l_orderkey, o_orderdate,
        |    sum(l_extendedprice * (1.0 - l_discount)) AS rev
        |  FROM customer, orders, lineitem
        |  WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |    AND l_orderkey = o_orderkey
        |    AND o_orderdate < TIMESTAMP '1998-06-01'
        |    AND l_shipdate > TIMESTAMP '1998-06-01'
        |  GROUP BY l_orderkey, o_orderdate
        |  ORDER BY rev DESC, l_orderkey LIMIT 10)""".stripMargin
  )
}
