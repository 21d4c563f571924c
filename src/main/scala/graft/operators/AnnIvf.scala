package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** IVF (inverted-file) approximate nearest neighbors — the scale path
  * complementing [[AnnLsh]]: a coarse quantizer of `nlist` centroids
  * partitions the corpus into cells; a query ranks centroids and scans
  * only the `nprobe` nearest cells.
  *
  * At 100 TB: cell id is a partition/bucket column; the centroid table
  * (nlist x dim doubles) broadcasts to every executor; a probe reads
  * nprobe/nlist of the data. Centroid training is Lloyd's k-means
  * expressed as DataFrame ops (assign = broadcast join + argmin,
  * update = groupBy mean over exploded dims) — each iteration is two
  * shuffles of (cell, dim) aggregates, never a driver-side loop over
  * rows.
  */
object AnnIvf {

  /** Deterministic seed centroids: the vectors whose id is in
    * `seedIds` (sampling-by-id keeps this engine-reproducible). */
  def seedCentroids(df: DataFrame, vecCol: String, idCol: String,
                    seedIds: Seq[Long]): DataFrame =
    df.filter(col(idCol).isin(seedIds: _*))
      .select(col(idCol).as("cell"), col(vecCol).cast("array<double>").as("centroid"))

  /** Assign each row to its nearest centroid.
    *
    * The centroid table is tiny (nlist x dim — the reference holds it
    * in memory too), so it is collected and unrolled into ONE argmin
    * expression: `least` over (dist, cell) structs, each dist a
    * codegen'd dot product against a literal centroid. Zero joins,
    * zero shuffles — assignment rides the scan, which is the property
    * that makes IVF indexing feasible on a 100 TB corpus. */
  def assign(df: DataFrame, vecCol: String, idCol: String,
             centroids: DataFrame, metric: Knn.Metric): DataFrame = {
    val cents: Array[(Long, Seq[Double])] = centroids
      .select(col("cell").cast("long"), col("centroid").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    require(cents.nonEmpty, "assign() needs at least one centroid")
    val best = cents.map { case (cell, cv) =>
      struct(Knn.distCol(metric, col(vecCol), typedlit(cv)).as("d"),
        lit(cell).as("c"))
    }.reduce(least(_, _))
    df.withColumn("_best", best)
      .withColumn("cell", col("_best.c"))
      .withColumn("centroid_dist", col("_best.d"))
      .drop("_best")
  }

  /** One Lloyd iteration: recompute each cell's centroid as the mean
    * of its members (exploded by dimension; two shuffles, all
    * distributed). */
  def lloydStep(df: DataFrame, vecCol: String, idCol: String,
                centroids: DataFrame, metric: Knn.Metric): DataFrame =
    assign(df, vecCol, idCol, centroids, metric)
      .select(col("cell"), posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
      .groupBy(col("cell"), col("d"))
      .agg(avg(col("x")).as("m"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("d"), col("m")))).as("dm"))
      .select(col("cell"), transform(col("dm"), s => s.getField("m")).as("centroid"))

  /** Train centroids: seeds + `iters` Lloyd iterations. */
  def train(df: DataFrame, vecCol: String, idCol: String, seedIds: Seq[Long],
            iters: Int, metric: Knn.Metric): DataFrame = {
    var c = seedCentroids(df, vecCol, idCol, seedIds)
    for (_ <- 0 until iters)
      c = lloydStep(df, vecCol, idCol, c, metric)
    c
  }

  /** Approximate top-k: rank cells by query-to-centroid distance,
    * scan the nprobe nearest cells, exact distance within. */
  def knn(df: DataFrame, vecCol: String, query: DataFrame, k: Int,
          centroids: DataFrame, nprobe: Int, metric: Knn.Metric,
          idCol: String): DataFrame = {
    val probeCells = centroids.crossJoin(broadcast(query))
      .withColumn("_qd", Knn.distCol(metric, col("centroid"), col("qvec")))
      .orderBy(col("_qd").asc, col("cell").asc)
      .limit(nprobe)
      .select(col("cell"))
    val assigned = assign(df, vecCol, idCol, centroids, metric)
    assigned.join(broadcast(probeCells), "cell")
      .crossJoin(broadcast(query))
      .withColumn("dist", Knn.distCol(metric, col(vecCol), col("qvec")))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
      .drop("qvec")
  }
}
