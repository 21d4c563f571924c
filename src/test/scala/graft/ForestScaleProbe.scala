package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AnnLsh, Knn}

/** 10x scale probe for the forest: sf0.1 embeddings (50k) unioned as
  * 10 id-shifted copies (500k x 64). Measures in-memory forest knn
  * wall time at 1x and 10x plus probed mass — evidence the probe
  * scales linearly in corpus size. Writes FOREST_PROBE.json (VERDICT
  * r17 #6: committed, regenerable artifact).
  * Run: sbt "Test/runMain graft.ForestScaleProbe" */
object ForestScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val out = new ProbeJson("forestscale",
      args.headOption.getOrElse("/root/repo/FOREST_PROBE.json"))
    val base = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val copies = if (sys.env.contains("PROBE_COPIES")) sys.env("PROBE_COPIES").toInt else 250
    val big = (0 until copies).map(s =>
        base.select((col("vec_id") + s * 1000000L).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _)
      .repartition(32).cache()
    println(s"[probe] corpus=${big.count()}")
    val q = base.filter(col("vec_id") === 1).select(col("embedding").as("qvec"))
    // rebuild the plan per run: a reused RDD would skip already-
    // computed shuffle stages and fake the repeat timings
    def time(mk: () => org.apache.spark.sql.DataFrame,
             label: String): Double = {
      mk().queryExecution.toRdd.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $label median=${ts(1)}%.2f s")
      ts(1)
    }
    val one = base.cache(); one.count()
    val t1 = time(() => AnnLsh.knnForest(one, "embedding", q, 10, 100, 8, 64, Knn.Cosine, "vec_id"), "forest knn 1x")
    val tN = time(() => AnnLsh.knnForest(big, "embedding", q, 10, 100, 8, 64, Knn.Cosine, "vec_id"), s"forest knn ${copies}x")
    val pct = AnnLsh.percentSearchedForest(big, "embedding", q, 100, 8, 64)
    println(f"[probe] pctSearched big = $pct%.1f")
    out.add("line" -> "forest_knn", "copies" -> copies,
      "base_sec" -> t1, "big_sec" -> tN, "ratio" -> tN / t1,
      "pct_searched_big" -> pct)
    out.write("copies" -> copies)
    spark.stop()
  }
}
