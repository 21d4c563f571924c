package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the pagerank SETUP variants (r20): the box has
  * a bursty co-tenant, so sequential cross-build Profile pairs drift
  * ±30-40% between arms — here both arms run alternately in ONE JVM,
  * so an era hits both equally. Arms replicate Graph.pagerank's setup
  * chains inline (the Micro "kept in sync by construction" rule):
  *  - staged: cut(distinct) -> cut(deg agg) -> cut(e⋈deg) [r19 shape,
  *    noSinks so no semi] -> deg.count()
  *  - window: cut(distinct + count().over(src)) -> cut(node roll-up)
  *    -> count()  [r20 candidate]
  * Edges = the declared graph_pagerank co-purchase frame. */
object MicroPagerank {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5

    def edges: DataFrame = {
      val orders = graft.core.Tables.table(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val li = graft.core.Tables.table(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val cs = orders.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      cs.unionByName(cs.select(col("dst").as("src"), col("src").as("dst")))
    }
    def eDist = edges
      .filter(col("src").isNotNull && col("dst").isNotNull).distinct()

    def staged(): Long = {
      val e = eDist.localCheckpoint()
      val deg = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg")).localCheckpoint()
      val ed = e.join(deg, e("src") === deg("node"))
        .select(col("src"), col("dst"), col("deg")).localCheckpoint()
      val n = deg.count()
      ed.unpersist(); deg.unpersist(); e.unpersist()
      n
    }
    def window(): Long = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("src"))
      val ed = eDist.withColumn("deg", count(lit(1)).over(w)).localCheckpoint()
      val deg = ed.groupBy(col("src").as("node"))
        .agg(max(col("deg")).as("deg")).localCheckpoint()
      val n = deg.count()
      ed.unpersist(); deg.unpersist()
      n
    }

    staged(); window() // warm both
    val ts = collection.mutable.Map[String, Vector[Double]]()
    for (_ <- 1 to reps; (label, fn) <- Seq("staged" -> staged _, "window" -> window _)) {
      val t0 = System.nanoTime()
      fn()
      val dt = (System.nanoTime() - t0) / 1e9
      ts(label) = ts.getOrElse(label, Vector.empty) :+ dt
    }
    for ((label, v) <- ts.toSeq.sortBy(_._1))
      println(f"[micro-pr] $label%-8s min=${v.min}%.3f med=${v.sorted.apply(v.size / 2)}%.3f all=${v.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
