package graft.tools

import org.apache.spark.sql.SparkSession

/** Executes the named queries and prints the FINAL adaptive plan —
  * AQE materializes exchange/stage reuse only at runtime, so the
  * pre-execution dump (PlanDump) cannot confirm a ReusedExchange
  * claim; this can. args = sfDir q1,q2 */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    for (name <- args(1).split(",").map(_.trim).filter(_.nonEmpty)) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      val reusedStage = plan.linesIterator.count(_.contains("reuses"))
      val exch = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
      println(s"[reuse] $name exchanges=$exch reusedExchange=$reused reusedStage=$reusedStage")
      if (args.length > 2 && args(2) == "full") println(plan)
    }
    spark.stop()
  }
}
