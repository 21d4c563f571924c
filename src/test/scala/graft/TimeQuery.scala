package graft

/** Time one declared query: args = sfDir name [reps]. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val reps = if (args.length > 2) args(2).toInt else 3
    val fn = SparkEntry.queries(args(1))
    fn(spark, args(0)).queryExecution.toRdd.count() // warm
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, args(0)).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[time] ${args(1)} median=${times.sorted.apply(reps / 2)}%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
