package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Execute the query's OWN physical plan (toRdd), not count() on
    // top of it: count() lets the optimizer drop every projection, so
    // map-heavy queries (regex scrubbing, hashing) would clock as a
    // bare parquet row-count.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
            dir: String): Unit =
      fn(spark, dir).queryExecution.toRdd.count()
    // JIT/codegen warm-up: run every query once at the tiny sf so the
    // timed runs measure steady-state throughput, not first-run
    // interpreter/compile cost (measured 4-5x on string-heavy paths)
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn, "/root/testdata/sf0.001")
      catch { case _: Throwable => }
    }
    // median of 3 timed runs per query. Round 4 was an A/A control on
    // a byte-identical binary and min-of-2 still moved single queries
    // by ±2-4 s (GC / page-cache contention between queries sharing
    // cached inputs) — below that noise floor a 2x per-query change is
    // invisible. The median tolerates one bad run out of three; one
    // full-size warm pass first absorbs tail JIT of the hottest loops.
    SparkEntry.queries.foreach { case (_, fn) =>
      try run(fn, sfDir) catch { case _: Throwable => }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try run(fn, sfDir) catch { case _: Throwable => }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(1)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
