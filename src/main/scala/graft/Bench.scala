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
    //
    // The 3 samples are INTERLEAVED (3 round-robin passes over all
    // queries), not back-to-back: the round-5 driver run showed a
    // multi-minute host-contention era can cover one query's entire
    // back-to-back triple (doc_fingerprint 0.7 -> 13 s median on an
    // identical binary), while spread samples put at most one bad era
    // in any query's triple and the median discards it.
    // Failures must never masquerade as fast lines: a swallowed
    // Throwable here once logged a crashed family as 0.05 s "wins"
    // for two rounds (VERDICT r9). Record the error and emit -1.
    val errors = collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      try run(fn, sfDir) catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }
    val samples = collection.mutable.LinkedHashMap[String, Vector[Double]]()
    for (_ <- 1 to 3) {
      SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try run(fn, sfDir) catch { case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        }
        val t = (System.nanoTime() - t0) / 1e9
        samples(name) = samples.getOrElse(name, Vector.empty) :+ t
      }
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val results = samples.map { case (name, ts) =>
      name -> (if (errors.contains(name)) -1.0 else ts.sorted.apply(1))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
