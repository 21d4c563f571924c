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
    // Errors are recorded ONLY from the timed passes, and a query's
    // result is the median of its SUCCESSFUL timed samples — a
    // transient failure in the untimed warm pass (or in one of three
    // timed runs) must not permanently brand a query -1 when the timed
    // runs produced a valid median (ADVICE r10). -1 stays reserved for
    // queries with zero successful timed samples.
    val errors = collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      try run(fn, sfDir) catch { case _: Throwable => }
    }
    val samples = collection.mutable.LinkedHashMap[String, Vector[Double]]()
    for (_ <- 1 to 3) {
      SparkEntry.queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val okRun = try { run(fn, sfDir); true } catch { case e: Throwable =>
          errors(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}"
          false
        }
        if (okRun) {
          val t = (System.nanoTime() - t0) / 1e9
          samples(name) = samples.getOrElse(name, Vector.empty) :+ t
        }
      }
    }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val results = SparkEntry.queries.keys.map { name =>
      val ts = samples.getOrElse(name, Vector.empty)
      name -> (if (ts.isEmpty) -1.0 else ts.sorted.apply(ts.size / 2))
    }.toSeq
    // ms precision, sorted most-expensive-first: the driver's artifact
    // keeps only the JSON tail's last ~3.3 KB, so rounding + ordering
    // ensure ALL per-query lines survive (and if one ever falls off,
    // it's the cheapest, not an arbitrary prefix) — VERDICT r10 #4.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.sortBy { case (_, v) => -v }
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors
      .filter { case (k, _) => samples.getOrElse(k, Vector.empty).isEmpty }
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
