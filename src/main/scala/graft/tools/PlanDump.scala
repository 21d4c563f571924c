package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named declared queries to files —
  * the before/after plan evidence for optimization rounds.
  * args = sfDir outDir suffix [query1,query2,...] (default: all). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val out = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    java.nio.file.Files.createDirectories(out)
    val only: Set[String] =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet else Set.empty
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        val txt = try {
          val qe = fn(spark, dir).queryExecution
          qe.explainString(org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"ERROR: $e" }
        java.nio.file.Files.write(out.resolve(s"${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] $name -> ${name}_$suffix.txt (${txt.length} chars)")
      }
    }
    spark.stop()
  }
}
