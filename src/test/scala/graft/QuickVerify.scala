package graft

/** Dump selected SparkEntry queries (args: sfDir outDir name...) for a
  * local DuckDB parity check without running the full Verify sweep.
  * Run: sbt "Test/runMain graft.QuickVerify /root/testdata/sf0.01 /tmp/qv ann_lsh_multitable" */
object QuickVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val spark = SparkSpec.session
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      val sql = SparkEntry.oracleSql.get(name).getOrElse("")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
    }
    spark.stop()
  }
}
