package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints executed-plan summaries for every SparkEntry query —
  * the .explain audit loop (broadcasts where expected, TakeOrdered
  * for top-k, PushedFilters at scans, codegen coverage). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val only = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only(name)) {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val ops = plan.linesIterator
          .map(_.replaceAll("^[-+:* (]*([A-Za-z]+).*", "$1"))
          .filter(_.nonEmpty).toSeq
          .groupBy(identity).view.mapValues(_.size).toMap
        val flags = Seq(
          "TakeOrdered" -> plan.contains("TakeOrderedAndProject"),
          "BroadcastHash" -> plan.contains("BroadcastHashJoin"),
          "SortMerge" -> plan.contains("SortMergeJoin"),
          "BcastNL" -> plan.contains("BroadcastNestedLoopJoin"),
          "Pushed" -> plan.contains("PushedFilters: ["),
          "Codegen" -> plan.contains("WholeStageCodegen"))
          .collect { case (k, true) => k }.mkString(",")
        val exch = ops.getOrElse("Exchange", 0)
        println(f"$name%-20s exchanges=$exch flags=[$flags]")
      }
    }
    spark.stop()
  }
}
