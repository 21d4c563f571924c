package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Scratch plan-inspection main (not part of the driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 16, 3)
    time("signatures count")(println(sigs.count()))
    sigs.explain("formatted")
    val cands = Dedup.lshCandidates(sigs, "doc_id", 4, 4)
    time("candidates count")(println(cands.count()))
    spark.stop()
  }
}
