package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.core.Tables

/** Split sample_dsir's cost: model build vs scoring fold vs top-k. */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    val target = docs.filter(col("doc_id") % 20 === 0)
    def t(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[dsirprobe] $tag%-14s median=${ts.sorted.apply(1)}%.3f")
    }
    t("model") { Sampling.trainDsir(docs, "text", target, "text", 4096); () }
    val model = Sampling.trainDsir(docs, "text", target, "text", 4096)
    t("scoreAll") { Sampling.dsirScoreAll(docs, "doc_id", "text", model)
      .queryExecution.toRdd.count(); () }
    t("full_sample") { Sampling.dsirSample(docs, "doc_id", "text", target,
      "text", 80, 4096).queryExecution.toRdd.count(); () }
    spark.stop()
  }
}
