package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Dedup

/** Corpus-growth probe for incremental near-dedup: the DELTA is held
  * fixed (the nightly crawl doesn't grow because the archive did)
  * while the corpus grows 10x, measuring (a) the in-memory path,
  * which re-shingles corpus text per batch, (b) the one-time
  * writeMinhashIndex build, and (c) the indexed probe, which reads
  * only the persisted band keys + hash sets. The scaling claim under
  * test: (c) grows far slower than (a) because the per-batch cost
  * drops from "re-hash 100 TB of text" to "scan L longs + one key per
  * stored doc", and the text-hashing cost moves into (b), paid once.
  * Copies are id-shifted but text-identical, so corpus band buckets
  * at 10x are the worst case (every bucket 10x heavier). Writes
  * INCREMENTAL_PROBE.json (VERDICT r17 #6: committed, regenerable
  * artifact).
  * Run: sbt "Test/runMain graft.IncrementalScaleProbe" */
object IncrementalScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val out = new ProbeJson("incrementalscale",
      args.headOption.getOrElse("/root/repo/INCREMENTAL_PROBE.json"))
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    def corpusAt(copies: Int) = (0 until copies).map(s =>
        base.select((col("doc_id") + s * 1000000L).as("doc_id"),
          // vary the tail so copies are near-dups of each other, not
          // byte-identical (exact copies collapse into one band
          // bucket per group — the shape exact-dedup removes first)
          concat_ws(" ", col("text"), lit(s"copy$s tail")).as("text")))
      .reduce(_ unionByName _).repartition(32).cache()
    val delta = base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 50000000L).as("doc_id"), col("text"))
      .repartition(8).cache()
    println(s"[probe] delta=${delta.count()}")

    def time(label: String, copies: Int)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label x$copies: $sec%.2f s ($n rows)")
      out.add("line" -> label, "copies" -> copies,
        "sec" -> sec, "rows" -> n)
    }

    for (copies <- Seq(1, 10)) {
      val corpus = corpusAt(copies)
      // counted OUTSIDE any timed region (ADVICE r18 #3: a prior cut
      // counted inside index_build's closure, so the committed probe
      // charged a full corpus scan to the build time)
      val corpusRows = corpus.count()
      println(s"[probe] corpus x$copies = $corpusRows")
      time("in_memory", copies) {
        Dedup.incrementalNearDup(corpus, delta, "text", "doc_id").count()
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-incr$copies")
        .toFile.getAbsolutePath
      time("index_build", copies) {
        // rows = corpus docs indexed (the honest count for this line;
        // review r18 — a prior cut recorded the copies knob here)
        Dedup.writeMinhashIndex(corpus, "text", "doc_id", s"$dir/idx")
        corpusRows
      }
      time("indexed_probe", copies) {
        Dedup.incrementalNearDupIndexed(spark, s"$dir/idx", delta,
          "text", "doc_id").count()
      }
      corpus.unpersist()
    }
    out.write()
    spark.stop()
  }
}
