package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, Sampling, Search, TextAnalysis}

/** 10x scale probe for the round-7 search/split/chunk/profile
  * operators: sf0.1 documents (5k) unioned as 10 id-shifted copies
  * (50k docs). Unlike TextScaleProbe (which measures the worst-case
  * heavy-duplication corpora), this probe keeps the NEAR-DUP MASS
  * CONSTANT while the corpus grows 10x — embeddings copies are
  * far-shifted (+2s on the first coordinate, far below tau) and
  * split pairs are a fixed frame — because the scaling claim under
  * test is "the cluster/label machinery is decoupled from corpus
  * size". Run: sbt "Test/runMain graft.PipelineScaleProbe" */
object PipelineScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    val big = (0 until 10).map(s =>
        base.select((col("doc_id") + s * 1000000L).as("doc_id"), col("text")))
      .reduce(_ unionByName _).repartition(32).cache()
    println(s"[probe] docs big=${big.count()}")
    val one = base.repartition(32).cache(); one.count()

    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    // ROTATED copies: copy s rotates the coordinates by s positions —
    // far from the original and from each other (cos ≈ 0 for generic
    // vectors), so true near-dup mass stays ~constant while the corpus
    // grows 10x. Rotation (unlike shifting one coordinate by a large
    // constant) preserves the coordinate distribution, so LSH bucket
    // occupancy stays uniform — a +2s shift on coord 0 would pin every
    // plane's sign to sign(p[0]) and collapse each copy group into ONE
    // bucket per table, a synthetic skew no real corpus has
    val bigEmb = (0 until 10).map(s =>
        emb.select((col("vec_id") + s * 1000000L).as("vec_id"),
          (if (s == 0) col("embedding")
           else concat(slice(col("embedding"), s + 1, 64 - s),
             slice(col("embedding"), 1, s))).as("embedding")))
      .reduce(_ unionByName _).repartition(32).cache()
    println(s"[probe] vecs big=${bigEmb.count()}")
    val oneEmb = emb.repartition(32).cache(); oneEmb.count()

    // fixed near-dup pair frame: the split machinery must scale with
    // the CORPUS, not re-pay the pair job (measured separately by
    // TextScaleProbe / dedup benches)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (100L, 101L))
      .map { case (a, b) => (a, b) }
    val pairsDf = spark.createDataFrame(pairs).toDF("id_a", "id_b").cache()
    pairsDf.count()

    def time(mk: () => org.apache.spark.sql.DataFrame, label: String): Unit = {
      mk().queryExecution.toRdd.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $label median=${ts(1)}%.2f s")
    }

    val only = args.headOption // e.g. "semantic" to rerun one section
    for ((df, tag) <- Seq((one, "1x"), (big, "10x")) if only.forall(_ == "docs")) {
      time(() => Search.bm25(df, "text", "doc_id",
        Seq("join", "scan", "merge"), 20), s"bm25_search $tag")
      time(() => Search.hybridSearch(df, "text", "doc_id",
        Seq("join", "scan", "merge"), "join scan merge", 10),
        s"hybrid_search $tag")
      time(() => TextAnalysis.chunkDocs(df, "text", "doc_id", 40, 20),
        s"doc_chunks $tag")
      time(() => TextAnalysis.corpusProfile(df, "text", 20, 10),
        s"corpus_profile $tag")
      time(() => Sampling.leakageSafeSplit(df.select(col("doc_id")), "doc_id",
        pairsDf, 0.1, "s0"), s"split_safe $tag")
    }
    // bits per table scale with log(corpus): bucket occupancy — and
    // with it the per-bucket self-join cost — stays pinned (~21/bucket
    // at 1x with 8 bits, ~27 at 10x with 11 bits). Fixed 4-bit tables
    // at 10x would put ~3.4k vectors in every bucket and square.
    for ((df, tag, bits) <- Seq((oneEmb, "1x", 8), (bigEmb, "10x", 11))
         if only.forall(_ == "semantic")) {
      time(() => Dedup.semanticDedup(df, "embedding", "vec_id", 4, bits, 64, 0.99),
        s"dedup_semantic $tag (4 tables x $bits bits)")
    }
    spark.stop()
  }
}
