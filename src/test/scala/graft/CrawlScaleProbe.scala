package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Url

/** Corpus-growth probe for the crawl-key family (r19): fetch corpus
  * grows 1x -> 10x (each copy shifts doc ids AND mints new hosts, the
  * way a bigger crawl really has more domains), with 3 fetches per
  * resource (case/port/fragment/tracking-param spellings that
  * collapse only after normalization). Measures:
  *
  *  - `url_dedup`: normalize + one url_norm-keyed agg — the claim is
  *    near-linear growth (map-side expressions + one shuffle whose
  *    map-side partials collapse the 3x refetch fanout before it
  *    moves).
  *  - `domain_profile`: full-PSL kernel extraction + one domain agg —
  *    same near-linear claim; domain count grows with the corpus but
  *    stays driver-safe.
  *  - hot-domain skew: the SAME 10x corpus with every host rewritten
  *    onto ONE domain — `domainProfile`'s exact countDistincts funnel
  *    every distinct (host, text) through one reducer, while
  *    `domainProfileSketch` keeps <= k longs per partition map-side.
  *    The claim: the sketch's hot-domain wall stays close to its
  *    uniform wall while exact degrades.
  *
  * Writes CRAWL_PROBE.json (the committed-regenerable-artifact rule).
  * Run: sbt "Test/runMain graft.CrawlScaleProbe" */
object CrawlScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val out = new ProbeJson("crawlscale",
      args.headOption.getOrElse("/root/repo/CRAWL_PROBE.json"))
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("source"), col("text"))

    // one copy = every base doc under a copy-specific host universe,
    // fetched 3 ways; urls are adversarial for the normalizer
    def fetchesAt(copies: Int) = (0 until copies).map { s =>
      val d = (col("doc_id") + s * 1000000L)
      val ds = d.cast("string")
      // the registrable DOMAIN varies per (source, copy, k): a bigger
      // crawl has more domains, and the PSL kernel must group them
      // apart (a host under one shared suffix would collapse the
      // whole probe onto a single domain row)
      val host = concat(col("source"), lit(s"-c$s-"),
        (col("doc_id") % 40).cast("string"), lit(".com"))
      val url0 = concat(lit("https://www."), host, lit("/item/"), ds)
      base.select(d.as("doc_id"), col("text"),
          array(
            concat(lit("HTTPS://WWW."), host, lit(":443/item/"), ds,
              lit("?utm_source=crawl")),
            concat(url0, lit("#frag-"), ds),
            url0).as("_us"))
        .select(col("doc_id"), col("text"),
          posexplode(col("_us")))
        .select((col("doc_id") * 4 + col("pos")).as("fetch_id"),
          col("doc_id"), col("text"), col("col").as("url"))
    }.reduce(_ unionByName _).repartition(32).cache()

    // per-block shuffle-write tally: the sketch-vs-exact claim is a
    // SHUFFLE-VOLUME claim (bounded map-side partials), so the probe
    // records what actually moved, not just wall time
    val shuffled = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffled.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    // execute a query's OWN physical plan (the Bench rule): .count()
    // on an aggregate lets the optimizer PRUNE the aggregate functions
    // (count-of-groups = distinct keys), so the first cut timed a
    // gutted profile query and recorded zero shuffle for it
    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    def time(label: String, copies: Int)(f: => Long): Unit = {
      Thread.sleep(300) // drain the async listener bus between blocks
      val s0 = shuffled.get()
      val t0 = System.nanoTime()
      val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val mb = (shuffled.get() - s0) / 1e6
      println(f"[probe] $label x$copies: $sec%.2f s ($n rows, $mb%.1f MB shuffled)")
      out.add("line" -> label, "copies" -> copies,
        "sec" -> sec, "rows" -> n, "shuffle_mb" -> mb)
    }

    // JIT/codegen warm-up on a tiny slice so the 1x timings measure
    // steady state, not first-run compile cost (the Bench rule)
    locally {
      val w = fetchesAt(1).limit(500).cache(); w.count()
      run(Url.dedupFetches(w, "url", "fetch_id"))
      run(Url.domainProfile(w, "url", "text"))
      run(Url.domainProfileSketch(w, "url", "text", k = 4096))
      w.unpersist()
    }

    // 1x/10x sit under constant job overheads on this box (the first
    // cut read FLAT 1->10x); 100x = 1.5M fetches / 500k docs is where
    // per-row cost dominates and the scaling claim is actually tested
    for (copies <- Seq(1, 10, 100)) {
      val fetches = fetchesAt(copies)
      println(s"[probe] fetches x$copies = ${fetches.count()}")
      time("url_dedup", copies) {
        run(Url.dedupFetches(fetches, "url", "fetch_id"))
      }
      time("domain_profile", copies) {
        run(Url.domainProfile(fetches, "url", "text"))
      }
      // the crawler-trap shape: every fetch on ONE registrable domain
      val hot = fetches.withColumn("url",
        concat(lit("https://h"), pmod(col("fetch_id"), lit(100000L)),
          lit(".trap.example.org/p/"), col("fetch_id"))).cache()
      hot.count()
      time("profile_hot_exact", copies) {
        run(Url.domainProfile(hot, "url", "text"))
      }
      time("profile_hot_sketch", copies) {
        run(Url.domainProfileSketch(hot, "url", "text", k = 4096))
      }
      hot.unpersist()
      fetches.unpersist()
    }
    out.write()
    spark.stop()
  }
}
