package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Parse a previous BENCH_r{N}.json artifact into its per-query
    * times. Factored out of main because the artifact is ADVERSARIAL
    * input three rounds of verdicts hit bugs on: the driver wraps
    * this program's stdout in a JSON "tail" STRING (so pairs appear
    * with escaped quotes, `\"q3_join\":0.695` — r13 shipped a regex
    * that missed all of them and vs_prev printed null), the tail is
    * TRUNCATED mid-token at ~3.3 KB, and the artifact embeds the
    * prev run's own vs_prev line whose shifted_gt20pct map holds
    * query->RATIO pairs that must not be misread as times. BenchSpec
    * pins all three traps on real artifact shapes. */
  private[graft] def parsePrevQueryTimes(raw: String): Map[String, Double] = {
    val pairRe = "\\\\?\"([A-Za-z0-9_]+)\\\\?\":(-?\\d+(?:\\.\\d+)?)".r
    val meta = Set("value", "sf", "total", "round", "geomean",
      "n", "rc", "cpus", "lines", "ext_cores",
      "io_cores", "ext_max", "io_max", "dq_depth", "dq_max",
      "noisy_lines", "geomean_vs_local", "errors_n", "shifted_n")
    // A pair whose match runs to the very end of the text was cut
    // mid-token by the driver's tail window (e.g. 1.25 cut to "1.2"
    // would parse as 1.2 and fabricate a vs_prev shift — ADVICE r14);
    // a cleanly terminated pair always has a delimiter after the
    // number, so drop the end-of-text match instead of misparsing.
    def pairs(txt: String): Map[String, Double] =
      pairRe.findAllMatchIn(txt)
        .filterNot(_.`end` == txt.length)
        .map(m => m.group(1) -> m.group(2).toDouble)
        .filterNot { case (k, _) => meta(k) }.toMap
    val cut = raw.indexOf("vs_prev")
    val front = pairs(if (cut >= 0) raw.substring(0, cut) else raw)
    // r20 artifacts carry a third, COMPACT line after vs_prev (the
    // driver's 2000-char tail never held the full 164-entry main line
    // whole — "parsed": null in every BENCH_r*.json ever — so the
    // compact line re-emits the slowest medians inside the window);
    // parse pairs after its "compact":true marker too, past the
    // vs_prev cut above, or a fresh checkout's fallback base would
    // drop the only complete medians the artifact has.
    val compactRe = "\\\\?\"compact\\\\?\":true".r
    val back = compactRe.findAllMatchIn(raw).toSeq.lastOption
      .map(m => pairs(raw.substring(m.`end`))).getOrElse(Map.empty)
    front ++ back
  }

  /** The driver's artifact keeps only the stdout TAIL — measured at
    * exactly 2000 characters in every committed BENCH_r*.json — and
    * its parse needs a COMPLETE JSON line with the per-query map. The
    * main line's full queries map outgrew 2000 chars before round 1
    * ever shipped ("parsed": null in all 19 artifacts), so the driver
    * has never had per-query times or a scaling comparison (VERDICT
    * r19 #1). This builds the LAST printed line: guaranteed under
    * `maxChars` (budget = 2000 minus sbt's ~80-char success trailer
    * minus slack), carrying the true total, the line count, the
    * geomean vs the local history, and the longest prefix of the
    * SLOWEST per-query medians that fits. Additions-only: the full
    * main line and the vs_prev line still print first, unchanged. */
  private[graft] def compactLine(totalStr: String, sfDir: String,
                                 slowestFirst: Seq[(String, Double)],
                                 geomean: Option[Double], nErrors: Int,
                                 maxChars: Int = 1850): String = {
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toString
    val geoStr = geomean.map(g => BigDecimal(g).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toString).getOrElse("null")
    val head = s"""{"metric":"total","value":$totalStr,"unit":"sec",""" +
      s""""sf":"$sfDir","compact":true,"lines":${slowestFirst.size},""" +
      s""""geomean_vs_local":$geoStr,"errors_n":$nErrors,"queries":{"""
    val sb = new StringBuilder(head)
    val close = "}}"
    var first = true
    var room = true
    val it = slowestFirst.iterator
    while (room && it.hasNext) {
      val (k, v) = it.next()
      val entry = (if (first) "" else ",") + "\"" + k + "\":" + r3(v)
      if (sb.length + entry.length + close.length <= maxChars) {
        sb.append(entry); first = false
      } else room = false
    }
    sb.append(close).toString
  }

  /** Whether this pass may overwrite the committed full-history file
    * (VERDICT r15 #3): a CONTAMINATED pass (1-min loadavg above the
    * threshold at any sample point) must not replace a same-sf CLEAN
    * base — the r15 end-of-round pass ran at loadavg 6.2 and its
    * vs_prev flagged five phantom dedup "regressions" against the
    * idle mid-round history. A contaminated pass may still seed an
    * EMPTY history, replace a history for another sf, or replace a
    * base that is itself contaminated (or predates the flag — the
    * pre-r16 file IS the loaded r15 pass): self-labeled files only
    * protect themselves via the literal `"contaminated":false`. */
  private[graft] def shouldPersist(contaminated: Boolean,
                                   prevRaw: Option[String],
                                   sfDir: String): Boolean =
    !contaminated || !prevRaw.exists { raw =>
      raw.contains("\"sf\":\"" + sfDir + "\"") &&
        raw.contains("\"contaminated\":false")
    }

  /** Busy (non-idle, non-iowait) jiffies from the aggregate `cpu `
    * line of /proc/stat: user + nice + system + irq + softirq +
    * steal. */
  private[graft] def busyJiffies(cpuLine: String): Long = {
    val f = cpuLine.trim.split("\\s+")
    Seq(1, 2, 3, 6, 7, 8).map(i => if (i < f.length) f(i).toLong else 0L).sum
  }

  /** Iowait jiffies (field 5 of the aggregate `cpu ` line): CPU idle
    * with IO outstanding. This is the contamination channel ext_cores
    * is blind to (VERDICT r16 #1): a co-tenant that evicts the page
    * cache or saturates the disk degrades the checkpoint-heavy lines
    * 3-5x while burning almost no CPU — the r16 final pass read
    * ext_cores 0.80 yet shipped pretrain_v3 at 4x its idle time.
    * Iowait is system-wide (the bench's own parquet/checkpoint IO
    * counts too), so its cap is calibrated above the bench's own
    * clean-pass level rather than near zero.
    *
    * Calibration blind spot (ADVICE r17): iowait only accrues while a
    * CPU is IDLE, so during phases where the bench's own 32 threads
    * keep every core busy, a disk-saturating co-tenant can read
    * near-zero on this channel. That gap is now covered directly by
    * the /proc/diskstats time-in-queue channel ([[diskWeightedMs]],
    * VERDICT r18 #3), which accrues regardless of CPU state; iowait
    * stays as the cheaper system-wide cross-check, and the
    * retry-probe window still samples both while the bench is fully
    * ASLEEP — where every channel is maximally sensitive. */
  private[graft] def iowaitJiffies(cpuLine: String): Long = {
    val f = cpuLine.trim.split("\\s+")
    if (f.length > 5) f(5).toLong else 0L
  }

  /** Weighted ms-in-queue per device from /proc/diskstats (the 11th
    * per-device stat, field index 13): the kernel's time-in-queue
    * counter accrues for every queued request REGARDLESS of CPU
    * state — the channel iowait is blind to whenever the bench's own
    * 32 threads keep every core busy (ADVICE r17 blind spot, VERDICT
    * r18 #3: a disk-saturating co-tenant during a CPU-saturated
    * phase was invisible to all three prior channels). Virtual
    * devices (loop*, ram*, zram*, dm-*) are dropped; consumers take
    * the MAX over devices, so a box that lists partitions under
    * their parent disk cannot double-count. */
  private[graft] def diskWeightedMs(diskstats: String): Map[String, Long] =
    diskstats.linesIterator.flatMap { line =>
      val f = line.trim.split("\\s+")
      if (f.length < 14) None
      else {
        val name = f(2)
        if (name.startsWith("loop") || name.startsWith("ram") ||
            name.startsWith("zram") || name.startsWith("dm-")) None
        else Some(name -> f(13).toLong)
      }
    }.toMap

  /** Max over devices of the weighted-ms delta between two diskstats
    * samples — the numerator of the busiest-device average queue
    * depth (Δweighted-ms / wall-ms). A device absent from either
    * sample contributes zero (hotplug between samples). */
  private[graft] def diskDeltaMs(d0: Map[String, Long],
                                 d1: Map[String, Long]): Long =
    if (d0.isEmpty || d1.isEmpty) 0L
    else d1.keysIterator.map { k =>
      math.max(0L, d1(k) - d0.getOrElse(k, d1(k)))
    }.foldLeft(0L)(math.max)

  /** One measured slice of the timed run: (Δbusy, Δiowait, Δself,
    * Δdisk-queue-weighted-ms, wallSec) between two /proc samples
    * bracketing a query. `dWq` is already the busiest-device max for
    * the slice; coalescing sums slices, which stays exact while one
    * device dominates (vda on this box) and otherwise over-counts
    * toward caution, never under. */
  private[graft] final case class Seg(dBusy: Long, dIo: Long,
                                      dSelf: Long, dWq: Long,
                                      wall: Double)

  /** Coalesce consecutive per-query slices into windows of at least
    * `minWall` seconds (ADVICE r16: a 30 s co-tenant burst inside a
    * 10-minute pass dilutes below any whole-run average — per-window
    * maxima catch it). Slices are merged in order; a sub-minimum tail
    * folds into the last emitted window so no slice is dropped. */
  private[graft] def coalesceWindows(segs: Seq[Seg],
                                     minWall: Double): Seq[Seg] = {
    val out = collection.mutable.ArrayBuffer[Seg]()
    var acc = Seg(0L, 0L, 0L, 0L, 0.0)
    for (s <- segs) {
      acc = Seg(acc.dBusy + s.dBusy, acc.dIo + s.dIo,
        acc.dSelf + s.dSelf, acc.dWq + s.dWq, acc.wall + s.wall)
      if (acc.wall >= minWall) { out += acc; acc = Seg(0L, 0L, 0L, 0L, 0.0) }
    }
    if (acc.wall > 0.0) {
      if (out.isEmpty) out += acc
      else {
        val last = out.remove(out.size - 1)
        out += Seg(last.dBusy + acc.dBusy, last.dIo + acc.dIo,
          last.dSelf + acc.dSelf, last.dWq + acc.dWq,
          last.wall + acc.wall)
      }
    }
    out.toSeq
  }

  /** max-of-reps over median-of-reps: a query whose three interleaved
    * samples disagree by more than ~3x sat inside a contention era at
    * least once (the judge's self-noise signal, VERDICT r16 #2).
    * Published as a count, not a contamination trigger — the median
    * already discards one bad rep. The LOWER median for even sizes:
    * with two surviving reps (one failed) the upper median IS the
    * max, which would pin the ratio at 1.0 and hide exactly the
    * one-bad-rep case this exists to count. */
  private[graft] def spreadRatio(ts: Seq[Double]): Double =
    if (ts.size < 2) 1.0
    else {
      val sorted = ts.sorted
      val med = sorted((sorted.size - 1) / 2)
      if (med <= 0) 1.0 else sorted.last / med
    }

  /** The contamination decision (VERDICT r16 #1 + ADVICE r16 +
    * VERDICT r18 #3): dirty if external CPU exceeds the cap —
    * whole-run average OR any coalesced >=2 s window (burst
    * detection) — or system iowait exceeds its own cap on either
    * granularity (the IO blind spot the r16 final pass slipped
    * through), or the busiest device's average queue depth exceeds
    * the disk cap on either granularity (the CPU-saturated disk
    * blind spot: iowait only accrues on IDLE cores, so while the
    * bench's 32 threads keep every core busy a disk-saturating
    * co-tenant reads near-zero on both CPU channels — time-in-queue
    * accrues regardless). Every channel's per-window maximum exists
    * because a 30 s burst dilutes below any whole-run average. */
  private[graft] def isContaminated(extAvg: Double, extMax: Double,
                                    ioAvg: Double, ioMax: Double,
                                    dqAvg: Double, dqMax: Double,
                                    extCap: Double, ioCap: Double,
                                    dqCap: Double): Boolean =
    extAvg > extCap || extMax > extCap || ioAvg > ioCap || ioMax > ioCap ||
      dqAvg > dqCap || dqMax > dqCap

  /** This process's own jiffies (utime + stime, fields 14-15) from
    * /proc/self/stat. The comm field may contain spaces and parens,
    * so split after the LAST ')'. */
  private[graft] def selfJiffies(selfStat: String): Long = {
    val tail = selfStat.substring(selfStat.lastIndexOf(')') + 2).split(" ")
    tail(11).toLong + tail(12).toLong
  }

  /** Average EXTERNAL cores busy over a (Δbusy, Δself, wallSec)
    * window: other tenants' CPU seconds per wall second, self-load
    * excluded by construction. This is the contamination signal a
    * loadavg threshold cannot be (VERDICT r15 #3 follow-through): the
    * bench's own 32 executor threads push the box's 1-min loadavg to
    * 7-8 during any timed pass, so a fixed loadavg cap either flags
    * every pass or none — while the r14/r15 phantom-regression eras
    * were precisely OTHER processes stealing cores mid-window, which
    * this measures directly (USER_HZ = 100 on Linux). */
  private[graft] def externalCores(dBusy: Long, dSelf: Long,
                                   wallSec: Double): Double =
    if (wallSec <= 0) 0.0
    else math.max(0.0, (dBusy - dSelf) / 100.0 / wallSec)

  private def optJson(v: Option[Double]): String =
    v.map(x => BigDecimal(x).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toString).getOrElse("null")

  /** One full measured pass (warm pass + 3 interleaved timed passes)
    * rolled up with its own three-channel self-label, so a retried
    * run can publish BOTH attempts' labels (VERDICT r17 #1: the
    * artifact must show the retry, not hide the dirty first pass). */
  private[graft] final case class Pass(
      samples: Map[String, Vector[Double]],
      errors: Map[String, String],
      loadAvgs: Vector[Double],
      extCores: Option[Double], extMax: Option[Double],
      ioCores: Option[Double], ioMax: Option[Double],
      dqDepth: Option[Double], dqMax: Option[Double],
      noisyLines: Int, contaminated: Boolean) {
    // loadavg rides EVERY attempt's label: on the /proc-less fallback
    // path it is the only evidence of why a pass read dirty, and the
    // artifact must show the dirty first attempt's numbers, not just
    // its verdict
    def labelJson: String =
      s"""{"ext_cores":${optJson(extCores)},"ext_max":${optJson(extMax)},""" +
        s""""io_cores":${optJson(ioCores)},"io_max":${optJson(ioMax)},""" +
        s""""dq_depth":${optJson(dqDepth)},"dq_max":${optJson(dqMax)},""" +
        s""""noisy_lines":$noisyLines,"contaminated":$contaminated,""" +
        s""""loadavg":${loadAvgs.map(v => BigDecimal(v).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toString)
          .mkString("[", ",", "]")}}"""
  }

  /** The self-healing decision (VERDICT r17 next-round #1): a full
    * pass that self-labels dirty gets ONE retry after a cooldown —
    * the r17 driver artifact was correctly REFUSED (ext_max 4.66, 22
    * noisy lines) but left the round certified only by the committed
    * history, when a 2-minute wait would have bought a clean
    * driver-side bench. Decision table, pinned by BenchSpec:
    *
    *  - first pass clean                      -> "publish_first"
    *  - solo (SPARK_GRAFT_ONLY) or retries
    *    disabled (SPARK_GRAFT_RETRY=0)        -> "no_retry" (publish
    *    the dirty first pass — solo runs never persist anyway, and a
    *    disabled retry must not silently change the run's shape)
    *  - cooldown probe still above either cap -> "skip_busy" (the
    *    co-tenant is still there; a second 10-minute pass would just
    *    burn dirty — publish the labeled-dirty first pass)
    *  - probe clean                           -> "retry" (publish the
    *    second pass under its OWN label, dirty or not)
    *
    * The probe window runs while the bench is fully asleep, which is
    * exactly where both channels are most sensitive (external CPU has
    * zero self-noise; iowait accrues freely on idle cores). */
  private[graft] def retryDecision(firstContaminated: Boolean,
                                   soloRun: Boolean,
                                   retriesEnabled: Boolean,
                                   probeMeasured: Boolean,
                                   probeExt: Double, probeIo: Double,
                                   probeDq: Double,
                                   extCap: Double, ioCap: Double,
                                   dqCap: Double): String =
    if (!firstContaminated) "publish_first"
    else if (soloRun || !retriesEnabled) "no_retry"
    // an UNMEASURABLE probe (no /proc — the loadavg-fallback boxes)
    // must not read as "clean": retrying blind is a guaranteed
    // 10-minute second pass whose fallback label inherits the first
    // pass's decaying self-load and predictably publishes dirty
    // again — publish the labeled-dirty first pass instead
    else if (!probeMeasured) "skip_busy"
    else if (probeExt > extCap || probeIo > ioCap || probeDq > dqCap)
      "skip_busy"
    else "retry"

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
    // label every query's jobs (guide §1.5) so a listener / event log
    // can attribute stages; a thread-local string, free in the timing
    def labeled(name: String)(body: => Unit): Unit = {
      spark.sparkContext.setJobDescription(name)
      try body finally spark.sparkContext.setJobDescription(null)
    }
    // External-CPU window opens BEFORE any Spark work: everything the
    // bench itself burns from here on is `self` and subtracts out.
    def procRead(p: String): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)),
        java.nio.charset.StandardCharsets.UTF_8))
      catch { case _: Throwable => None }
    def cpuSample(): Option[(Long, Long, Long)] =
      for (st <- procRead("/proc/stat"); self <- procRead("/proc/self/stat"))
        yield {
          val cpuLine = st.linesIterator.next()
          (busyJiffies(cpuLine), iowaitJiffies(cpuLine), selfJiffies(self))
        }
    // diskstats sampled beside every cpu sample; empty map when the
    // file is absent (the /proc-less fallback boxes) — the disk
    // channel then reads 0 everywhere and never flags, leaving the
    // loadavg fallback as before
    def diskSample(): Map[String, Long] =
      procRead("/proc/diskstats").map(diskWeightedMs).getOrElse(Map.empty)
    // Solo/A-A mode (VERDICT r16 #1): SPARK_GRAFT_ONLY=q1,q2 times
    // just the named lines — for adjudicating a single shifted query
    // against history without a 10-minute full pass. A filtered run
    // NEVER persists (its partial map would erase the full history).
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // fail loud on a typo'd name: an adjudication run that silently
    // times NOTHING reads as a 0-second pass, not as the mistake it is
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    val queries = SparkEntry.queries.filter { case (k, _) =>
      only.forall(_.contains(k)) }
    // caps read ONCE — shared by every pass's self-label and the
    // retry-probe decision, so the two can't disagree
    val extCap = sys.env.getOrElse("SPARK_GRAFT_EXT_CORES_MAX", "2.0").toDouble
    val ioCap = sys.env.getOrElse("SPARK_GRAFT_IO_CORES_MAX", "2.0").toDouble
    // busiest-device average queue depth cap: like ioCap, calibrated
    // ABOVE the bench's own clean-pass level rather than near zero
    // (the bench's parquet/checkpoint writes queue real IO, though
    // the page cache absorbs most of it: a clean sf0.1 pass over the
    // checkpoint-heavy lines measured dq_depth 0.06 whole-run,
    // dq_max 0.03 per-window) — a saturating co-tenant holds depth
    // well above this cap for its whole era
    val dqCap = sys.env.getOrElse("SPARK_GRAFT_DQ_MAX", "4.0").toDouble
    val loadCap = sys.env.getOrElse("SPARK_GRAFT_LOAD_MAX", "4.0").toDouble
    // JIT/codegen warm-up: run every query once at the tiny sf so the
    // timed runs measure steady-state throughput, not first-run
    // interpreter/compile cost (measured 4-5x on string-heavy paths).
    // Once per JVM — a retried pass is already JIT-warm.
    queries.foreach { case (name, fn) =>
      try labeled(s"warmup: $name")(run(fn, "/root/testdata/sf0.001"))
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
    //
    // The whole measured pass — full-size warm pass, 3 interleaved
    // timed passes, /proc bracketing, self-label — is one function so
    // a dirty first pass can be retried whole (VERDICT r17 #1). The
    // external-CPU window opens at pass start: everything the bench
    // burns inside the pass is `self` and subtracts out; the warm
    // pass stays INSIDE because a retry must re-warm the page cache
    // the contended era evicted, or the retry re-measures the
    // co-tenant's damage instead of the code.
    def measuredPass(): Pass = {
      val cpu0 = cpuSample()
      val disk0 = diskSample()
      val wall0 = System.nanoTime()
      val errors = collection.mutable.LinkedHashMap[String, String]()
      queries.foreach { case (name, fn) =>
        try labeled(s"prepass: $name")(run(fn, sfDir))
        catch { case _: Throwable => }
      }
      // Host-contention self-identification (VERDICT r13 perf note):
      // the r13 artifact's uniform +50-110% drift on untouched queries
      // was a box-wide era, invisible in the artifact itself. Sample
      // the 1-min system load before each timed pass (and once at the
      // end) so a contaminated era is visible without a rerun.
      val loadAvgs = collection.mutable.ArrayBuffer[Double]()
      def sampleLoad(): Unit = loadAvgs += java.lang.management
        .ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
      val samples = collection.mutable.LinkedHashMap[String, Vector[Double]]()
      // Per-query /proc slices (ADVICE r16): bracketing every timed
      // run gives the burst-window and iowait signals their
      // granularity — six tiny /proc reads per query, ~1 ms against
      // 100 ms+ queries.
      val segs = collection.mutable.ArrayBuffer[Seg]()
      for (_ <- 1 to 3) {
        sampleLoad()
        queries.foreach { case (name, fn) =>
          val s0 = cpuSample()
          val d0 = diskSample()
          val t0 = System.nanoTime()
          val okRun = try { labeled(name)(run(fn, sfDir)); true }
          catch { case e: Throwable =>
            errors(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}"
            false
          }
          val wall = (System.nanoTime() - t0) / 1e9
          val dWq = diskDeltaMs(d0, diskSample())
          for ((b0, i0, f0) <- s0; (b1, i1, f1) <- cpuSample())
            segs += Seg(b1 - b0, i1 - i0, f1 - f0, dWq, wall)
          if (okRun) {
            samples(name) = samples.getOrElse(name, Vector.empty) :+ wall
          }
        }
      }
      sampleLoad()
      // Contamination (VERDICT r16 #1 + ADVICE r16, isContaminated):
      // whole-run external-CPU average above the cap, OR any coalesced
      // >=2 s per-query window above the same cap (burst detection),
      // OR system iowait-cores above the IO cap on either granularity
      // — the channel the r16 final pass slipped through. Fallback
      // when /proc is unavailable: the pre-r16 loadavg rule — on
      // ENTRY only (the in-run samples measure the bench's own
      // threads).
      val endWall = (System.nanoTime() - wall0) / 1e9
      val endSample = cpuSample()
      val diskEnd = diskSample()
      val extCores: Option[Double] =
        for ((b0, _, s0) <- cpu0; (b1, _, s1) <- endSample)
          yield externalCores(b1 - b0, s1 - s0, endWall)
      val ioCores: Option[Double] =
        for ((_, i0, _) <- cpu0; (_, i1, _) <- endSample)
          yield math.max(0.0, (i1 - i0) / 100.0 / endWall)
      val dqDepth: Option[Double] =
        if (disk0.isEmpty || diskEnd.isEmpty || endWall <= 0) None
        else Some(diskDeltaMs(disk0, diskEnd) / 1000.0 / endWall)
      val windows = coalesceWindows(segs.toSeq, 2.0)
      val extMax: Option[Double] =
        if (windows.isEmpty) None
        else Some(windows.map(w =>
          externalCores(w.dBusy, w.dSelf, w.wall)).max)
      val ioMax: Option[Double] =
        if (windows.isEmpty) None
        else Some(windows.map(w =>
          math.max(0.0, w.dIo / 100.0 / w.wall)).max)
      val dqMax: Option[Double] =
        if (windows.isEmpty || dqDepth.isEmpty) None
        else Some(windows.map(w => w.dWq / 1000.0 / w.wall).max)
      val noisyLines = samples.values.count { ts =>
        ts.size >= 2 && spreadRatio(ts) > 3.0 &&
          ts.sorted.apply(ts.size / 2) > 0.05
      }
      val contaminated = extCores match {
        case Some(x) => isContaminated(x, extMax.getOrElse(0.0),
          ioCores.getOrElse(0.0), ioMax.getOrElse(0.0),
          dqDepth.getOrElse(0.0), dqMax.getOrElse(0.0),
          extCap, ioCap, dqCap)
        // /proc/stat unreadable: loadavg fallback — but the disk
        // channel samples /proc/diskstats INDEPENDENTLY, so a valid
        // dq reading still flags (review r19: the first cut dropped a
        // measured dq 9.0 on this path and published clean)
        case None => (loadAvgs.nonEmpty && loadAvgs.head > loadCap) ||
          dqDepth.exists(_ > dqCap) || dqMax.exists(_ > dqCap)
      }
      Pass(samples.toMap, errors.toMap, loadAvgs.toVector,
        extCores, extMax, ioCores, ioMax, dqDepth, dqMax,
        noisyLines, contaminated)
    }

    // Self-healing on contamination (VERDICT r17 next-round #1): a
    // dirty full pass sleeps a cooldown, probes the box over a short
    // fully-idle window, and retries ONCE if the probe reads clean.
    // See retryDecision for the pinned table. Both attempts'
    // self-labels ship in the artifact.
    val p1 = measuredPass()
    val retriesEnabled = sys.env.getOrElse("SPARK_GRAFT_RETRY", "1") != "0"
    val cooldownSec =
      sys.env.getOrElse("SPARK_GRAFT_RETRY_COOLDOWN_SEC", "90").toDouble
    val decision: String =
      if (!p1.contaminated || only.nonEmpty || !retriesEnabled)
        retryDecision(p1.contaminated, only.nonEmpty, retriesEnabled,
          probeMeasured = true, 0.0, 0.0, 0.0, extCap, ioCap, dqCap)
      else {
        val s0 = cpuSample()
        val d0 = diskSample()
        val t0 = System.nanoTime()
        Thread.sleep(math.max(1L, (cooldownSec * 1000).toLong))
        val wall = (System.nanoTime() - t0) / 1e9
        // the asleep-probe disk depth has ZERO self-IO, so any queue
        // time here is the co-tenant's — but it is still judged
        // against the same dqCap the pass label used, so the two
        // decisions cannot disagree about what "dirty" means
        val probeDq = diskDeltaMs(d0, diskSample()) / 1000.0 / wall
        val probe: Option[(Double, Double)] =
          for ((b0, i0, f0) <- s0; (b1, i1, f1) <- cpuSample())
            yield (externalCores(b1 - b0, f1 - f0, wall),
              math.max(0.0, (i1 - i0) / 100.0 / wall))
        retryDecision(firstContaminated = true, soloRun = false,
          retriesEnabled = true, probeMeasured = probe.nonEmpty,
          probe.map(_._1).getOrElse(0.0), probe.map(_._2).getOrElse(0.0),
          probeDq, extCap, ioCap, dqCap)
      }
    val p2 = if (decision == "retry") Some(measuredPass()) else None
    val pub = p2.getOrElse(p1)
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val results = queries.keys.map { name =>
      val ts = pub.samples.getOrElse(name, Vector.empty)
      name -> (if (ts.isEmpty) -1.0 else ts.sorted.apply(ts.size / 2))
    }.toSeq
    // ms precision, sorted cheapest-FIRST: the driver's artifact keeps
    // only the output's last ~3.3 KB (the TAIL), so the queries map
    // goes LAST in the JSON with the slowest lines at the very end —
    // if the line is ever longer than the tail window, truncation
    // drops the cheap lines and the front matter, never the expensive
    // lines a reader wants first (VERDICT r11 #1; r10's fix sorted
    // the wrong way and lost the ~30 slowest lines).
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.sortBy(_._2)
      .map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = pub.errors
      .filter { case (k, _) => pub.samples.getOrElse(k, Vector.empty).isEmpty }
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    // Era-drift self-identification (VERDICT r11 #8): compare against
    // the newest BENCH_r{N}.json already in the repo and emit the
    // geometric-mean ratio plus ONLY the lines that moved >20% — a
    // compact field (the full prev map is already on disk as the
    // artifact itself, so re-emitting it would just crowd the tail
    // window that item #1 exists to protect). Prev artifacts are
    // tail-truncated by the driver, so parse "key":num pairs by regex
    // rather than as strict JSON.
    // The comparison base prefers the repo-side FULL history file
    // (VERDICT r14 #3): the driver's artifact keeps only the ~3.3 KB
    // stdout tail, which caps vs_prev at ~77 of 154 lines and loses
    // half the per-query history every round. BENCH_LOCAL.json — the
    // complete medians map of the previous run, committed per round —
    // covers every line; the truncated artifact stays as fallback for
    // a fresh checkout. Only a same-sf local file is comparable.
    val localHist = new java.io.File("/root/repo/BENCH_LOCAL.json")
    // the geomean escapes the vs_prev block so the compact final line
    // (see compactLine) can carry it inside the driver's tail window
    var geoOpt: Option[Double] = None
    val vsPrev: String = try {
      val fromLocal: Option[(String, Map[String, Double])] =
        if (!localHist.exists()) None else {
          val raw = new String(java.nio.file.Files.readAllBytes(
            localHist.toPath), java.nio.charset.StandardCharsets.UTF_8)
          val sfRe = "\"sf\":\"([^\"]*)\"".r
          if (sfRe.findFirstMatchIn(raw).exists(_.group(1) == sfDir))
            Some(("\"source\":\"BENCH_LOCAL\"", parsePrevQueryTimes(raw)))
          else None
        }
      val fromArtifact: Option[(String, Map[String, Double])] = {
        val benchRe = "BENCH_r(\\d+)\\.json".r
        val repo = new java.io.File("/root/repo")
        val prevFiles = Option(repo.listFiles()).getOrElse(Array.empty)
          .flatMap { f => f.getName match {
            case benchRe(n) => Some((n.toInt, f)); case _ => None } }
        if (prevFiles.isEmpty) None else {
          val (prevRound, prevFile) = prevFiles.maxBy(_._1)
          val raw = new String(java.nio.file.Files.readAllBytes(
            prevFile.toPath), java.nio.charset.StandardCharsets.UTF_8)
          Some((s""""round":$prevRound""", parsePrevQueryTimes(raw)))
        }
      }
      fromLocal.orElse(fromArtifact) match {
        case None => "null"
        case Some((srcLabel, prev)) =>
          val cur = results.toMap
          val ratios = cur.keys.toSeq.sorted.flatMap { k =>
            for (p <- prev.get(k); c = cur(k); if p > 0 && c > 0)
              yield k -> c / p
          }
          if (ratios.isEmpty) "null" else {
            val geo = math.exp(ratios.map(r => math.log(r._2)).sum / ratios.size)
            geoOpt = Some(geo)
            def r2(v: Double) = BigDecimal(v).setScale(2,
              BigDecimal.RoundingMode.HALF_UP).toString
            // capped at the 30 largest shifts (VERDICT r19 #1): a
            // contaminated pass can push 60+ lines over 1.2x, and an
            // uncapped map blows the whole vs_prev line past the
            // driver's 2000-char tail window; shifted_n records how
            // many shifted in total so a cap never reads as "only 30
            // lines moved"
            val allShifted = ratios
              .filter { case (_, r) => math.abs(math.log(r)) > math.log(1.2) }
              .sortBy { case (_, r) => -math.abs(math.log(r)) }
            val shifted = allShifted.take(30)
              .map { case (k, r) => "\"" + k + "\":" + r2(r) }
              .mkString("{", ",", "}")
            s"""{$srcLabel,"lines":${ratios.size},"geomean":${r2(geo)},"shifted_n":${allShifted.size},"shifted_gt20pct":$shifted}"""
          }
      }
    } catch { case _: Throwable => "null" }
    // Contamination self-labeling (VERDICT r15 #3 → r16 #1/#2 → r17
    // #1): the published pass carries its own three-channel label;
    // when a retry happened, BOTH attempts' labels ship (a clean
    // artifact that hides a dirty first attempt would read as an
    // idle box when it wasn't one). `retry` records the decision:
    // publish_first | no_retry | skip_busy | retry.
    val loadJson = pub.loadAvgs.map(v => BigDecimal(v).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toString).mkString("[", ",", "]")
    val attemptsJson =
      (Seq(p1) ++ p2).map(_.labelJson).mkString("[", ",", "]")
    val selfLabel = s""""ext_cores":${optJson(pub.extCores)},"ext_max":${optJson(pub.extMax)},"io_cores":${optJson(pub.ioCores)},"io_max":${optJson(pub.ioMax)},"dq_depth":${optJson(pub.dqDepth)},"dq_max":${optJson(pub.dqMax)},"noisy_lines":${pub.noisyLines},"contaminated":${pub.contaminated},"retry":"$decision","attempts":$attemptsJson"""
    // Persist the full medians map AFTER reading the previous one, so
    // consecutive runs chain (this run becomes the next run's base).
    // Best-effort: a read-only checkout must not fail the bench.
    try {
      val prevRaw =
        if (!localHist.exists()) None
        else Some(new String(java.nio.file.Files.readAllBytes(
          localHist.toPath), java.nio.charset.StandardCharsets.UTF_8))
      if (only.isEmpty && shouldPersist(pub.contaminated, prevRaw, sfDir)) {
        val full = s"""{"sf":"$sfDir","loadavg":$loadJson,$selfLabel,"errors":$errJson,"queries":$qs}\n"""
        java.nio.file.Files.write(localHist.toPath,
          full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    } catch { case _: Throwable => }
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":"$sfDir","errors":$errJson,"queries":$qs}""")
    // vs_prev on its OWN line AFTER the main JSON (VERDICT r12 #1):
    // the driver's artifact keeps only the output's tail, so anything
    // that must survive capture has to come after the queries map —
    // r12 computed the era comparison but embedded it before the map,
    // and the tail window truncated it away.
    println(s"""{"metric":"vs_prev","value":$vsPrev,"loadavg":$loadJson,$selfLabel}""")
    // the COMPACT line prints LAST (VERDICT r19 #1): the only line
    // guaranteed to sit whole inside the driver's 2000-char tail, so
    // the driver's per-query parse and the c8/c32 scaling comparison
    // finally have data. Same total, same medians — a re-emission of
    // the slowest prefix, never a different measurement.
    println(compactLine(r3(total), sfDir, results.sortBy(-_._2), geoOpt,
      pub.errors.count { case (k, _) =>
        pub.samples.getOrElse(k, Vector.empty).isEmpty }))
    spark.stop()
  }
}
