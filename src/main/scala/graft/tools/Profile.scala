package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-job/per-stage wall breakdown for one declared query — the
  * measure-first loop (guide §1) without a UI on this box: run the
  * query once warm, then once instrumented, and print every job and
  * stage with its wall, task count, and shuffle bytes so the hot
  * stage is identifiable from a terminal. args = sfDir name [reps]. */
object Profile {
  final case class StageRow(id: Int, name: String, tasks: Int,
                            wallMs: Long, shufRead: Long, shufWrite: Long,
                            input: Long, runMs: Long, cpuMs: Long,
                            gcMs: Long, deserMs: Long)

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 1
    for (name <- names) profileOne(spark, dir, name, reps)
    spark.stop()
  }

  private def profileOne(spark: SparkSession, dir: String,
                         name: String, reps: Int): Unit = {
    val fn = graft.SparkEntry.queries(name)
    def run(): Unit = fn(spark, dir).queryExecution.toRdd.count()
    run() // warm: JIT + codegen cache + page cache + index memos

    val stages = mutable.Map[Int, StageRow]()
    val jobs = mutable.ArrayBuffer[(Int, Long, String)]()
    val jobStart = mutable.Map[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = j.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
          .getOrElse("?")
        jobStart(j.jobId) = (System.nanoTime(), site)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobStart.remove(j.jobId).foreach { case (t0, site) =>
          jobs += ((j.jobId, (System.nanoTime() - t0) / 1000000L, site))
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for (a <- si.submissionTime; b <- si.completionTime)
          yield b - a).getOrElse(-1L)
        val m = si.taskMetrics
        stages(si.stageId) = StageRow(si.stageId,
          si.name.takeWhile(_ != '\n'), si.numTasks, wall,
          m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten, m.inputMetrics.bytesRead,
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.jvmGCTime, m.executorDeserializeTime)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val walls = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      run()
      (System.nanoTime() - t0) / 1e9
    }
    spark.sparkContext.removeSparkListener(listener)
    Thread.sleep(300) // let the listener bus drain

    val sv = stages.values.toSeq
    println(f"[profile] $name wall=${walls.min}%.3f s (min of $reps)")
    // jobs/stages accumulate across ALL reps (stage ids never repeat),
    // so totals are reps-multiplied — print per-rep alongside so the
    // header is comparable with the min-of-reps wall above
    println(f"[profile] jobs=${jobs.size} stages=${stages.size} " +
      f"tasks=${sv.map(_.tasks).sum} runMs=${sv.map(_.runMs).sum} " +
      f"cpuMs=${sv.map(_.cpuMs).sum} gcMs=${sv.map(_.gcMs).sum} " +
      f"deserMs=${sv.map(_.deserMs).sum} (over $reps reps; per-rep: " +
      f"jobs=${jobs.size / reps} runMs=${sv.map(_.runMs).sum / reps} " +
      f"cpuMs=${sv.map(_.cpuMs).sum / reps})")
    jobs.sortBy(-_._2).take(16).foreach { case (id, ms, site) =>
      println(f"[job] id=$id%-4d wall=${ms}ms  $site")
    }
    jobs.groupBy(_._3).view.mapValues(js => (js.size, js.map(_._2).sum))
      .toSeq.sortBy(-_._2._2).take(12).foreach { case (site, (n, ms)) =>
        println(f"[jobsite] n=$n%-3d sum=${ms}ms  $site")
      }
    sv.sortBy(-_.runMs).take(24).foreach { s =>
      println(f"[stage] id=${s.id}%-4d wall=${s.wallMs}%6dms run=${s.runMs}%6d " +
        f"cpu=${s.cpuMs}%6d gc=${s.gcMs}%5d deser=${s.deserMs}%5d " +
        f"tasks=${s.tasks}%3d in=${s.input}%9d sr=${s.shufRead}%9d " +
        f"sw=${s.shufWrite}%9d  ${s.name}")
    }
  }
}
