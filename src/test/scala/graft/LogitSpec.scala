package graft

import graft.operators.Logit
import org.apache.spark.sql.functions._

/** Deterministic logistic regression: bit-equality to a local mirror
  * of the identical recurrence, partitioning independence (the
  * integer-grid gradient contract), scoring consistency, and the
  * calibration report's invariants. */
class LogitSpec extends SparkSpec {
  import spark.implicits._

  /** Local mirror of Logit.train on (x1, x2, y) rows: the same
    * fixed-order z fold, the same 1e-9 grid (Spark's round(double)
    * is BigDecimal.valueOf + HALF_UP), the same exact integer sums,
    * the same driver update expression. */
  private def localTrain(rows: Seq[(Long, Long, Int)], iters: Int,
                         lr: Double): (Double, Seq[Double]) = {
    val xs = 64.0
    def grid(v: Double): Long = java.math.BigDecimal.valueOf(v * 1e9)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    var b = 0.0
    var w = Vector(0.0, 0.0)
    val n = rows.length.toLong
    for (_ <- 1 to iters) {
      var gb = 0L
      val g = Array(0L, 0L)
      rows.foreach { case (x1, x2, y) =>
        val z = (b + w(0) * (x1.toDouble / xs)) + w(1) * (x2.toDouble / xs)
        val resid = (1.0 / (1.0 + math.exp(-z))) - y.toDouble
        gb += grid(resid)
        g(0) += grid(resid * (x1.toDouble / xs))
        g(1) += grid(resid * (x2.toDouble / xs))
      }
      b = b - lr * (gb.toDouble / 1e9 / n)
      w = Vector(w(0) - lr * (g(0).toDouble / 1e9 / n),
        w(1) - lr * (g(1).toDouble / 1e9 / n))
    }
    (b, w)
  }

  private def sigDf(rows: Seq[(Long, Long, Int)]) =
    rows.zipWithIndex
      .map { case ((x1, x2, y), i) => (i.toLong, x1, x2, y) }
      .toDF("id", "f1", "f2", "y")

  private val rows: Seq[(Long, Long, Int)] =
    (0 until 120).map { i =>
      val x1 = (i * 37 % 90).toLong
      val x2 = (i * 13 % 7).toLong
      (x1, x2, if (x1 >= 30 && x2 >= 1) 1 else 0)
    }

  test("train matches the local mirror bit-for-bit") {
    val m = Logit.train(sigDf(rows), "y", Seq("f1", "f2"),
      iterations = 12, lr = 1.0)
    val (eb, ew) = localTrain(rows, iters = 12, lr = 1.0)
    assert(m.bias == eb)
    assert(m.weights == ew)
  }

  test("fitted model is partitioning-independent") {
    val df = sigDf(rows)
    val m1 = Logit.train(df, "y", Seq("f1", "f2"), 8, 1.0)
    val m2 = Logit.train(df.repartition(7), "y", Seq("f1", "f2"), 8, 1.0)
    assert(m1 == m2)
  }

  test("score: pred is the exact z>=0 decision, prob matches sigmoid") {
    val df = sigDf(rows)
    val m = Logit.train(df, "y", Seq("f1", "f2"), 20, 1.0)
    val got = Logit.score(df, m, Seq("id", "f1", "f2", "y"))
      .select(col("id"), col("f1"), col("f2"), col("z"), col("prob"),
        col("pred"))
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    got.foreach { case (_, x1, x2, z, prob, pred) =>
      val ez = (m.bias + m.weights(0) * (x1.toDouble / 64.0)) +
        m.weights(1) * (x2.toDouble / 64.0)
      assert(z == r6(ez))
      assert(prob == r6(1.0 / (1.0 + math.exp(-ez))))
      assert(pred == (if (ez >= 0.0) 1L else 0L))
      assert(prob > 0.0 && prob < 1.0)
    }
    // the fitted model separates the bulk of the rule: >= 80% agree
    val acc = got.count { case (i, x1, x2, _, _, pred) =>
      pred == (if (x1 >= 30 && x2 >= 1) 1L else 0L)
    }.toDouble / got.length
    assert(acc >= 0.8, s"held accuracy $acc")
  }

  test("calibration bins partition the frame and bound their logits") {
    val df = sigDf(rows)
    val m = Logit.train(df, "y", Seq("f1", "f2"), 20, 1.0)
    val bins = Logit.calibration(df, m, "y")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(bins.map(_._2).sum == rows.length)
    val edges = Logit.zEdges
    bins.foreach { case (bin, n, nPos, posRate, meanZ) =>
      assert(bin >= 0 && bin <= 9)
      assert(nPos <= n)
      assert(posRate >= 0.0 && posRate <= 1.0)
      // mean logit sits inside the bin's z interval (open above; the
      // 1e-6 mean grid can sit a hair past an edge only by rounding)
      val lo = if (bin == 0) Double.NegativeInfinity else edges(bin.toInt - 1)
      val hi = if (bin == 9) Double.PositiveInfinity else edges(bin.toInt)
      assert(meanZ >= lo - 1e-5 && meanZ <= hi + 1e-5,
        s"bin $bin mean_z $meanZ outside [$lo, $hi]")
    }
    // a decile's empirical rate should broadly track its probability
    // range on this separable corpus: the top-occupied bin is purer
    // than the bottom-occupied bin
    val sorted = bins.sortBy(_._1)
    assert(sorted.last._4 >= sorted.head._4)
  }

  /** d-agnostic local mirror (VERDICT r15 #7): same fixed-order z
    * fold, same grid, same update order, any feature count. */
  private def localTrainD(rows: Seq[(Seq[Long], Int)], iters: Int,
                          lr: Double): (Double, Seq[Double]) = {
    val xs = 64.0
    def grid(v: Double): Long = java.math.BigDecimal.valueOf(v * 1e9)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val d = rows.head._1.length
    var b = 0.0
    var w = Vector.fill(d)(0.0)
    val n = rows.length.toLong
    for (_ <- 1 to iters) {
      var gb = 0L
      val g = Array.fill(d)(0L)
      rows.foreach { case (xsRow, y) =>
        // the zSql fold: left-to-right, one term at a time
        val z = xsRow.indices.foldLeft(0.0 + b) { (acc, j) =>
          acc + w(j) * (xsRow(j).toDouble / xs)
        }
        val resid = (1.0 / (1.0 + math.exp(-z))) - y.toDouble
        gb += grid(resid)
        xsRow.indices.foreach { j =>
          g(j) += grid(resid * (xsRow(j).toDouble / xs))
        }
      }
      b = b - lr * (gb.toDouble / 1e9 / n)
      w = Vector.tabulate(d)(j => w(j) - lr * (g(j).toDouble / 1e9 / n))
    }
    (b, w)
  }

  test("d=4: train matches the local mirror bit-for-bit, any partitioning " +
      "(VERDICT r15 #7)") {
    val rows4: Seq[(Seq[Long], Int)] = (0 until 150).map { i =>
      val x = Seq((i * 37 % 90).toLong, (i * 13 % 7).toLong,
        (i * 101 % 600).toLong, (i * 7 % 30).toLong)
      (x, if (x(0) >= 30 && x(1) >= 1) 1 else 0)
    }
    val df = rows4.zipWithIndex.map { case ((x, y), i) =>
      (i.toLong, x(0), x(1), x(2), x(3), y)
    }.toDF("id", "f1", "f2", "f3", "f4", "y")
    val feats = Seq("f1", "f2", "f3", "f4")
    val m = Logit.train(df, "y", feats, iterations = 15, lr = 0.5)
    val (eb, ew) = localTrainD(rows4, iters = 15, lr = 0.5)
    assert(m.bias == eb)
    assert(m.weights == ew)
    // the grid contract holds at d>2 in any partitioning
    val m2 = Logit.train(df.repartition(11), "y", feats, 15, 0.5)
    assert(m == m2)
  }

  test("a diverging step fails fast with a non-finite-model error") {
    // lr large enough that the first update overflows a weight to
    // -Infinity (feature ~6000, resid ~0.5 => grad ~50; 1e307 * 50
    // overflows double): the NEXT zSql evaluation must throw the
    // dLit finite-require, not silently keep training on garbage
    val df = (0 until 50).map(i => (i.toLong, 6000L + i, i % 2))
      .toDF("id", "f1", "y")
    val ex = intercept[IllegalArgumentException] {
      Logit.train(df, "y", Seq("f1"), iterations = 3, lr = 1e307)
    }
    assert(ex.getMessage.contains("non-finite model value"))
  }

  test("declared queries: shared model, hash-stable columns") {
    val q = SparkEntry.queries("classify_logreg")(spark, sf0001)
    assert(q.columns.toSeq ==
      Seq("doc_id", "label", "pred", "prob", "z", "agree"))
    assert(q.count() > 0)
    val r = SparkEntry.queries("classify_logreg_report")(spark, sf0001)
    assert(r.columns.toSeq == Seq("bin", "n", "n_pos", "pos_rate", "mean_z"))
    // report rows cover the same held-out docs the scored query emits
    assert(r.agg(sum(col("n"))).head().getLong(0) == q.count())
    // the d=6 member scores the same held-out fifth with the same
    // column contract and a usable linear fit
    val m = SparkEntry.queries("classify_logreg_multi")(spark, sf0001)
    assert(m.columns.toSeq ==
      Seq("doc_id", "label", "pred", "prob", "z", "agree"))
    assert(m.count() == q.count())
  }
}
