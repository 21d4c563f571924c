package graft

import org.apache.spark.sql.functions._
import graft.operators.Boost

/** Exact-integer AdaBoost (operators/Boost.scala): bit-exact vs a
  * local mirror of the integer algorithm, learns a planted AND-rule
  * the base rate can't explain, partitioning-independent, and sane on
  * the clamp/constant-stump edges. */
class BoostSpec extends SparkSpec {
  import spark.implicits._

  /** Local mirror: same candidate set, same (err, feature, theta,
    * pol) argmin order, same integer clamps and renorm flooring. */
  private def localTrain(rows: Seq[(Long, Long, Long, Int)], rounds: Int,
                         rScale: BigInt = BigInt("1000000000000"))
      : List[(String, Long, Int, Long, Long, Long)] = {
    val feats = Seq("a" -> ((r: (Long, Long, Long, Int)) => r._2),
      "b" -> ((r: (Long, Long, Long, Int)) => r._3))
    var w = rows.map(r => r._1 -> BigInt(1)).toMap
    var model = List.empty[(String, Long, Int, Long, Long, Long)]
    for (_ <- 1 to rounds) {
      val cands = feats.flatMap { case (f, get) =>
        (rows.map(get).distinct :+ (rows.map(get).max + 1)).map(f -> _)
      }
      val best = cands.flatMap { case (f, th) =>
        val get = feats.toMap.apply(f)
        val errPos = rows.filter(r =>
          (if (get(r) >= th) 1 else -1) != (if (r._4 == 1) 1 else -1))
          .map(r => w(r._1)).sum
        val wtot = rows.map(r => w(r._1)).sum
        Seq((errPos, f, th, 1), (wtot - errPos, f, th, -1))
      }.minBy(t => (t._1, t._2, t._3, t._4))
      val (err, f, th, pol) = best
      val get = feats.toMap.apply(f)
      val wtot = rows.map(r => w(r._1)).sum
      val eps = err.max(1)
      val rest = (wtot - err).max(1)
      val u = rows.map { r =>
        val h = if (get(r) >= th) pol else -pol
        val yy = if (r._4 == 1) 1 else -1
        r._1 -> w(r._1) * (if (h == yy) eps else rest)
      }.toMap
      val d = (u.values.sum / rScale).max(1)
      w = u.view.mapValues(_ / d).toMap
      model = (f, th, pol, eps.toLong, rest.toLong, d.toLong) :: model
    }
    model.reverse
  }

  private def localPredict(model: List[(String, Long, Int, Long, Long, Long)],
                           a: Long, b: Long): Long = {
    var va = BigInt(1); var vb = BigInt(1)
    model.foreach { case (f, th, pol, eps, rest, _) =>
      val v = if (f == "a") a else b
      val h = if (v >= th) pol else -pol
      if (h == 1) { va *= rest; vb *= eps } else { va *= eps; vb *= rest }
    }
    if (va > vb) 1L else 0L
  }

  // planted AND-rule: y = (a >= 30 && b >= 1); mixed marginals so no
  // single stump explains it
  private val planted: Seq[(Long, Long, Long, Int)] =
    (0L until 200L).map { i =>
      val a = 5 + (i * 7) % 90          // 5..94
      val b = if (i % 3 == 0) 0L else 1L + i % 2
      (i, a, b, if (a >= 30 && b >= 1) 1 else 0)
    }

  test("training matches the local integer mirror exactly") {
    val df = planted.toDF("id", "a", "b", "y")
    val m = Boost.trainStumps(df, "y", Seq("a", "b"), rounds = 3)
    val exp = localTrain(planted, 3)
    assert(m.stumps.map(s =>
      (s.feature, s.theta, s.pol, s.eps, s.rest, s.renorm)) ==
      exp.map { case (f, th, p, e, r, d) =>
        (if (f == "a") "a" else "b", th, p, e, r, d) })
  }

  test("the committee learns the AND rule; scoring matches the mirror") {
    val df = planted.toDF("id", "a", "b", "y")
    val m = Boost.trainStumps(df, "y", Seq("a", "b"), rounds = 3)
    val got = Boost.scoreStumps(df, m, Seq("id", "a", "b", "y"))
      .as[(Long, Long, Long, Int, Long)].collect()
    val exp = localTrain(planted, 3)
    got.foreach { case (id, a, b, _, pred) =>
      assert(pred == localPredict(exp, a, b), s"id=$id") }
    val acc = got.count { case (_, _, _, y, pred) => y.toLong == pred }.toDouble / got.length
    val base = planted.count(_._4 == 1).toDouble / planted.size
    assert(acc >= 0.95 && acc > math.max(base, 1 - base) + 0.05,
      s"acc=$acc base=$base")
  }

  test("model and predictions are partitioning-independent") {
    val df = planted.toDF("id", "a", "b", "y")
    val m1 = Boost.trainStumps(df.repartition(1), "y", Seq("a", "b"), 3)
    val m7 = Boost.trainStumps(df.repartition(7), "y", Seq("a", "b"), 3)
    assert(m1.stumps == m7.stumps)
  }

  test("perfectly separable data hits the eps clamp and still predicts the rule") {
    val rows = (0L until 40L).map(i => (i, i % 50, 0L, if (i % 50 >= 20) 1 else 0))
    val df = rows.toDF("id", "a", "b", "y")
    val m = Boost.trainStumps(df, "y", Seq("a", "b"), rounds = 2)
    assert(m.stumps.head.eps == 1L) // clamped: the stump is perfect
    val got = Boost.scoreStumps(df, m, Seq("id", "y"))
      .as[(Long, Int, Long)].collect()
    got.foreach { case (id, y, pred) => assert(pred == y.toLong, s"id=$id") }
  }

  test("high-cardinality feature: candidate cap binds, grid stays bounded, rule still learned") {
    // a length-in-chars-like signal: ~2000 distinct values, far over
    // a cap of 16 — the exact-distinct candidate set would be 2000+
    // thetas; the quantile grid must stay <= cap while still letting
    // boosting find the planted threshold region
    val rows = (0L until 2000L).map { i =>
      val a = i * 13 % 1999            // ~1999 distinct values
      (i, a, i % 2, if (a >= 1000) 1 else 0)
    }
    val df = rows.toDF("id", "a", "b", "y")
    val m = Boost.trainStumps(df, "y", Seq("a", "b"), rounds = 3,
      maxCandidates = 16)
    // committee accuracy: the sampled grid cannot split at exactly
    // 1000, but a nearby quantile threshold gets close
    val got = Boost.scoreStumps(df, m, Seq("id", "y"))
      .as[(Long, Int, Long)].collect()
    val acc = got.count { case (_, y, p) => y.toLong == p }.toDouble / got.length
    assert(acc >= 0.9, s"acc=$acc")
    // determinism under repartitioning (the sampled thresholds are
    // k-min-hash derived, not partition-order derived)
    val m7 = Boost.trainStumps(df.repartition(7), "y", Seq("a", "b"),
      rounds = 3, maxCandidates = 16)
    assert(m7.stumps == m.stumps)
  }

  test("cap does not bind on low-cardinality features: stumps unchanged vs uncapped") {
    val df = planted.toDF("id", "a", "b", "y")
    val uncapped = Boost.trainStumps(df, "y", Seq("a", "b"), rounds = 3,
      maxCandidates = 1000000)
    val default = Boost.trainStumps(df, "y", Seq("a", "b"), rounds = 3)
    val tight = Boost.trainStumps(df, "y", Seq("a", "b"), rounds = 3,
      maxCandidates = 90) // planted `a` has ~90 distinct values <= 90
    assert(default.stumps == uncapped.stumps)
    assert(tight.stumps == uncapped.stumps)
  }

  test("single-class data picks a constant stump via the sentinel") {
    val rows = (0L until 20L).map(i => (i, i % 5, i % 2, 1))
    val df = rows.toDF("id", "a", "b", "y")
    val m = Boost.trainStumps(df, "y", Seq("a", "b"), rounds = 1)
    val got = Boost.scoreStumps(df, m, Seq("id"))
      .as[(Long, Long)].collect()
    got.foreach { case (id, pred) => assert(pred == 1L, s"id=$id") }
  }
}
