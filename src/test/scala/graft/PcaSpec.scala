package graft

import org.apache.spark.sql.functions._
import graft.operators.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic anisotropic cloud: dim 0 carries ~16x the variance of
  // dim 1, dims 2/3 are small and correlated with 0/1
  private lazy val dim = 4
  private lazy val cloud = (0 until 400).map { i =>
    val a = math.sin(i * 0.7) * 2.0 + (i % 7) * 0.1
    val b = math.cos(i * 1.3) * 0.5
    (i.toLong, Array(a, b, 0.3 * a + 0.05 * math.sin(i.toDouble),
      -0.2 * b + 0.02 * math.cos(i * 2.0)).map(_.toFloat))
  }.toDF("vec_id", "embedding")

  private def bruteCov: Array[Array[Double]] = {
    val rows = cloud.select("embedding").as[Array[Float]].collect()
      .map(_.map(x => math.round(x.toDouble * 1e6) / 1e6)) // the 1e-6 grid
    val n = rows.length
    val mean = Array.tabulate(dim)(d => rows.map(_(d)).sum / n)
    Array.tabulate(dim, dim) { (i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
    }
  }

  test("jacobiEigen recovers analytic eigenpairs of a known symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 and 1 with vectors (1,1)/sqrt2, (1,-1)/sqrt2
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12 && math.abs(vals(1) - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r2, r2)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(vecs(1).zip(Array(r2, -r2)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("covariance matches a brute-force driver computation") {
    val got = Pca.covariance(cloud, "embedding", dim)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(3))).toMap
    val want = bruteCov
    for (i <- 0 until dim; j <- i until dim)
      assert(math.abs(got((i, j)) - want(i)(j)) < 1e-9,
        s"cov($i,$j): got ${got((i, j))}, want ${want(i)(j)}")
    assert(got.size == dim * (dim + 1) / 2)
  }

  test("fit: components are orthonormal and satisfy A v = lambda v") {
    val m = Pca.fit(cloud, "embedding", dim)
    val cov = bruteCov
    for (k <- 0 until dim; l <- k until dim) {
      val dot = (0 until dim).map(i => m.components(k)(i) * m.components(l)(i)).sum
      val want = if (k == l) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<v$k, v$l> = $dot")
    }
    // eigenvalues descending
    assert(m.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    for (k <- 0 until dim) {
      val av = (0 until dim).map(i =>
        (0 until dim).map(j => cov(i)(j) * m.components(k)(j)).sum)
      av.zipWithIndex.foreach { case (x, i) =>
        assert(math.abs(x - m.eigenvalues(k) * m.components(k)(i)) < 1e-7,
          s"(A v$k)[$i]") }
    }
  }

  test("fit is deterministic across invocations and partitionings") {
    val m1 = Pca.fit(cloud.repartition(7), "embedding", dim)
    val m2 = Pca.fit(cloud.repartition(2), "embedding", dim)
    assert(m1.eigenvalues.toSeq == m2.eigenvalues.toSeq)
    assert(m1.components.map(_.toSeq).toSeq == m2.components.map(_.toSeq).toSeq)
    assert(m1.means.toSeq == m2.means.toSeq)
  }

  test("project matches a manual centered dot product; projected variance tracks eigenvalues") {
    val m = Pca.fit(cloud, "embedding", dim)
    val p = 2
    val proj = Pca.project(cloud, "embedding", m, p)
      .select(col("vec_id"), col("pc0"), col("pc1"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val raw = cloud.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap
    raw.foreach { case (id, v) =>
      for (k <- 0 until p) {
        // same order-pinned fold as the operator: left-to-right over dims
        var acc = 0.0
        for (i <- 0 until dim)
          acc += (v(i).toDouble - m.means(i)) * m.components(k)(i)
        val got = if (k == 0) proj(id)._1 else proj(id)._2
        assert(math.abs(got - acc) < 1e-12, s"proj($id, pc$k)")
      }
    }
    // population variance of pc_k approximates eigenvalue k (exact up to
    // the 1e-6 input grid the fit quantizes on)
    val n = raw.size
    for (k <- 0 until p) {
      val xs = raw.keys.toSeq.map(id => if (k == 0) proj(id)._1 else proj(id)._2)
      val mean = xs.sum / n
      val varK = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(varK - m.eigenvalues(k)) < 1e-4,
        s"var(pc$k) = $varK vs eigenvalue ${m.eigenvalues(k)}")
    }
  }

  test("explainedVariance: shares sum to 1 and cumulate monotonically") {
    val m = Pca.fit(cloud, "embedding", dim)
    val rows = Pca.explainedVariance(cloud, m)
      .orderBy("component").collect()
    assert(rows.length == dim)
    val shares = rows.map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    val cums = rows.map(_.getDouble(3))
    assert(cums.sliding(2).forall(p => p.length < 2 || p(0) <= p(1) + 1e-12))
    assert(math.abs(cums.last - 1.0) < 1e-9)
  }

  test("whiten: unit variance per axis, scaled projection, partitioning-independent") {
    val p = 3
    val m = Pca.fit(cloud, "embedding", dim)
    val w = Pca.whiten(cloud, "embedding", m, p)
    val cols = w.columns
    assert((0 until p).forall(k => cols.contains(s"wpc$k")) && !cols.exists(_.startsWith("pc0")))
    val rows = w.select(Seq(col("vec_id")) ++ (0 until p).map(k => col(s"wpc$k")): _*)
      .collect().map(r => r.getLong(0) -> (1 to p).map(r.getDouble).toSeq).toMap
    // whitened coordinate = projected coordinate / sqrt(eigenvalue + eps)
    val proj = Pca.project(cloud, "embedding", m, p)
      .select(Seq(col("vec_id")) ++ (0 until p).map(k => col(s"pc$k")): _*)
      .collect().map(r => r.getLong(0) -> (1 to p).map(r.getDouble).toSeq).toMap
    rows.foreach { case (id, ws) =>
      (0 until p).foreach { k =>
        assert(ws(k) == proj(id)(k) * (1.0 / math.sqrt(m.eigenvalues(k) + 1e-9)), s"id=$id k=$k")
      }
    }
    // population variance of each whitened axis is ~1 (up to the fit grid)
    val n = rows.size
    (0 until p).foreach { k =>
      val xs = rows.values.toSeq.map(_(k))
      val mean = xs.sum / n
      val varK = xs.map(x => (x - mean) * (x - mean)).sum / n
      assert(math.abs(varK - 1.0) < 1e-3, s"var(wpc$k) = $varK")
    }
    val again = Pca.whiten(cloud.repartition(7), "embedding", m, p)
      .select(Seq(col("vec_id")) ++ (0 until p).map(k => col(s"wpc$k")): _*)
      .collect().map(r => r.getLong(0) -> (1 to p).map(r.getDouble).toSeq).toMap
    assert(again == rows)
  }

  test("covarianceStats: empty input yields empty output (no n=0 rows)") {
    // a global agg always emits one row; the operator must restore the
    // empty-in/empty-out contract rather than hand cov a divide-by-zero
    val empty = cloud.filter(col("vec_id") < 0)
    assert(Pca.covarianceStats(empty, "embedding", dim).count() == 0L)
    assert(Pca.covariance(empty, "embedding", dim).count() == 0L)
  }

  test("non-finite vector elements fail loudly, not as raw NumberFormatException") {
    val bad = Seq((1L, Array(1.0f, Float.NaN, 0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.covariance(bad, "embedding", dim).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("non-finite vector element"))),
      s"wanted the GramSumsAgg non-finite message, got: ${e.getMessage}")
  }

  test("GramBuffer: overflow promotes to exact BigInteger cells") {
    import java.math.BigInteger
    import graft.functions.{GramBuffer, GramSumsAgg}
    // the long fast path must promote rather than wrap: cells stay
    // EXACT past Long.MaxValue (the at-scale case a small corpus
    // never reaches) across add, merge of mixed promoted/unpromoted
    // buffers, and the serialize round-trip
    val b = new GramBuffer(2) // 2 moments + 3 pairs = 5 cells
    b.n = 3
    b.add(0, Long.MaxValue - 5)
    b.add(0, 10L) // would overflow the long cell -> promote
    assert(b.big != null)
    assert(b.total(0) ==
      BigInteger.valueOf(Long.MaxValue - 5).add(BigInteger.TEN))
    val c = new GramBuffer(2) // stays unpromoted
    c.n = 2
    c.add(0, 7L)
    c.add(4, -3L)
    val agg = GramSumsAgg(null, 2)
    val m = agg.merge(b, c)
    assert(m.n == 5L)
    assert(m.total(0) == BigInteger.valueOf(Long.MaxValue - 5)
      .add(BigInteger.TEN).add(BigInteger.valueOf(7)))
    assert(m.total(4) == BigInteger.valueOf(-3))
    val de = agg.deserialize(agg.serialize(m))
    assert(de.n == m.n)
    assert((0 until 5).forall(i => de.total(i) == m.total(i)))
  }
}
