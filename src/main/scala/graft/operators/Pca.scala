package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding corpus — the
  * dimensionality step a 100 TB vector pipeline runs before storage
  * quantization (PCA-whitening ahead of PQ is the classic OPQ-lite
  * recipe) and the diagnostic that tells an operator how many of the
  * model's dimensions carry signal. The reference stores raw vectors
  * and exposes only per-collection quantization width
  * (collection.go:30-52, quantization.go); at scale the rotation that
  * concentrates variance into a prefix of the dimensions is what makes
  * narrow widths usable, so this engine owes its users the fit.
  *
  * Split Spark-first along the natural driver/cluster line:
  *
  *  - [[covariance]] — ONE distributed pass. Coordinates quantize to
  *    the 1e-6 integer grid (the embedding_drift rule,
  *    [[Eval.embeddingDrift]]), per-row upper-triangular products are
  *    generated map-side by HOFs, and the keyed agg's map-side
  *    partials collapse every partition to ≤ d(d+1)/2 + d rows before
  *    the shuffle — the exchange moves O(d² × partitions) rows at ANY
  *    corpus size. Sums accumulate as decimal(38,0): exact,
  *    order-independent (so engine- and partitioning-reproducible,
  *    unlike float folds) and overflow-free to ~1e38 (a 1e12-scale
  *    product per row crosses 38 digits only past 1e26 rows).
  *  - [[fit]] — collects the d×d matrix (driver-sized BY CONTRACT:
  *    d² doubles, independent of corpus size) and runs a deterministic
  *    cyclic Jacobi eigensolve. Eigenpairs sort by (eigenvalue desc,
  *    index asc) and each vector sign-canonicalizes on its
  *    largest-magnitude component, so the model is a pure function of
  *    the covariance matrix.
  *  - [[project]] — pure map-side: each output coordinate is an
  *    order-pinned `aggregate` fold of (x − mean)·w over the ARRAY
  *    order (the lm_score float-fold rule), components ride the plan
  *    as array literals. Zero shuffles, zero joins; at 100 TB the
  *    projection is a scan at full cluster parallelism.
  *
  * CPU note: the per-row product fan-out is d(d+1)/2 entries (2080 at
  * d = 64) — embarrassingly parallel but quadratic in d; past d ≈ 512
  * fold the Gram update into a TypedImperativeAggregate with an
  * Array[Long] buffer instead (the KmvAgg buffer pattern) rather than
  * widening this explode.
  */
object Pca {

  private val Grid = 1000000.0 // 1e-6 quantization grid (drift rule)

  /** Sufficient statistics for PCA in one pass: for every dimension
    * pair i ≤ j a row (i, j, n, s_ij) where s_ij = Σ q_i·q_j over the
    * corpus on the integer grid, plus first-moment rows (i, -1, n,
    * s_i). `cov` materializes the centered covariance from the exact
    * integers in one fixed expression:
    * (s_ij·n − s_i·s_j) / (n²·grid²).
    *
    * Computed by the fused [[graft.functions.GramSumsAgg]] kernel —
    * ONE aggregation whose buffer is the whole statistics vector
    * (primitive adds per row; the prior explode formulation built
    * d(d+1)/2 + d interpreted HOF structs per row, 2,144 at d = 64,
    * and was the #4 bench line at 3.7 s — now the corpus pass is a
    * tight loop and only ONE ~2.1k-element array crosses the
    * exchange). The reshape to (i, j, n, s) rows runs on that single
    * row; identical integers in any partitioning (PcaSpec pins the
    * brute-force equality). */
  def covarianceStats(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val d = dim
    val sums = df.agg(graft.functions.GramSumsAgg
      .gramSums(col(vecCol).cast("array<double>"), d).as("_g"))
    // element_at positions: 1 = n, 2..d+1 = first moments, then the
    // upper triangle row-major at d + 2 + i·d − i(i−1)/2 + (j − i)
    val entries = expr(
      s"""concat(
         |  transform(sequence(0, ${d - 1}), i ->
         |    named_struct('i', i, 'j', -1, 's', element_at(_g, i + 2))),
         |  flatten(transform(sequence(0, ${d - 1}), i ->
         |    transform(sequence(i, ${d - 1}), j ->
         |      named_struct('i', i, 'j', j, 's',
         |        element_at(_g, cast(${d + 2} + i * $d
         |          - (i * (i - 1)) div 2 + (j - i) as int)))))))
         |""".stripMargin)
    sums.select(element_at(col("_g"), 1).cast("long").as("n"),
        explode(entries).as("_e"))
      .select(col("_e.i").as("i"), col("_e.j").as("j"), col("n"),
        col("_e.s").as("s"))
      // Empty-in/empty-out (ADVICE r15): a global agg always emits one
      // row, so without this an empty corpus yields d + d(d+1)/2 rows
      // with n = 0 and downstream cov divides by zero; the prior
      // groupBy formulation returned zero rows, which is the contract.
      .filter(col("n") > 0)
  }

  /** Covariance matrix rows (i, j, n, cov) for i ≤ j — the
    * oracle-checkable face of the fit: every value derives from exact
    * integer sums in one fixed expression, so any engine reproduces it
    * bit-for-bit. */
  def covariance(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val stats = covarianceStats(df, vecCol, dim)
    val moments = stats.filter(col("j") === -1)
    val mi = moments.select(col("i").as("_mi"), col("s").as("_si"))
    val mj = moments.select(col("i").as("_mj"), col("s").as("_sj"))
    // 2080 product rows ⋈ 64 moment rows — both agg outputs, broadcast
    val prods = stats.filter(col("j") >= 0)
    prods
      .join(broadcast(mi), col("i") === col("_mi"))
      .join(broadcast(mj), col("j") === col("_mj"))
      .select(col("i"), col("j"), col("n"),
        ((col("s") * col("n") - col("_si") * col("_sj")).cast("double") /
          (col("n").cast("double") * col("n").cast("double") *
            lit(Grid * Grid))).as("cov"))
  }

  /** A fitted PCA model: per-dimension means, eigenvalues
    * (descending), and eigenvectors as rows of `components`
    * (components(k)(i) = weight of input dim i in output dim k). */
  final case class Model(means: Array[Double], eigenvalues: Array[Double],
                         components: Array[Array[Double]])

  /** Fit PCA from the one-pass stats. The collect is driver-sized by
    * contract — d first moments + d(d+1)/2 products — and the Jacobi
    * solve is O(d³) on 64-bit-exact inputs, so the model is a pure
    * function of the corpus. */
  def fit(df: DataFrame, vecCol: String, dim: Int): Model = {
    val rows = covarianceStats(df, vecCol, dim)
      .collect().map { r =>
        (r.getInt(0), r.getInt(1), r.getLong(2),
          r.getDecimal(3).toBigInteger)
      }
    val n = rows.head._3
    require(n > 1, s"PCA needs > 1 vector, got $n")
    val s1 = Array.ofDim[BigInt](dim)
    val s2 = Array.ofDim[BigInt](dim, dim)
    rows.foreach { case (i, j, _, s) =>
      if (j == -1) s1(i) = BigInt(s) else { s2(i)(j) = BigInt(s) }
    }
    val means = s1.map(s => s.toDouble / n / Grid)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      (s2(a)(b) * n - s1(a) * s1(b)).toDouble / (n.toDouble * n) / (Grid * Grid)
    }
    val (eigVals, eigVecs) = jacobiEigen(cov)
    Model(means, eigVals, eigVecs)
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * matrix: sweeps rotate out each upper-triangular entry in a fixed
    * (row, col) order until the off-diagonal mass is below tolerance.
    * Returns (eigenvalues desc, eigenvectors as rows), each vector
    * sign-canonicalized so its largest-|component| is positive —
    * removing the one degree of freedom an eigensolve leaves. */
  private[graft] def jacobiEigen(m: Array[Array[Double]],
      maxSweeps: Int = 64, tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val scale = math.max(1e-300, frobenius(a))
    while (sweep < maxSweeps && off > tol * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val row = Array.tabulate(d)(k => v(k)(i))
      val maxIdx = row.indices.maxBy(k => (math.abs(row(k)), -k))
      if (row(maxIdx) < 0) row.map(-_) else row
    }.toArray
    (vals, vecs)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- i + 1 until a.length) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  /** Project vectors onto the model's top `p` components, appending
    * columns `pc0..pc{p-1}`. Pure map-side: means and components ride
    * the plan as array literals; each coordinate is ONE order-pinned
    * `aggregate` fold over the array (engine-reproducible), and the
    * scan parallelism is the only parallelism needed. */
  def project(df: DataFrame, vecCol: String, model: Model, p: Int): DataFrame = {
    require(p > 0 && p <= model.components.length,
      s"p must be in [1, ${model.components.length}]")
    val v = col(vecCol).cast("array<double>")
    val meansLit = typedLit(model.means.toSeq)
    val projCols = (0 until p).map { k =>
      val w = typedLit(model.components(k).toSeq)
      val centered = zip_with(v, meansLit, (x, m) => x - m)
      val weighted = zip_with(centered, w, (c, wi) => c * wi)
      aggregate(weighted, lit(0.0), (acc: Column, x: Column) => acc + x)
        .as(s"pc$k")
    }
    df.select(df.columns.map(col) ++ projCols: _*)
  }

  /** PCA-whitening: [[project]] onto the top `p` axes, then scale
    * each coordinate by `1/sqrt(λ_k + eps)` so every output dimension
    * carries unit variance — the standard preprocessing before
    * product quantization (isotropic coordinates stop PQ codebooks
    * from spending all their centroids on the dominant axis; Jégou et
    * al. 2011's PQ assumes balanced energy) and before cosine-based
    * near-dup thresholds that assume no axis dominates.
    *
    * Same execution contract as [[project]]: pure map-side, the model
    * rides the plan as array literals, each output coordinate is one
    * order-pinned fold then one multiply by a driver-computed scale —
    * deterministic across engines and partitionings (sqrt is
    * IEEE-exact). `eps` guards zero-variance axes. */
  def whiten(df: DataFrame, vecCol: String, model: Model, p: Int,
             eps: Double = 1e-9): DataFrame = {
    require(p > 0 && p <= model.components.length,
      s"p must be in [1, ${model.components.length}]")
    require(eps > 0, s"eps must be > 0, got $eps")
    val projected = project(df, vecCol, model, p)
    val scaled = (0 until p).map { k =>
      (col(s"pc$k") * lit(1.0 / math.sqrt(model.eigenvalues(k) + eps)))
        .as(s"wpc$k")
    }
    val pcNames = (0 until p).map(k => s"pc$k").toSet
    projected.select(
      projected.columns.filterNot(pcNames.contains).map(col) ++ scaled: _*)
  }

  /** Explained-variance report over the fitted model — the "how many
    * dimensions carry signal" dashboard: one row per component with
    * its eigenvalue, variance share, and the cumulative share. */
  def explainedVariance(df: DataFrame, model: Model): DataFrame = {
    val total = model.eigenvalues.sum
    val spark = df.sparkSession
    import spark.implicits._
    val rows = model.eigenvalues.toSeq.zipWithIndex.scanLeft((0, 0.0, 0.0)) {
      case ((_, _, cum), (ev, k)) => (k, ev, cum + ev)
    }.drop(1).map { case (k, ev, cum) =>
      (k, ev, if (total > 0) ev / total else 0.0,
        if (total > 0) cum / total else 0.0)
    }
    rows.toDF("component", "eigenvalue", "var_share", "cum_share")
  }
}
