package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation: the measurement harness that turns an
  * ANN index from "seems to work" into a number an operator can gate a
  * deploy on. The reference exposes its recall contract qualitatively
  * (`precision: "exact" | "medium"`, collection.go:569-712); at 100 TB
  * a user needs the quantitative version — run a query sample down
  * BOTH the exact and approximate paths and report recall@k per query
  * before trusting the index with production traffic.
  */
object Eval {

  /** Recall@k of an approximate retrieval result against the exact
    * one, per query: `n_exact` ground-truth rows, `n_hit` of them
    * returned by the approximate arm, `recall` = n_hit / n_exact.
    *
    * Takes the two result FRAMES, not an index: any (qid, id) pair
    * source works — LSH forest, IVF, quantized search, a competitor —
    * so one evaluator covers every index family in the library.
    *
    * Scale shape: both arms are already k-bounded per query (queries ×
    * k rows — driver-small even for a 10k-query sample), so the join
    * and the keyed roll-up here are trivially cheap next to the arms
    * themselves; the exact arm's one corpus pass is the unavoidable
    * ground-truth cost, paid on a SAMPLE of queries, never per probe.
    * All counts are integers; `recall` divides them in one fixed
    * expression, so the report reproduces bit-exactly in any engine. */
  def recallAtK(exact: DataFrame, approx: DataFrame,
                qidCol: String = "qid", idCol: String = "vec_id"): DataFrame = {
    val e = exact.select(col(qidCol).as("qid"), col(idCol).as("_id"))
    val a = approx.select(col(qidCol).as("qid"), col(idCol).as("_id"),
      lit(1L).as("_hit"))
    e.join(a, Seq("qid", "_id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("_hit"), lit(0L))).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_exact"))
  }

  /** Per-column table profile — the ANALYZE/data-quality dashboard a
    * pipeline reads before trusting a new table: one row per column
    * with row count, null count, and a KMV distinct-count estimate
    * ([[graft.functions.KmvAgg]] — k smallest distinct 60-bit md5
    * hashes, exactly reproducible across engines/partitionings, unlike
    * HLL). Everything is computed in ONE aggregate pass over the scan
    * (2·cols + 1 agg expressions), then unpivoted to rows.
    *
    * Columns must be string or integral-typed: the hash input is the
    * value's string form, and float formatting differs across engines
    * (integral-to-string does not). */
  def tableProfile(df: DataFrame, cols: Seq[String], k: Int = 256,
                   seed: String = "tp0"): DataFrame = {
    require(cols.nonEmpty, "tableProfile needs at least one column")
    val aggs = Seq(count(lit(1)).as("_n")) ++ cols.flatMap { c =>
      val h = conv(substring(md5(concat(lit(seed + "_"),
        col(c).cast("string"))), 1, 15), 16, 10).cast("long")
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_nulls_$c"),
        graft.functions.KmvAgg.kmv(when(col(c).isNotNull, h), k)
          .as(s"_mins_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val kk = lit(k.toLong)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col("_n").as("n_rows"),
        col(s"_nulls_$c").as("n_nulls"), col(s"_mins_$c").as("_mins"))
    }
    row.select(explode(array(perCol: _*)).as("_r"))
      .select(col("_r.column").as("column"), col("_r.n_rows").as("n_rows"),
        col("_r.n_nulls").as("n_nulls"),
        round(
          when(size(col("_r._mins")) < kk,
              size(col("_r._mins")).cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              (element_at(col("_r._mins"), k).cast("double") /
                lit(math.pow(2.0, 60)))), 4)
          .as("distinct_est"))
  }

  /** Pair-quality report for a dedup method against labeled truth —
    * the dedup twin of [[recallAtK]]: predicted and truth are both
    * (id_a, id_b) pair frames (e.g. a MinHash sketch's pairs vs
    * exact-Jaccard pairs, or vs human labels); the report is one row
    * of tp/fp/fn + precision/recall/F1. Pairs are normalized to
    * (min, max) and deduplicated, so orientation and repeats never
    * miscount.
    *
    * Scale shape: one equi-join on the normalized pair key (pair
    * frames are corpus-decoupled — near-dup pairs ≪ corpus at any
    * sane dup rate) and a single-row roll-up. Counts are integers;
    * the three ratios divide them in fixed expressions, so the report
    * reproduces bit-exactly in any engine. */
  def pairQuality(predicted: DataFrame, truth: DataFrame): DataFrame = {
    def norm(df: DataFrame) = df.select(
      least(col("id_a"), col("id_b")).as("id_a"),
      greatest(col("id_a"), col("id_b")).as("id_b")).distinct()
    val p = norm(predicted).withColumn("_p", lit(1L))
    val t = norm(truth).withColumn("_t", lit(1L))
    // coalesce: sum over ZERO rows is NULL, so the empty-vs-empty report
    // must still read (0, 0, 0), not (NULL, NULL, NULL)
    p.join(t, Seq("id_a", "id_b"), "full_outer")
      .agg(
        coalesce(sum(when(col("_p").isNotNull && col("_t").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(col("_p").isNotNull && col("_t").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(col("_p").isNull && col("_t").isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("fn"))
      .withColumn("precision",
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp"))).otherwise(lit(0.0)))
      .withColumn("recall",
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn"))).otherwise(lit(0.0)))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
  }

  /** Embedding-space drift between two corpus slices — the vector
    * twin of [[TextAnalysis.corpusDrift]]: per dimension, the mean
    * coordinate in slice `sideA` vs slice `sideB` of `groupCol`, with
    * `drift = |mean_a − mean_b|`. The check run when an embedding
    * model version changes or a new crawl lands: a stable corpus
    * drifts ~0 in every dimension; a model/domain shift concentrates
    * mass in a few dimensions.
    *
    * Determinism: float coordinate sums are summation-order-dependent,
    * so each coordinate QUANTIZES to a 1e-6 integer grid first
    * (`round(x·1e6)` as long — the ann_ivf_trained grid rule); the
    * per-(dim, side) sums are then integer-exact in any engine or
    * partitioning, and the means divide those integers in one fixed
    * expression. The grid is far coarser than double noise and far
    * finer than any drift worth alerting on.
    *
    * Scale shape: the posexplode is map-side and the keyed agg's
    * map-side partials collapse each partition to ≤ dim rows before
    * the shuffle — the exchange moves O(dim × partitions) longs
    * regardless of corpus size; output is dim rows. */
  def embeddingDrift(df: DataFrame, vecCol: String,
                     groupCol: org.apache.spark.sql.Column,
                     sideA: String, sideB: String): DataFrame = {
    require(sideA != sideB, "drift needs two distinct sides")
    val sided = df.withColumn("_side",
        when(groupCol === sideA, "a").when(groupCol === sideB, "b"))
      .filter(col("_side").isNotNull)
    val ex = sided.select(col("_side"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "_x")))
      .select(col("_side"), col("dim"),
        round(col("_x") * lit(1000000.0), 0).cast("long").as("_qx"))
    ex.groupBy(col("dim")).agg(
        sum(when(col("_side") === "a", col("_qx")).otherwise(0L)).as("_sa"),
        sum(when(col("_side") === "a", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("_side") === "b", col("_qx")).otherwise(0L)).as("_sb"),
        sum(when(col("_side") === "b", 1L).otherwise(0L)).as("n_b"))
      .withColumn("mean_a", (col("_sa").cast("double") / col("n_a")) / 1000000.0)
      .withColumn("mean_b", (col("_sb").cast("double") / col("n_b")) / 1000000.0)
      .select(col("dim"), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"),
        abs(col("mean_a") - col("mean_b")).as("drift"))
  }

  /** Embedding-space QA: the top-k vectors farthest from the corpus
    * centroid, scored as a z-score of squared centroid distance —
    * the "these rows were mis-embedded / belong to another
    * distribution" report an embedding pipeline runs after every
    * model change or crawl ingest (drift says WHETHER the corpus
    * moved; this says WHICH rows sit outside it).
    *
    * Determinism: coordinates snap to the 1e-6 grid (the
    * [[embeddingDrift]] rule) so centroid sums are integer-exact;
    * each row's squared distance folds over dimensions IN INDEX ORDER
    * (one fixed double expression per term) and itself snaps to the
    * grid, so the corpus-wide distance moments are again exact
    * integer sums (decimal(38,0) — overflow-free) and the z-scores /
    * the (dist², id) ranking reproduce in any engine or partitioning.
    *
    * Scale shape: three passes, none corpus-shuffling — (1) per-dim
    * centroid sums with map-side partials (≤ dim rows per partition
    * move), rolled into a ONE-ROW dim→mean map broadcast; (2) pure
    * map-side distance fold; (3) a single-row moment agg (broadcast
    * back) + TakeOrdered top-k. The corpus never sorts globally and
    * never joins anything data-sized. */
  def embeddingOutliers(df: DataFrame, vecCol: String, idCol: String,
                        k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val q = df.select(col(idCol),
      transform(col(vecCol).cast("array<double>"),
        x => round(x * lit(1000000.0), 0).cast("long")).as("_qv"))
    // the centroid travels as a dim-ORDERED ARRAY, not a map: inside
    // the per-row fold an array element is O(1) (zip_with walks both
    // arrays once) where a map lookup is a linear scan per element —
    // O(d²) interpreted evals per row, measured minutes-per-pass at
    // the sf1 probe before the rewrite
    val mu = q.select(posexplode(col("_qv")).as(Seq("dim", "_qx")))
      .groupBy(col("dim"))
      .agg(sum(col("_qx")).as("_s"), count(lit(1)).as("_n"))
      .agg(array_sort(collect_list(struct(col("dim"),
        ((col("_s").cast("double") / col("_n")) / lit(1000000.0)).as("m"))))
        .as("_ms"))
      .select(transform(col("_ms"), s => s.getField("m")).as("_mu"))
    // d2 is (id, long) and has TWO consumers (the moment agg and the
    // z-score pass) — as a plain plan the whole vector-fold chain
    // re-executed per consumer. Cut it once (r19, guide §5 / the
    // pagerank `cut` rule); the cut runs inside the timed builder.
    val d2 = q.crossJoin(broadcast(mu))
      .select(col(idCol),
        aggregate(
          zip_with(col("_qv"), col("_mu"), (x, m) => {
            val d = x.cast("double") / lit(1000000.0) - m
            d * d
          }),
          lit(0.0), (a, v) => a + v).as("_d2"))
      .select(col(idCol),
        round(col("_d2") * lit(1000000.0), 0).cast("long").as("_dq"))
      .localCheckpoint()
    val st = d2.agg(count(lit(1)).as("_nn"),
      sum(col("_dq").cast("decimal(38,0)")).as("_s1"),
      sum((col("_dq") * col("_dq")).cast("decimal(38,0)")).as("_s2"))
    d2.crossJoin(broadcast(st))
      .select(col(idCol), col("_dq"),
        (col("_s1").cast("double") / col("_nn")).as("_m1"),
        (col("_s2").cast("double") / col("_nn")).as("_m2"))
      .select(col(idCol), col("_dq"),
        when(col("_m2") - col("_m1") * col("_m1") <= 0.0, lit(0.0))
          .otherwise((col("_dq").cast("double") - col("_m1"))
            / sqrt(col("_m2") - col("_m1") * col("_m1"))).as("zscore"))
      .orderBy(col("_dq").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol),
        (col("_dq").cast("double") / lit(1000000.0)).as("dist2"),
        col("zscore"))
  }
}
