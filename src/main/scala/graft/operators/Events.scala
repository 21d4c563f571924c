package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
import org.apache.spark.sql.functions._

/** Event-stream analytics in their batch form. The streaming twins in
  * [[graft.streaming.Ingest]] reuse the same aggregations over
  * `readStream` sources with watermarks.
  */
object Events {

  /** Tumbling-window aggregation: (window_start, key) -> count, sum. */
  def windowedAgg(df: DataFrame, tsCol: String, keyCol: String,
                  valueCol: String, windowDuration: String): DataFrame =
    df.groupBy(window(col(tsCol), windowDuration).as("w"), col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"))
      .select(col("w.start").as("window_start"), col(keyCol),
        col("n_events"), col("sum_value"))

  /** Bucketized RANGE JOIN: every `points` row paired with every
    * `intervals` row of the same key whose [startCol, endCol] contains
    * its tsCol (boundaries inclusive) — the operator behind
    * attribution windows ("views within 5 minutes of the purchase"),
    * downtime overlap, and any time-in-interval question. Spark has no
    * native range join; the naive formulation is an equi-join on the
    * key plus a range FILTER, which Catalyst executes as the full
    * per-key cartesian before filtering — a hot user with 10k
    * intervals × 100k points explodes. This plan never goes
    * cartesian: intervals explode to the fixed-width time buckets they
    * cover (`sequence` over bucket ids — ~(len/bucket + 1) rows each),
    * each point maps to its ONE bucket, and the join is a plain
    * equi-join on (key, bucket) with the exact range predicate as a
    * residual filter. A (point, interval) pair can meet in only the
    * point's single bucket, so output needs NO dedup barrier.
    *
    * `bucketSeconds` trades index size for join fanout: ~the typical
    * interval length is right (each interval ≈ 2 bucket rows; each
    * bucket's population stays near the raw event rate). Both sides'
    * other columns pass through — disambiguate names before calling. */
  def rangeJoin(intervals: DataFrame, points: DataFrame, keyCol: String,
                startCol: String, endCol: String, ptsCol: String,
                bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    // guard BEFORE the bucket explode: sequence(a, b) with a > b produces
    // a full DESCENDING range, so one corrupt interval (end < start, e.g.
    // an epoch-0 sentinel) would silently explode into a flood of bucket
    // rows the residual filter then discards. An inverted interval
    // contains no point, so dropping it is the semantically-exact result.
    val ib = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("_bkt",
        explode(sequence(
          floor(col(startCol).cast("long") / bucketSeconds).cast("long"),
          floor(col(endCol).cast("long") / bucketSeconds).cast("long"))))
    val pb = points.withColumn("_bkt",
      floor(col(ptsCol).cast("long") / bucketSeconds).cast("long"))
    ib.join(pb, Seq(keyCol, "_bkt"))
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) <= col(endCol))
      .drop("_bkt")
  }

  /** Gap-based sessionization: a new session starts when the gap to
    * the previous event of the same user exceeds `gapMinutes`.
    * One shuffle on the user key; the cumulative-sum session id is the
    * standard lag/cumsum formulation. */
  def sessionize(df: DataFrame, tsCol: String, userCol: String,
                 idCol: String, gapMinutes: Int): DataFrame = {
    val byUser = W.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(idCol).asc)
    val gapUs = gapMinutes * 60L * 1000000L
    df.withColumn("_prev", lag(col(tsCol), 1).over(byUser))
      .withColumn("_new",
        when(col("_prev").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("_prev")) > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("_new")).over(byUser))
      .drop("_prev", "_new")
  }

  /** Catalyst-native alternative to [[sessionStats]]: Spark's
    * `session_window` merges events closer than the gap into one
    * window per key — same sessions, one operator, and it works
    * identically over Structured Streaming inputs. */
  def sessionWindowStats(df: DataFrame, tsCol: String, userCol: String,
                         valueCol: String, gapMinutes: Int): DataFrame =
    df.groupBy(session_window(col(tsCol), s"$gapMinutes minutes").as("sw"), col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("sum_value"),
        min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"))
      .select(col(userCol), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))

  /** As-of join: attach to every `leftType` event the most recent
    * `rightType` event of the same user at or before it (ties on ts
    * broken by event id, so the result is fully deterministic).
    *
    * The textbook formulation is a range join — quadratic blowup on
    * hot users and no equi-key for the pairing. This is the
    * union-window form: filter to the two event types, ONE shuffle on
    * the user key, and a single ordered pass per user carries the
    * last-seen right event forward (`last(_, ignoreNulls)` over
    * rows unbounded-preceding..current). Partition-parallel across
    * users like [[sessionize]]; no per-pair join ever materializes,
    * which is what survives a 100 TB event log with skewed users.
    *
    * Output: the left events with `prior_id`/`prior_ts`/`prior_value`
    * (null when no prior right event exists) and `gap_us` (exact long
    * microseconds — no float rounding in the oracle compare). */
  def asofJoin(df: DataFrame, tsCol: String, userCol: String, typeCol: String,
               idCol: String, valueCol: String,
               leftType: String, rightType: String): DataFrame = {
    val byUser = W.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val right = when(col(typeCol) === rightType,
      struct(col(idCol).as("id"), col(tsCol).as("ts"), col(valueCol).as("value")))
    df.filter(col(typeCol).isin(leftType, rightType))
      .withColumn("_r", last(right, ignoreNulls = true).over(byUser))
      .filter(col(typeCol) === leftType)
      .select(col(idCol), col(tsCol), col(userCol), col(valueCol),
        col("_r.id").as("prior_id"), col("_r.ts").as("prior_ts"),
        col("_r.value").as("prior_value"),
        (unix_micros(col(tsCol)) - unix_micros(col("_r.ts"))).as("gap_us"))
  }

  /** Per-session rollup on top of [[sessionize]]. */
  def sessionStats(df: DataFrame, tsCol: String, userCol: String,
                   idCol: String, valueCol: String, gapMinutes: Int): DataFrame =
    sessionize(df, tsCol, userCol, idCol, gapMinutes)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))

  /** Ordered funnel analysis: per user, the earliest time each step
    * of `steps` was completed, where step i+1 must happen STRICTLY
    * after the user's earliest completion of step i (the standard
    * "view → click → purchase" product funnel). Returns one row per
    * user who completed step 1: (user, ts_1 … ts_n nullable,
    * steps_reached).
    *
    * Shape: one filtered min-agg per step, chained by an equi-join on
    * the user key — n steps = n keyed aggs, no per-user event arrays,
    * no windows, no state. Each stage's input is the events of ONE
    * type (filter pushes to the scan), so cost is proportional to the
    * funnel's own events even when the table holds everything. */
  def funnel(df: DataFrame, tsCol: String, userCol: String, typeCol: String,
             steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("ts_1"))
    val reached = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (prev, (s, i)) =>
        val next = df.filter(col(typeCol) === s)
          .join(prev.select(col(userCol), col(s"ts_$i")), Seq(userCol))
          .filter(col(tsCol) > col(s"ts_$i"))
          .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"ts_${i + 1}"))
        prev.join(next, Seq(userCol), "left")
    }
    val stepsReached = steps.indices.tail.foldLeft(lit(1)) { (acc, i) =>
      acc + when(col(s"ts_${i + 1}").isNotNull, 1).otherwise(0)
    }
    // ts_{i+1} is null whenever ts_i is (each stage joins on the
    // previous), so the sum counts a prefix — steps are ordered
    reached.withColumn("steps_reached", stepsReached.cast("long"))
  }

  /** Cohort retention: users are cohorted by their FIRST active day;
    * each (cohort, day-offset) cell counts cohort members active that
    * many days later — the standard retention matrix.
    *
    * Shape: per-(user, day) activity is ONE distinct (keyed shuffle);
    * cohorts are a keyed min; the contact is a user-key equi-join and
    * a final keyed count. A user contributes at most one row per
    * (cohort, offset) because activity is already day-distinct, so
    * the count is plain — no count-distinct shuffle anywhere. */
  def retention(df: DataFrame, tsCol: String, userCol: String): DataFrame = {
    val activity = df.select(col(userCol), to_date(col(tsCol)).as("_d")).distinct()
    val cohorts = activity.groupBy(col(userCol)).agg(min(col("_d")).as("cohort"))
    activity.join(cohorts, Seq(userCol))
      .select(col("cohort"), datediff(col("_d"), col("cohort")).cast("long").as("day_offset"))
      .groupBy(col("cohort"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Approximate distinct count per group via the KMV sketch
    * ([[graft.functions.KmvAgg]]): `est_distinct ≈ |{value}|` per key,
    * exact whenever the group's true cardinality is < k (the sketch
    * then holds every distinct hash).
    *
    * Scale shape: ONE keyed agg whose map side keeps ≤ k longs per
    * group per partition — the `count(DISTINCT …)` plan this replaces
    * shuffles every distinct value to the reducer. All arithmetic is
    * reproducible (md5-derived 60-bit hashes, one double division), so
    * unlike HLL the estimate is bit-identical across engines and
    * partitionings — a DuckDB oracle can state it. */
  def kmvDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  k: Int, seed: String): DataFrame = {
    // 60-bit hash: 15 hex chars of md5 — fits a BIGINT exactly in both
    // engines (16 chars could set the sign bit)
    val h = conv(substring(md5(concat(lit(seed + "_"),
      col(valueCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val keys = keyCols.map(col)
    val kk = lit(k.toLong)
    df.select(keys :+ h.as("_h"): _*)
      .groupBy(keys: _*)
      .agg(graft.functions.KmvAgg.kmv(col("_h"), k).as("_mins"))
      .select(keys ++ Seq(
        size(col("_mins")).cast("long").as("n_sketch"),
        when(size(col("_mins")) < kk,
            size(col("_mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("_mins"), k).cast("double") / lit(math.pow(2.0, 60))))
          .as("est_distinct")): _*)
  }

  /** Rolling `windowDays`-day distinct count per observed day — the
    * WAU/MAU dashboard line ("distinct users over the trailing 7
    * days, for every day"). A naive formulation joins each day to its
    * whole trailing window of raw events (w× the volume through a
    * shuffle) or runs w overlapping `count(DISTINCT …)` jobs; here
    * each event row fans out map-side to the `windowDays` target days
    * it covers (the [[rangeJoin]] bucket trick) and the same
    * [[graft.functions.KmvAgg]] buffer as [[kmvDistinct]] absorbs
    * them — set semantics make the union of overlapping days exact,
    * and the map-side partials keep ≤ k longs per (day, partition),
    * so the shuffle is bounded regardless of volume or window width.
    * Target days are restricted to days observed in the data (the
    * dashboard's x-axis). Same exactly-reproducible estimate as
    * [[kmvDistinct]]: exact under k distinct, (k−1)/frac(h_k) above. */
  def rollingDistinct(df: DataFrame, tsCol: String, valueCol: String,
                      windowDays: Int, k: Int, seed: String): DataFrame = {
    require(windowDays > 0, s"windowDays must be > 0, got $windowDays")
    val h = conv(substring(md5(concat(lit(seed + "_"),
      col(valueCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val day = to_date(col(tsCol))
    val contrib = df.select(day.as("_d"), h.as("_h"))
      .select(explode(sequence(lit(0), lit(windowDays - 1))).as("_i"),
        col("_d"), col("_h"))
      .select(date_add(col("_d"), col("_i")).as("day"), col("_h"))
    val days = df.select(day.as("day")).distinct()
    val kk = lit(k.toLong)
    contrib.join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(graft.functions.KmvAgg.kmv(col("_h"), k).as("_mins"))
      .select(col("day"),
        size(col("_mins")).cast("long").as("n_sketch"),
        when(size(col("_mins")) < kk,
            size(col("_mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("_mins"), k).cast("double") / lit(math.pow(2.0, 60))))
          .as("est_distinct"))
  }

  /** Top-k event-type TRANSITIONS (from → to between consecutive
    * events of the same user, ordered by (ts, id)) — the "what do
    * users do next" path dashboard behind funnel design. One
    * user-partitioned window for the successor type, one keyed count
    * with map-side partial agg, and the output is type² rows at most —
    * TakeOrdered handles the top-k, no global sort. Counts are
    * integers; the (ts, id) order is a total order, so the transition
    * set is deterministic under any partitioning. */
  def topPaths(df: DataFrame, userCol: String, tsCol: String, idCol: String,
               typeCol: String, k: Int): DataFrame = {
    val w = W.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    df.withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("from_type").asc, col("to_type").asc)
      .limit(k)
  }

  /** Per-group value quantiles from a DETERMINISTIC fixed-size sample —
    * the bounded-shuffle replacement for exact percentiles, which sort
    * every value per group. Sample membership is the k smallest
    * md5(seed, id) hashes per group (the [[Sampling.exactSample]]
    * rule), so the sample — and therefore every quantile — is exactly
    * reproducible across runs, partitionings, and engines (unlike
    * t-digest/GK sketches, whose merge order changes the result).
    * Quantile q = the sampled value at nearest-rank index
    * floor(q·(n−1)), n = sample size; groups smaller than k are exact.
    *
    * Scale shape: ONE keyed agg — the fused
    * [[graft.functions.SampleValuesAgg]] buffer keeps ≤ k (hash,
    * value) pairs per group per partition map-side and returns the
    * sample already value-sorted, so there is no join-back and the
    * per-group sort is over k values, never the raw group. The hash
    * ranks through the same double conversion the TopKAgg-based
    * samplers use, so the sample membership matches the SQL oracle's
    * row_number formulation exactly. */
  def quantiles(df: DataFrame, keyCols: Seq[String], valCol: String,
                idCol: String, k: Int, qs: Seq[Double],
                seed: String): DataFrame = {
    require(k >= 2, s"sample size must be >= 2, got $k")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must lie in [0, 1]")
    val keys = keyCols.map(col)
    val h = conv(substring(md5(concat(lit(seed + "_"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    df.filter(col(valCol).isNotNull)
      .select(keys ++ Seq(h.cast("double").cast("long").as("_h"),
        col(valCol).as("_v")): _*)
      .groupBy(keys: _*)
      .agg(graft.functions.SampleValuesAgg
        .sampleValues(col("_h"), col("_v"), k).as("_vs"))
      .select(keys ++ Seq(explode(typedlit(qs)).as("quantile"), col("_vs")): _*)
      .select(keys ++ Seq(col("quantile"),
        element_at(col("_vs"),
          (floor(col("quantile") * (size(col("_vs")) - 1)) + 1).cast("int"))
          .as("value")): _*)
  }

  /** Event-type co-occurrence per user with PMI/lift — "which event
    * types happen to the same users" (the association dashboard behind
    * funnel design and feature pruning). One (user, type)-distinct
    * frame, a per-user self-join whose fanout is bounded by the TYPE
    * cardinality (never by event volume), and integer counts all the
    * way: pmi/lift divide them in one fixed expression, so the report
    * reproduces bit-exactly in any engine. */
  def typeCooccurrence(df: DataFrame, userCol: String,
                       typeCol: String): DataFrame = {
    val ut = df.select(col(userCol).as("_u"), col(typeCol).as("_t")).distinct()
    val nUsers = ut.select(col("_u")).distinct()
      .agg(count(lit(1)).as("_nu"))
    val perType = ut.groupBy(col("_t")).agg(count(lit(1)).as("_nt"))
    val pairs = ut
      .join(ut.select(col("_u"), col("_t").as("_t2")), Seq("_u"))
      .filter(col("_t") < col("_t2"))
      .groupBy(col("_t"), col("_t2")).agg(count(lit(1)).as("_nab"))
    val lift = (col("_nab").cast("double") * col("_nu")) /
      (col("_nt").cast("double") * col("_nt2"))
    pairs
      .join(broadcast(perType), Seq("_t"))
      .join(broadcast(perType.select(col("_t").as("_t2"),
        col("_nt").as("_nt2"))), Seq("_t2"))
      .crossJoin(broadcast(nUsers))
      .select(col("_t").as("type_a"), col("_t2").as("type_b"),
        col("_nt").as("n_a"), col("_nt2").as("n_b"), col("_nab").as("n_both"),
        col("_nu").as("n_users"),
        round(lift, 5).as("lift"), round(log(lift), 5).as("pmi"))
  }

  /** Skew-safe fact × dim equi-join with explicit key SALTING: keys
    * with ≥ `hotThreshold` fact rows get their dim row replicated
    * `salts` ways, and each hot fact row picks one replica
    * deterministically (md5(idCol) mod salts) — a key with 100 M rows
    * spreads over `salts` reducer partitions instead of one straggler
    * task. Cold keys join normally (salt 0), and the result is
    * row-identical to the plain join (the oracle states the plain
    * join).
    *
    * AQE's skew-join splitting covers many sort-merge cases at
    * runtime; explicit salting is the lever that still works when the
    * engine can't split — bucketed/co-partitioned inputs, a skewed
    * keyed aggregation downstream, or a join the planner chose to
    * broadcast the wrong way. The hot-key set is itself one keyed
    * count (map-side partial) and broadcasts — it is small by
    * definition (few keys can exceed a meaningful threshold). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 idCol: String, salts: Int, hotThreshold: Long): DataFrame = {
    require(salts >= 2, s"salts must be >= 2, got $salts")
    require(hotThreshold >= 1, s"hotThreshold must be >= 1, got $hotThreshold")
    val hot = fact.groupBy(col(keyCol)).agg(count(lit(1)).as("_kn"))
      .filter(col("_kn") >= hotThreshold)
      .select(col(keyCol), lit(true).as("_hot"))
    val dimSalted = dim.join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("_salt",
        explode(when(col("_hot").isNotNull,
          sequence(lit(0), lit(salts - 1))).otherwise(array(lit(0)))))
      .drop("_hot")
    val factSalted = fact.join(broadcast(hot), Seq(keyCol), "left")
      .withColumn("_salt",
        when(col("_hot").isNotNull,
          pmod(conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
            .cast("long"), lit(salts.toLong)).cast("int"))
          .otherwise(lit(0)))
      .drop("_hot")
    factSalted.join(dimSalted, Seq(keyCol, "_salt")).drop("_salt")
  }

  /** Daily-volume anomaly report per event type: z-score of each
    * day's event count against the type's own history, flagged at
    * `|z| ≥ threshold` — the "did the pipeline break / did a client
    * start spamming" monitor run over every ingest feed.
    *
    * Scale shape: one (type, day)-keyed count (map-side partial), one
    * type-keyed roll-up of integer sums (n, Σc, Σc²), broadcast back
    * onto the daily frame — no window over history. The moment
    * arithmetic is INTEGER sums until the final two divisions, so the
    * scores are bit-identical across engines and partitionings (a
    * float `stddev` agg would be summation-order-dependent). Types
    * with zero variance (or a single day) yield NULL z-scores and
    * never flag. */
  def volumeAnomaly(df: DataFrame, tsCol: String, typeCol: String,
                    threshold: Double = 2.0): DataFrame = {
    val daily = df.groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.groupBy(col(typeCol)).agg(
      count(lit(1)).as("_n"),
      sum(col("n_events")).as("_s"),
      sum(col("n_events") * col("n_events")).as("_s2"))
    daily.join(broadcast(stats), Seq(typeCol))
      .withColumn("_mean", col("_s").cast("double") / col("_n"))
      .withColumn("_var",
        (col("_s2").cast("double") -
          col("_s").cast("double") * col("_s").cast("double") / col("_n")) / col("_n"))
      .withColumn("zscore",
        when(col("_var") > 0,
          (col("n_events").cast("double") - col("_mean")) / sqrt(col("_var"))))
      .withColumn("is_anomaly",
        coalesce(abs(col("zscore")) >= threshold, lit(false)))
      .drop("_n", "_s", "_s2", "_mean", "_var")
  }

  /** Daily-volume forecast per event type — Holt's double exponential
    * smoothing (level + trend), the standard next-week capacity line
    * under the [[volumeAnomaly]] dashboard. Calendar gaps fill with 0
    * (a day with no events IS zero volume), so the recurrence runs on
    * a regular daily grid.
    *
    * Engine-reproducibility: the smoothing recurrence is an
    * order-pinned fold over the day-ordered series (plain SUM order
    * would not matter here — the fold is inherently sequential — but
    * the ORDER must pin: array_sort by day, then one `aggregate`
    * pass); α = 0.5 and β = 0.25 are exact binary fractions and every
    * step is the same IEEE expression in both engines, so forecasts
    * hash-match. Per-type state is (level, trend) — O(1); group size
    * is the CALENDAR span in days (never event volume), so the fold
    * is bounded at any scale.
    *
    * Output: (typeCol, h, forecast) for h = 1..horizon, forecast =
    * level + h·trend. */
  def forecast(df: DataFrame, tsCol: String, typeCol: String,
               horizon: Int): DataFrame = {
    require(horizon > 0, s"horizon must be > 0, got $horizon")
    val daily = df.groupBy(col(typeCol).as("_t"), to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1)).as("_n"))
    val rng = daily.groupBy(col("_t"))
      .agg(min(col("_d")).as("_d0"), max(col("_d")).as("_d1"))
    val cal = rng.select(col("_t"), explode(sequence(col("_d0"), col("_d1"))).as("_d"))
    val filled = cal.join(daily, Seq("_t", "_d"), "left")
      .select(col("_t"), col("_d"), coalesce(col("_n"), lit(0L)).cast("double").as("_x"))
    val series = filled.groupBy(col("_t"))
      .agg(array_sort(collect_list(struct(col("_d"), col("_x")))).as("_s"))
      .select(col("_t"), transform(col("_s"), s => s.getField("_x")).as("_vs"))
    // l' appears twice in the update (once for itself, once inside the
    // trend step) — written out verbatim both times so the oracle's
    // identical duplication computes the identical doubles
    def lNext(acc: Column, x: Column): Column =
      lit(0.5) * x + lit(0.5) * (acc.getField("l") + acc.getField("b"))
    val state = aggregate(
      slice(col("_vs"), lit(2), greatest(size(col("_vs")) - 1, lit(0))),
      struct(element_at(col("_vs"), 1).as("l"), lit(0.0).as("b")),
      (acc, x) => struct(
        lNext(acc, x).as("l"),
        (lit(0.25) * (lNext(acc, x) - acc.getField("l"))
          + lit(0.75) * acc.getField("b")).as("b")))
    series.select(col("_t"), state.getField("l").as("_l"),
        state.getField("b").as("_b"))
      .select(col("_t").as(typeCol),
        explode(sequence(lit(1L), lit(horizon.toLong))).as("h"),
        col("_l"), col("_b"))
      .select(col(typeCol), col("h"),
        (col("_l") + col("h") * col("_b")).as("forecast"))
  }

  /** Funnel summary: users reaching step ≥ i, per step — the
    * conversion curve [[funnel]]'s per-user frame rolls up to. */
  def funnelCounts(df: DataFrame, tsCol: String, userCol: String,
                   typeCol: String, steps: Seq[String]): DataFrame = {
    val per = funnel(df, tsCol, userCol, typeCol, steps)
    // explode idx 1..steps_reached (≤ n per user) and count per idx —
    // map-side fanout bounded by the funnel length
    per.select(explode(sequence(lit(1L), col("steps_reached"))).as("step_idx"))
      .groupBy(col("step_idx")).agg(count(lit(1)).as("n_users"))
      .withColumn("step",
        element_at(typedlit(steps), col("step_idx").cast("int")))
      .select(col("step_idx"), col("step"), col("n_users"))
  }
}
