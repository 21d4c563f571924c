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
}
