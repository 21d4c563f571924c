package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated test tables (see TESTDATA.md).
  * Callers select the columns they need so parquet column pruning and
  * predicate pushdown stay effective.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  /** Schema-adaptive events reader. Driver testdata generations have
    * stored `ts` two ways: TIMESTAMP(NANOS) (readable only as INT64
    * under nanosAsLong, then nanos→micros) and native timestamp[us]
    * (read as TIMESTAMP_NTZ). Dispatch on the observed dtype so either
    * generation works, and normalize to TimestampType — the type the
    * old path produced — so downstream operators and the DuckDB oracle
    * (naive timestamps, session tz pinned to UTC) see identical values
    * regardless of which testdata generation is on disk. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => df
      case other =>
        // fail LOUDLY on an unknown third generation — a silent
        // pass-through would surface as confusing downstream operator
        // errors rounds later (the r9 failure class)
        throw new IllegalStateException(
          s"events.ts has unsupported dtype $other; supported testdata " +
          "generations: INT64 nanos, timestamp_ntz[us], timestamp[us]")
    }
  }
}
