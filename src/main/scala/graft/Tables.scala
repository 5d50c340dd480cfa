package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Typed readers for the driver-generated fixture parquet
  * (see /root/repo/FIXTURES.md). One function per table; all reads are
  * lazy parquet scans so Catalyst can push filters/projections into the
  * scan. At the 100 TB design point these would be partitioned/bucketed
  * tables behind a catalog; the API shape (DataFrame per table) is the
  * same.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  /** events.ts has shipped under two parquet physical types across
    * fixture generations, both normalized here to a session-zone
    * TIMESTAMP so every downstream query (unix_millis, watermarks,
    * window()) sees one type:
    *  - TIMESTAMP(NANOS), which Spark does not model (µs is the
    *    engine's granularity) — read nanos as long and convert; the
    *    fixture data is µs-granular so the truncation is lossless;
    *  - TIMESTAMP(MICROS) without isAdjustedToUTC → TIMESTAMP_NTZ —
    *    the wall clock is UTC by generation, and sessions run UTC, so
    *    the cast to TIMESTAMP preserves every instant bit-for-bit.
    * At the design point a ns-precision source would keep a separate
    * `ts_nanos` long column for sub-µs ordering. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
