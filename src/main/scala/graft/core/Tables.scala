package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the TESTDATA star schema (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's vectorized
  * parquet reader, predicate pushdown, and column pruning apply. At
  * 100 TB the same call works against a partitioned directory tree —
  * nothing here assumes single-file inputs.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events table stores `ts` as parquet TIMESTAMP(NANOS). How Spark
    * surfaces that column depends on the reader version, so branch on the
    * loaded schema rather than pinning one behavior:
    *   - LongType (Spark ≤4.0 with `nanosAsLong`): convert epoch-nanos to a
    *     microsecond TimestampType with exact integer division (`DIV`, not
    *     `/`: epoch-nanos exceed 2^53, double division would lose precision).
    *   - TimestampNTZType (Spark 4.1+ reads NANOS natively, truncating to
    *     micros in the reader): cast to TimestampType — the session runs UTC,
    *     so the wall-clock reinterpretation yields the identical instant.
    * The generator emits µs-precision values, so both paths are lossless. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType =>
        raw
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unexpected type $other; update Tables.events for this Spark version")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Schema-evolution read: a long-lived 100 TB table accumulates files
    * written under different schema versions (columns added over time).
    * `mergeSchema` unions the footers' schemas — missing columns read as
    * null — instead of silently projecting through whichever file's
    * footer Spark samples first. Costs one footer read per file, so it
    * is an explicit opt-in, not the default scan path. */
  def mergedParquet(s: SparkSession, paths: String*): DataFrame =
    s.read.option("mergeSchema", "true").parquet(paths: _*)
}
