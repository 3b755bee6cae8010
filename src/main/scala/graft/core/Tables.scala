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

  /** Scale-adaptive fan-out for CPU-heavy per-row passes (gram
    * explodes, per-shingle md5/conv hashing, signature building) whose
    * input has less partition parallelism than the session has cores.
    *
    * Why it exists (optimization guide §2.5 "input skew — one huge
    * unsplittable file" and §1.2 "the distributed algorithm first"):
    * the bench fixtures are single-row-group parquet files, so every
    * scan is ONE task and the whole map stage ahead of the first
    * exchange — exactly where this family's expensive per-row work
    * lives — ran on one core of 32 (Profile r15: the d22 shingle+md5
    * pass was a single 2.3 s task; t10's two gram explodes 1.5+1.7 s,
    * both single-task). The same starvation hits checkpointed
    * intermediate frames that AQE coalesced to 1-4 partitions by BYTE
    * size before an expensive pass (x62's survivor frames).
    *
    * The repartition is gated on an ESTIMATE of the input's existing
    * parallelism so it is a no-op at scale: scan-rooted inputs are
    * estimated as ceil(bytes / maxPartitionBytes) per file (an
    * overestimate of real row-group-capped parallelism — conservative
    * in the right direction: a 100 TB directory tree clears the gate
    * by file count alone and is never re-shuffled), RDD-backed inputs
    * (localCheckpoint) by their actual partition count, and anything
    * else — un-executed exchanges whose output sizing AQE owns — is
    * left alone. Hash-partitioning on `key` (deterministic, no
    * sort-before-repartition cost; callers pass a high-cardinality
    * key like doc_id) moves only the projected columns of a
    * row-count-sized frame, never a payload the pass doesn't read. */
  def fanOutForCpu(df: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
    val spark = df.sparkSession
    val para = spark.sparkContext.defaultParallelism
    val maxPB = spark.sessionState.conf.filesMaxPartitionBytes
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    val leaves = df.queryExecution.analyzed.collectLeaves()
    val est: Long = leaves.map {
      case l: LogicalRDD => l.rdd.getNumPartitions.toLong
      case r: LogicalRelation =>
        math.max(1L, r.relation.sizeInBytes / math.max(1L, maxPB))
      case _ => Long.MaxValue // unknown source: assume parallel enough
    }.foldLeft(0L)((a, b) => if (a == Long.MaxValue || b == Long.MaxValue)
      Long.MaxValue else a + b)
    if (est < para) df.repartition(para, key) else df
  }

  /** Schema-evolution read: a long-lived 100 TB table accumulates files
    * written under different schema versions (columns added over time).
    * `mergeSchema` unions the footers' schemas — missing columns read as
    * null — instead of silently projecting through whichever file's
    * footer Spark samples first. Costs one footer read per file, so it
    * is an explicit opt-in, not the default scan path. */
  def mergedParquet(s: SparkSession, paths: String*): DataFrame =
    s.read.option("mergeSchema", "true").parquet(paths: _*)
}
