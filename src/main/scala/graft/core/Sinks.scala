package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic writers + canonical fingerprints (SURVEY §7.2 M0).
  *
  * The fingerprint is ORDER-INSENSITIVE (modular SUM of per-row hashes,
  * not xor — xor cancels any even-multiplicity row, so {X,X,Y} and
  * {Z,Z,Y} would always collide), stable under any partitioning/shuffle
  * layout — the property that makes it usable as a cheap distributed
  * equality check between two plans of the same query (e.g. a salted
  * join vs its plain form) without a sort.
  */
object Sinks {

  /** Mersenne prime 2^61−1: per-row hashes are reduced mod p and summed
    * in DECIMAL(38,0) (no ANSI overflow below ~10^18 rows). */
  private val P61 = 2305843009213693951L

  /** Single canonical row-hash column over all columns (null-safe: nulls
    * hash as a NUL-prefixed sentinel — written as the "\u0000" escape —
    * that no castable value can collide with). */
  def rowHash(df: DataFrame): Column =
    xxhash64(df.columns.map(c => coalesce(col(c).cast("string"),
      lit("\u0000null"))): _*)

  /** Order-insensitive 64-bit fingerprint of the whole relation.
    * Total: an empty relation folds to 0 with n=0 (never null). */
  def fingerprint(df: DataFrame): Long = {
    val r = df.select(rowHash(df).as("h"))
      .agg(
        coalesce(sum(pmod(col("h"), lit(P61)).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")).as("fp"),
        count(lit(1)).as("n"))
      .collect()(0)
    val fp = r.getDecimal(0).toBigInteger
      .mod(java.math.BigInteger.valueOf(P61)).longValue()
    // fold the row count in so total-count differences can't cancel
    fp ^ java.lang.Long.rotateLeft(r.getLong(1), 32)
  }

  /** Deterministic parquet write: sorted by the given keys, fixed file
    * count (1 by default — the oracle-compare shape). */
  def writeParquet(df: DataFrame, path: String, sortCols: Seq[String],
      files: Int = 1): Unit =
    df.orderBy(sortCols.map(col): _*).coalesce(files)
      .write.mode("overwrite").parquet(path)

  /** Deterministic CSV write (golden files): header, sorted, one file. */
  def writeCsv(df: DataFrame, path: String, sortCols: Seq[String]): Unit =
    df.orderBy(sortCols.map(col): _*).coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** Hive-style partitioned parquet write (e.g. by date column): at
    * 100 TB this is THE layout lever — a filter on the partition column
    * prunes entire directories before any IO (PartitionFilters in the
    * scan, asserted in SinksSpec). */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed managed-table write: co-locates rows by hash(key) into a
    * fixed bucket count so joins/aggregations between tables bucketed on
    * the same key plan WITHOUT a shuffle exchange — the pre-partitioning
    * tool for repeatedly-joined 100 TB fact tables (verified in
    * BucketingSpec: the bucketed join plan has no Exchange). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Small-files compaction — the maintenance job every long-lived
    * 100 TB table needs: streaming/incremental writers leave thousands
    * of KB-sized files whose per-file open/footer cost dominates scans.
    * Rewrites a parquet directory into ceil(bytes / targetBytes) files
    * using the optimizer's size estimate. Round-robin repartition (not
    * coalesce: coalesce(n) merges existing partitions without a
    * shuffle, inheriting their skew — fine for mild reduction, wrong
    * for thousands→few). Returns the target file count. */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
      inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    require(new java.io.File(inDir).getCanonicalPath !=
      new java.io.File(outDir).getCanonicalPath,
      "outDir must differ from inDir: overwrite would delete the source mid-read")
    val df = spark.read.parquet(inDir)
    // size from the ACTUAL on-disk file lengths, not the optimizer's
    // stats.sizeInBytes (an estimated in-memory/decompressed size,
    // typically several times the parquet footprint — sizing from it
    // would emit proportionally more, smaller files than targetBytes)
    val hconf = spark.sessionState.newHadoopConf()
    // one listStatus per parent directory, not one getFileStatus RPC per
    // file — on object stores with thousands of files the per-file form
    // serializes thousands of driver round-trips before the job starts
    val inputs = df.inputFiles.map(f => new org.apache.hadoop.fs.Path(f))
    val wanted = inputs.map(_.toUri.getPath).toSet
    val bytes = inputs.groupBy(_.getParent).iterator.map {
      case (parent, _) =>
        val fs = parent.getFileSystem(hconf)
        fs.listStatus(parent).iterator
          .filter(st => wanted.contains(st.getPath.toUri.getPath))
          .map(st => BigInt(st.getLen)).foldLeft(BigInt(0))(_ + _)
    }.foldLeft(BigInt(0))(_ + _)
    val parts = ((bytes + targetBytes - 1) / targetBytes)
      .max(BigInt(1)).min(BigInt(10000)).toInt
    df.repartition(parts).write.mode("overwrite").parquet(outDir)
    parts
  }
}
