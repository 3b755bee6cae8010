package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiling — the reference's A2 idiom
  * (`Main.scala:133,190-206`: `groupBy(c).count().groupBy(c).count().count()`
  * per column = 2 shuffles × N columns) collapsed into a single aggregate
  * over all columns at once.
  *
  * `exact` is the oracle-parity form (multi-`countDistinct` plans one
  * Expand + one aggregate — a single scan). `approx` is the 100 TB form:
  * HLL++ `approx_count_distinct` needs no Expand and no per-column
  * distinct shuffle at all.
  */
object Profile {

  private def nullCount(c: String): Column =
    sum(col(c).isNull.cast("long")).as(s"nulls_$c")

  /** Exact per-column null + distinct counts, single pass. */
  def exact(df: DataFrame): DataFrame = {
    val aggs = df.columns.toSeq.flatMap(c =>
      Seq(nullCount(c), countDistinct(col(c)).as(s"distinct_$c")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Approximate profile: same shape, sketch-based distinct counts. */
  def approx(df: DataFrame, rsd: Double = 0.02): DataFrame = {
    val aggs = df.columns.toSeq.flatMap(c =>
      Seq(nullCount(c), approx_count_distinct(col(c), rsd).as(s"distinct_$c")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Approximate profile of every TESTDATA table in one call — the
    * warehouse-sweep entry point (one job per table, sketch-based, no
    * exact-distinct Expand). */
  def profileTables(spark: org.apache.spark.sql.SparkSession, dir: String,
      tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "documents", "embeddings"))
      : Map[String, DataFrame] =
    tables.map(t =>
      t -> approx(graft.core.Tables.table(spark, dir, t))).toMap

  /** Columns that are all-null or constant — the reference's
    * drop-candidate rule (`Main.scala:190-206`: its per-column
    * `groupBy(c).count()` counts the NULL group as a value), computed from
    * ONE profile row instead of 2N jobs. NULL-inclusive on purpose:
    * `countDistinct` ignores nulls, so a value-plus-missing column
    * (1 non-null distinct + nulls) is NOT constant and must be kept —
    * treating it as droppable would silently discard an informative
    * column after the NA→null replace. */
  def constantColumns(df: DataFrame): Seq[String] = {
    val row = exact(df).collect()(0)
    df.columns.toSeq.filter { c =>
      val withNull =
        if (row.getAs[Long](s"nulls_$c") > 0L) 1L else 0L
      row.getAs[Long](s"distinct_$c") + withNull <= 1L
    }
  }
}
