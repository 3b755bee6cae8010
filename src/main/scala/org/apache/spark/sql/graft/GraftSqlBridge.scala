package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Bridge into the `org.apache.spark.sql` package tree: building a
  * DataFrame from a custom LogicalPlan requires the package-private
  * `Dataset.ofRows` — the standard extension-library pattern for
  * exposing custom operators through the public Dataset API. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(spark.asInstanceOf[
      org.apache.spark.sql.classic.SparkSession], plan)
}
