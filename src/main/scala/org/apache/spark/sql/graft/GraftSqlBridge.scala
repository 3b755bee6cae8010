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

  /** Test-only views of what an extensions hook registered (the build*
    * methods are private[sql]); lets specs assert the
    * `spark.sql.extensions` wiring without constructing a fresh session. */
  def registeredRules(e: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]] =
    e.buildOptimizerRules(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
  def registeredStrategies(e: org.apache.spark.sql.SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    e.buildPlannerStrategies(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}
