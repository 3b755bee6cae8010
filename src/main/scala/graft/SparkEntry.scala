package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ext.{Curation, Dedup, Graph, Multimodal, Similarity, TextAnalysis}
import graft.queries.{Extensions, MlQueries, QueryDef, Relational}
import graft.stream.Events

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All capabilities are registered as [[QueryDef]]s; `queries`/`oracleSql`
  * are derived views so the two maps can never drift apart.
  */
object SparkEntry {

  /** Every registered capability, in declaration order. */
  def registry: Seq[QueryDef] =
    Relational.all ++ TextAnalysis.all ++ Dedup.all ++ Similarity.all ++
      Multimodal.all ++ Events.all ++ Extensions.all ++ MlQueries.all ++
      Curation.all ++ Graph.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(q.name -> _)).toMap
}
