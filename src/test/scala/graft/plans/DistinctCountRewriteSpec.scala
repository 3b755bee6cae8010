package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions.{avg, count, lit, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The optimizer-rule worked example: the reference's 3-aggregate
  * distinct-count idiom must (a) produce the same numbers with the rule
  * installed, and (b) collapse to a single Aggregate over the base
  * relation. Installed via experimental.extraOptimizations (the
  * per-session route; GraftExtensions is the spark.sql.extensions route
  * for fresh sessions). */
class DistinctCountRewriteSpec extends AnyFunSuite {

  lazy val spark = {
    val s = TestSpark.spark
    if (!s.experimental.extraOptimizations.contains(DistinctCountRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ DistinctCountRewrite
    s
  }

  private def idiom(df: DataFrame, c: String): Long =
    df.groupBy(c).count().groupBy(c).count().count()

  private def nAggregates(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.size

  test("rewrite preserves the null-inclusive distinct count") {
    import spark.implicits._
    val df = Seq(Some("a"), Some("a"), Some("b"), None, None, Some("c"))
      .toDF("c")
    assert(idiom(df, "c") == 4) // a, b, c + the null group
    val noNulls = Seq("x", "y", "x").toDF("c")
    assert(idiom(noNulls, "c") == 2)
  }

  test("idiom collapses to ONE aggregate over the base relation") {
    import spark.implicits._
    val df = Seq("a", "b", "a").toDF("c")
    val plan = df.groupBy("c").count().groupBy("c").count()
      .agg(count(lit(1)).as("count"))
    assert(plan.collect()(0).getLong(0) == 2)
    assert(nAggregates(plan) == 1,
      s"expected 1 Aggregate after rewrite:\n${plan.queryExecution.optimizedPlan}")
  }

  test("rewrite returns 0 (not null) on an empty relation") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("c")
    assert(idiom(empty, "c") == 0L)
    val withNullOnly = Seq(Option.empty[String]).toDF("c")
    assert(idiom(withNullOnly, "c") == 1L) // the null group counts
  }

  test("GraftExtensions wires BOTH the rule and the physical strategy") {
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(e)
    val rules = org.apache.spark.sql.graft.GraftSqlBridge
      .registeredRules(e, spark)
    assert(rules.contains(DistinctCountRewrite), rules.toString)
    val strategies = org.apache.spark.sql.graft.GraftSqlBridge
      .registeredStrategies(e, spark)
    assert(strategies.contains(TopKPerKeyStrategy), strategies.toString)
  }

  test("rule does not fire on legitimate two-level aggregates") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    // avg of group sums — NOT the idiom; must keep both aggregates
    val plan = df.groupBy("k").agg(sum("v").as("s")).agg(avg("s"))
    assert(nAggregates(plan) == 2, plan.queryExecution.optimizedPlan.toString)
    assert(plan.collect()(0).getDouble(0) == 3.0)
  }
}
