package graft.core

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bucketing = the shuffle-elimination scale tool: two tables bucketed
  * on the join key must join with NO Exchange in the plan, and the
  * result must equal the plain join. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dropTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val loc = new java.io.File(s"spark-warehouse/$t")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // disable broadcast so the join must pick a partitioned strategy —
    // that's what the bucketing is supposed to make shuffle-free.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      dropTable("b_orders"); dropTable("b_customer")
      val o = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      val c = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
      Sinks.writeBucketed(o.select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", "o_custkey", 4)
      Sinks.writeBucketed(c.select("c_custkey", "c_mktsegment"),
        "b_customer", "c_custkey", 4)

      val bo = spark.table("b_orders")
      val bc = spark.table("b_customer")
      // the bare join: with both sides co-bucketed there is NOTHING to
      // shuffle (downstream aggs on other keys still shuffle, correctly)
      val joined = bo.join(bc, bo("o_custkey") === bc("c_custkey"))
      joined.collect()
      val plan = joined.queryExecution.explainString(
        ExplainMode.fromString("simple"))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      // result parity with the plain join
      val plain = o.join(c, o("o_custkey") === c("c_custkey"))
        .select(joined.columns.map(col): _*)
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      dropTable("b_orders"); dropTable("b_customer")
    }
  }
}
