package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Exact unit expectations on sf0.001 + algebraic join laws. */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  test("every registered query runs and q08 is the only possibly-empty one") {
    // (cheap structural check; full oracle parity is the Verify gate)
    assert(SparkEntry.queries.size == SparkEntry.registry.size)
    assert(SparkEntry.registry.map(_.name).distinct.size ==
      SparkEntry.registry.size, "duplicate query names")
  }

  test("q02 aggregates to the 6 returnflag×linestatus groups") {
    val rows = Relational.q02.build(spark, sf).collect()
    assert(rows.length == 6)
    val n = rows.map(_.getAs[Long]("count_order")).sum
    assert(n == spark.read.parquet(s"$sf/lineitem.parquet").count())
  }

  test("join algebra: semi = inner ∘ distinct-project; anti = complement") {
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey")
    val innerDistinct = c.join(o, c("c_custkey") === o("o_custkey"))
      .select("c_custkey").distinct()
    assert(semi.count() == innerDistinct.count())
    assert(semi.except(innerDistinct).isEmpty)
    val anti = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
    assert(semi.count() + anti.count() == c.count())
  }

  test("q15 top-k equals sort-then-take") {
    val topk = Relational.q15.build(spark, sf).collect().map(_.getLong(0))
    val full = spark.read.parquet(s"$sf/orders.parquet")
      .orderBy(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.col("o_totalprice"), 2).desc,
        org.apache.spark.sql.functions.col("o_orderkey"))
      .limit(10).collect().map(_.getAs[Long]("o_orderkey"))
    assert(topk.toSeq == full.toSeq)
  }

  test("seeded sampling is deterministic and approximately sized (M4)") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val s1 = o.sample(withReplacement = false, 0.3, seed = 10)
    val s2 = o.sample(withReplacement = false, 0.3, seed = 10)
    assert(s1.count() == s2.count())
    assert(graft.core.Sinks.fingerprint(s1) == graft.core.Sinks.fingerprint(s2))
    val frac = s1.count().toDouble / o.count()
    assert(frac > 0.2 && frac < 0.4, s"frac=$frac")
    // randomSplit partitions are disjoint and cover the input
    val Array(a, b) = o.randomSplit(Array(0.7, 0.3), 10)
    assert(a.count() + b.count() == o.count())
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
