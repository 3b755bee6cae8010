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

  test("q21 scale plan selects the same decile-1 set as a global ntile window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    val ntileSet = c.select(col("c_custkey"), ntile(10).over(w).as("d"))
      .filter(col("d") === 1).collect().map(_.getLong(0)).toSet
    // the registered plan's semi-join key set, recovered via the same
    // histogram-selection the query uses — compare whole outputs instead
    val viaQuery = Relational.q21.build(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Long]("revenue_cents"), r.getAs[Double]("revenue"))).toSeq
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val expected = o.filter(col("o_custkey").isin(ntileSet.toSeq: _*))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rc"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(2).toDouble / 100.0)).toSeq
    assert(viaQuery == expected)
  }

  test("q35 name-domain plan: result identical to row-level blocking; lev work vocab-bounded") {
    import org.apache.spark.sql.functions._
    val p = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_brand", "p_name")
    // brand-only row-blocking baseline (the round-1 plan)
    val a = p.select(col("p_brand"), col("p_partkey").as("a_id"),
      col("p_name").as("a_name"))
    val b = p.select(col("p_brand"), col("p_partkey").as("b_id"),
      col("p_name").as("b_name"))
    val baseline = a.join(b, Seq("p_brand")).filter(col("a_id") < col("b_id"))
      .withColumn("lev", levenshtein(col("a_name"), col("b_name")))
      .filter(col("lev") <= 3 && col("a_name") =!= col("b_name"))
      .select("p_brand", "a_id", "b_id", "lev")
      .orderBy("p_brand", "a_id", "b_id").collect().toSeq
    assert(Relational.q35.build(spark, sf).collect().toSeq == baseline)
    // lev candidate space scales with the name VOCABULARY, not the rows:
    // 10× the rows must not grow the name-pair stage
    def stats(dir: String): (Long, Long) = {
      val part = spark.read.parquet(s"$dir/part.parquet")
      val rows = part.count()
      val vocab = part.select("p_name").distinct().count()
      (rows, vocab * vocab)
    }
    val (rows0, lev0) = stats(sf)
    val (rows1, lev1) = stats("/root/testdata/sf0.01")
    info(s"rows $rows0->$rows1, lev candidates $lev0->$lev1")
    assert(rows1 >= rows0 * 5)
    assert(lev1 <= lev0 * 2, s"lev work grew with rows: $lev0 -> $lev1")
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
