package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 90% of rows on one hot key — the shape salting exists for.
  lazy val skewed = ((1 to 900).map(i => ("hot", i.toDouble)) ++
    (1 to 100).map(i => (s"k$i", i.toDouble))).toDF("key", "v")
  lazy val dim = (Seq("hot") ++ (1 to 100).map(i => s"k$i"))
    .zipWithIndex.map { case (k, i) => (k, i) }.toDF("key", "attr")

  test("saltedJoin result equals the plain inner join") {
    val plain = skewed.join(dim, Seq("key"))
      .groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = Skew.saltedJoin(skewed, dim, "key", saltFactor = 4)
      .groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("saltedJoin spreads the hot key over multiple salt partitions") {
    val salted = skewed.withColumn("__salt",
      (rand(42L) * 4).cast("int"))
    val spread = salted.filter($"key" === "hot")
      .select("__salt").distinct().count()
    assert(spread > 1, s"hot key landed in $spread salt buckets")
  }

  test("saltedSum equals plain sum") {
    val plain = skewed.groupBy("key").agg(sum("v").as("sum_v"))
    val salted = Skew.saltedSum(skewed, "key", "v", saltFactor = 4)
    val joined = plain.as("p").join(salted.as("s"), Seq("key"))
      .select(abs($"p.sum_v" - $"s.sum_v").as("d")).agg(max("d"))
      .collect()(0).getDouble(0)
    assert(joined < 1e-9)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    // The complementary path to manual salting: shrink AQE's skew
    // thresholds so the hot partition qualifies, and verify the executed
    // plan marks the join as skew-handled.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val big = skewed.select($"key", $"v",
        concat_ws("", Seq.fill(40)(lit("pad")): _*).as("pad"))
      val joined = big.join(dim, Seq("key"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(2000))
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("keyHistogram surfaces the hot key first") {
    val top = Skew.keyHistogram(skewed, "key", 1).collect()(0)
    assert(top.getString(0) == "hot" && top.getLong(1) == 900)
  }

  test("AQE does NOT split a skewed AGGREGATION — the boundary where " +
      "manual salting is still required") {
    // When salting is and isn't needed, as one executable statement:
    // OptimizeSkewedJoin only rewrites JOIN shuffles (the test above —
    // skew=true on the planted sort-merge join), so rely on AQE there.
    // A hot GROUP BY key funnels into one reducer with no AQE rescue —
    // under the very thresholds that split the join, the aggregation
    // exchange stays unsplit — which is exactly what Skew.saltedSum's
    // two-phase (key, salt) aggregate exists for ("saltedSum equals
    // plain sum" proves it's semantics-preserving).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes").map(k => k -> conf.get(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      val big = skewed.select($"key", $"v",
        concat_ws("", Seq.fill(40)(lit("pad")): _*).as("pad"))
      val agg = big.groupBy("key")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("skew=true"),
        s"aggregation unexpectedly skew-split:\n${plan.take(2000)}")
      assert(plan.contains("HashAggregate"), plan.take(500))
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }
}
