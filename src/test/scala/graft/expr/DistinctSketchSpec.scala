package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DistinctSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("estimate within 5% of exact at 10k distinct") {
    val est = DistinctSketch.estimate(
      (1L to 10000L).foldLeft(DistinctSketch.emptyBuffer)(DistinctSketch.update))
    assert(math.abs(est - 10000) < 500, s"est=$est")
  }

  test("merge(sketch(A), sketch(B)) == sketch(A ∪ B) — mergeability") {
    val a = (1L to 5000L).foldLeft(DistinctSketch.emptyBuffer)(DistinctSketch.update)
    val b = (2500L to 8000L).foldLeft(DistinctSketch.emptyBuffer)(DistinctSketch.update)
    val union = (1L to 8000L).foldLeft(DistinctSketch.emptyBuffer)(DistinctSketch.update)
    assert(DistinctSketch.merge(a, b).toSeq == union.toSeq)
  }

  test("duplicates don't change the sketch (idempotent updates)") {
    val once = (1L to 100L).foldLeft(DistinctSketch.emptyBuffer)(DistinctSketch.update)
    val thrice = (1 to 3).foldLeft(DistinctSketch.emptyBuffer) { (buf, _) =>
      (1L to 100L).foldLeft(buf)(DistinctSketch.update)
    }
    assert(once.toSeq == thrice.toSeq)
  }

  test("distinctSketchAny works over string columns") {
    val df = (1 to 5000).map(i => s"user_${i % 700}").toDF("s")
    val row = df.agg(
      DistinctSketch.distinctSketchAny(col("s")).as("est"),
      countDistinct(col("s")).as("exact")).collect()(0)
    val (est, exact) = (row.getLong(0), row.getLong(1))
    assert(math.abs(est - exact).toDouble / exact < 0.06, s"est=$est exact=$exact")
  }

  test("UDAF over a DataFrame tracks countDistinct") {
    val df = (1L to 20000L).map(i => i % 3000).toDF("k")
    val row = df.agg(
      DistinctSketch.distinctSketch(col("k")).as("est"),
      countDistinct(col("k")).as("exact")).collect()(0)
    val (est, exact) = (row.getLong(0), row.getLong(1))
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("e05 KMV: error bound on the estimated path, exact below k") {
    val out = graft.queries.Extensions.kmvSketch
      .build(spark, graft.TestSpark.sf0001).collect()
      .map(r => r.getAs[String]("col_name") ->
        (r.getAs[Double]("kmv_est"), r.getAs[Long]("exact"))).toMap
    // o_orderpriority has 5 distinct values < k=64 -> exact path
    val (pEst, pExact) = out("o_orderpriority")
    assert(pEst == pExact.toDouble, s"below-k path must be exact: $pEst vs $pExact")
    // o_custkey (>k distinct): KMV std error is ~1/sqrt(k) = 12.5%
    val (cEst, cExact) = out("o_custkey")
    assert(math.abs(cEst - cExact) / cExact < 0.4, s"est=$cEst exact=$cExact")
  }

  test("e05 KMV merge law: k-min of unioned k-min sketches == k-min of union") {
    // the property that makes KMV a distributed sketch: taking the k
    // smallest of each partition's k smallest equals the global k smallest
    val k = 16
    val a = (1L to 400L).map(x => x * 2654435761L % 1000003L)
    val b = (401L to 800L).map(x => x * 2654435761L % 1000003L)
    val skA = a.distinct.sorted.take(k)
    val skB = b.distinct.sorted.take(k)
    val merged = (skA ++ skB).distinct.sorted.take(k)
    val global = (a ++ b).distinct.sorted.take(k)
    assert(merged == global)
  }
}
