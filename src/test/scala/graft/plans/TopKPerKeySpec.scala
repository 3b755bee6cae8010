package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The custom physical operator must agree exactly with the window-
  * function formulation and must plan through TopKPerKeyExec with a
  * Catalyst-inserted shuffle on the group key. */
class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  private def viaWindow(k: Int) = {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  test("matches the window row_number formulation exactly") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val custom = TopKPerKey.topKPerKey(
      o, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
    val expected = viaWindow(3)
    assert(custom.count() == expected.count())
    assert(custom.exceptAll(expected).isEmpty &&
      expected.exceptAll(custom).isEmpty)
  }

  test("plans through TopKPerKeyExec with a key-clustered exchange") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val custom = TopKPerKey.topKPerKey(
      o, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
    custom.collect()
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(600)) // nodeName strips "Exec"
    assert(plan.contains("hashpartitioning(o_custkey"), plan.take(600))
    // and crucially: NO Sort or Window operator anywhere
    assert(!plan.contains("WindowExec") && !plan.contains("Sort "), plan.take(600))
  }

  test("k larger than any group returns everything") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val all = TopKPerKey.topKPerKey(
      o, Seq("o_custkey"), "o_totalprice", "o_orderkey", 1000000)
    assert(all.count() == o.count())
  }

  test("NaN ranks greatest, matching Spark's desc-sort total order") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 1L), (1L, Double.NaN, 2L), (1L, 7.0, 3L))
      .toDF("k", "v", "tie")
    val got = TopKPerKey.topKPerKey(df, Seq("k"), "v", "tie", 1)
      .collect().map(_.getLong(2))
    // window form: desc sort puts NaN first
    val w = Window.partitionBy(col("k")).orderBy(col("v").desc, col("tie"))
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).collect().map(_.getLong(2))
    assert(got.toSeq == expected.toSeq && got.toSeq == Seq(2L))
  }

  test("rejects wrong types, unknown/ambiguous columns, and k <= 0") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 2L)).toDF("k", "v", "tie")
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(df, Seq("k"), "tie", "tie", 1) // long orderCol
    }
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(df, Seq("k"), "nope", "tie", 1)
    }
    intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(df, Seq("k"), "v", "tie", 0)
    }
    // case-insensitive resolution (Spark default resolver)
    assert(TopKPerKey.topKPerKey(df, Seq("K"), "V", "TIE", 1).count() == 1)
  }

  test("ties at the boundary resolve by the tiebreak column") {
    import spark.implicits._
    val df = Seq(
      (1L, 10.0, 100L), (1L, 10.0, 101L), (1L, 10.0, 102L), (1L, 5.0, 99L))
      .toDF("k", "v", "tie")
    val got = TopKPerKey.topKPerKey(df, Seq("k"), "v", "tie", 2)
      .collect().map(_.getLong(2)).sorted
    assert(got.toSeq == Seq(100L, 101L))
  }
}
