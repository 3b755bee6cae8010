package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

// top-level: Spark can't synthesize encoders for suite-inner classes
final case class Line(
    l_orderkey: Long, l_quantity: Double, l_extendedprice: Double,
    l_returnflag: String)

final case class Order(
    o_orderkey: Long, o_custkey: Long, o_totalprice: Double,
    o_orderdate: Timestamp)

/** The Dataset[T] typed surface (SURVEY §1.3): case-class Encoders over
  * the parquet tables, typed transforms agreeing with the untyped plans. */
class TypedDatasetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed filter+groupByKey agg equals the untyped aggregate") {
    val df = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val ds = df.select("l_orderkey", "l_quantity", "l_extendedprice",
      "l_returnflag").as[Line]
    val typed = ds.filter(_.l_quantity > 30)
      .groupByKey(_.l_returnflag)
      .mapGroups((k, it) => k -> it.map(_.l_quantity).sum)
      .collect().toMap
    val untyped = df.filter(col("l_quantity") > 30)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (k, v) =>
      assert(math.abs(v - untyped(k)) < 1e-6, k)
    }
  }

  test("typed encoder round-trips timestamps and joins typed-to-typed") {
    val orders = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .as[Order]
    val top = orders.filter(_.o_totalprice > 100000).collect()
    assert(top.forall(_.o_orderdate != null))
    // typed joinWith keeps both sides as objects
    val c = spark.read.parquet(s"${TestSpark.sf0001}/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)]
    val joined = orders.joinWith(c, orders("o_custkey") === c("c_custkey")).take(5)
    assert(joined.forall { case (o, (ck, _)) => o.o_custkey == ck })
  }
}
