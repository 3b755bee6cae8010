package graft.expr

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DayPartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference semantics, Main.scala:27-38. */
  val expected = Seq(
    0 -> "lateNight", 499 -> "lateNight", 500 -> "earlyMorning",
    799 -> "earlyMorning", 800 -> "lateMorning", 1199 -> "lateMorning",
    1200 -> "earlyAfternoon", 1399 -> "earlyAfternoon",
    1400 -> "lateAfternoon", 1699 -> "lateAfternoon",
    1700 -> "earlyEvening", 1899 -> "earlyEvening",
    1900 -> "lateEvening", 2099 -> "lateEvening",
    2100 -> "earlyNight", 2400 -> "earlyNight",
    2401 -> "", -1 -> "")

  test("label matches reference bucket boundaries") {
    expected.foreach { case (in, out) => assert(DayPart.label(in) == out) }
  }

  test("codegen'd expression agrees with driver-side label()") {
    DayPart.register(spark)
    val got = expected.map(_._1).toDF("hhmm")
      .withColumn("dp", expr("day_part(hhmm)"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    expected.foreach { case (in, out) => assert(got(in) == out, s"hhmm=$in") }
  }

  test("null-safe: null in, null out") {
    DayPart.register(spark)
    val r = Seq[Option[Int]](None).toDF("hhmm")
      .selectExpr("day_part(hhmm)").collect()(0)
    assert(r.isNullAt(0))
  }

  test("property: total and order-preserving on [0, 2400]") {
    val bucketOrder = Seq("lateNight", "earlyMorning", "lateMorning",
      "earlyAfternoon", "lateAfternoon", "earlyEvening", "lateEvening",
      "earlyNight")
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val a = rnd.nextInt(2401); val b = rnd.nextInt(2401)
      val (la, lb) = (DayPart.label(a), DayPart.label(b))
      assert(la.nonEmpty && lb.nonEmpty)
      if (a <= b)
        assert(bucketOrder.indexOf(la) <= bucketOrder.indexOf(lb), s"$a,$b")
    }
  }
}
