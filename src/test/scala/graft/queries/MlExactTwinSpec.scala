package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exactness laws for the closed-form ML twins (ml01b OLS, ml02b
  * stump): the driver gate already hash-checks them against DuckDB on
  * the fixture tables; these specs check the MATH against an
  * arbitrary-precision driver-side reference on planted data, so the
  * integer-quantization overflow reasoning in the Scaladocs is
  * asserted, not just argued. */
class MlExactTwinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Planted orders: month cycles 1..12, price walks a deterministic
    * ramp with a month effect, so the stump/OLS have real structure. */
  private def plant(n: Int): Seq[(Long, Double, java.sql.Timestamp)] =
    (1 to n).map { i =>
      val m = 1 + (i % 12)
      val price = 100.0 * m + (i % 997) * 3.0 + 0.25
      (i.toLong, price,
        java.sql.Timestamp.valueOf(f"2024-$m%02d-15 00:00:00"))
    }

  private def writeOrders(rows: Seq[(Long, Double, java.sql.Timestamp)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("mlexact").toString
    rows.toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    tmp
  }

  test("ml01b OLS equals the BigInt-exact closed form on planted data") {
    val rows = plant(5000)
    val dir = writeOrders(rows)
    val out = MlQueries.olsExact.build(spark, dir).collect().head
    // arbitrary-precision reference over the same quantization
    val xy = rows.map { case (_, price, ts) =>
      val m = BigInt(ts.toLocalDateTime.getMonthValue)
      val y = BigInt(math.floor(price / 100.0).toLong)
      (m, y)
    }
    val n = BigInt(xy.size)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(t => t._1 * t._2).sum
    val sxx = xy.map(t => t._1 * t._1).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val intercept = (sy.toDouble - slope * sx.toDouble) / n.toDouble
    assert(out.getAs[Long]("n") == xy.size.toLong)
    // bit-exact: the engine performs the identical integer arithmetic
    // and the identical IEEE divisions
    assert(out.getAs[Double]("slope") == slope,
      s"slope ${out.getAs[Double]("slope")} != $slope")
    assert(out.getAs[Double]("intercept") == intercept,
      s"intercept ${out.getAs[Double]("intercept")} != $intercept")
  }

  test("ml02b stump equals the BigInt-exact SSE argmin on planted data") {
    val rows = plant(5000)
    val dir = writeOrders(rows)
    val out = MlQueries.stumpExact.build(spark, dir).collect().head
    val xy = rows.map { case (_, price, ts) =>
      (ts.toLocalDateTime.getMonthValue.toLong,
        math.floor(price / 100.0).toLong)
    }
    val byX = xy.groupBy(_._1).toSeq.sortBy(_._1).map { case (x, g) =>
      (x, BigInt(g.size), g.map(t => BigInt(t._2)).sum,
        g.map(t => BigInt(t._2) * BigInt(t._2)).sum)
    }
    val (nt, st, qt) = (byX.map(_._2).sum, byX.map(_._3).sum, byX.map(_._4).sum)
    def sse(nl: BigInt, sl: BigInt, ql: BigInt): Double =
      (ql.toDouble - sl.toDouble * sl.toDouble / nl.toDouble) +
        ((qt - ql).toDouble -
          (st - sl).toDouble * (st - sl).toDouble / (nt - nl).toDouble)
    val cands = byX.inits.toSeq.reverse.tail // non-empty prefixes in x order
      .map { pre =>
        (pre.last._1, pre.map(_._2).sum, pre.map(_._3).sum, pre.map(_._4).sum)
      }
      .filter { case (_, nl, _, _) => nl < nt }
      .map { case (x, nl, sl, ql) => (x, nl, sse(nl, sl, ql)) }
    val best = cands.minBy { case (x, _, s) => (s, x) }
    assert(out.getAs[Long]("split_at") == best._1)
    assert(out.getAs[Long]("n_left") == best._2.toLong)
    assert(out.getAs[Double]("sse_stump") == best._3,
      s"sse ${out.getAs[Double]("sse_stump")} != ${best._3}")
    val sseRoot = qt.toDouble - st.toDouble * st.toDouble / nt.toDouble
    assert(out.getAs[Double]("sse_root") == sseRoot)
    // the stump must actually improve on no-split
    assert(out.getAs[Double]("sse_stump") < out.getAs[Double]("sse_root"))
  }
}
