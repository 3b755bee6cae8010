package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.MlQueries

/** Round-11 operators: ml17 ridge path, t33 vocabulary-growth curve,
  * x50 Neyman allocation (st21's laws live in StreamingSpec with the
  * other stream==batch proofs). Each op's oracle row is the hash-exact
  * proof; these are the fixture-law checks. */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = TestSpark.sf0001

  test("ml17: lambda=0 reproduces ml01b's OLS exactly; shrinkage is the slope ratio") {
    val path = MlQueries.ridgePath.build(spark, sf).collect()
      .map(r => r.getAs[Long]("lambda") ->
        (r.getAs[Double]("slope"), r.getAs[Double]("intercept"),
          r.getAs[Double]("shrinkage"))).toMap
    val ols = MlQueries.olsExact.build(spark, sf).collect().head
    val (s0, i0, sh0) = path(0L)
    assert(s0 == ols.getAs[Double]("slope"), "lambda=0 slope != OLS")
    assert(i0 == ols.getAs[Double]("intercept"), "lambda=0 intercept != OLS")
    assert(sh0 == 1.0)
    // monotone shrinkage toward zero, slope ratio identity
    val lams = Seq(0L, 10L, 100L, 1000L)
    lams.sliding(2).foreach { case Seq(a, b) =>
      assert(math.abs(path(b)._1) < math.abs(path(a)._1),
        s"slope magnitude must shrink: $a -> $b")
      assert(path(b)._3 < path(a)._3, "shrinkage must decrease")
    }
    lams.foreach { l =>
      assert(path(l)._3 > 0.0 && path(l)._3 <= 1.0)
      assert(math.abs(path(l)._1 - s0 * path(l)._3) < 1e-12,
        s"slope(l) must equal slope(0) * shrinkage(l) at l=$l")
    }
  }

  test("t33: nested prefixes reproduce brute-force cumulative vocab and token counts") {
    val got = TextAnalysis.vocabGrowth.build(spark, sf).collect()
      .map(r => (r.getAs[Long]("prefix"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_vocab")))
    val docs = graft.core.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    for (k <- 0L to 3L) {
      val toks = docs.filter(_._1 % 4 <= k)
        .flatMap(_._2.split(" ", -1))
      val row = got.find(_._1 == k).getOrElse(fail(s"prefix $k missing"))
      assert(row._2 == toks.length, s"prefix $k token count")
      assert(row._3 == toks.distinct.length, s"prefix $k vocab")
    }
    // monotone nesting: both curves nondecreasing, vocab <= tokens
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3, "curves must be nondecreasing")
    }
    got.foreach { case (_, n, v) => assert(v <= n) }
  }

  test("x50: allocation sums to the budget and matches driver-side largest remainder") {
    val got = Curation.neymanAllocation.build(spark, sf).collect()
      .map(r => (r.getAs[String]("segment"), r.getAs[Long]("n_h"),
        r.getAs[Long]("sd_cents"), r.getAs[Long]("n_alloc")))
    assert(got.map(_._4).sum == 1000L, got.mkString(","))
    assert(got.length == 5) // the five market segments
    // driver-side largest-remainder recompute from raw cents
    val cents = graft.core.Tables.customer(spark, sf)
      .selectExpr("c_mktsegment AS seg",
        "CAST(round(c_acctbal * 100) AS BIGINT) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val w = cents.map { case (seg, cs) =>
      val n = cs.length.toLong
      val sc = cs.sum; val scc = cs.map(c => c * c).sum
      val sd = math.floor(math.sqrt((n * scc - sc * sc).toDouble) / n).toLong
      seg -> n * sd
    }
    val wt = w.values.sum
    val floor0 = w.view.mapValues(v => 1000L * v / wt).toMap
    val seats = 1000L - floor0.values.sum
    val order = w.toSeq.sortBy { case (seg, v) => (-(1000L * v % wt), seg) }
      .map(_._1).take(seats.toInt).toSet
    val expect = w.keys.map(seg =>
      seg -> (floor0(seg) + (if (order(seg)) 1L else 0L))).toMap
    got.foreach { case (seg, _, _, alloc) =>
      assert(alloc == expect(seg), s"$seg: $alloc != ${expect(seg)}")
    }
    // Neyman property: every stratum with positive weight gets a share
    got.foreach { case (seg, _, sd, alloc) =>
      if (sd > 0) assert(alloc > 0, s"$seg starved despite positive weight")
    }
  }
}
