package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Laws for the round-7 portable sketch twins (e02b raw HLL, e08b
  * md5 Count-Min) — the estimator MATH is already hash-checked against
  * DuckDB by the driver; these assert the sketch guarantees hold on
  * data the oracle compare doesn't construct. */
class SketchTwinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("e08b estimates never undercount and hit exact counts for unique cells") {
    val out = Extensions.countMinMd5.build(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val est = r.getAs[Long]("est"); val exact = r.getAs[Long]("exact")
      assert(est >= exact,
        s"${r.getAs[String]("tok")}: est $est < exact $exact")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
  }

  test("e09 Bloom: one-sided error law on a planted vocabulary") {
    // every PRESENT probe must pass the filter (no false negatives, the
    // Bloom guarantee); absent probes may only flag as false_positive
    // when the filter says yes
    val tmp = java.nio.file.Files.createTempDirectory("e09").toString
    Seq((1L, "the and of planted words"), (2L, "more planted the text"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = Extensions.bloomMd5.build(spark, tmp).collect()
      .map(r => r.getAs[String]("tok") ->
        ((r.getAs[Int]("might_contain"), r.getAs[Int]("present"),
          r.getAs[Int]("false_positive")))).toMap
    assert(out.keySet ==
      Set("the", "and", "of", "qqxzabsent1", "qqxzabsent2"))
    out.foreach { case (tok, (might, present, fp)) =>
      if (present == 1) assert(might == 1, s"false negative on $tok")
      assert(fp == might * (1 - present))
    }
    // the three planted tokens are present; the qqxz probes are not
    assert(Seq("the", "and", "of").forall(out(_)._2 == 1))
    assert(Seq("qqxzabsent1", "qqxzabsent2").forall(out(_)._2 == 0))
  }

  test("e09 Bloom: sf0.001 corpus — presence column is exact, no false negatives") {
    val out = Extensions.bloomMd5.build(spark, TestSpark.sf0001).collect()
    assert(out.length == 5)
    out.foreach { r =>
      if (r.getAs[Int]("present") == 1)
        assert(r.getAs[Int]("might_contain") == 1,
          s"false negative on ${r.getAs[String]("tok")}")
    }
  }

  /** The JVM-side mirror of Dedup.sparkMd5Int60's parity bit: md5 hex
    * chars [2, 17) (1-based), parsed base 16 — 60 bits, fits a Long. */
  private def md5Sign(r: Long, tok: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$r:$tok".getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex.substring(1, 16), 16) % 2 == 0) 1L
    else -1L
  }

  test("e10 AMS: every Z row equals a sequential driver-side simulation") {
    // the distributed sum-of-signs must equal the textbook sequential
    // AMS pass over the same counts — signs from the same md5 family
    val tmp = java.nio.file.Files.createTempDirectory("e10").toString
    Seq((1L, "a a a b b c"), (2L, "b c c d"), (3L, "a d d d"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val counts = Map("a" -> 4L, "b" -> 3L, "c" -> 3L, "d" -> 4L)
    val out = Extensions.amsF2.build(spark, tmp).collect()
    assert(out.length == 16)
    val f2 = counts.values.map(c => c * c).sum
    out.foreach { row =>
      val r = row.getAs[Long]("r")
      val zSim = counts.map { case (t, c) => md5Sign(r, t) * c }.sum
      assert(row.getAs[Long]("z") == zSim, s"row $r: z != simulation")
      assert(row.getAs[Long]("est") == zSim * zSim)
      assert(row.getAs[Long]("f2_exact") == f2)
    }
    val ests = out.map(_.getAs[Long]("est").toDouble).sorted
    val mean = out.head.getAs[Double]("ams_mean")
    assert(mean == ests.sum / 16)
  }

  test("e10 AMS: estimators bracket exact F2 within the 16-row variance band on sf0.001") {
    // E[Z²] = F2 and Var[Z²] ≤ 2·F2², so the 16-row mean has σ ≤ F2·√2/4
    // ≈ 0.35·F2 and the median-of-4-means is tighter in the tails; both
    // are DETERMINISTIC here (md5 signs), so the 3σ band, once green,
    // stays green — this guards the sign family, not luck
    val out = Extensions.amsF2.build(spark, TestSpark.sf0001).collect()
    assert(out.length == 16)
    val f2 = out.head.getAs[Long]("f2_exact").toDouble
    assert(f2 > 0)
    for (c <- Seq("ams_mean", "ams_mom")) {
      val est = out.head.getAs[Double](c)
      val rel = math.abs(est - f2) / f2
      assert(rel <= 1.05, s"$c: est $est vs exact F2 $f2 (rel $rel)")
    }
    // Z is a plain sum over token counts: estimator rows must agree on
    // the shared summary columns (one aggregate, not per-row recompute)
    assert(out.map(_.getAs[Double]("ams_mean")).distinct.length == 1)
    assert(out.map(_.getAs[Double]("ams_mom")).distinct.length == 1)
  }

  test("e02b raw HLL lands within the 3σ band on a mid-range planted cardinality") {
    // 5000 distinct keys over m=256 registers is well past the
    // small-range regime the raw estimator (deliberately) doesn't
    // correct — the classic HLL standard error is 1.04/√m ≈ 6.5%,
    // asserted at 3σ (19.5%)
    val n = 5000
    val tmp = java.nio.file.Files.createTempDirectory("e02b").toString
    (1 to n).map(i => (i.toLong, i.toLong))
      .toDF("o_custkey", "o_orderkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val out = Extensions.hllMd5.build(spark, tmp).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Double]("hll_est"), r.getAs[Long]("exact")))).toMap
    assert(out.keySet == Set("o_custkey", "o_orderkey"))
    out.foreach { case (c, (est, exact)) =>
      assert(exact == n.toLong)
      val rel = math.abs(est - exact) / exact
      assert(rel <= 0.195, s"$c: est $est vs exact $exact (rel $rel)")
    }
  }

  test("e11 KMV set algebra: monotonicity and range laws on the fixture corpus") {
    val r = Extensions.kmvSetAlgebra.build(spark, TestSpark.sf0001).collect()
    assert(r.length == 1)
    val row = r.head
    def d(c: String) = row.getAs[Double](c)
    def l(c: String) = row.getAs[Long](c)
    // the merged sketch's k-th hash is <= each side's k-th hash, so the
    // union estimate dominates both side estimates deterministically
    assert(d("est_union") >= math.max(d("est_a"), d("est_b")) - 1e-9)
    assert(d("est_jaccard") >= 0.0 && d("est_jaccard") <= 1.0)
    assert(d("exact_jaccard") >= 0.0 && d("exact_jaccard") <= 1.0)
    assert(d("est_inter") <= d("est_union") + 1e-9)
    // exact side: inclusion-exclusion sanity over the token sets
    assert(l("exact_union") <= l("exact_a") + l("exact_b"))
    assert(l("exact_inter") == l("exact_a") + l("exact_b") - l("exact_union"))
    // KMV standard error is ~1/sqrt(k) = 12.5%; assert the union
    // estimate at 4 sigma on the deterministic fixture
    val rel = math.abs(d("est_union") - l("exact_union")) / l("exact_union")
    assert(rel <= 0.5, s"union est ${d("est_union")} vs ${l("exact_union")} (rel $rel)")
  }
}
