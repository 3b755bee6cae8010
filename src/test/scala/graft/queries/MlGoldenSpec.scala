package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-round golden bands on the REGISTRY's ml01/ml02 outputs
  * (VERDICT r6 next-step #6): the metrics are model-dependent reals the
  * DuckDB oracle can't hash (seeded CV folds, L-BFGS/impurity fits), so
  * the correctness evidence is banded goldens asserted every `sbt test`
  * instead of by-inspection — the flight-parity discipline
  * (BASELINE.md §2's ±0.5 RMSE / ±0.02 R² bands) applied to the
  * driver-visible queries. Everything upstream of the fit is seeded
  * (split seed 10, CV seed 10, tree seed 10) over fixed sf0.001 data,
  * so drift outside these bands means the feature pipeline, the split,
  * or Spark ML semantics changed — exactly what a round gate should
  * catch.
  *
  * Model ordering note: on ORDERS data the label (o_totalprice) carries
  * no linear or tree-recoverable signal from (month, acctbal, priority,
  * segment) — R² ≈ 0 by construction of the synthetic data — so the
  * expected error ordering is LR < RFR < DTR: the regularized linear
  * model shrinks toward the mean while the trees overfit noise, and
  * forest averaging recovers part of the overfit. (The reference's
  * LR < DTR < RFR ordering is a property of its FLIGHT data, asserted
  * where it belongs — FlightPipelineSpec on the flight fixture.) */
class MlGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf0001

  // golden values recorded 2026-08-13 (round 7) at sf0.001; rmse bands
  // ±0.5% relative, r2 bands ±0.01 absolute — wide enough for FP
  // accumulation drift across thread schedules, tight enough that any
  // pipeline/semantics change trips them
  private val ml01Rmse = 143346.74
  private val ml02Rmse = Map(
    "DecisionTreeRegressor" -> 150440.79,
    "RandomForestRegressor" -> 144770.80)
  private val ml01R2 = -0.0031
  private val ml02R2 = Map(
    "DecisionTreeRegressor" -> -0.1048,
    "RandomForestRegressor" -> -0.0231)

  private def inBand(got: Double, golden: Double, rel: Double): Boolean =
    math.abs(got - golden) <= math.abs(golden) * rel

  test("ml01 LR metrics stay inside the recorded golden bands") {
    val r = MlQueries.lrOrders.build(spark, sf).collect()
    assert(r.length == 1)
    val rmse = r(0).getAs[Double]("rmse")
    val r2 = r(0).getAs[Double]("r2")
    assert(r(0).getAs[Long]("n_train") == 1040L)
    assert(r(0).getAs[Long]("n_test") == 460L)
    assert(inBand(rmse, ml01Rmse, 0.005), s"ml01 rmse drifted: $rmse")
    assert(math.abs(r2 - ml01R2) <= 0.01, s"ml01 r2 drifted: $r2")
  }

  test("ml02 tree metrics stay inside the recorded golden bands, LR < RFR < DTR error") {
    val r = MlQueries.treeOrders.build(spark, sf).collect()
      .map(x => x.getAs[String]("model") ->
        ((x.getAs[Double]("rmse"), x.getAs[Double]("r2")))).toMap
    assert(r.keySet == Set("DecisionTreeRegressor", "RandomForestRegressor"))
    r.foreach { case (m, (rmse, r2)) =>
      assert(inBand(rmse, ml02Rmse(m), 0.005), s"$m rmse drifted: $rmse")
      assert(math.abs(r2 - ml02R2(m)) <= 0.01, s"$m r2 drifted: $r2")
    }
    // the no-signal ordering (see scaladoc): shrinkage < averaged
    // overfit < single-tree overfit
    assert(ml01Rmse < r("RandomForestRegressor")._1)
    assert(r("RandomForestRegressor")._1 < r("DecisionTreeRegressor")._1)
  }
}
