package graft.queries

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature._
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** ML pipeline surface (SURVEY §2.7, ML1-ML13) exercised over the
  * TESTDATA tables so the driver can run it per-round: indexer → OHE →
  * assembler → normalizer → selector → LR under CV. Metrics are
  * model-dependent reals → rows-only check here; tolerance-based golden
  * assertions (and the full flight-parity app) live in the test suite.
  */
object MlQueries {

  /** Shared labeled-features frame: orders ⋈ customer with the label and
    * the raw numeric/categorical feature columns (used by ml01 and ml02
    * so the two can't drift). */
  private def orderFeatures(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(
        col("o_totalprice").as("label"),
        month(col("o_orderdate")).cast("double").as("o_month"),
        col("c_acctbal"),
        col("o_orderpriority"), col("c_mktsegment"))

  /** Shared categorical indexer stage. */
  private def indexerStage() = new StringIndexer()
    .setInputCols(Array("o_orderpriority", "c_mktsegment"))
    .setOutputCols(Array("prioIdx", "segIdx"))
    .setHandleInvalid("keep")

  /** ml01 — regression of order value from customer/date features through
    * the full feature pipeline + 3-fold CV LinearRegression. */
  val lrOrders: QueryDef = QueryDef(
    "ml01_lr_pipeline",
    (s, d) => {
      import s.implicits._
      // cache: each pipeline-stage fit (indexer, selector ANOVA) and the
      // final transform is its own pass over this frame — uncached, the
      // orders ⋈ customer join would re-run for every one of them
      val df = orderFeatures(s, d).cache()

      val stages = Seq(
        indexerStage(),
        new OneHotEncoder().setInputCols(Array("prioIdx", "segIdx"))
          .setOutputCols(Array("prioCat", "segCat")),
        new VectorAssembler()
          .setInputCols(Array("o_month", "c_acctbal", "prioCat", "segCat"))
          .setOutputCol("rawFeatures"),
        new Normalizer().setInputCol("rawFeatures").setOutputCol("normFeatures")
          .setP(1.0),
        new UnivariateFeatureSelector()
          .setFeatureType("continuous").setLabelType("continuous")
          .setSelectionMode("fdr").setSelectionThreshold(0.5)
          .setFeaturesCol("normFeatures").setLabelCol("label")
          .setOutputCol("features"))
      val prepped = new Pipeline().setStages(stages.toArray)
        .fit(df).transform(df).select("label", "features")

      // cache: CV re-executes its input lineage once per fold×fit — without
      // this the join + feature pipeline recompute 4×.
      val Array(tr, te) = prepped.randomSplit(Array(0.7, 0.3), 10)
      tr.cache(); te.cache()
      val lr = new LinearRegression()
      val grid = new ParamGridBuilder()
        .addGrid(lr.regParam, Array(0.01))
        .addGrid(lr.elasticNetParam, Array(0.25))
        .addGrid(lr.maxIter, Array(10)).build()
      val rmseEval = new RegressionEvaluator().setMetricName("rmse")
      val cv = new CrossValidator().setEstimator(lr)
        .setEstimatorParamMaps(grid).setEvaluator(rmseEval)
        .setNumFolds(3).setSeed(10)
        // r15: fit the three folds from concurrent driver threads
        // (guide §2.6) — fold fits are independent and seeded, so the
        // fitted models and avgMetrics are identical to the serial run
        .setParallelism(3)
      val pred = cv.fit(tr).transform(te)
      val r2Eval = new RegressionEvaluator().setMetricName("r2")
      val out = Seq((
        "LinearRegression",
        rmseEval.evaluate(pred),
        r2Eval.evaluate(pred),
        tr.count(), te.count()))
        .toDF("model", "rmse", "r2", "n_train", "n_test")
      tr.unpersist(); te.unpersist(); df.unpersist()
      out
    },
    None)

  /** ml02 — tree regressors (DTR/RFR) on the same feature pipeline,
    * single fit each (the CV form is exercised by the flight app):
    * completes the driver-visible model-family coverage. */
  val treeOrders: QueryDef = QueryDef(
    "ml02_tree_regressors",
    (s, d) => {
      import org.apache.spark.ml.regression.{DecisionTreeRegressor, RandomForestRegressor}
      import s.implicits._
      // cache for the same reason as ml01: indexer fit + transform are
      // separate passes over the join
      val df = orderFeatures(s, d).cache()
      val stages = Seq(
        indexerStage(),
        new VectorAssembler()
          .setInputCols(Array("o_month", "c_acctbal", "prioIdx", "segIdx"))
          .setOutputCol("features"))
      val prepped = new Pipeline().setStages(stages.toArray)
        .fit(df).transform(df).select("label", "features")
      val Array(tr, te) = prepped.randomSplit(Array(0.7, 0.3), 10)
      tr.cache(); te.cache()
      val rmseEval = new RegressionEvaluator().setMetricName("rmse")
      val r2Eval = new RegressionEvaluator().setMetricName("r2")
      // r15: the two model fits are independent (same cached train
      // split, fixed seeds) — overlap them on driver threads
      // (guide §2.6); results are seed-deterministic either way
      val models = {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.ExecutionContext.Implicits.global
        import scala.concurrent.duration.Duration
        Await.result(Future.sequence(Seq(
          Future("DecisionTreeRegressor" ->
            new DecisionTreeRegressor().setSeed(10).fit(tr)),
          Future("RandomForestRegressor" ->
            new RandomForestRegressor().setSeed(10).setNumTrees(10)
              .fit(tr)))), Duration.Inf)
      }
      val out = models.map { case (name, m) =>
        val pred = m.transform(te)
        (name, rmseEval.evaluate(pred), r2Eval.evaluate(pred))
      }.toDF("model", "rmse", "r2").orderBy("model")
      tr.unpersist(); te.unpersist(); df.unpersist()
      out
    },
    None)

  /** ml03 — seeded KMeans clustering over embeddings (rows-only:
    * centroid init is engine-specific, and k-means|| seeding + double
    * accumulation depend on input partitioning, so the histogram is
    * stable only for a fixed partition layout). */
  val kmeansClusters: QueryDef = QueryDef(
    "ml03_kmeans_clusters",
    (s, d) => {
      import org.apache.spark.ml.functions.array_to_vector
      val vecs = Tables.embeddings(s, d)
        .select(col("vec_id"),
          array_to_vector(col("embedding").cast("array<double>"))
            .as("features"))
      val model = new org.apache.spark.ml.clustering.KMeans()
        .setK(8).setSeed(42).setMaxIter(10)
        .setFeaturesCol("features").setPredictionCol("cluster")
        .fit(vecs)
      model.transform(vecs)
        .groupBy("cluster")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .orderBy("cluster")
    },
    None)

  /** ml03b — oracle-exact twin of ml03: the same deliverable (a cluster
    * histogram of the embeddings table under seeded k-means) computed
    * with the deterministic distributed Lloyd construction from s07
    * (int8-quantized vectors so every centroid partial-sum is an exact
    * order-independent integer, pinned low-id seeds, sequential-fold
    * dot products) instead of MLlib's engine-specific k-means|| init.
    * ml03 stays rows-only by design — MLlib's init sampling and float
    * accumulation depend on partition layout — so this twin is what
    * pins the "k-means over embeddings" capability to the DuckDB
    * oracle, the same twin pattern as e02b/e08b/x29b. */
  val kmeansClustersExact: QueryDef = QueryDef(
    "ml03b_kmeans_hist",
    (s, d) => graft.ext.Similarity.kmeansLloyd.build(s, d)
      .select("vec_id", "cluster")
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"))
      .orderBy("cluster"),
    Some(s"""SELECT cluster, COUNT(*) AS n
             FROM (${graft.ext.Similarity.kmeansLloyd.sql.get}) lloyd
             GROUP BY cluster ORDER BY cluster"""))

  /** ml01b — oracle-exact twin for ml01's regression row, the same
    * twin move as ml03b: a closed-form ordinary-least-squares fit whose
    * every intermediate is deterministic in BOTH engines. MLlib's LR
    * (ml01) stays rows-only — L-BFGS iterate order and float reduction
    * depend on partitioning — so this pins the "fit a linear model
    * distributed" capability to the DuckDB oracle:
    *   - features/label are quantized to integers (s07's trick):
    *     x = month, y = floor(price/100) — so the five sufficient
    *     statistics (n, Σx, Σy, Σxy, Σx²) are exact BIGINTs,
    *     order- and partition-independent, no overflow until n ≈ 3·10⁸
    *     (y ≤ 6·10³, x ≤ 12);
    *   - slope = (nΣxy − ΣxΣy)/(nΣx² − Σx²) does integer arithmetic
    *     and ONE IEEE division; intercept = (Σy − slope·Σx)/n performs
    *     the same three IEEE ops in the same order in both engines.
    * Scale shape: one partial-aggregable scan — the 100 TB OLS is
    * five numbers per partition, merged associatively (this is also
    * why MLlib's own normal-equation solver scales; here the algebra
    * is explicit and exact). */
  val olsExact: QueryDef = QueryDef(
    "ml01b_ols_exact",
    (s, d) => Tables.orders(s, d)
      .select(
        month(col("o_orderdate")).cast("long").as("x"),
        expr("CAST(floor(o_totalprice / 100e0) AS BIGINT)").as("y"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .withColumn("slope", expr(
        "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"))
      .withColumn("intercept", expr(
        "(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"))
      .select("n", "slope", "intercept"),
    Some("""WITH q AS (
              SELECT CAST(month(o_orderdate) AS BIGINT) AS x,
                     CAST(floor(o_totalprice / 100e0) AS BIGINT) AS y
              FROM orders),
            s AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx
              FROM q),
            sl AS (
              SELECT *, CAST(n * sxy - sx * sy AS DOUBLE)
                        / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
              FROM s)
            SELECT n, slope,
              (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                / CAST(n AS DOUBLE) AS intercept
            FROM sl"""))

  /** ml02b — oracle-exact twin for ml02's tree row: the depth-1
    * regression tree (decision stump) fit EXACTLY. MLlib's trees
    * (ml02) stay rows-only — impurity aggregation order and binning
    * are engine-internal — but the stump over a small discrete feature
    * is fully determined by per-value sufficient statistics, which is
    * precisely how distributed tree learners (PLANET, MLlib itself)
    * evaluate splits: per candidate split s, SSE(s) =
    * (ΣyL² − (ΣyL)²/nL) + (ΣyR² − (ΣyR)²/nR), computed here from ONE
    * 12-row groupBy(month) aggregate of exact BIGINT sums (ml01b's
    * quantization) + a prefix-sum window over those 12 rows; both
    * engines perform the identical IEEE ops and break SSE ties on the
    * smaller split point. Output: the chosen split, side populations
    * and means, stump SSE, and the no-split SSE it improves on.
    *
    * Scale shape: the corpus-sized work is the single partial-
    * aggregable groupBy(x); candidate evaluation happens on the
    * 12-row frame (the bounded global window is whitelisted in
    * PlanGuardSpec like x11/x15's). */
  val stumpExact: QueryDef = QueryDef(
    "ml02b_stump_exact",
    (s, d) => {
      val w = Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byX = Tables.orders(s, d)
        .select(
          month(col("o_orderdate")).cast("long").as("x"),
          expr("CAST(floor(o_totalprice / 100e0) AS BIGINT)").as("y"))
        .groupBy("x")
        .agg(count(lit(1)).as("n"), sum("y").as("sy"),
          sum(expr("y * y")).as("syy"))
      val cum = byX
        .withColumn("nl", sum("n").over(w))
        .withColumn("sl", sum("sy").over(w))
        .withColumn("ql", sum("syy").over(w))
        .crossJoin(byX.agg(sum("n").as("nt"), sum("sy").as("st"),
          sum("syy").as("qt")))
        .filter(col("nl") < col("nt")) // right side must be non-empty
      val scored = cum
        .withColumn("sse", expr(
          """(CAST(ql AS DOUBLE)
               - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE))
             + (CAST(qt - ql AS DOUBLE)
               - CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
                 / CAST(nt - nl AS DOUBLE))"""))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("sse"), col("x"))))
        .filter(col("rn") === 1)
      scored.select(
        col("x").as("split_at"),
        col("nl").as("n_left"), (col("nt") - col("nl")).as("n_right"),
        expr("CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE)").as("mean_left"),
        expr("CAST(st - sl AS DOUBLE) / CAST(nt - nl AS DOUBLE)")
          .as("mean_right"),
        col("sse").as("sse_stump"),
        expr("""CAST(qt AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)""")
          .as("sse_root"))
    },
    Some("""WITH q AS (
              SELECT CAST(month(o_orderdate) AS BIGINT) AS x,
                     CAST(floor(o_totalprice / 100e0) AS BIGINT) AS y
              FROM orders),
            byx AS (
              SELECT x, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(y * y) AS BIGINT) AS syy
              FROM q GROUP BY x),
            tot AS (
              SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(sy) AS BIGINT) AS st,
                     CAST(sum(syy) AS BIGINT) AS qt
              FROM byx),
            cum AS (
              SELECT x,
                CAST(sum(n) OVER w AS BIGINT) AS nl,
                CAST(sum(sy) OVER w AS BIGINT) AS sl,
                CAST(sum(syy) OVER w AS BIGINT) AS ql,
                nt, st, qt
              FROM byx, tot
              WINDOW w AS (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            scored AS (
              SELECT *,
                (CAST(ql AS DOUBLE)
                   - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE))
                + (CAST(qt - ql AS DOUBLE)
                   - CAST(st - sl AS DOUBLE) * CAST(st - sl AS DOUBLE)
                     / CAST(nt - nl AS DOUBLE)) AS sse
              FROM cum WHERE nl < nt),
            best AS (
              SELECT * FROM (
                SELECT *, row_number() OVER (ORDER BY sse, x) AS rn
                FROM scored) WHERE rn = 1)
            SELECT x AS split_at, nl AS n_left, nt - nl AS n_right,
              CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE) AS mean_left,
              CAST(st - sl AS DOUBLE) / CAST(nt - nl AS DOUBLE) AS mean_right,
              sse AS sse_stump,
              CAST(qt AS DOUBLE)
                - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)
                AS sse_root
            FROM best"""))

  /** ml04 — cross-validation slope STABILITY: ml01b's closed-form OLS
    * fit per md5-assigned fold (k=5), with the cross-fold mean and
    * spread — the model-stability readout the reference's 5-fold CV
    * (ML11) buys implicitly, made explicit and oracle-exact. A spread
    * far above the fold-sampling noise flags a feature whose
    * relationship is regime-dependent (exactly what CV is for); the
    * evaluation-harness idiom (d17/t21/s08/s13) applied to regression.
    *
    * Determinism: fold = 40-bit md5 fold of the order key mod 5 (x01's
    * portable-hash idiom); per-fold sums are exact longs and the slope
    * is ONE IEEE division (ml01b's argument). The CROSS-fold mean and
    * spread are computed over slope_e6 = round(slope·10⁶) INTEGERS —
    * summing the raw doubles would be aggregation-order-dependent; the
    * integerized t23 discipline keeps the summary exact and order-free.
    *
    * Scale shape: ONE partial-aggregable groupBy(fold) over the corpus
    * (5 groups), then a 5-row frame with a 1-row summary broadcast
    * (e05's idiom). */
  val cvSlopeStability: QueryDef = {
    val folds = 5
    QueryDef(
      "ml04_cv_slope_stability",
      (s, d) => {
        val perFold = Tables.orders(s, d)
          .select(
            expr(s"CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 10), 16, 10) AS BIGINT) % $folds")
              .as("fold"),
            month(col("o_orderdate")).cast("long").as("x"),
            expr("CAST(floor(o_totalprice / 100e0) AS BIGINT)").as("y"))
          .groupBy("fold")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
          .withColumn("slope", expr(
            "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
              "(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"))
          .withColumn("slope_e6", expr("CAST(round(slope * 1000000) AS BIGINT)"))
        val summary = perFold.agg(
          expr("CAST(sum(slope_e6) AS BIGINT)").as("sum_e6"),
          max("slope_e6").as("max_e6"), min("slope_e6").as("min_e6"))
        perFold.crossJoin(broadcast(summary))
          .selectExpr("fold", "n", "slope", "slope_e6",
            s"round(CAST(sum_e6 AS DOUBLE) / (1000000.0 * $folds), 6) AS slope_mean",
            "round(CAST(max_e6 - min_e6 AS DOUBLE) / 1000000.0, 6) AS slope_spread")
          .orderBy("fold")
      },
      Some(s"""WITH q AS (
                 SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(1, 11),
                       i -> CAST(strpos('0123456789abcdef',
                         substring(md5(CAST(o_orderkey AS VARCHAR)), i, 1))
                         - 1 AS BIGINT))),
                     (a, dg) -> a * 16 + dg) % $folds AS fold,
                   CAST(month(o_orderdate) AS BIGINT) AS x,
                   CAST(floor(o_totalprice / 100e0) AS BIGINT) AS y
                 FROM orders),
               pf AS (
                 SELECT fold, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx
                 FROM q GROUP BY 1),
               sl AS (
                 SELECT fold, n,
                   (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
                 FROM pf),
               se AS (
                 SELECT fold, n, slope,
                   CAST(round(slope * 1000000) AS BIGINT) AS slope_e6
                 FROM sl),
               summ AS (
                 SELECT CAST(sum(slope_e6) AS BIGINT) AS sum_e6,
                   max(slope_e6) AS max_e6, min(slope_e6) AS min_e6
                 FROM se)
               SELECT se.fold, se.n, se.slope, se.slope_e6,
                 round(CAST(summ.sum_e6 AS DOUBLE) / (1000000.0 * $folds), 6)
                   AS slope_mean,
                 round(CAST(summ.max_e6 - summ.min_e6 AS DOUBLE) / 1000000.0, 6)
                   AS slope_spread
               FROM se, summ ORDER BY fold"""))
  }

  /** ml07 — learning-curve readout (the data-scaling audit: hold the
    * eval set fixed, fit on nested 10/20/40/80% training subsets, and
    * report each budget's fit and held-out RMSE — the curve that says
    * whether MORE DATA still buys accuracy, the question every
    * training-data pipeline exists to answer; Banko & Brill ACL 2001
    * is the canonical NLP demonstration, Hestness et al. 2017 the
    * deep-learning form). Buckets are md5-assigned (ml04's idiom);
    * budgets k ∈ {1,2,4,8} train on buckets < k, eval is ALWAYS
    * buckets 8-9 — nested subsets, disjoint from eval at every budget.
    *
    * Determinism: ALL corpus-sized work lands in one 10-bucket
    * aggregate of exact BIGINT sufficient statistics (n, Σx, Σy, Σxy,
    * Σx², Σy²); the held-out SSE is evaluated from eval-side moments —
    * SSE = Σy² − 2aΣy − 2sΣxy + 2asΣx + a²n + s²Σx² — a fixed-shape
    * IEEE expression over exact longs, identical in both engines, so
    * no per-row float accumulation ever happens.
    *
    * Scale shape: ONE partial-aggregable scan → 10-row frame; budget
    * fan-out is a 4×10 bounded theta-join on that frame (whitelisted);
    * the eval-moments row broadcasts (e05's idiom). Output: 4 rows. */
  val learningCurve: QueryDef = {
    val buckets = 10
    val budgets = Seq(1, 2, 4, 8)
    val budgetVals = budgets.map(k => s"($k)").mkString(", ")
    QueryDef(
      "ml07_learning_curve",
      (s, d) => {
        import s.implicits._
        val perBucket = Tables.orders(s, d)
          .select(
            expr(s"CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 10), 16, 10) AS BIGINT) % $buckets")
              .as("b"),
            month(col("o_orderdate")).cast("long").as("x"),
            expr("CAST(floor(o_totalprice / 100e0) AS BIGINT)").as("y"))
          .groupBy("b")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
            sum(expr("y * y")).as("syy"))
          .localCheckpoint() // one corpus scan feeds train fan-out + eval
        val train = broadcast(budgets.toDF("k"))
          .join(perBucket, col("b") < col("k"))
          .groupBy("k")
          .agg(sum("n").as("n_t"), sum("sx").as("sx_t"),
            sum("sy").as("sy_t"), sum("sxy").as("sxy_t"),
            sum("sxx").as("sxx_t"))
        val ev = perBucket.filter(col("b") >= 8)
          .agg(sum("n").as("n_e"), sum("sx").as("sx_e"),
            sum("sy").as("sy_e"), sum("sxy").as("sxy_e"),
            sum("sxx").as("sxx_e"), sum("syy").as("syy_e"))
        train.crossJoin(broadcast(ev))
          .withColumn("slope", expr(
            "(CAST(n_t AS DOUBLE) * CAST(sxy_t AS DOUBLE) - CAST(sx_t AS DOUBLE) * CAST(sy_t AS DOUBLE)) / " +
              "(CAST(n_t AS DOUBLE) * CAST(sxx_t AS DOUBLE) - CAST(sx_t AS DOUBLE) * CAST(sx_t AS DOUBLE))"))
          .withColumn("icept", expr(
            "(CAST(sy_t AS DOUBLE) - slope * CAST(sx_t AS DOUBLE)) / CAST(n_t AS DOUBLE)"))
          .withColumn("sse", expr(
            "CAST(syy_e AS DOUBLE) - 2.0 * icept * CAST(sy_e AS DOUBLE) - " +
              "2.0 * slope * CAST(sxy_e AS DOUBLE) + " +
              "2.0 * icept * slope * CAST(sx_e AS DOUBLE) + " +
              "icept * icept * CAST(n_e AS DOUBLE) + " +
              "slope * slope * CAST(sxx_e AS DOUBLE)"))
          .selectExpr("k", "n_t AS n_train", "round(slope, 6) AS slope",
            "round(icept, 6) AS intercept",
            "round(sqrt(sse / CAST(n_e AS DOUBLE)), 6) AS rmse_eval")
          .orderBy("k")
      },
      Some(s"""WITH q AS (
                 SELECT list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(range(1, 11),
                       i -> CAST(strpos('0123456789abcdef',
                         substring(md5(CAST(o_orderkey AS VARCHAR)), i, 1))
                         - 1 AS BIGINT))),
                     (a, dg) -> a * 16 + dg) % $buckets AS b,
                   CAST(month(o_orderdate) AS BIGINT) AS x,
                   CAST(floor(o_totalprice / 100e0) AS BIGINT) AS y
                 FROM orders),
               pb AS (
                 SELECT b, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
                 FROM q GROUP BY 1),
               ks(k) AS (VALUES $budgetVals),
               tr AS (
                 SELECT k, CAST(sum(n) AS BIGINT) AS n_t,
                   CAST(sum(sx) AS BIGINT) AS sx_t,
                   CAST(sum(sy) AS BIGINT) AS sy_t,
                   CAST(sum(sxy) AS BIGINT) AS sxy_t,
                   CAST(sum(sxx) AS BIGINT) AS sxx_t
                 FROM ks JOIN pb ON pb.b < ks.k GROUP BY k),
               ev AS (
                 SELECT CAST(sum(n) AS BIGINT) AS n_e,
                   CAST(sum(sx) AS BIGINT) AS sx_e,
                   CAST(sum(sy) AS BIGINT) AS sy_e,
                   CAST(sum(sxy) AS BIGINT) AS sxy_e,
                   CAST(sum(sxx) AS BIGINT) AS sxx_e,
                   CAST(sum(syy) AS BIGINT) AS syy_e
                 FROM pb WHERE b >= 8),
               fit AS (
                 SELECT k, n_t,
                   (CAST(n_t AS DOUBLE) * CAST(sxy_t AS DOUBLE)
                     - CAST(sx_t AS DOUBLE) * CAST(sy_t AS DOUBLE)) /
                   (CAST(n_t AS DOUBLE) * CAST(sxx_t AS DOUBLE)
                     - CAST(sx_t AS DOUBLE) * CAST(sx_t AS DOUBLE)) AS slope,
                   sx_t, sy_t
                 FROM tr),
               fi AS (
                 SELECT k, n_t, slope,
                   (CAST(sy_t AS DOUBLE) - slope * CAST(sx_t AS DOUBLE))
                     / CAST(n_t AS DOUBLE) AS icept
                 FROM fit),
               ss AS (
                 SELECT k, n_t, slope, icept,
                   CAST(syy_e AS DOUBLE) - 2.0 * icept * CAST(sy_e AS DOUBLE)
                     - 2.0 * slope * CAST(sxy_e AS DOUBLE)
                     + 2.0 * icept * slope * CAST(sx_e AS DOUBLE)
                     + icept * icept * CAST(n_e AS DOUBLE)
                     + slope * slope * CAST(sxx_e AS DOUBLE) AS sse,
                   n_e
                 FROM fi, ev)
               SELECT CAST(k AS INTEGER) AS k, n_t AS n_train,
                 round(slope, 6) AS slope, round(icept, 6) AS intercept,
                 round(sqrt(sse / CAST(n_e AS DOUBLE)), 6) AS rmse_eval
               FROM ss ORDER BY k"""))
  }

  /** ml08 — cross-slice transfer matrix (the domain-generalization
    * audit: fit on slice i, evaluate on slice j, report the full
    * RMSE matrix — the question behind every data-mixing decision:
    * does slice A's model transfer to slice B, or is B's data
    * irreplaceable? The cross-domain form of ml07's scaling curve;
    * cf. the cross-corpus transfer matrices in Blitzer et al. EMNLP
    * 2006 and the per-domain ablations in The Pile, Gao et al. 2020).
    * Slices are the 5 document languages; the model is ml01b's
    * closed-form OLS of y = n_chars on x = whitespace-token count.
    *
    * Determinism (ml07's argument): ALL corpus-sized work is one
    * 5-row groupBy(lang) aggregate of exact BIGINT sufficient
    * statistics (n, Σx, Σy, Σxy, Σx², Σy²); the cross-slice SSE is
    * the fixed-shape IEEE polynomial over those exact longs —
    * SSE = Σy² − 2aΣy − 2bΣxy + 2abΣx + a²n + b²Σx² — identical op
    * order in both engines, no per-row float accumulation anywhere.
    * Long bound: Σy² < n·(max n_chars)² — safe to n ≈ 3·10¹¹ docs at
    * the fixture's 4-digit n_chars; beyond that the moments widen to
    * DECIMAL(38,0) (st16/x36's documented path).
    *
    * Scale shape: ONE partial-aggregable scan → lang-domain frame
    * (bounded by the language inventory, ~dozens at 100 TB); the
    * matrix fan-out is a bounded broadcast cross of that frame with
    * itself — 25 rows here, |langs|² always. */
  val transferMatrix: QueryDef = QueryDef(
    "ml08_transfer_matrix",
    (s, d) => {
      val perLang = Tables.documents(s, d)
        .select(col("lang"),
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("x"),
          col("n_chars").cast("long").as("y"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"),
          sum(expr("y * y")).as("syy"))
        .localCheckpoint() // one corpus scan feeds both matrix axes
      val tr = perLang.select(col("lang").as("train_lang"),
          col("n").as("n_t"), col("sx").as("sx_t"), col("sy").as("sy_t"),
          col("sxy").as("sxy_t"), col("sxx").as("sxx_t"))
        .withColumn("slope", expr(
          "(CAST(n_t AS DOUBLE) * CAST(sxy_t AS DOUBLE) - CAST(sx_t AS DOUBLE) * CAST(sy_t AS DOUBLE)) / " +
            "(CAST(n_t AS DOUBLE) * CAST(sxx_t AS DOUBLE) - CAST(sx_t AS DOUBLE) * CAST(sx_t AS DOUBLE))"))
        .withColumn("icept", expr(
          "(CAST(sy_t AS DOUBLE) - slope * CAST(sx_t AS DOUBLE)) / CAST(n_t AS DOUBLE)"))
      val ev = perLang.select(col("lang").as("eval_lang"),
        col("n").as("n_e"), col("sx").as("sx_e"), col("sy").as("sy_e"),
        col("sxy").as("sxy_e"), col("sxx").as("sxx_e"),
        col("syy").as("syy_e"))
      tr.crossJoin(broadcast(ev))
        .withColumn("sse", expr(
          "CAST(syy_e AS DOUBLE) - 2.0 * icept * CAST(sy_e AS DOUBLE) - " +
            "2.0 * slope * CAST(sxy_e AS DOUBLE) + " +
            "2.0 * icept * slope * CAST(sx_e AS DOUBLE) + " +
            "icept * icept * CAST(n_e AS DOUBLE) + " +
            "slope * slope * CAST(sxx_e AS DOUBLE)"))
        .selectExpr("train_lang", "eval_lang", "n_e AS n_eval",
          "round(slope, 6) AS slope", "round(icept, 6) AS intercept",
          "round(sqrt(sse / CAST(n_e AS DOUBLE)), 6) AS rmse")
        .orderBy("train_lang", "eval_lang")
    },
    Some("""WITH q AS (
              SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
                     CAST(n_chars AS BIGINT) AS y
              FROM documents),
            pl AS (
              SELECT lang, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(y * y) AS BIGINT) AS syy
              FROM q GROUP BY 1),
            fit AS (
              SELECT lang,
                (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
                n, sx, sy
              FROM pl),
            fi AS (
              SELECT lang, slope,
                (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                  / CAST(n AS DOUBLE) AS icept
              FROM fit),
            cell AS (
              SELECT t.lang AS train_lang, e.lang AS eval_lang,
                t.slope, t.icept, e.n AS n_e,
                CAST(e.syy AS DOUBLE) - 2.0 * t.icept * CAST(e.sy AS DOUBLE)
                  - 2.0 * t.slope * CAST(e.sxy AS DOUBLE)
                  + 2.0 * t.icept * t.slope * CAST(e.sx AS DOUBLE)
                  + t.icept * t.icept * CAST(e.n AS DOUBLE)
                  + t.slope * t.slope * CAST(e.sxx AS DOUBLE) AS sse
              FROM fi t, pl e)
            SELECT train_lang, eval_lang, n_e AS n_eval,
              round(slope, 6) AS slope, round(icept, 6) AS intercept,
              round(sqrt(sse / CAST(n_e AS DOUBLE)), 6) AS rmse
            FROM cell ORDER BY train_lang, eval_lang"""))

  /** ml09 — leave-one-feature-out importance (LOFO — the
    * permutation-free feature-importance audit: refit WITHOUT each
    * feature, importance = held-in RMSE degradation; the ablation form
    * of Breiman 2001's permutation importance, exactly computable from
    * sufficient statistics where permutation is not). Model: 2-feature
    * closed-form OLS of y = n_chars on x1 = token count and
    * x2 = distinct token count over documents; per feature the single-
    * feature refit drops it and the report row carries the full-model
    * coefficient, full RMSE, without-RMSE and the importance delta.
    *
    * Determinism (ml01b's argument, one feature wider): ALL
    * corpus-sized work is one aggregate of TEN exact BIGINT moments
    * (n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y, Σy²); the
    * normal-equations solve (Cramer on the 2×2 centered system), the
    * intercept, and each SSE expansion are ONE fixed-shape IEEE
    * expression over those longs — identical op order in both engines,
    * never a per-row float.
    *
    * Scale shape: one partial-aggregable scan → a 1-row moments frame;
    * everything downstream is driver-free scalar algebra on that row.
    * The 100 TB LOFO is ten numbers per partition, merged
    * associatively — refitting-without-a-feature costs nothing extra
    * because every submodel reads the same moment set. */
  val lofoImportance: QueryDef = QueryDef(
    "ml09_lofo_importance",
    (s, d) => {
      Tables.documents(s, d)
        .select(
          expr("CAST(size(split(text, ' ')) AS BIGINT)").as("x1"),
          expr("CAST(size(array_distinct(split(text, ' '))) AS BIGINT)").as("x2"),
          col("n_chars").cast("long").as("y"))
        .agg(count(lit(1)).as("n"),
          sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
          sum(expr("x1 * x1")).as("s11"), sum(expr("x2 * x2")).as("s22"),
          sum(expr("x1 * x2")).as("s12"),
          sum(expr("x1 * y")).as("s1y"), sum(expr("x2 * y")).as("s2y"),
          sum(expr("y * y")).as("syy"))
        .withColumn("c11", expr("CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"))
        .withColumn("c22", expr("CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"))
        .withColumn("c12", expr("CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)"))
        .withColumn("c1y", expr("CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE)"))
        .withColumn("c2y", expr("CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE)"))
        .withColumn("det", expr("c11 * c22 - c12 * c12"))
        .withColumn("b1", expr("(c22 * c1y - c12 * c2y) / det"))
        .withColumn("b2", expr("(c11 * c2y - c12 * c1y) / det"))
        .withColumn("a", expr("(CAST(sy AS DOUBLE) - b1 * CAST(s1 AS DOUBLE) - b2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE)"))
        .withColumn("rmse_full", expr(
          "sqrt((CAST(syy AS DOUBLE) + CAST(n AS DOUBLE) * a * a + b1 * b1 * CAST(s11 AS DOUBLE) + b2 * b2 * CAST(s22 AS DOUBLE) " +
            "- 2.0 * a * CAST(sy AS DOUBLE) - 2.0 * b1 * CAST(s1y AS DOUBLE) - 2.0 * b2 * CAST(s2y AS DOUBLE) " +
            "+ 2.0 * a * b1 * CAST(s1 AS DOUBLE) + 2.0 * a * b2 * CAST(s2 AS DOUBLE) + 2.0 * b1 * b2 * CAST(s12 AS DOUBLE)) / CAST(n AS DOUBLE))"))
        .withColumn("m1", expr("c1y / c11"))
        .withColumn("a1", expr("(CAST(sy AS DOUBLE) - m1 * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE)"))
        .withColumn("rmse_only_x1", expr(
          "sqrt((CAST(syy AS DOUBLE) + CAST(n AS DOUBLE) * a1 * a1 + m1 * m1 * CAST(s11 AS DOUBLE) " +
            "- 2.0 * a1 * CAST(sy AS DOUBLE) - 2.0 * m1 * CAST(s1y AS DOUBLE) + 2.0 * a1 * m1 * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE))"))
        .withColumn("m2", expr("c2y / c22"))
        .withColumn("a2", expr("(CAST(sy AS DOUBLE) - m2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE)"))
        .withColumn("rmse_only_x2", expr(
          "sqrt((CAST(syy AS DOUBLE) + CAST(n AS DOUBLE) * a2 * a2 + m2 * m2 * CAST(s22 AS DOUBLE) " +
            "- 2.0 * a2 * CAST(sy AS DOUBLE) - 2.0 * m2 * CAST(s2y AS DOUBLE) + 2.0 * a2 * m2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE))"))
        .selectExpr(
          "stack(2, " +
            "'n_tokens', round(b1, 6), round(rmse_full, 6), round(rmse_only_x2, 6), round(rmse_only_x2 - rmse_full, 6), " +
            "'n_distinct_tokens', round(b2, 6), round(rmse_full, 6), round(rmse_only_x1, 6), round(rmse_only_x1 - rmse_full, 6)) " +
            "AS (feature, coef_full, rmse_full, rmse_without, importance)")
        .orderBy("feature")
    },
    Some("""WITH q AS (
              SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS x2,
                CAST(n_chars AS BIGINT) AS y
              FROM documents),
            m AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x1 * x1) AS BIGINT) AS s11,
                CAST(sum(x2 * x2) AS BIGINT) AS s22,
                CAST(sum(x1 * x2) AS BIGINT) AS s12,
                CAST(sum(x1 * y) AS BIGINT) AS s1y,
                CAST(sum(x2 * y) AS BIGINT) AS s2y,
                CAST(sum(y * y) AS BIGINT) AS syy
              FROM q),
            c AS (
              SELECT *,
                CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS c11,
                CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c22,
                CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS c12,
                CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1y,
                CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2y
              FROM m),
            b AS (
              SELECT *, c11 * c22 - c12 * c12 AS det FROM c),
            f AS (
              SELECT *,
                (c22 * c1y - c12 * c2y) / det AS b1,
                (c11 * c2y - c12 * c1y) / det AS b2
              FROM b),
            f2 AS (
              SELECT *,
                (CAST(sy AS DOUBLE) - b1 * CAST(s1 AS DOUBLE) - b2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE) AS a,
                c1y / c11 AS m1, c2y / c22 AS m2
              FROM f),
            f3 AS (
              SELECT *,
                (CAST(sy AS DOUBLE) - m1 * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE) AS a1,
                (CAST(sy AS DOUBLE) - m2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE) AS a2
              FROM f2),
            r AS (
              SELECT *,
                sqrt((CAST(syy AS DOUBLE) + CAST(n AS DOUBLE) * a * a + b1 * b1 * CAST(s11 AS DOUBLE) + b2 * b2 * CAST(s22 AS DOUBLE)
                  - 2.0 * a * CAST(sy AS DOUBLE) - 2.0 * b1 * CAST(s1y AS DOUBLE) - 2.0 * b2 * CAST(s2y AS DOUBLE)
                  + 2.0 * a * b1 * CAST(s1 AS DOUBLE) + 2.0 * a * b2 * CAST(s2 AS DOUBLE) + 2.0 * b1 * b2 * CAST(s12 AS DOUBLE)) / CAST(n AS DOUBLE)) AS rmse_full,
                sqrt((CAST(syy AS DOUBLE) + CAST(n AS DOUBLE) * a1 * a1 + m1 * m1 * CAST(s11 AS DOUBLE)
                  - 2.0 * a1 * CAST(sy AS DOUBLE) - 2.0 * m1 * CAST(s1y AS DOUBLE) + 2.0 * a1 * m1 * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE)) AS rmse_only_x1,
                sqrt((CAST(syy AS DOUBLE) + CAST(n AS DOUBLE) * a2 * a2 + m2 * m2 * CAST(s22 AS DOUBLE)
                  - 2.0 * a2 * CAST(sy AS DOUBLE) - 2.0 * m2 * CAST(s2y AS DOUBLE) + 2.0 * a2 * m2 * CAST(s2 AS DOUBLE)) / CAST(n AS DOUBLE)) AS rmse_only_x2
              FROM f3)
            SELECT 'n_distinct_tokens' AS feature, round(b2, 6) AS coef_full,
              round(rmse_full, 6) AS rmse_full,
              round(rmse_only_x1, 6) AS rmse_without,
              round(rmse_only_x1 - rmse_full, 6) AS importance
            FROM r
            UNION ALL
            SELECT 'n_tokens' AS feature, round(b1, 6) AS coef_full,
              round(rmse_full, 6) AS rmse_full,
              round(rmse_only_x2, 6) AS rmse_without,
              round(rmse_only_x2 - rmse_full, 6) AS importance
            FROM r
            ORDER BY feature"""))

  /** ml10 — A/B experiment readout (Welch's unequal-variance t-test,
    * Welch 1947 — the default two-sample test of every experimentation
    * platform): events are hash-randomized into arms A/B by md5 of the
    * event id (the x01/x07 assignment discipline — reproducible,
    * uncorrelated with time or user), and per event_type the test
    * reports arm means, the Welch t statistic, the Welch–Satterthwaite
    * degrees of freedom, and the |t| > 1.96 verdict.
    *
    * Determinism: `value` is 2-decimal by contract, so per-arm moments
    * are EXACT integer cents (n, Σc, Σc²) — order-free BIGINT sums
    * (Σc² < 2⁶³ until n ≈ 9·10¹⁰ events; the DECIMAL(38,0) widening
    * path applies beyond, st16's documented move); means/variances/
    * t/df are one fixed-shape IEEE expression over those longs,
    * identical op order in both engines (a per-row double sum would
    * be partition-order-dependent — the same trap st07 documents).
    *
    * Scale shape: ONE partial-aggregable scan → a type-domain frame;
    * the null-hypothesis machinery costs nothing at any scale. */
  val abWelch: QueryDef = QueryDef(
    "ml10_ab_welch",
    (s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          expr(graft.ext.Dedup.sparkMd5Int60("CAST(event_id AS STRING)")
            + " % 2").as("arm"),
          expr("CAST(round(value * 100) AS BIGINT)").as("c"))
        .groupBy("event_type")
        .agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("sa"),
          sum(when(col("arm") === 0, expr("c * c")).otherwise(0L)).as("qa"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
          sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("sb"),
          sum(when(col("arm") === 1, expr("c * c")).otherwise(0L)).as("qb"))
        .withColumn("ma", expr(
          "CAST(sa AS DOUBLE) / (100.0 * CAST(na AS DOUBLE))"))
        .withColumn("mb", expr(
          "CAST(sb AS DOUBLE) / (100.0 * CAST(nb AS DOUBLE))"))
        .withColumn("va", expr(
          "(CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / " +
            "(CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0) * 10000.0)"))
        .withColumn("vb", expr(
          "(CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / " +
            "(CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0) * 10000.0)"))
        .withColumn("se2", expr(
          "va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE)"))
        .withColumn("t_welch", expr("(ma - mb) / sqrt(se2)"))
        .withColumn("df_welch", expr(
          "(se2 * se2) / ((va / CAST(na AS DOUBLE)) * (va / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0) + " +
            "(vb / CAST(nb AS DOUBLE)) * (vb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0))"))
        .selectExpr("event_type", "na", "nb",
          "round(ma, 6) AS mean_a", "round(mb, 6) AS mean_b",
          "round(t_welch, 6) AS t_welch", "round(df_welch, 4) AS df_welch",
          "abs(t_welch) > 1.96 AS significant")
        .orderBy("event_type")
    },
    Some(s"""WITH q AS (
               SELECT event_type,
                 ${graft.ext.Dedup.duckMd5IntSlice(
                   "CAST(event_id AS VARCHAR)", 2, 15)} % 2 AS arm,
                 CAST(round(value * 100) AS BIGINT) AS c
               FROM events),
             m AS (
               SELECT event_type,
                 CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                 CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS sa,
                 CAST(sum(CASE WHEN arm = 0 THEN c * c ELSE 0 END) AS BIGINT) AS qa,
                 CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
                 CAST(sum(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS sb,
                 CAST(sum(CASE WHEN arm = 1 THEN c * c ELSE 0 END) AS BIGINT) AS qb
               FROM q GROUP BY 1),
             w AS (
               SELECT *,
                 CAST(sa AS DOUBLE) / (100.0 * CAST(na AS DOUBLE)) AS ma,
                 CAST(sb AS DOUBLE) / (100.0 * CAST(nb AS DOUBLE)) AS mb,
                 (CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
                   - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) /
                 (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0) * 10000.0) AS va,
                 (CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
                   - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) /
                 (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0) * 10000.0) AS vb
               FROM m),
             w2 AS (
               SELECT *,
                 va / CAST(na AS DOUBLE) + vb / CAST(nb AS DOUBLE) AS se2
               FROM w),
             w3 AS (
               SELECT *, (ma - mb) / sqrt(se2) AS t_welch,
                 (se2 * se2) / ((va / CAST(na AS DOUBLE)) * (va / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0)
                   + (vb / CAST(nb AS DOUBLE)) * (vb / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0)) AS df_welch
               FROM w2)
             SELECT event_type, na, nb,
               round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
               round(t_welch, 6) AS t_welch, round(df_welch, 4) AS df_welch,
               abs(t_welch) > 1.96 AS significant
             FROM w3 ORDER BY event_type"""))

  /** ml11 — CUPED variance reduction (Deng, Xu, Kohavi & Walker,
    * "Improving the sensitivity of online controlled experiments by
    * utilizing pre-experiment data", WSDM 2013 — the standard
    * experimentation-platform adjustment): each user's PRE-period
    * activity predicts their POST-period metric, and the adjusted
    * metric Y − θ(X − X̄) removes the predictable between-user
    * variance, shrinking the A/B test's required sample size by the
    * squared pre/post correlation. Per event_type, users are split at
    * the fixture midpoint (2024-01-16): X = the user's pre-period
    * value total, Y = post-period total (absent period ⇒ 0), and the
    * readout reports θ = cov(X,Y)/var(X), the post-period mean and
    * variance, the CUPED-adjusted variance var(Y)·(1 − r²), and the
    * variance-reduction percentage 100·r².
    *
    * Determinism: `value` is 2-decimal by contract, so per-user period
    * totals are EXACT integer cents and the five cross-moments (N, ΣX,
    * ΣY, ΣXY, ΣX², ΣY²) are order-free BIGINT sums (ΣXY < 2⁶³ up to
    * ~10⁸ users at the fixture's per-user totals; DECIMAL(38,0) is the
    * documented widening path beyond, st16's move); θ/r²/variances are
    * ONE fixed-shape IEEE expression over those exact longs with every
    * product taken in DOUBLE (the g13 overflow discipline), identical
    * op order in both engines.
    *
    * Scale shape: one partial-aggregable scan to (event_type, user)
    * totals — the only shuffle, keyed on the natural grouping — then a
    * type-domain second agg; nothing driver-side. */
  val cupedReadout: QueryDef = {
    val mid = "2024-01-16 00:00:00"
    QueryDef(
      "ml11_cuped",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"), col("user_id"),
            (col("ts") < lit(mid).cast("timestamp")).as("pre"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"))
          .groupBy("event_type", "user_id")
          .agg(sum(when(col("pre"), col("c")).otherwise(0L)).as("x"),
            sum(when(!col("pre"), col("c")).otherwise(0L)).as("y"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(expr("x * y")).as("sxy"),
            sum(expr("x * x")).as("sxx"),
            sum(expr("y * y")).as("syy"))
          .withColumn("covn", expr(
            "CAST(n_users AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"))
          .withColumn("varxn", expr(
            "CAST(n_users AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"))
          .withColumn("varyn", expr(
            "CAST(n_users AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"))
          .withColumn("theta", expr("covn / varxn"))
          .withColumn("r2", expr("(covn * covn) / (varxn * varyn)"))
          .withColumn("var_post", expr(
            "varyn / (CAST(n_users AS DOUBLE) * (CAST(n_users AS DOUBLE) - 1.0) * 10000.0)"))
          // r12 sweep: the chain is bit-identical on both engines
          // (int64 casts are hardware-exact) but a final round() can
          // sit exactly on a dyadic boundary where the engines' tie
          // rules differ — emit the full-precision doubles instead.
          .selectExpr("event_type", "n_users",
            "CAST(sy AS DOUBLE) / (100.0 * CAST(n_users AS DOUBLE)) AS mean_post",
            "theta",
            "var_post",
            "var_post * (1.0 - r2) AS var_adjusted",
            "100.0 * r2 AS var_reduction_pct")
          .orderBy("event_type")
      },
      Some(s"""WITH per AS (
                 SELECT event_type, user_id,
                   CAST(sum(CASE WHEN ts < TIMESTAMP '$mid'
                     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                     AS BIGINT) AS x,
                   CAST(sum(CASE WHEN ts >= TIMESTAMP '$mid'
                     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
                     AS BIGINT) AS y
                 FROM events GROUP BY 1, 2),
               m AS (
                 SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
                 FROM per GROUP BY 1),
               w AS (
                 SELECT *,
                   CAST(n_users AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
                   CAST(n_users AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varxn,
                   CAST(n_users AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS varyn
                 FROM m),
               w2 AS (
                 SELECT *, covn / varxn AS theta,
                   (covn * covn) / (varxn * varyn) AS r2,
                   varyn / (CAST(n_users AS DOUBLE)
                     * (CAST(n_users AS DOUBLE) - 1.0) * 10000.0) AS var_post
                 FROM w)
               SELECT event_type, n_users,
                 CAST(sy AS DOUBLE) / (100.0 * CAST(n_users AS DOUBLE))
                   AS mean_post,
                 theta,
                 var_post,
                 var_post * (1.0 - r2) AS var_adjusted,
                 100.0 * r2 AS var_reduction_pct
               FROM w2 ORDER BY event_type"""))
  }

  /** ml12 — multinomial Naive Bayes language classifier (McCallum &
    * Nigam, "A comparison of event models for Naive Bayes text
    * classification", AAAI-98 workshop): train per-language unigram
    * counts with Laplace smoothing on the even-doc_id half, classify
    * the held-out odd half by argmax of log-prior + Σ log-likelihood,
    * and report the full confusion matrix with per-true-language
    * shares — the supervised counterpart of t01's heuristic lang-id
    * and t21's confusion readout.
    *
    * Determinism: every log term (prior and per-token likelihood) is
    * integerized to micro-nats (t25's discipline), so per-(doc, cand)
    * scores are exact order-free long sums; the argmax ties break on
    * candidate language ascending — fully deterministic in both
    * engines. OOV held-out tokens score the smoothing floor
    * 1/(T_lang + V), the standard multinomial treatment. (The fixture
    * corpus draws every language slice from one shared token
    * generator, so the learned likelihoods barely separate and the
    * majority-class prior dominates the matrix — the op verifies the
    * exact NB mechanics, not fixture separability; t21 reads the
    * heuristic analogue.)
    *
    * Scale shape: ONE training census (map-side combinable), then the
    * held-out token stream crossed with the BOUNDED language domain
    * (5 rows broadcast — fanout ×|langs|, not a shuffle) and one left
    * equi-join on (lang, token) to the census; the (doc, cand) score
    * agg is the only data-sized shuffle. The argmax window partitions
    * by doc_id — fully parallel. No iteration, no driver loop; at
    * 100 TB the census is vocab-sized and broadcast-joins stay
    * bounded by |langs| and |vocab|. */
  val naiveBayes: QueryDef = QueryDef(
    "ml12_naive_bayes",
    (s, d) => {
      val docs = Tables.documents(s, d)
      def toks(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
      val train = docs.filter("doc_id % 2 = 0")
      val held = docs.filter("doc_id % 2 = 1")
      val cnt = toks(train).groupBy("lang", "tok")
        .agg(count(lit(1)).as("c"))
      val cands = cnt.groupBy("lang").agg(sum(col("c")).as("t"))
        .select(col("lang").as("cand"), col("t"))
      val voc = cnt.select("tok").distinct().agg(count(lit(1)).as("v"))
      val pri = train.groupBy("lang").agg(count(lit(1)).as("nd"))
        .crossJoin(train.agg(count(lit(1)).as("ndt")))
        .select(col("lang").as("cand"), expr(
          "CAST(round(ln(CAST(nd AS DOUBLE) / CAST(ndt AS DOUBLE)) " +
            "* 1000000) AS BIGINT)").as("prior_e6"))
      val lm = cnt.select(col("lang").as("cand"), col("tok"), col("c"))
      val scored = toks(held)
        .crossJoin(broadcast(cands))
        .join(lm, Seq("cand", "tok"), "left")
        .crossJoin(broadcast(voc))
        .select(col("doc_id"), col("lang"), col("cand"), expr(
          "CAST(round(ln(CAST(coalesce(c, 0) + 1 AS DOUBLE) / " +
            "CAST(t + v AS DOUBLE)) * 1000000) AS BIGINT)").as("lp"))
        .groupBy("doc_id", "lang", "cand")
        .agg(sum(col("lp")).as("ll"))
        .join(broadcast(pri), Seq("cand"))
        .withColumn("score", col("ll") + col("prior_e6"))
      val byScore = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("cand"))
      val pred = scored.withColumn("rk", row_number().over(byScore))
        .filter(col("rk") === 1)
        .select(col("lang"), col("cand").as("pred"))
      val heldTot = held.groupBy("lang").agg(count(lit(1)).as("tot_docs"))
      pred.groupBy("lang", "pred").agg(count(lit(1)).as("n_docs"))
        .join(broadcast(heldTot), Seq("lang"))
        .selectExpr("lang", "pred", "n_docs",
          "round(CAST(n_docs AS DOUBLE) / CAST(tot_docs AS DOUBLE), 6)" +
            " AS share")
        .orderBy("lang", "pred")
    },
    Some("""WITH tr AS (
              SELECT doc_id, lang, text FROM documents
              WHERE doc_id % 2 = 0),
            he AS (
              SELECT doc_id, lang, text FROM documents
              WHERE doc_id % 2 = 1),
            cnt AS (
              SELECT lang, tok, count(*) AS c FROM (
                SELECT lang, unnest(string_split(text, ' ')) AS tok
                FROM tr)
              WHERE tok != '' GROUP BY 1, 2),
            cands AS (
              SELECT lang AS cand, CAST(sum(c) AS BIGINT) AS t
              FROM cnt GROUP BY 1),
            voc AS (SELECT count(DISTINCT tok) AS v FROM cnt),
            pri AS (
              SELECT lang AS cand,
                CAST(round(ln(CAST(count(*) AS DOUBLE) /
                  (SELECT CAST(count(*) AS DOUBLE) FROM tr)) * 1000000)
                  AS BIGINT) AS prior_e6
              FROM tr GROUP BY 1),
            het AS (
              SELECT doc_id, lang, tok FROM (
                SELECT doc_id, lang,
                  unnest(string_split(text, ' ')) AS tok
                FROM he)
              WHERE tok != ''),
            sc AS (
              SELECT h.doc_id, h.lang, cands.cand,
                CAST(sum(CAST(round(ln(CAST(coalesce(cnt.c, 0) + 1
                  AS DOUBLE) / CAST(cands.t + voc.v AS DOUBLE))
                  * 1000000) AS BIGINT)) AS BIGINT) AS ll
              FROM het h CROSS JOIN cands CROSS JOIN voc
              LEFT JOIN cnt
                ON cnt.lang = cands.cand AND cnt.tok = h.tok
              GROUP BY 1, 2, 3),
            ranked AS (
              SELECT sc.doc_id, sc.lang, sc.cand,
                row_number() OVER (PARTITION BY sc.doc_id
                  ORDER BY sc.ll + pri.prior_e6 DESC, sc.cand) AS rk
              FROM sc JOIN pri USING (cand)),
            pred AS (
              SELECT doc_id, lang, cand AS pred FROM ranked
              WHERE rk = 1),
            tot AS (
              SELECT lang, count(*) AS tot_docs FROM he GROUP BY 1)
            SELECT p.lang, p.pred, count(*) AS n_docs,
              round(CAST(count(*) AS DOUBLE)
                / CAST(any_value(t.tot_docs) AS DOUBLE), 6) AS share
            FROM pred p JOIN tot t USING (lang)
            GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** ml13 — Poisson-bootstrap confidence intervals (Chamandy et al.,
    * "Estimating uncertainty for massive data streams", Google TR 2012;
    * the one-pass bootstrap every planet-scale metrics pipeline uses
    * because true resampling needs N draws per replicate and a shared
    * RNG): each event gets B=32 independent Poisson(1) weights derived
    * from md5(event_id, replicate), each replicate's weighted mean is
    * computed in the SAME single pass, and the per-type CI is read off
    * the sorted replicate means (drop the extreme one per side →
    * a ~93.75% percentile interval at B=32).
    *
    * Determinism: weights are EXACT integers — the 60-bit md5 uniform
    * is compared against precomputed integer thresholds
    * floor(CDF_Poisson(1)(k)·2⁶⁰) (literals shared verbatim with the
    * mirror, so both engines draw identical weights); replicate
    * numerators/denominators are exact long sums of 2-decimal cents;
    * each replicate mean is ONE division; the CI rank orders on
    * (mean, rep) so even exact ties break identically.
    *
    * Scale shape: the ×32 replicate fan-out happens IN THE MAP STAGE
    * (explode before the partial agg — no extra shuffle, map-side
    * combine collapses to |types|×32 rows); everything after is
    * algebra on a bounded frame. This is the whole point of the
    * Poisson bootstrap at 100 TB: B passes become 1. */
  val poissonBootstrap: QueryDef = {
    val b = 32
    // floor(2^60 · P(Poisson(1) ≤ k)) for k = 0..7; weight caps at 8
    val thr = Seq(424136118829305344L, 848272237658610688L,
      1060340297073263360L, 1131029650211480960L, 1148701988496035328L,
      1152236456152946176L, 1152825534095764608L, 1152909688087595776L)
    def weightCase(u: String): String =
      thr.zipWithIndex.map { case (t, k) => s"WHEN $u < $t THEN $k" }
        .mkString("CASE ", " ", " ELSE 8 END")
    QueryDef(
      "ml13_poisson_bootstrap",
      (s, d) => {
        val uExpr = graft.ext.Dedup.sparkMd5Int60(
          "concat(CAST(event_id AS STRING), ':', CAST(rep AS STRING))")
        // fan-out: the x32 replicate explode + per-(event, rep) md5
        // is the whole cost of this query and ran single-task on the
        // one-row-group fixture scan (r15, guide §2.5)
        val reps = Tables.fanOutForCpu(
            Tables.events(s, d)
              .select(col("event_type"), col("value"), col("event_id")),
            col("event_id"))
          .select(col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"),
            col("event_id"),
            explode(expr(s"sequence(0, ${b - 1})")).as("rep"))
          .select(col("event_type"), col("rep"), col("c"),
            expr(weightCase(s"($uExpr)")).as("w"))
          .groupBy("event_type", "rep")
          .agg(sum(col("w")).as("nw"),
            sum(expr("w * c")).as("sw"))
          .withColumn("rep_mean", expr(
            "CAST(sw AS DOUBLE) / (100.0 * CAST(nw AS DOUBLE))"))
        val byMean = Window.partitionBy("event_type")
          .orderBy(col("rep_mean"), col("rep"))
        val exact = Tables.events(s, d)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(expr("CAST(round(value * 100) AS BIGINT)")).as("sc"))
        reps.withColumn("rk", row_number().over(byMean))
          .filter(col("rk") === 2 || col("rk") === (b - 1))
          .groupBy("event_type")
          .agg(min(col("rep_mean")).as("lo"), max(col("rep_mean")).as("hi"))
          .join(broadcast(exact), Seq("event_type"))
          .selectExpr("event_type", "n_events",
            "round(CAST(sc AS DOUBLE) / (100.0 * CAST(n_events AS DOUBLE)), 6) AS mean",
            "round(lo, 6) AS ci_lo", "round(hi, 6) AS ci_hi",
            "round(hi - lo, 6) AS ci_width")
          .orderBy("event_type")
      },
      Some {
        val uSql = graft.ext.Dedup.duckMd5IntSlice(
          "concat(CAST(event_id AS VARCHAR), ':', CAST(rep AS VARCHAR))",
          2, 15)
        s"""WITH reps AS (
              SELECT event_type, rep,
                CAST(sum(w) AS BIGINT) AS nw,
                CAST(sum(w * c) AS BIGINT) AS sw
              FROM (
                SELECT event_type, rep,
                  CAST(round(value * 100) AS BIGINT) AS c,
                  ${weightCase(s"($uSql)")} AS w
                FROM events, unnest(range(0, $b)) AS r(rep))
              GROUP BY 1, 2),
            means AS (
              SELECT event_type, rep,
                CAST(sw AS DOUBLE) / (100.0 * CAST(nw AS DOUBLE))
                  AS rep_mean
              FROM reps),
            ranked AS (
              SELECT *, row_number() OVER (PARTITION BY event_type
                ORDER BY rep_mean, rep) AS rk
              FROM means),
            ci AS (
              SELECT event_type, min(rep_mean) AS lo, max(rep_mean) AS hi
              FROM ranked WHERE rk = 2 OR rk = ${b - 1}
              GROUP BY 1),
            exact AS (
              SELECT event_type, count(*) AS n_events,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS sc
              FROM events GROUP BY 1)
            SELECT event_type, n_events,
              round(CAST(sc AS DOUBLE)
                / (100.0 * CAST(n_events AS DOUBLE)), 6) AS mean,
              round(lo, 6) AS ci_lo, round(hi, 6) AS ci_hi,
              round(hi - lo, 6) AS ci_width
            FROM ci JOIN exact USING (event_type)
            ORDER BY event_type"""
      })
  }

  /** ml14 — weight-of-evidence / information-value feature audit
    * (Siddiqi, "Credit Risk Scorecards", Wiley 2006 §6 — the
    * scorecard-industry standard for ranking features before any model
    * is fit): `value` is cut into 10 fixed-width bins, each bin's
    * WoE = ln(smoothed positive share / smoothed negative share)
    * measures how strongly the bin separates error events from the
    * rest, and IV = Σ (p⁺−p⁻)·WoE summarizes the whole feature
    * (< 0.02 useless, > 0.3 strong — the thresholds every scorecard
    * shop quotes).
    *
    * Determinism: bin populations are exact integers; WoE and each IV
    * term are ONE fixed-shape IEEE expression over those integers with
    * the standard +0.5 Laplace continuity correction, integerized at
    * 10⁶/10⁹ before any cross-row arithmetic; the IV total is an exact
    * long sum over the 10-row bin frame.
    *
    * Scale shape: ONE partial-aggregable scan to the 10-row bin frame;
    * everything after is algebra on it (global window bounded by the
    * bin count). Fixed-width bins — not ntile — so no global sort ever
    * touches the data (the x15 quantile-edge alternative is the
    * data-driven binning path and is documented there). */
  val woeIv: QueryDef = QueryDef(
    "ml14_woe_iv",
    (s, d) => {
      val bins = Tables.events(s, d)
        .selectExpr(
          "least(CAST(round(value * 100) AS BIGINT) DIV 5000, 9) AS bin",
          "IF(event_type = 'error', 1L, 0L) AS pos")
        .groupBy("bin")
        .agg(sum(col("pos")).as("n_pos"),
          sum(expr("1L - pos")).as("n_neg"))
      val whole = Window.partitionBy(lit(1))
      bins
        .withColumn("p_tot", sum(col("n_pos")).over(whole))
        .withColumn("n_tot", sum(col("n_neg")).over(whole))
        .withColumn("woe_e6", expr(
          "CAST(round(ln(((CAST(n_pos AS DOUBLE) + 0.5) / CAST(p_tot AS DOUBLE)) / " +
            "((CAST(n_neg AS DOUBLE) + 0.5) / CAST(n_tot AS DOUBLE))) * 1000000) AS BIGINT)"))
        .withColumn("iv_term_e9", expr(
          "CAST(round((((CAST(n_pos AS DOUBLE) + 0.5) / CAST(p_tot AS DOUBLE)) - " +
            "((CAST(n_neg AS DOUBLE) + 0.5) / CAST(n_tot AS DOUBLE))) * " +
            "(CAST(woe_e6 AS DOUBLE) / 1e6) * 1000000000) AS BIGINT)"))
        .withColumn("iv_total_e9", sum(col("iv_term_e9")).over(whole))
        .select("bin", "n_pos", "n_neg", "woe_e6", "iv_term_e9",
          "iv_total_e9")
        .orderBy("bin")
    },
    Some("""WITH b AS (
              SELECT least(CAST(round(value * 100) AS BIGINT) // 5000, 9)
                  AS bin,
                CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS pos
              FROM events),
            bins AS (
              SELECT bin, CAST(sum(pos) AS BIGINT) AS n_pos,
                CAST(sum(1 - pos) AS BIGINT) AS n_neg
              FROM b GROUP BY 1),
            t AS (
              SELECT *, CAST(sum(n_pos) OVER () AS BIGINT) AS p_tot,
                CAST(sum(n_neg) OVER () AS BIGINT) AS n_tot
              FROM bins),
            w AS (
              SELECT *,
                CAST(round(ln(((CAST(n_pos AS DOUBLE) + 0.5)
                    / CAST(p_tot AS DOUBLE))
                  / ((CAST(n_neg AS DOUBLE) + 0.5)
                    / CAST(n_tot AS DOUBLE))) * 1000000) AS BIGINT)
                  AS woe_e6
              FROM t),
            iv AS (
              SELECT *,
                CAST(round((((CAST(n_pos AS DOUBLE) + 0.5)
                    / CAST(p_tot AS DOUBLE))
                  - ((CAST(n_neg AS DOUBLE) + 0.5)
                    / CAST(n_tot AS DOUBLE)))
                  * (CAST(woe_e6 AS DOUBLE) / 1e6) * 1000000000)
                  AS BIGINT) AS iv_term_e9
              FROM w)
            SELECT bin, n_pos, n_neg, woe_e6, iv_term_e9,
              CAST(sum(iv_term_e9) OVER () AS BIGINT) AS iv_total_e9
            FROM iv ORDER BY bin"""))

  /** ml15 — exact two-sample Kolmogorov–Smirnov test (Smirnov 1939;
    * the distribution-shift detector behind every data-drift monitor):
    * D = sup|F_error − F_other| between the error-event value
    * distribution and everything else, with the large-sample α=0.05
    * critical value c(α)·√((n₁+n₂)/(n₁n₂)), c(0.05)=1.358
    * (Massey 1951, Table 1). Complements x39's binned PSI with the
    * binning-free sup-norm statistic.
    *
    * Determinism: values are 2-decimal by contract, so the ECDF sup is
    * reached on the DISTINCT-cent domain and the numerator
    * |ca·n_b − cb·n_a| is an EXACT long (no ECDF division until the
    * final readout); the long bound ca·n_b < 2⁶³ holds to ~3·10⁹
    * events per side (the st16/x36 DECIMAL(38,0) widening path
    * beyond). The cumulative window runs over the bounded
    * distinct-value frame (x15/ml06's value-domain idiom), never the
    * events.
    *
    * Scale shape: ONE partial-aggregable scan → the ≤49 002-row cent
    * frame; cumulative sums + the max are frame-local algebra. */
  val ksTest: QueryDef = QueryDef(
    "ml15_ks_test",
    (s, d) => {
      val byC = Tables.events(s, d)
        .selectExpr("CAST(round(value * 100) AS BIGINT) AS c",
          "IF(event_type = 'error', 1L, 0L) AS isa")
        .groupBy("c")
        .agg(sum(col("isa")).as("a_n"), sum(expr("1L - isa")).as("b_n"))
      val byVal = Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(lit(1))
      byC
        .withColumn("ca", sum(col("a_n")).over(byVal))
        .withColumn("cb", sum(col("b_n")).over(byVal))
        .withColumn("na", sum(col("a_n")).over(whole))
        .withColumn("nb", sum(col("b_n")).over(whole))
        .withColumn("dnum", expr("abs(ca * nb - cb * na)"))
        .groupBy("na", "nb")
        .agg(max(col("dnum")).as("d_num"),
          count(lit(1)).as("n_distinct_values"))
        .selectExpr("na", "nb", "n_distinct_values", "d_num",
          "round(CAST(d_num AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 9) AS d",
          "round(1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) / " +
            "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 9) AS d_crit",
          "CAST(d_num AS DOUBLE) > 1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) / " +
            "(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) * " +
            "CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) AS reject_h0")
    },
    Some("""WITH byc AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS c,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a_n,
                CAST(sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)
                  AS BIGINT) AS b_n
              FROM events GROUP BY 1),
            cum AS (
              SELECT
                CAST(sum(a_n) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS ca,
                CAST(sum(b_n) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cb,
                CAST(sum(a_n) OVER () AS BIGINT) AS na,
                CAST(sum(b_n) OVER () AS BIGINT) AS nb
              FROM byc)
            SELECT na, nb, count(*) AS n_distinct_values,
              CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS d_num,
              round(CAST(max(abs(ca * nb - cb * na)) AS DOUBLE)
                / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 9) AS d,
              round(1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 9) AS d_crit,
              CAST(max(abs(ca * nb - cb * na)) AS DOUBLE)
                > 1.358 * sqrt((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE))
                  / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
                * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) AS reject_h0
            FROM cum GROUP BY na, nb"""))

  /** ml16 — TOST equivalence readout (Schuirmann 1987, the two
    * one-sided tests every experimentation platform runs to declare a
    * null RESULT rather than a null verdict: "the arms differ by less
    * than δ" is a positive claim |t₁| and |t₂| can certify, where
    * ml10's |t| > 1.96 can only fail to reject): same md5-randomized
    * arms and exact integer-cent moments as ml10, equivalence margin
    * δ = 0.5 value units, verdict = (mA−mB+δ)/se > 1.645 AND
    * (mA−mB−δ)/se < −1.645 at α = 0.05.
    *
    * Determinism: identical moment discipline to ml10 — exact long
    * (n, Σc, Σc²) per arm, one fixed-shape IEEE expression for the
    * two t statistics, integer-exact verdict comparisons in both
    * engines.
    *
    * Scale shape: ONE partial-aggregable scan to the type-domain
    * frame; the TOST algebra costs nothing at any scale. */
  val tostEquivalence: QueryDef = {
    val deltaCents = 50L // δ = 0.5 value units
    QueryDef(
      "ml16_tost_equivalence",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"),
            expr(graft.ext.Dedup.sparkMd5Int60("CAST(event_id AS STRING)")
              + " % 2").as("arm"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"))
          .groupBy("event_type")
          .agg(
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("na"),
            sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("sa"),
            sum(when(col("arm") === 0, expr("c * c")).otherwise(0L)).as("qa"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nb"),
            sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("sb"),
            sum(when(col("arm") === 1, expr("c * c")).otherwise(0L)).as("qb"))
          .withColumn("diff", expr(
            "CAST(sa AS DOUBLE) / (100.0 * CAST(na AS DOUBLE)) - " +
              "CAST(sb AS DOUBLE) / (100.0 * CAST(nb AS DOUBLE))"))
          .withColumn("se", expr(
            "sqrt((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) / " +
              "(CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0) * 10000.0) / CAST(na AS DOUBLE) + " +
              "(CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) / " +
              "(CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0) * 10000.0) / CAST(nb AS DOUBLE))"))
          .withColumn("t_lower", expr(
            s"(diff + ${deltaCents}.0 / 100.0) / se"))
          .withColumn("t_upper", expr(
            s"(diff - ${deltaCents}.0 / 100.0) / se"))
          .selectExpr("event_type", "na", "nb",
            "round(diff, 6) AS mean_diff",
            "round(se, 6) AS se",
            "round(t_lower, 6) AS t_lower",
            "round(t_upper, 6) AS t_upper",
            "t_lower > 1.645 AND t_upper < -1.645 AS equivalent")
          .orderBy("event_type")
      },
      Some(s"""WITH q AS (
                 SELECT event_type,
                   ${graft.ext.Dedup.duckMd5IntSlice(
                     "CAST(event_id AS VARCHAR)", 2, 15)} % 2 AS arm,
                   CAST(round(value * 100) AS BIGINT) AS c
                 FROM events),
               m AS (
                 SELECT event_type,
                   CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                   CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT) AS sa,
                   CAST(sum(CASE WHEN arm = 0 THEN c * c ELSE 0 END) AS BIGINT) AS qa,
                   CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
                   CAST(sum(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT) AS sb,
                   CAST(sum(CASE WHEN arm = 1 THEN c * c ELSE 0 END) AS BIGINT) AS qb
                 FROM q GROUP BY 1),
               w AS (
                 SELECT *,
                   CAST(sa AS DOUBLE) / (100.0 * CAST(na AS DOUBLE))
                     - CAST(sb AS DOUBLE) / (100.0 * CAST(nb AS DOUBLE))
                     AS diff,
                   sqrt((CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
                       - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                     / (CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) - 1.0)
                       * 10000.0) / CAST(na AS DOUBLE)
                     + (CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
                     / (CAST(nb AS DOUBLE) * (CAST(nb AS DOUBLE) - 1.0)
                       * 10000.0) / CAST(nb AS DOUBLE)) AS se
                 FROM m),
               t AS (
                 SELECT *,
                   (diff + ${deltaCents}.0 / 100.0) / se AS t_lower,
                   (diff - ${deltaCents}.0 / 100.0) / se AS t_upper
                 FROM w)
               SELECT event_type, na, nb,
                 round(diff, 6) AS mean_diff, round(se, 6) AS se,
                 round(t_lower, 6) AS t_lower,
                 round(t_upper, 6) AS t_upper,
                 t_lower > 1.645 AND t_upper < -1.645 AS equivalent
               FROM t ORDER BY event_type"""))
  }

  /** ml17 — ridge regularization path, CLOSED FORM from the same exact
    * BIGINT sufficient statistics as ml01b (one aggregate over orders;
    * the regulated twin of its OLS row). For the centered 1-feature
    * model min Σ(y − a − bx)² + λb²:
    *
    *   b(λ) = Sxy_c / (Sxx_c + λ) = (n·sxy − sx·sy) / (n·sxx − sx² + n²λ)
    *   a(λ) = (sy − b·sx) / n,   shrinkage = Sxx_c / (Sxx_c + λ)
    *
    * (both numerator and denominator stay EXACT integers after scaling
    * by n — the derivation multiplies through by n², so λ enters as
    * n²λ). The λ grid rides a 4-row literal frame crossJoined onto the
    * 1-row statistics (e05's idiom); every per-λ value is the same
    * IEEE division on both engines → hash-exact, no rounding. λ = 0
    * reproduces ml01b's slope exactly — asserted in the spec.
    *
    * Scale shape: the corpus-sized work is ONE partial-aggregable
    * scan; the path evaluation is 4 rows of arithmetic. This is the
    * 100 TB pattern for hyperparameter paths over linear models:
    * sufficient statistics once, the entire path closed-form. */
  val ridgePath: QueryDef = {
    val lambdas = Seq(0L, 10L, 100L, 1000L)
    QueryDef(
      "ml17_ridge_path",
      (s, d) => {
        val stats = Tables.orders(s, d)
          .select(
            month(col("o_orderdate")).cast("long").as("x"),
            expr("CAST(floor(o_totalprice / 100e0) AS BIGINT)").as("y"))
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
            sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
        val grid = lambdas.map(l => s"CAST($l AS BIGINT)").mkString(",")
        stats.crossJoin(
          stats.sparkSession.sql(
            s"SELECT explode(array($grid)) AS lambda"))
          .withColumn("slope", expr(
            """CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx + n * n * lambda AS DOUBLE)"""))
          .withColumn("intercept", expr(
            "(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"))
          .withColumn("shrinkage", expr(
            """CAST(n * sxx - sx * sx AS DOUBLE)
               / CAST(n * sxx - sx * sx + n * n * lambda AS DOUBLE)"""))
          .select("lambda", "n", "slope", "intercept", "shrinkage")
          .orderBy("lambda")
      },
      Some(s"""WITH q AS (
                 SELECT CAST(month(o_orderdate) AS BIGINT) AS x,
                        CAST(floor(o_totalprice / 100e0) AS BIGINT) AS y
                 FROM orders),
               s AS (
                 SELECT CAST(count(*) AS BIGINT) AS n,
                        CAST(sum(x) AS BIGINT) AS sx,
                        CAST(sum(y) AS BIGINT) AS sy,
                        CAST(sum(x * y) AS BIGINT) AS sxy,
                        CAST(sum(x * x) AS BIGINT) AS sxx
                 FROM q),
               g AS (SELECT unnest([${lambdas.mkString(", ")}]) AS lambda),
               p AS (
                 SELECT CAST(g.lambda AS BIGINT) AS lambda, s.*,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx + n * n * g.lambda AS DOUBLE)
                     AS slope,
                   CAST(n * sxx - sx * sx AS DOUBLE)
                     / CAST(n * sxx - sx * sx + n * n * g.lambda AS DOUBLE)
                     AS shrinkage
                 FROM s, g)
               SELECT lambda, n, slope,
                 (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS intercept,
                 shrinkage
               FROM p ORDER BY lambda"""))
  }

  /** ml18 — 2-feature PCA, CLOSED FORM: eigendecomposition of the 2×2
    * scatter matrix [[A,B],[B,C]] built from the same one-pass exact
    * BIGINT sufficient statistics as ml01b/ml17 (A = n·Σx²−(Σx)²,
    * B = n·Σxy−ΣxΣy, C = n·Σy²−(Σy)², each cast to DOUBLE before
    * combination so no scale overflows):
    *
    *   λ₁,₂ = (A+C)/2 ± sqrt(((A−C)/2)² + B²)
    *
    * Emitted: λ₁'s explained-variance share, the PC1 axis slope
    * (λ₁−A)/B (the eigenvector identity — asserted in the spec), and
    * Pearson r = B/√(AC). Every output is the identical IEEE chain on
    * both engines → hash-exact unrounded. Deliberately NOT emitted:
    * the principal angle via atan2 (not cross-engine
    * exactness-guaranteed; the slope is).
    *
    * Scale shape: one partial-aggregable scan; the eigen algebra is a
    * single row. The d-dimensional version of this pattern ships the
    * d² scatter entries from the same one-pass aggregate to a driver-
    * side eigensolver — sufficient statistics once, never iterate over
    * data. */
  val pca2d: QueryDef = QueryDef(
    "ml18_pca_2d",
    (s, d) => Tables.orders(s, d)
      .select(
        month(col("o_orderdate")).cast("long").as("x"),
        expr("CAST(floor(o_totalprice / 100e0) AS BIGINT)").as("y"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"),
        sum(expr("y * y")).as("syy"))
      .withColumn("a", expr(
        "CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)"))
      .withColumn("b", expr(
        "CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"))
      .withColumn("c", expr(
        "CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)"))
      .withColumn("disc", expr(
        "sqrt(((a - c) / 2) * ((a - c) / 2) + b * b)"))
      .withColumn("lam1", expr("(a + c) / 2 + disc"))
      .select(
        col("n"),
        expr("lam1 / (a + c)").as("lam1_share"),
        expr("(lam1 - a) / b").as("pc1_slope"),
        expr("b / sqrt(a * c)").as("corr_xy")),
    Some("""WITH q AS (
              SELECT CAST(month(o_orderdate) AS BIGINT) AS x,
                     CAST(floor(o_totalprice / 100e0) AS BIGINT) AS y
              FROM orders),
            s AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(y * y) AS BIGINT) AS syy
              FROM q),
            m AS (
              SELECT n,
                CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS a,
                CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS b,
                CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS c
              FROM s),
            e AS (
              SELECT *,
                (a + c) / 2 + sqrt(((a - c) / 2) * ((a - c) / 2) + b * b)
                  AS lam1
              FROM m)
            SELECT n, lam1 / (a + c) AS lam1_share,
              (lam1 - a) / b AS pc1_slope,
              b / sqrt(a * c) AS corr_xy
            FROM e"""))

  /** ml19 — exact two-sample Mann–Whitney U test (Mann & Whitney, Ann.
    * Math. Statist. 18(1), 1947; the rank-sum complement of ml15's KS:
    * KS detects ANY distribution difference, U specifically tests
    * stochastic dominance P(X>Y) ≠ ½ — and unlike ml10's Welch t it
    * needs no normality). Error-event values vs the rest.
    *
    * Determinism: values are 2-decimal by contract, so ranks live on
    * the bounded distinct-cent frame (ml15's idiom); DOUBLED rank sums
    * keep midrank ties integral — per cent value v with a_n error /
    * b_n other observations and C observations below it, the error
    * rows contribute a_n·(2C + (a_n+b_n) + 1) to 2R₁ exactly. The tie
    * correction Σ(t³−t) is an exact long sum (t³ < 2⁶³ to ~2·10⁶ ties
    * per cent; the t24 DECIMAL(38,0) widening path beyond). z is ONE
    * fixed-shape IEEE expression over those exact integers, emitted at
    * 9 dp; the normal-approximation verdict compares the same doubles
    * in both engines.
    *
    * Scale shape: ONE partial-aggregable scan → the ≤49 002-row cent
    * frame; cumulative/total windows are frame-local (whitelisted,
    * value-domain bounded). */
  val mannWhitney: QueryDef = QueryDef(
    "ml19_mann_whitney",
    (s, d) => {
      val byC = Tables.events(s, d)
        .selectExpr("CAST(round(value * 100) AS BIGINT) AS c",
          "IF(event_type = 'error', 1L, 0L) AS isa")
        .groupBy("c")
        .agg(sum(col("isa")).as("a_n"), sum(expr("1L - isa")).as("b_n"))
      val byVal = Window.orderBy("c")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = Window.partitionBy(lit(1))
      byC
        .withColumn("ca", sum(col("a_n")).over(byVal))
        .withColumn("cb", sum(col("b_n")).over(byVal))
        .withColumn("na", sum(col("a_n")).over(whole))
        .withColumn("nb", sum(col("b_n")).over(whole))
        .withColumn("r1_term",
          expr("a_n * (2 * (ca + cb - a_n - b_n) + (a_n + b_n) + 1)"))
        .withColumn("tie_term",
          expr("(a_n + b_n) * (a_n + b_n) * (a_n + b_n) - (a_n + b_n)"))
        .groupBy("na", "nb")
        .agg(sum(col("r1_term")).as("r1_x2"),
          sum(col("tie_term")).as("tie_sum"),
          count(lit(1)).as("n_distinct_values"))
        .withColumn("u1_x2", expr("r1_x2 - na * (na + 1)"))
        .withColumn("z", expr(
          "round((CAST(u1_x2 AS DOUBLE) / 2.0 - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0) / " +
            "sqrt((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0) * " +
            "((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0) - " +
            "CAST(tie_sum AS DOUBLE) / ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) * " +
            "(CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) - 1.0)))), 9)"))
        .withColumn("reject_h0", expr("abs(z) > 1.96"))
        .select("na", "nb", "n_distinct_values", "r1_x2", "u1_x2",
          "tie_sum", "z", "reject_h0")
    },
    Some("""WITH byc AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS c,
                CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a_n,
                CAST(sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END)
                  AS BIGINT) AS b_n
              FROM events GROUP BY 1),
            cum AS (
              SELECT a_n, b_n,
                CAST(sum(a_n) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS ca,
                CAST(sum(b_n) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cb,
                CAST(sum(a_n) OVER () AS BIGINT) AS na,
                CAST(sum(b_n) OVER () AS BIGINT) AS nb
              FROM byc),
            agg AS (
              SELECT na, nb,
                CAST(sum(a_n * (2 * (ca + cb - a_n - b_n) + (a_n + b_n) + 1))
                  AS BIGINT) AS r1_x2,
                CAST(sum((a_n + b_n) * (a_n + b_n) * (a_n + b_n)
                  - (a_n + b_n)) AS BIGINT) AS tie_sum,
                count(*) AS n_distinct_values
              FROM cum GROUP BY na, nb),
            u AS (
              SELECT *, r1_x2 - na * (na + 1) AS u1_x2 FROM agg),
            z AS (
              SELECT *,
                round((CAST(u1_x2 AS DOUBLE) / 2.0 - CAST(na AS DOUBLE)
                    * CAST(nb AS DOUBLE) / 2.0)
                  / sqrt((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0)
                    * ((CAST(na AS DOUBLE) + CAST(nb AS DOUBLE) + 1.0)
                      - CAST(tie_sum AS DOUBLE) / ((CAST(na AS DOUBLE)
                        + CAST(nb AS DOUBLE)) * (CAST(na AS DOUBLE)
                        + CAST(nb AS DOUBLE) - 1.0)))), 9) AS z
              FROM u)
            SELECT na, nb, n_distinct_values, r1_x2, u1_x2, tie_sum, z,
              abs(z) > 1.96 AS reject_h0
            FROM z"""))

  /** ml20 — χ² test of independence on the event_type × value-band
    * contingency table (Pearson 1900; the categorical complement of
    * ml15/ml19: is the value DISTRIBUTION independent of the event
    * type?). Bands are ml14's fixed-width 50-unit bins; the cell
    * domain is the OBSERVED types × OBSERVED bands cross (so every
    * marginal is positive and no expected count is zero), with
    * unobserved interior cells kept at O = 0 — dropping them would
    * bias χ² low, the s13/d20 domain-frame lesson again.
    *
    * Determinism: cell counts and marginals are exact BIGINTs; each
    * cell's (O−E)²/E is ONE fixed-shape IEEE expression integerized to
    * 10⁻⁶ on the bounded cell frame, χ² is an exact long sum; the
    * α = 0.05 critical value is the Wilson–Hilferty cube approximation
    * (Wilson & Hilferty, PNAS 17, 1931: χ²_df ≈ df·(1 − 2/9df +
    * z·√(2/9df))³) — a closed form both engines evaluate identically,
    * instead of a quantile table lookup.
    *
    * Scale shape: ONE partial-aggregable scan → the ≤(types·bands)
    * cell frame; the domain cross is a bounded broadcast; marginal and
    * total windows are frame-local. */
  val chiSquare: QueryDef = {
    val eE = "(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))"
    val termE =
      s"CAST(round((CAST(o AS DOUBLE) - $eE) * (CAST(o AS DOUBLE) - $eE) / $eE * 1000000) AS BIGINT)"
    val critE =
      "CAST(dof AS DOUBLE) * power(1.0 - 2.0 / (9.0 * CAST(dof AS DOUBLE)) + " +
        "1.645 * sqrt(2.0 / (9.0 * CAST(dof AS DOUBLE))), 3.0)"
    QueryDef(
      "ml20_chi_square",
      (s, d) => {
        val cells = Tables.events(s, d)
          .selectExpr("event_type",
            "least(CAST(round(value * 100) AS BIGINT) DIV 5000, 9) AS band")
          .groupBy("event_type", "band").agg(count(lit(1)).as("o"))
        val domain = cells.select("event_type").distinct()
          .crossJoin(broadcast(cells.select("band").distinct()))
        val byRow = Window.partitionBy("event_type")
        val byCol = Window.partitionBy("band")
        val whole = Window.partitionBy(lit(1))
        domain.join(cells, Seq("event_type", "band"), "left")
          .na.fill(0L, Seq("o"))
          .withColumn("rt", sum(col("o")).over(byRow))
          .withColumn("ct", sum(col("o")).over(byCol))
          .withColumn("n", sum(col("o")).over(whole))
          .withColumn("term_e6", expr(termE))
          .withColumn("chi2_e6", sum(col("term_e6")).over(whole))
          .withColumn("dof", expr(
            "(count(1) OVER (PARTITION BY band) - 1) * " +
              "(count(1) OVER (PARTITION BY event_type) - 1)"))
          .withColumn("crit", expr(s"round($critE, 6)"))
          .withColumn("reject_h0",
            expr(s"CAST(chi2_e6 AS DOUBLE) / 1000000.0 > $critE"))
          .select("event_type", "band", "o", "rt", "ct", "term_e6",
            "chi2_e6", "dof", "crit", "reject_h0")
          .orderBy("event_type", "band")
      },
      Some(s"""WITH cells AS (
                 SELECT event_type,
                   least(CAST(round(value * 100) AS BIGINT) // 5000, 9)
                     AS band,
                   CAST(count(*) AS BIGINT) AS o
                 FROM events GROUP BY 1, 2),
               dom AS (
                 SELECT t.event_type, b.band
                 FROM (SELECT DISTINCT event_type FROM cells) t
                 CROSS JOIN (SELECT DISTINCT band FROM cells) b),
               full_cells AS (
                 SELECT dom.event_type, dom.band, coalesce(c.o, 0) AS o
                 FROM dom LEFT JOIN cells c
                   ON c.event_type = dom.event_type AND c.band = dom.band),
               m AS (
                 SELECT event_type, band, o,
                   CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT)
                     AS rt,
                   CAST(sum(o) OVER (PARTITION BY band) AS BIGINT) AS ct,
                   CAST(sum(o) OVER () AS BIGINT) AS n,
                   (count(*) OVER (PARTITION BY band) - 1) *
                     (count(*) OVER (PARTITION BY event_type) - 1) AS dof
                 FROM full_cells),
               t AS (SELECT *, $termE AS term_e6 FROM m),
               z AS (
                 SELECT *,
                   CAST(sum(term_e6) OVER () AS BIGINT) AS chi2_e6
                 FROM t)
               SELECT event_type, band, o, rt, ct, term_e6, chi2_e6, dof,
                 round($critE, 6) AS crit,
                 CAST(chi2_e6 AS DOUBLE) / 1000000.0 > $critE AS reject_h0
               FROM z ORDER BY event_type, band"""))
  }

  /** ml21 — one Newton–Raphson step of logistic regression from w = 0,
    * closed form (the IRLS step — McCullagh & Nelder, Generalized
    * Linear Models, 1989 §4.4 — evaluated at the zero vector, where
    * p = ½ and the Hessian is ¼·XᵀX, so the step is 4·(XᵀX)⁻¹Xᵀ(y−½):
    * an EXACTLY computable function of five BIGINT moments, the
    * logistic member of the ml01b/ml17/ml18 ship-the-moments family —
    * at 100 TB each further IRLS iteration is one more moments pass,
    * this op is the first of them). Feature: value cents; label:
    * error events. Readout: the step coefficients and the training
    * accuracy of the resulting linear classifier, with the
    * majority-class baseline.
    *
    * Determinism: moments are exact BIGINTs; the numerators
    * A = Σxx·g₀ − Σx·g₁, B = n·g₁ − Σx·g₀ (g = doubled gradient,
    * integral) and det = n·Σxx − Σx² are exact 128-bit integers
    * (DECIMAL(38,0) on Spark, HUGEINT in DuckDB — products reach
    * ~10²¹ at sf1.0, past the long range); the per-row prediction
    * b₀+b₁x > 0 is the EXACT integer comparison A + B·x > 0 (det > 0),
    * so accuracy can never flip on float noise; the coefficients are
    * emitted as exact 10⁻⁹ fixed-point integers b_e9 = (2·num·10⁹)
    * DIV det (sign split so Spark's truncating DIV and DuckDB's
    * flooring // agree on negatives — the x51 recipe), with the
    * human-readable float derived from that SAME integer on both
    * engines (one fixed-shape IEEE division of a < 2⁵³ integer —
    * bit-identical). r11 post-mortem: round(2·CAST(num AS DOUBLE)/
    * CAST(det AS DOUBLE), 9) failed the sf0.01 hash because Spark's
    * decimal→double and DuckDB's hugeint→double can differ by 1 ulp
    * on >2⁵³ values and the quotient sat on a round-at-9dp boundary
    * (the q02 class). No 128-bit value may ever cross to DOUBLE
    * before comparison or emission.
    *
    * Scale shape: one partial-aggregable moments scan, then one
    * scoring scan under a 1-row coefficient broadcast — no iterative
    * driver loop, no per-row state. */
  val logitNewton: QueryDef = QueryDef(
    "ml21_logit_newton",
    (s, d) => {
      val m = Tables.events(s, d).selectExpr(
        "CAST(round(value * 100) AS BIGINT) AS x",
        "IF(event_type = 'error', 1L, 0L) AS y")
      val coef = m.agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("x * x")).as("sxx"), sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"))
        .selectExpr("n", "sy",
          "CAST(sxx AS DECIMAL(38,0)) * CAST(2 * sy - n AS DECIMAL(38,0)) - " +
            "CAST(sx AS DECIMAL(38,0)) * CAST(2 * sxy - sx AS DECIMAL(38,0)) AS a_num",
          "CAST(n AS DECIMAL(38,0)) * CAST(2 * sxy - sx AS DECIMAL(38,0)) - " +
            "CAST(sx AS DECIMAL(38,0)) * CAST(2 * sy - n AS DECIMAL(38,0)) AS b_num",
          "CAST(n AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0)) - " +
            "CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)) AS det")
      m.crossJoin(broadcast(coef))
        .selectExpr("n", "sy", "a_num", "b_num", "det",
          "IF((a_num + b_num * CAST(x AS DECIMAL(38,0))) > 0, 1L, 0L) AS pred",
          "y")
        .groupBy("n", "sy")
        .agg(
          expr("CAST(CASE WHEN max(a_num) >= 0 " +
            "THEN (2 * max(a_num) * 1000000000) DIV max(det) " +
            "ELSE -((2 * (-max(a_num)) * 1000000000) DIV max(det)) END " +
            "AS BIGINT)").as("b0_e9"),
          expr("CAST(CASE WHEN max(b_num) >= 0 " +
            "THEN (2 * max(b_num) * 1000000000) DIV max(det) " +
            "ELSE -((2 * (-max(b_num)) * 1000000000) DIV max(det)) END " +
            "AS BIGINT)").as("b1_e9"),
          sum(expr("IF(pred = y, 1L, 0L)")).as("n_correct"))
        .withColumn("b0", expr("CAST(b0_e9 AS DOUBLE) / 1000000000.0"))
        .withColumn("b1", expr("CAST(b1_e9 AS DOUBLE) / 1000000000.0"))
        .withColumn("acc_ppm", expr("(1000000 * n_correct) DIV n"))
        .withColumn("base_correct", expr("greatest(sy, n - sy)"))
        .withColumn("base_ppm", expr("(1000000 * base_correct) DIV n"))
        .select(col("n"), col("sy").as("n_pos"), col("b0_e9"),
          col("b1_e9"), col("b0"), col("b1"),
          col("n_correct"), col("acc_ppm"), col("base_correct"),
          col("base_ppm"))
    },
    Some("""WITH m AS (
              SELECT CAST(round(value * 100) AS BIGINT) AS x,
                CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
              FROM events),
            mom AS (
              SELECT CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(x * x) AS BIGINT) AS sxx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy
              FROM m),
            c AS (
              SELECT n, sy,
                CAST(sxx AS HUGEINT) * CAST(2 * sy - n AS HUGEINT) -
                  CAST(sx AS HUGEINT) * CAST(2 * sxy - sx AS HUGEINT)
                  AS a_num,
                CAST(n AS HUGEINT) * CAST(2 * sxy - sx AS HUGEINT) -
                  CAST(sx AS HUGEINT) * CAST(2 * sy - n AS HUGEINT)
                  AS b_num,
                CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT) -
                  CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS det
              FROM mom),
            p AS (
              SELECT c.n, c.sy, c.a_num, c.b_num, c.det, m.y,
                CASE WHEN (c.a_num + c.b_num * CAST(m.x AS HUGEINT)) > 0
                  THEN 1 ELSE 0 END AS pred
              FROM m CROSS JOIN c)
            SELECT n, sy AS n_pos,
              CAST(CASE WHEN max(a_num) >= 0
                THEN (2 * max(a_num) * 1000000000) // max(det)
                ELSE -((2 * (-max(a_num)) * 1000000000) // max(det)) END
                AS BIGINT) AS b0_e9,
              CAST(CASE WHEN max(b_num) >= 0
                THEN (2 * max(b_num) * 1000000000) // max(det)
                ELSE -((2 * (-max(b_num)) * 1000000000) // max(det)) END
                AS BIGINT) AS b1_e9,
              CAST(CASE WHEN max(a_num) >= 0
                THEN (2 * max(a_num) * 1000000000) // max(det)
                ELSE -((2 * (-max(a_num)) * 1000000000) // max(det)) END
                AS DOUBLE) / 1000000000.0 AS b0,
              CAST(CASE WHEN max(b_num) >= 0
                THEN (2 * max(b_num) * 1000000000) // max(det)
                ELSE -((2 * (-max(b_num)) * 1000000000) // max(det)) END
                AS DOUBLE) / 1000000000.0 AS b1,
              CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT)
                AS n_correct,
              (1000000 * CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END)
                AS BIGINT)) // n AS acc_ppm,
              greatest(sy, n - sy) AS base_correct,
              (1000000 * greatest(sy, n - sy)) // n AS base_ppm
            FROM p GROUP BY n, sy"""))

  /** ml22 — exact re-randomization test for the A/B mean difference
    * (Fisher, The Design of Experiments, 1935 §II; the "approximate
    * randomization" form of Noreen 1989: when the original assignment
    * was a coin flip — ml10's md5 arms ARE one — the null distribution
    * is rebuilt by re-flipping the coins, and the p-value needs no
    * normality, no variance formula, no t table). B = 32 md5
    * re-randomizations of the SAME events, all evaluated in ONE pass
    * via the ml13 replicate-explode idiom; p = (1 + #extreme)/(B + 1)
    * with the standard add-one smoothing (Phipson & Smyth 2010).
    *
    * Determinism: per-replicate arm moments are exact BIGINTs; the
    * "is this replicate at least as extreme" comparison is the EXACT
    * cross-multiplied integer inequality |s₁ⁿ₀−s₀ⁿ₁|·(n₁ᵒn₀ᵒ) ≥
    * |s₁ᵒn₀ᵒ−s₀ᵒn₁ᵒ|·(n₁n₀) in 128-bit arithmetic (DECIMAL(38,0) /
    * HUGEINT — products reach ~10²⁸ at sf1.0), so no replicate can
    * flip on float noise; the p-value is an exact integer ppm.
    *
    * Scale shape: one explode scan → a 32-row replicate frame + a
    * 1-row observed frame broadcast onto it; nothing downstream
    * touches the corpus. */
  val permutationTest: QueryDef = {
    val b = 32
    val extremeExpr =
      "abs(CAST(sw1 AS DECIMAL(38,0)) * CAST(nw0 AS DECIMAL(38,0)) - " +
        "CAST(sw0 AS DECIMAL(38,0)) * CAST(nw1 AS DECIMAL(38,0))) * " +
        "(CAST(n1o AS DECIMAL(38,0)) * CAST(n0o AS DECIMAL(38,0))) >= " +
        "abs(CAST(s1o AS DECIMAL(38,0)) * CAST(n0o AS DECIMAL(38,0)) - " +
        "CAST(s0o AS DECIMAL(38,0)) * CAST(n1o AS DECIMAL(38,0))) * " +
        "(CAST(nw1 AS DECIMAL(38,0)) * CAST(nw0 AS DECIMAL(38,0)))"
    QueryDef(
      "ml22_permutation_test",
      (s, d) => {
        val armObs = graft.ext.Dedup.sparkMd5Int60("CAST(event_id AS STRING)") + " % 2"
        val armRep = graft.ext.Dedup.sparkMd5Int60(
          "concat(CAST(event_id AS STRING), ':', CAST(rep AS STRING))") + " % 2"
        val obs = Tables.events(s, d)
          .selectExpr(s"($armObs) AS arm",
            "CAST(round(value * 100) AS BIGINT) AS c")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1o"),
            sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("s1o"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0o"),
            sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("s0o"))
        val reps = Tables.events(s, d)
          .select(col("event_id"),
            expr("CAST(round(value * 100) AS BIGINT)").as("c"),
            explode(expr(s"sequence(0, ${b - 1})")).as("rep"))
          .selectExpr("rep", "c", s"($armRep) AS arm")
          .groupBy("rep")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nw1"),
            sum(when(col("arm") === 1, col("c")).otherwise(0L)).as("sw1"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nw0"),
            sum(when(col("arm") === 0, col("c")).otherwise(0L)).as("sw0"))
        reps.crossJoin(broadcast(obs))
          .withColumn("extreme", expr(s"IF($extremeExpr, 1L, 0L)"))
          .groupBy("n1o", "s1o", "n0o", "s0o")
          .agg(sum(col("extreme")).as("n_extreme"),
            count(lit(1)).as("n_reps"))
          .selectExpr("n1o + n0o AS n_events", "n1o", "n0o",
            "round(CAST(s1o AS DOUBLE) / (100.0 * CAST(n1o AS DOUBLE)) - " +
              "CAST(s0o AS DOUBLE) / (100.0 * CAST(n0o AS DOUBLE)), 6) AS obs_diff",
            "n_reps", "n_extreme",
            s"(1000000 * (1 + n_extreme)) DIV (${b + 1}) AS p_ppm",
            s"(1000000 * (1 + n_extreme)) DIV (${b + 1}) <= 50000 AS reject_h0")
      },
      Some {
        val uObs = graft.ext.Dedup.duckMd5IntSlice(
          "CAST(event_id AS VARCHAR)", 2, 15)
        val uRep = graft.ext.Dedup.duckMd5IntSlice(
          "concat(CAST(event_id AS VARCHAR), ':', CAST(rep AS VARCHAR))", 2, 15)
        val extremeSql = extremeExpr.replace("DECIMAL(38,0)", "HUGEINT")
        s"""WITH obs AS (
              SELECT
                CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n1o,
                CAST(sum(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT)
                  AS s1o,
                CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n0o,
                CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT)
                  AS s0o
              FROM (
                SELECT ($uObs) % 2 AS arm,
                  CAST(round(value * 100) AS BIGINT) AS c
                FROM events)),
            reps AS (
              SELECT rep,
                CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS nw1,
                CAST(sum(CASE WHEN arm = 1 THEN c ELSE 0 END) AS BIGINT)
                  AS sw1,
                CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS nw0,
                CAST(sum(CASE WHEN arm = 0 THEN c ELSE 0 END) AS BIGINT)
                  AS sw0
              FROM (
                SELECT rep, ($uRep) % 2 AS arm,
                  CAST(round(value * 100) AS BIGINT) AS c
                FROM events, unnest(range(0, $b)) AS r(rep))
              GROUP BY 1),
            x AS (
              SELECT o.*, CASE WHEN $extremeSql THEN 1 ELSE 0 END
                AS extreme
              FROM reps CROSS JOIN obs o)
            SELECT n1o + n0o AS n_events, n1o, n0o,
              round(CAST(s1o AS DOUBLE) / (100.0 * CAST(n1o AS DOUBLE))
                - CAST(s0o AS DOUBLE) / (100.0 * CAST(n0o AS DOUBLE)), 6)
                AS obs_diff,
              count(*) AS n_reps,
              CAST(sum(extreme) AS BIGINT) AS n_extreme,
              (1000000 * (1 + CAST(sum(extreme) AS BIGINT)))
                // ${b + 1} AS p_ppm,
              (1000000 * (1 + CAST(sum(extreme) AS BIGINT)))
                // ${b + 1} <= 50000 AS reject_h0
            FROM x GROUP BY 1, 2, 3, 4"""
      })
  }

  /** ml23 — per-segment OLS, one pass ("many small models": ml01b's
    * exact closed-form regression GROUPED by market segment — the
    * distributed pattern for fitting thousands of per-key models where
    * a driver loop over segments would serialize; at 100 TB the
    * segment key is a grouping column, not a filter, so ONE scan fits
    * them all — the GROUP BY generalization every per-tenant /
    * per-cohort trend fit uses).
    *
    * Determinism: identical moment discipline to ml01b — exact BIGINT
    * (n, Σx, Σy, Σxy, Σxx) per segment, slope/intercept as the same
    * unrounded fixed-shape IEEE divisions (bit-identical across
    * engines, the ml01b-verified contract).
    *
    * Scale shape: one orders↔customer key-partitioned equi-join (the
    * segment attribute lives on the dimension), one partial-aggregable
    * 5-moment agg to the segment-domain frame; the fits are frame
    * algebra. */
  val groupedOls: QueryDef = QueryDef(
    "ml23_grouped_ols",
    (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          month(col("o_orderdate")).cast("long").as("x"),
          expr("CAST(floor(o_totalprice / 100e0) AS BIGINT)").as("y"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(expr("x * y")).as("sxy"),
          sum(expr("x * x")).as("sxx"))
        .withColumn("slope", expr(
          "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"))
        .withColumn("intercept", expr(
          "(CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)"))
        .select("seg", "n", "slope", "intercept")
        .orderBy("seg"),
    Some("""WITH m AS (
              SELECT c.c_mktsegment AS seg,
                CAST(month(o.o_orderdate) AS BIGINT) AS x,
                CAST(floor(o.o_totalprice / 100) AS BIGINT) AS y
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
            agg AS (
              SELECT seg, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(x) AS BIGINT) AS sx,
                CAST(sum(y) AS BIGINT) AS sy,
                CAST(sum(x * y) AS BIGINT) AS sxy,
                CAST(sum(x * x) AS BIGINT) AS sxx
              FROM m GROUP BY 1),
            f AS (
              SELECT *, CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
              FROM agg)
            SELECT seg, n, slope,
              (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                / CAST(n AS DOUBLE) AS intercept
            FROM f ORDER BY seg"""))

  /** ml24 — ml21's exact Newton–Raphson logistic step PER GROUP (the
    * grouped extension ml21's Scaladoc promises: "each further IRLS
    * step is one more moments pass" — and so is each further SEGMENT):
    * one partial-aggregable scan to per-event-type moments, the same
    * closed-form 4·(XᵀX)⁻¹Xᵀ(y−½) step from w = 0 per group, label =
    * weekend events, feature = value cents. The per-segment training
    * accuracy against the segment majority baseline is the standard
    * sliced-model-quality readout (does a per-segment model beat the
    * pooled prior anywhere?).
    *
    * Determinism: identical 128-bit recipe as ml21 post-fix —
    * coefficients as exact (2·num·10⁹) DIV det fixed-point integers
    * (sign-split), per-row verdict as the EXACT integer inequality
    * A + B·x > 0, accuracy as integer ppm. No 128-bit value crosses to
    * DOUBLE except through the derived ≤2⁵³ e9 integers.
    *
    * Scale shape: one moments scan keyed on the natural group — the
    * only shuffle — then a groups-sized coefficient frame broadcast
    * back onto the scoring scan. Group count is the event-type domain
    * (bounded), so the broadcast never grows with the corpus. */
  val groupedLogitNewton: QueryDef = {
    def sql(w128: String, div: String): String =
      (s"""WITH m AS (
             SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS x,
               CASE WHEN CAST(date_part('dow', ts) AS BIGINT) IN (0, 6)
                 THEN 1 ELSE 0 END AS y
             FROM events),
           mom AS (
             SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(CAST(x AS W128) * CAST(x AS W128)) AS W128) AS sxx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy
             FROM m GROUP BY event_type),
           c AS (
             SELECT event_type, n, sy,
               sxx * CAST(2 * sy - n AS W128)
                 - CAST(sx AS W128) * CAST(2 * sxy - sx AS W128) AS a_num,
               CAST(n AS W128) * CAST(2 * sxy - sx AS W128)
                 - CAST(sx AS W128) * CAST(2 * sy - n AS W128) AS b_num,
               CAST(n AS W128) * sxx
                 - CAST(sx AS W128) * CAST(sx AS W128) AS det
             FROM mom),
           p AS (
             SELECT c.event_type, c.n, c.sy, c.a_num, c.b_num, c.det, m.y,
               CASE WHEN (c.a_num + c.b_num * CAST(m.x AS W128)) > 0
                 THEN 1 ELSE 0 END AS pred
             FROM m JOIN c ON m.event_type = c.event_type)
           SELECT event_type, n, sy AS n_pos,
             CAST(CASE WHEN max(a_num) >= 0
               THEN (2 * max(a_num) * 1000000000) $div max(det)
               ELSE -((2 * (-max(a_num)) * 1000000000) $div max(det)) END
               AS BIGINT) AS b0_e9,
             CAST(CASE WHEN max(b_num) >= 0
               THEN (2 * max(b_num) * 1000000000) $div max(det)
               ELSE -((2 * (-max(b_num)) * 1000000000) $div max(det)) END
               AS BIGINT) AS b1_e9,
             CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
             (1000000 * CAST(sum(CASE WHEN pred = y THEN 1 ELSE 0 END)
               AS BIGINT)) $div n AS acc_ppm,
             (1000000 * greatest(sy, n - sy)) $div n AS base_ppm
           FROM p GROUP BY event_type, n, sy
           ORDER BY event_type""").replace("W128", w128)
    QueryDef(
      "ml24_grouped_logit_newton",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_ml24_events")
        s.sql(sql("DECIMAL(38,0)", "DIV")
          .replace("FROM events", "FROM g_ml24_events")
          // Spark: dayofweek() is 1=Sunday..7=Saturday; DuckDB dow is
          // 0=Sunday..6=Saturday — weekend test rendered per engine
          .replace("CAST(date_part('dow', ts) AS BIGINT) IN (0, 6)",
            "dayofweek(ts) IN (1, 7)"))
      },
      Some(sql("HUGEINT", "//")))
  }

  /** ml25 — cumulative gains / lift table (the campaign-targeting
    * readout: "contacting the top-X% of scores captures Y% of the
    * positives"; the tabular form of ml06-style ranking quality —
    * standard credit-scoring/response-model QA, cf. Siddiqi, Credit
    * Risk Scorecards 2006 ch.6): score = event value (cents), label =
    * error event; scores are banded into fixed $50-wide bins capped
    * at 10 (the x30 banding idiom — bands are DOMAIN-bucketed, no
    * global ntile window, the q21 scale lesson), read from the top
    * band down: per-band and cumulative counts, capture ppm of all
    * positives, and the cumulative lift vs the base rate.
    *
    * Determinism: bands, counts, and both ratios are pure integer
    * arithmetic (capture = 1e6·cum_pos DIV total_pos; lift_e6 =
    * (1e6·cum_pos·n_total) DIV (cum_n·total_pos)). Scale shape: ONE
    * corpus scan to the 10-row band frame; the cumulative windows run
    * over that bounded frame only. */
  val liftGains: QueryDef = {
    def sql(div: String): String =
      s"""WITH m AS (
            SELECT least(CAST(round(value * 100) AS BIGINT) $div 5000,
                CAST(9 AS BIGINT)) AS band,
              CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
            FROM events),
          b AS (
            SELECT band, count(*) AS n,
              CAST(sum(y) AS BIGINT) AS n_pos
            FROM m GROUP BY 1),
          c AS (
            SELECT band, n, n_pos,
              CAST(sum(n) OVER (ORDER BY band DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_n,
              CAST(sum(n_pos) OVER (ORDER BY band DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_pos,
              CAST(sum(n) OVER () AS BIGINT) AS n_total,
              CAST(sum(n_pos) OVER () AS BIGINT) AS total_pos
            FROM b)
          SELECT band, n, n_pos, cum_n, cum_pos,
            (1000000 * cum_pos) $div total_pos AS capture_ppm,
            (1000000 * cum_pos * n_total) $div (cum_n * total_pos)
              AS lift_e6
          FROM c ORDER BY band DESC"""
    QueryDef(
      "ml25_lift_gains",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_ml25_events")
        s.sql(sql("DIV").replace("FROM events", "FROM g_ml25_events"))
      },
      Some(sql("//")))
  }

  /** ml26 — exact Kendall τ-b rank correlation (Kendall 1938; the τ-b
    * tie correction per Kendall 1945) between l_quantity and the
    * discount, via the BOUNDED joint-domain census: both variables have
    * small value domains (50 quantities × 11 discount cents = ≤550
    * cells), so concordant/discordant pair counts are exact sums of
    * n_a·n_b over cell pairs — never a row-level O(n²) comparison.
    * The rank-based complement of q25/ml18's Pearson moments: immune
    * to monotone transforms and outliers, the standard screen for
    * nonlinear-but-monotone dependence.
    *
    * Determinism: C, D, tie terms, n₀ are exact BIGINTs (n₀ < 2⁵³ up
    * to ~120 M rows, documented bound); τ-b is ONE fixed-shape IEEE
    * chain over ≤2⁵³-exact casts (the ml18 discipline — no rounding
    * anywhere); the |τ|>0.1 verdict is an exact 128-bit
    * cross-multiplied inequality. Scale shape: one corpus scan to the
    * ≤550-row cell census (map-side partial agg), localCheckpoint'd so
    * the four census consumers never rescan the corpus (the g19
    * multi-ref lesson; mirrored AS MATERIALIZED in DuckDB); everything
    * downstream is bounded by the value domain, not the corpus. */
  val kendallTau: QueryDef = {
    def tail(div: String, w128: String): String =
      s"""mom AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM cells),
          tx AS (
            SELECT CAST(sum(t * (t - 1)) AS BIGINT) AS tie2
            FROM (SELECT CAST(sum(n) AS BIGINT) AS t
                  FROM cells GROUP BY x) q),
          ty AS (
            SELECT CAST(sum(t * (t - 1)) AS BIGINT) AS tie2
            FROM (SELECT CAST(sum(n) AS BIGINT) AS t
                  FROM cells GROUP BY y) q),
          cd AS (
            SELECT
              CAST(COALESCE(sum(CASE WHEN a.y < b.y
                THEN a.n * b.n END), 0) AS BIGINT) AS conc,
              CAST(COALESCE(sum(CASE WHEN a.y > b.y
                THEN a.n * b.n END), 0) AS BIGINT) AS disc
            FROM cells a JOIN cells b ON a.x < b.x)
          SELECT nn AS n,
            (nn * (nn - 1)) $div 2 AS n0,
            conc AS concordant, disc AS discordant,
            tx.tie2 $div 2 AS ties_x,
            ty.tie2 $div 2 AS ties_y,
            CAST(conc - disc AS DOUBLE) /
              sqrt(CAST((nn * (nn - 1)) $div 2 - tx.tie2 $div 2 AS DOUBLE)
                * CAST((nn * (nn - 1)) $div 2 - ty.tie2 $div 2 AS DOUBLE))
              AS tau_b,
            CASE WHEN 100 * CAST(conc - disc AS $w128)
                * CAST(conc - disc AS $w128)
              > CAST((nn * (nn - 1)) $div 2 - tx.tie2 $div 2 AS $w128)
                * CAST((nn * (nn - 1)) $div 2 - ty.tie2 $div 2 AS $w128)
              THEN 'dependent' ELSE 'weak' END AS verdict
          FROM mom, tx, ty, cd"""
    val cellsSql =
      """SELECT CAST(l_quantity AS BIGINT) AS x,
           CAST(round(l_discount * 100) AS BIGINT) AS y,
           CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY 1, 2"""
    QueryDef(
      "ml26_kendall_tau",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("g_ml26_lineitem")
        s.sql(cellsSql.replace("FROM lineitem", "FROM g_ml26_lineitem"))
          .localCheckpoint()
          .createOrReplaceTempView("g_ml26_cells")
        s.sql(("WITH " + tail("DIV", "DECIMAL(38,0)"))
          .replace("FROM cells", "FROM g_ml26_cells")
          .replace("JOIN cells", "JOIN g_ml26_cells"))
      },
      Some(s"""WITH cells AS MATERIALIZED ($cellsSql),
               ${tail("//", "HUGEINT")}"""))
  }

  /** ml27 — exact Spearman ρ (Spearman 1904 with the standard midrank
    * tie treatment): Pearson over DOUBLED midranks — the ml19 trick
    * (2·cum_before + t + 1 keeps every midrank integral) applied to
    * BOTH variables on ml26's bounded 550-cell joint census, so the
    * rank moments are exact 128-bit sums of cell-count products and
    * the whole statistic needs no row-level ranking window. The
    * monotone-dependence complement of ml26: τ counts pair inversions,
    * ρ correlates rank positions; both are reported over the same
    * cells at zero extra corpus cost.
    *
    * Determinism: all five moments exact in DECIMAL(38,0)/HUGEINT
    * (r2 ≤ 2n ⇒ Σ n·r2x·r2y ≤ 4n³ — past BIGINT at corpus scale);
    * ρ is ONE fixed-shape IEEE chain with every >2⁵³ cast routed
    * through the dec2d hi/lo split (the ml21 lesson); the rank-sum
    * law Σ n_cell·r2 = n(n+1) rides along as an integer self-check
    * column. Scale shape: identical to ml26 — one corpus scan to the
    * checkpointed census; marginal windows and the final moments all
    * run on ≤550 rows. */
  val spearmanRho: QueryDef = {
    import graft.core.Fixed
    def tail(div: String, w128: String): String = {
      val num = "(CAST(nt AS W128) * sxy - sx * sy)"
      val va = "(CAST(nt AS W128) * sxx - sx * sx)"
      val vb = "(CAST(nt AS W128) * syy - sy * sy)"
      s"""xr AS (
            SELECT x, cum_b AS cxb, t AS tx,
              2 * cum_b + t + 1 AS r2x
            FROM (
              SELECT x, CAST(sum(n) AS BIGINT) AS t,
                CAST(coalesce(sum(sum(n)) OVER (ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_b
              FROM cells GROUP BY x) q),
          yr AS (
            SELECT y, 2 * cum_b + t + 1 AS r2y
            FROM (
              SELECT y, CAST(sum(n) AS BIGINT) AS t,
                CAST(coalesce(sum(sum(n)) OVER (ORDER BY y
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cum_b
              FROM cells GROUP BY y) q),
          mom AS (
            SELECT CAST(sum(n) AS BIGINT) AS nt,
              CAST(sum(CAST(n AS W128) * r2x) AS W128) AS sx,
              CAST(sum(CAST(n AS W128) * r2y) AS W128) AS sy,
              CAST(sum(CAST(n AS W128) * r2x * r2x) AS W128) AS sxx,
              CAST(sum(CAST(n AS W128) * r2y * r2y) AS W128) AS syy,
              CAST(sum(CAST(n AS W128) * r2x * r2y) AS W128) AS sxy
            FROM cells JOIN xr USING (x) JOIN yr USING (y))
          SELECT nt AS n,
            CAST(sx AS BIGINT) AS rank2_sum_x,
            CAST(sy AS BIGINT) AS rank2_sum_y,
            ${Fixed.sdec2d(num, div)} /
              (sqrt(${Fixed.dec2d(va, div)})
                * sqrt(${Fixed.dec2d(vb, div)})) AS rho,
            CASE WHEN abs(${Fixed.sdec2d(num, div)} /
                (sqrt(${Fixed.dec2d(va, div)})
                  * sqrt(${Fixed.dec2d(vb, div)}))) > 0.1
              THEN 'dependent' ELSE 'weak' END AS verdict
          FROM mom""".replace("W128", w128)
    }
    val cellsSql =
      """SELECT CAST(l_quantity AS BIGINT) AS x,
           CAST(round(l_discount * 100) AS BIGINT) AS y,
           CAST(count(*) AS BIGINT) AS n
         FROM lineitem GROUP BY 1, 2"""
    QueryDef(
      "ml27_spearman_rho",
      (s, d) => {
        Tables.lineitem(s, d).createOrReplaceTempView("g_ml27_lineitem")
        s.sql(cellsSql.replace("FROM lineitem", "FROM g_ml27_lineitem"))
          .localCheckpoint()
          .createOrReplaceTempView("g_ml27_cells")
        s.sql(("WITH " + tail("DIV", "DECIMAL(38,0)"))
          .replace("FROM cells", "FROM g_ml27_cells"))
      },
      Some(s"""WITH cells AS MATERIALIZED ($cellsSql),
               ${tail("//", "HUGEINT")}"""))
  }

  /** ml28 — simple-exponential-smoothing volume forecast (Brown 1956 /
    * Holt 1957 SES, the capacity-planning baseline every telemetry
    * stack runs before anything fancier): 1-step-ahead forecast of the
    * per-type DAILY event count with α = ½, which makes the smoothing
    * weights DYADIC — f = Σₖ y_{n−k}·2^{−(k+1)} — so every term is an
    * exact truncating integer divide and the whole forecast is
    * engine-exact without a single float (the recurrence form would
    * need floats or recursion; the geometric expansion needs neither).
    * Backtest rides along: each day ≥ 2 is forecast from its own
    * prefix, and the mean absolute error is an exact integer mean.
    * The engine's first time-series-forecast operator.
    *
    * Determinism: counts, dyadic terms, |errors|, and integer means —
    * no floats. Scale shape: one corpus scan to the (type, day) census
    * (map-side partial agg, ≤ types·days rows); the prefix join runs
    * on that bounded frame only (30²·5 pairs), the q61/x57 pattern. */
  val sesForecast: QueryDef = {
    def tail(div: String, pow2: String): String =
      s"""idx AS (
            SELECT event_type, day, y,
              CAST(row_number() OVER (PARTITION BY event_type
                ORDER BY day) AS BIGINT) AS rn
            FROM cens),
          nn AS (
            SELECT event_type, CAST(max(rn) AS BIGINT) AS n_days,
              CAST(max(CASE WHEN rnmax = rn THEN y END) AS BIGINT)
                AS last_y
            FROM (SELECT event_type, rn, y,
                    max(rn) OVER (PARTITION BY event_type) AS rnmax
                  FROM idx) q
            GROUP BY 1),
          bt AS (
            SELECT t.event_type, t.rn, t.y,
              CAST(sum(p.y $div $pow2) AS BIGINT) AS f
            FROM idx t JOIN idx p
              ON p.event_type = t.event_type AND p.rn < t.rn
            GROUP BY 1, 2, 3),
          err AS (
            SELECT event_type,
              CAST(sum(abs(y - f)) AS BIGINT) AS sum_abs_err,
              CAST(count(*) AS BIGINT) AS n_bt
            FROM bt GROUP BY 1),
          fc AS (
            SELECT n.event_type,
              CAST(sum(p.y $div ${pow2.replace("t.rn", "n.n_days + 1")})
                AS BIGINT) AS forecast_next
            FROM nn n JOIN idx p ON p.event_type = n.event_type
            GROUP BY 1)
          SELECT nn.event_type, n_days, last_y, forecast_next,
            sum_abs_err, sum_abs_err $div n_bt AS mae
          FROM nn JOIN err ON nn.event_type = err.event_type
          JOIN fc ON nn.event_type = fc.event_type
          ORDER BY nn.event_type"""
    def censSql(epochUs: String, div: String): String =
      s"""SELECT event_type, $epochUs(ts) $div 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2"""
    // Exponent clamped at 62: Spark's shiftleft wraps shift counts mod
    // 64 while DuckDB's << overflows to 0 — for gaps >= ~40 the dyadic
    // term truncates to 0 anyway, so the clamp preserves exactness while
    // keeping both engines agreeing on series longer than 64 days.
    def pow2Spark =
      "shiftleft(CAST(1 AS BIGINT), least(CAST(t.rn - p.rn AS INT), 62))"
    def pow2Duck =
      "(CAST(1 AS BIGINT) << least(CAST(t.rn - p.rn AS INTEGER), 62))"
    QueryDef(
      "ml28_ses_forecast",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_ml28_events")
        s.sql(censSql("unix_micros", "DIV")
            .replace("FROM events", "FROM g_ml28_events"))
          .localCheckpoint()
          .createOrReplaceTempView("g_ml28_cens")
        s.sql(("WITH " + tail("DIV", pow2Spark))
          .replace("FROM cens", "FROM g_ml28_cens"))
      },
      Some(s"""WITH cens AS MATERIALIZED (${censSql("epoch_us", "//")}),
               ${tail("//", pow2Duck)}"""))
  }

  /** ml29 — robust MAD anomaly screen over the daily volume series
    * (Hampel 1974 / Leys et al. 2013 "use the median, not the mean":
    * the |y − median| > 3·MAD rule is the monitoring-alert standard
    * because one outlier day corrupts a z-score's own mean AND sd —
    * the exact failure it is meant to flag): per event type, the exact
    * ×2-snapped median of daily counts, doubled deviations
    * dev = |2y − med₂| (= 2|y − med|), the ×2-snapped median of those
    * (mad₂ = 4·MAD), and the anomaly census under the EXACT integer
    * rule 2·dev > 3·mad₂ ⟺ |y − med| > 3·MAD.
    *
    * Determinism: counts are integers, both medians ride the
    * sanctioned ×2 interpolated-midpoint snap (q59's recipe —
    * midpoints of integers are exactly .0/.5), the rule is a pure
    * integer cross-multiply. mad₂ = 0 (over half the days identical)
    * flags every deviating day — the documented degenerate of the
    * textbook rule. Scale shape: one corpus scan to the (type, day)
    * census; both medians and the census run on that bounded frame
    * (ml28's pattern — this is its alerting-side sibling). */
  val madAnomaly: QueryDef = {
    def tail(div: String, perc: String): String =
      s"""med AS (
            SELECT event_type,
              CAST(round($perc(y, 0.5) * 2) AS BIGINT) AS med2
            FROM cens GROUP BY 1),
          dev AS (
            SELECT c.event_type, c.day, c.y, m.med2,
              abs(2 * c.y - m.med2) AS d2
            FROM cens c JOIN med m ON c.event_type = m.event_type),
          mad AS (
            SELECT event_type,
              CAST(round($perc(d2, 0.5) * 2) AS BIGINT) AS mad2
            FROM dev GROUP BY 1)
          SELECT d.event_type,
            CAST(count(*) AS BIGINT) AS n_days,
            max(d.med2) AS med_x2,
            max(a.mad2) AS mad_x2x2,
            CAST(sum(CASE WHEN 2 * d.d2 > 3 * a.mad2 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_anomalies,
            max(d.d2) AS max_dev_x2
          FROM dev d JOIN mad a ON d.event_type = a.event_type
          GROUP BY d.event_type ORDER BY d.event_type"""
    def censSql(epochUs: String, div: String): String =
      s"""SELECT event_type, $epochUs(ts) $div 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2"""
    QueryDef(
      "ml29_mad_anomaly",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_ml29_events")
        s.sql(censSql("unix_micros", "DIV")
            .replace("FROM events", "FROM g_ml29_events"))
          .localCheckpoint()
          .createOrReplaceTempView("g_ml29_cens")
        s.sql(("WITH " + tail("DIV", "percentile"))
          .replace("FROM cens", "FROM g_ml29_cens"))
      },
      Some(s"""WITH cens AS MATERIALIZED (
                 ${censSql("epoch_us", "//")}),
               ${tail("//", "quantile_cont")}"""))
  }

  /** ml30 — CUSUM change detection over the daily volume series (Page,
    * Biometrika 1954 — the sequential drift detector monitoring stacks
    * run beside ml29's pointwise rule: a SUSTAINED small shift that no
    * single day flags accumulates until the alarm threshold): the
    * textbook recurrence s_i = max(0, s_{i−1} + d_i) is sequential,
    * but it has the classic CLOSED FORM s_i = P_i − min(0, min_{j≤i}
    * P_j) over the prefix sums P of the drift terms d = 2y − med₂ −
    * slack₂ — so the whole walk is TWO running windows (sum + min),
    * no recursion, no per-step job (the first recursive-CTE draft
    * cost a flat ~9 s in per-step scheduling; the window form prices
    * the same walk at window cost). Doubled integer units throughout:
    * target = the exact ×2 median, slack₂ = med₂ DIV 10, alarm at
    * s > med₂.
    *
    * Determinism: all integers; the ×2 median is the sanctioned q59
    * snap. Scale shape: one corpus scan to the bounded (type, day)
    * census; both windows run per-type over ≤ |days| rows —
    * ml28/ml29's pattern (the three ops form the forecast/screen/
    * drift monitoring triple). */
  val cusumDrift: QueryDef = {
    def tail(div: String, perc: String): String =
      s"""med AS (
            SELECT event_type,
              CAST(round($perc(y, 0.5) * 2) AS BIGINT) AS med2
            FROM cens GROUP BY 1),
          idx AS (
            SELECT c.event_type, c.day, m.med2,
              2 * c.y - m.med2 - m.med2 $div 10 AS d
            FROM cens c JOIN med m ON c.event_type = m.event_type),
          pfx AS (
            SELECT event_type, day, med2,
              CAST(sum(d) OVER w AS BIGINT) AS p,
              CAST(row_number() OVER (PARTITION BY event_type
                ORDER BY day) AS BIGINT) AS rn
            FROM idx
            WINDOW w AS (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          walk AS (
            SELECT event_type, rn, med2,
              p - least(CAST(0 AS BIGINT),
                CAST(min(p) OVER (PARTITION BY event_type ORDER BY rn
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT)) AS s
            FROM pfx)
          SELECT event_type,
            CAST(count(*) AS BIGINT) AS n_days,
            max(med2) AS med_x2,
            max(s) AS max_cusum_x2,
            CAST(sum(CASE WHEN s > med2 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_alarm_days,
            CAST(coalesce(min(CASE WHEN s > med2 THEN rn END), 0)
              AS BIGINT) AS first_alarm_rn
          FROM walk GROUP BY event_type ORDER BY event_type"""
    def censSql(epochUs: String, div: String): String =
      s"""SELECT event_type, $epochUs(ts) $div 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2"""
    QueryDef(
      "ml30_cusum_drift",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_ml30_events")
        s.sql(censSql("unix_micros", "DIV")
            .replace("FROM events", "FROM g_ml30_events"))
          .localCheckpoint()
          .createOrReplaceTempView("g_ml30_cens")
        s.sql(("WITH " + tail("DIV", "percentile"))
          .replace("FROM cens", "FROM g_ml30_cens"))
      },
      Some(s"""WITH cens AS MATERIALIZED (
                 ${censSql("epoch_us", "//")}),
               ${tail("//", "quantile_cont")}"""))
  }

  /** ml31 — Benford first-digit audit (Benford 1938; Nigrini's
    * forensic-accounting standard — fabricated or unit-capped numeric
    * columns betray themselves in the leading-digit distribution,
    * which for multi-magnitude natural data follows log₁₀(1+1/d)):
    * leading digit of the exact order-total cents vs the Benford
    * expectation, per digit observed/expected ppm and the absolute
    * deviation (the per-digit terms of Nigrini's MAD statistic).
    *
    * Determinism: digits from the decimal string of an exact BIGINT;
    * the expectation column is the SAME nine rounded literals rendered
    * into both engines (they sum to exactly 10⁶); ratios integer DIV.
    * Scale shape: one scan to the 9-cell digit census — map-side,
    * bounded, the ml20 domain-frame idiom (digit frame LEFT JOIN
    * census keeps never-observed digits). */
  val benfordAudit: QueryDef = {
    val exp = Seq(1 -> 301030, 2 -> 176091, 3 -> 124939, 4 -> 96910,
      5 -> 79181, 6 -> 66947, 7 -> 57992, 8 -> 51153, 9 -> 45757)
    def sql(str: String, div: String): String =
      s"""WITH m AS (
            SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100)
              AS BIGINT) AS $str), 1, 1) AS BIGINT) AS d
            FROM orders),
          c AS (
            SELECT d, CAST(count(*) AS BIGINT) AS n FROM m GROUP BY 1),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM c),
          e AS (
            SELECT * FROM (VALUES
              ${exp.map { case (d, p) =>
                s"(CAST($d AS BIGINT), CAST($p AS BIGINT))" }
                .mkString(", ")})
              AS v(d, exp_ppm))
          SELECT e.d AS digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
            (1000000 * CAST(coalesce(c.n, 0) AS BIGINT)) $div nt
              AS obs_ppm,
            e.exp_ppm,
            abs((1000000 * CAST(coalesce(c.n, 0) AS BIGINT)) $div nt
              - e.exp_ppm) AS dev_ppm
          FROM e LEFT JOIN c ON c.d = e.d CROSS JOIN t
          ORDER BY e.d"""
    QueryDef(
      "ml31_benford_audit",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("g_ml31_orders")
        s.sql(sql("STRING", "DIV")
          .replace("FROM orders", "FROM g_ml31_orders"))
      },
      Some(sql("VARCHAR", "//")))
  }

  /** ml32 — Wald–Wolfowitz runs test on the daily volume series (Wald
    * & Wolfowitz 1940; the randomness check behind residual-autocorr
    * screens: too FEW runs of above/below-median days means trend or
    * weekly seasonality, too MANY means oscillation — a property
    * neither ml29's pointwise rule nor ml30's one-sided drift sees):
    * per type, the above/below-median sign sequence (median-ties
    * excluded, the standard convention), the exact run count via the
    * lag-compare idiom, and the |R−μ| > 2σ verdict as ONE exact
    * integer cross-multiplied inequality — A²(n−1) > 8·n₁n₂(2n₁n₂−n)
    * with A = n(R−1) − 2n₁n₂ (all terms bounded by the day census,
    * never floats).
    *
    * Determinism: the ×2 median snap (q59), integer runs, integer
    * verdict. Scale shape: one corpus scan to the bounded census;
    * signs/runs/moments on ≤|days| rows per type (the ml28-ml30
    * monitoring family's fourth member). */
  val runsTest: QueryDef = {
    def tail(div: String, perc: String): String =
      s"""med AS (
            SELECT event_type,
              CAST(round($perc(y, 0.5) * 2) AS BIGINT) AS med2
            FROM cens GROUP BY 1),
          sg AS (
            SELECT c.event_type, c.day,
              CASE WHEN 2 * c.y > m.med2 THEN 1 ELSE 0 END AS s
            FROM cens c JOIN med m ON c.event_type = m.event_type
            WHERE 2 * c.y != m.med2),
          fl AS (
            SELECT event_type, s,
              CASE WHEN lag(s, 1) OVER (PARTITION BY event_type
                ORDER BY day) IS DISTINCT FROM s THEN 1 ELSE 0 END
                AS flip
            FROM sg),
          agg AS (
            SELECT event_type,
              CAST(count(*) AS BIGINT) AS n,
              CAST(sum(s) AS BIGINT) AS n1,
              CAST(count(*) - sum(s) AS BIGINT) AS n2,
              CAST(sum(flip) AS BIGINT) AS r
            FROM fl GROUP BY 1)
          SELECT event_type, n, n1, n2, r AS n_runs,
            n * (r - 1) - 2 * n1 * n2 AS a_num_xn,
            CASE WHEN (n * (r - 1) - 2 * n1 * n2)
                * (n * (r - 1) - 2 * n1 * n2) * (n - 1)
              > 8 * n1 * n2 * (2 * n1 * n2 - n)
              THEN 'nonrandom' ELSE 'random' END AS verdict
          FROM agg ORDER BY event_type"""
    def censSql(epochUs: String, div: String): String =
      s"""SELECT event_type, $epochUs(ts) $div 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2"""
    QueryDef(
      "ml32_runs_test",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_ml32_events")
        s.sql(censSql("unix_micros", "DIV")
            .replace("FROM events", "FROM g_ml32_events"))
          .localCheckpoint()
          .createOrReplaceTempView("g_ml32_cens")
        s.sql(("WITH " + tail("DIV", "percentile"))
          .replace("FROM cens", "FROM g_ml32_cens"))
      },
      Some(s"""WITH cens AS MATERIALIZED (
                 ${censSql("epoch_us", "//")}),
               ${tail("//", "quantile_cont")}"""))
  }

  /** ml33 — Theil–Sen robust trend slope over the daily volume series
    * (Theil 1950 / Sen, JASA 1968 — the median of pairwise slopes: the
    * robust trend reader that completes the monitoring quad ml28-ml32:
    * SES forecasts, MAD flags points, CUSUM flags sustained shifts,
    * the runs test flags oscillation — Theil–Sen states the DIRECTION
    * with a 29% breakdown point where an OLS slope follows one outlier
    * day): per event type, all C(n,2) day pairs from the bounded
    * census, slope_e6 = 10⁶(y₂−y₁)/(x₂−x₁) sign-split exact, the
    * doubled median via the sanctioned q59 ×2 snap (slopes are
    * integers — interpolated midpoints exactly .0/.5), and the trend
    * verdict 2·|med₂| > threshold as pure integer arithmetic.
    *
    * Scale shape: one corpus scan to the (type, day) census; the pair
    * frame is C(|days|, 2)·|types| ≤ ~2 200 rows — ml26's bounded
    * joint-census discipline, never row-level O(n²). Output covers the
    * FULL event-type domain: a type whose census has a single day has
    * zero slope pairs and is emitted as n_pairs = 0 / NULL slopes /
    * trend 0 via the nn-side LEFT JOIN (ADVICE r13), not silently
    * dropped. */
  val theilSen: QueryDef = {
    def tail(div: String, perc: String): String =
      s"""p AS (
            SELECT a.event_type,
              ${graft.core.Fixed.sdiv(
                "1000000 * (b.y - a.y)", "b.day - a.day", div)} AS slope_e6
            FROM cens a JOIN cens b
              ON a.event_type = b.event_type AND a.day < b.day),
          m AS (
            SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(round($perc(slope_e6, 0.5) * 2) AS BIGINT)
                AS slope2_e6,
              CAST(min(slope_e6) AS BIGINT) AS min_slope_e6,
              CAST(max(slope_e6) AS BIGINT) AS max_slope_e6
            FROM p GROUP BY 1),
          nn AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
            FROM cens GROUP BY 1)
          SELECT nn.event_type, n_days,
            CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
            slope2_e6, min_slope_e6, max_slope_e6,
            CAST(CASE WHEN slope2_e6 > 0 THEN 1
              WHEN slope2_e6 < 0 THEN -1 ELSE 0 END AS BIGINT) AS trend
          FROM nn LEFT JOIN m ON m.event_type = nn.event_type
          ORDER BY nn.event_type"""
    def censSql(epochUs: String, div: String): String =
      s"""SELECT event_type, $epochUs(ts) $div 86400000000 AS day,
            CAST(count(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2"""
    QueryDef(
      "ml33_theil_sen",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_ml33_events")
        s.sql(censSql("unix_micros", "DIV")
            .replace("FROM events", "FROM g_ml33_events"))
          .localCheckpoint()
          .createOrReplaceTempView("g_ml33_cens")
        s.sql(("WITH " + tail("DIV", "percentile"))
          .replace("FROM cens", "FROM g_ml33_cens")
          .replace("JOIN cens", "JOIN g_ml33_cens"))
      },
      Some(s"""WITH cens AS MATERIALIZED (
                 ${censSql("epoch_us", "//")}),
               ${tail("//", "quantile_cont")}"""))
  }

  /** ml34 — Kaplan–Meier survival estimate for time-to-convert
    * (Kaplan & Meier, JASA 1958 — the product-limit estimator every
    * retention/time-to-event readout uses under RIGHT CENSORING: users
    * who never purchase are not failures, they are observations that
    * survived past their last-seen time; dropping them biases the
    * curve down, counting them as conversions biases it up): per user,
    * duration = first purchase µs − first view µs (event), else
    * last-seen − first view (censored); the KM table at each distinct
    * event DAY carries the exact at-risk count n, events d, censored
    * c, and the log-survival ln S = Σ_{t_j ≤ t} [ln(n_j − d_j) −
    * ln(n_j)] integerized at 1e-6 nats per term — ln only of INTEGER
    * counts (the t41/t23 sanctioned recipe; the raw product-limit
    * Π(1 − d/n) would be a float product no fixed-point scheme keeps
    * exact), summed exactly as integers.
    *
    * Determinism: durations exact µs → day buckets by DIV; n/d/c pure
    * integer window arithmetic; lnS_e6 an exact integer prefix sum of
    * per-term integers. A terminal day where EVERY remaining at-risk
    * user converts (n = d, S(t) = 0) would put ln(0) = −∞ in the
    * term; that row (and any row at or after it) carries
    * ln_surv_e6 = NULL — the explicit "curve hit zero" sentinel —
    * instead of a divergent float (ADVICE r13; not reachable on the
    * fixture, data-dependent at scale). Scale shape: one user-keyed
    * agg to (user, duration, event?) — corpus-linear — then everything
    * on the bounded distinct-day frame (x15's value-domain idiom). */
  val kaplanMeier: QueryDef = {
    def sql(epochUs: String, div: String): String =
      s"""WITH per AS (
            SELECT user_id,
              min(CASE WHEN event_type = 'view' THEN $epochUs(ts) END)
                AS v_us,
              min(CASE WHEN event_type = 'purchase' THEN $epochUs(ts) END)
                AS p_us,
              max($epochUs(ts)) AS last_us
            FROM events GROUP BY 1),
          obs AS (
            SELECT user_id,
              CASE WHEN p_us IS NOT NULL AND p_us >= v_us
                THEN (p_us - v_us) $div 86400000000
                ELSE (last_us - v_us) $div 86400000000 END AS day,
              CASE WHEN p_us IS NOT NULL AND p_us >= v_us
                THEN 1 ELSE 0 END AS event
            FROM per WHERE v_us IS NOT NULL),
          tot AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM obs),
          cell AS (
            SELECT day,
              CAST(sum(event) AS BIGINT) AS d,
              CAST(sum(1 - event) AS BIGINT) AS c
            FROM obs GROUP BY 1),
          km AS (
            SELECT day, d, c,
              n0 - coalesce(sum(d + c) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS n
            FROM cell CROSS JOIN tot),
          terms AS (
            SELECT day, d, c, CAST(n AS BIGINT) AS n_r,
              CASE WHEN d > 0 AND n > d THEN
                CAST(round(ln(CAST(n - d AS DOUBLE)) * 1000000) AS BIGINT)
                - CAST(round(ln(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)
              ELSE 0 END AS term_e6,
              CASE WHEN d >= n THEN 1 ELSE 0 END AS dead
            FROM km WHERE n > 0 AND d > 0)
          SELECT day, n_r AS n_at_risk, d AS n_events, c AS n_censored,
            CAST(CASE WHEN sum(dead) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) > 0
              THEN NULL
              ELSE sum(term_e6) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              END AS BIGINT) AS ln_surv_e6
          FROM terms ORDER BY day"""
    QueryDef(
      "ml34_kaplan_meier",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_ml34_events")
        s.sql(sql("unix_micros", "DIV")
          .replace("FROM events", "FROM g_ml34_events"))
      },
      Some(sql("epoch_us", "//")))
  }

  /** ml35 — log-rank test between two user cohorts' time-to-convert
    * curves (Mantel 1966 / Peto & Peto 1972 — THE standard two-sample
    * test paired with ml34's Kaplan–Meier estimate: under H₀ "same
    * survival", cohort A's observed events O_A at each event day should
    * match the hypergeometric expectation E_A = Σ d_j·n_Aj/n_j, with
    * variance V = Σ d_j·(n_Aj/n_j)·(n_Bj/n_j)·(n_j−d_j)/(n_j−1); the
    * statistic (O_A−E_A)²/V is χ²₁ — how an experimenter reads "did
    * the treatment change time-to-convert" without binning durations):
    * cohorts split 8/8 on the first md5 hex digit of user_id (x07's
    * split device, so H₀ is TRUE by construction and the fixture
    * statistic should sit low), durations/censoring exactly as ml34.
    *
    * Determinism: at-risk/event counts are exact integer window
    * arithmetic on the bounded distinct-day frame; each day's E_A and
    * variance term is ONE fixed-shape IEEE chain over exact integer
    * counts rounded to 10⁻⁶ at the day frame (ml26's discipline)
    * before the exact long sums — deliberately NOT the integer
    * cross-multiply `(10⁶·d·n_A) DIV n`, whose product overflows
    * BIGINT (silently, under Spark's non-ANSI wrap) once d·n_A
    * exceeds ~9.2e12, i.e. a few million users; the double chain is
    * engine-identical at every scale. χ² is one final fixed double
    * ratio of the two exact aggregates, computed ONCE in a CTE that
    * both the statistic column and the reject flag read. Empty-terms
    * edge (zero qualifying event days — data-dependent): o_a/o_b/
    * e_a_e6/v_e6 are sum() over an empty frame and surface as NULL in
    * the single output row (ml34's ln_surv_e6 sentinel convention —
    * NULL means "no event days", identically in both engines);
    * chi2_e6 and reject_95 fall to 0 via their CASE guards. Scale
    * shape: one user-keyed agg, then everything on the bounded day
    * frame. */
  val logRank: QueryDef = {
    def sql(epochUs: String, div: String, str: String): String =
      s"""WITH per AS (
            SELECT user_id,
              min(CASE WHEN event_type = 'view' THEN $epochUs(ts) END)
                AS v_us,
              min(CASE WHEN event_type = 'purchase' THEN $epochUs(ts) END)
                AS p_us,
              max($epochUs(ts)) AS last_us
            FROM events GROUP BY 1),
          obs AS (
            SELECT
              CASE WHEN substring(md5(CAST(user_id AS $str)), 1, 1)
                IN ('0','1','2','3','4','5','6','7')
                THEN 0 ELSE 1 END AS grp,
              CASE WHEN p_us IS NOT NULL AND p_us >= v_us
                THEN (p_us - v_us) $div 86400000000
                ELSE (last_us - v_us) $div 86400000000 END AS day,
              CASE WHEN p_us IS NOT NULL AND p_us >= v_us
                THEN 1 ELSE 0 END AS event
            FROM per WHERE v_us IS NOT NULL),
          tot AS (
            SELECT
              CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n0a,
              CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n0b
            FROM obs),
          cell AS (
            SELECT day,
              CAST(sum(CASE WHEN grp = 0 THEN event ELSE 0 END)
                AS BIGINT) AS da,
              CAST(sum(CASE WHEN grp = 1 THEN event ELSE 0 END)
                AS BIGINT) AS db,
              CAST(sum(CASE WHEN grp = 0 THEN 1 - event ELSE 0 END)
                AS BIGINT) AS ca,
              CAST(sum(CASE WHEN grp = 1 THEN 1 - event ELSE 0 END)
                AS BIGINT) AS cb
            FROM obs GROUP BY 1),
          km AS (
            SELECT day, da, db,
              n0a - coalesce(sum(da + ca) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS na,
              n0b - coalesce(sum(db + cb) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS nb
            FROM cell CROSS JOIN tot),
          terms AS (
            SELECT da, db, na, nb, na + nb AS n, da + db AS d
            FROM km WHERE da + db > 0 AND na + nb > 0),
          agg AS (
            SELECT
              CAST(sum(da) AS BIGINT) AS o_a,
              CAST(sum(db) AS BIGINT) AS o_b,
              CAST(sum(CAST(round(CAST(d AS DOUBLE) * CAST(na AS DOUBLE)
                / CAST(n AS DOUBLE) * 1000000) AS BIGINT))
                AS BIGINT) AS e_a_e6,
              CAST(sum(CASE WHEN n > 1 THEN
                CAST(round((CAST(d AS DOUBLE) * CAST(na AS DOUBLE)
                  * CAST(nb AS DOUBLE) * CAST(n - d AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * CAST(n - 1 AS DOUBLE)) * 1000000) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS v_e6
            FROM terms),
          stat AS (
            SELECT n0a, n0b, o_a, o_b, e_a_e6, v_e6,
              CAST(CASE WHEN v_e6 > 0 THEN CAST(round(
                (CAST(1000000 * o_a - e_a_e6 AS DOUBLE)
                  * CAST(1000000 * o_a - e_a_e6 AS DOUBLE))
                / CAST(v_e6 AS DOUBLE)) AS BIGINT)
                ELSE 0 END AS BIGINT) AS chi2_e6
            FROM agg CROSS JOIN tot)
          SELECT n0a AS n_users_a, n0b AS n_users_b, o_a, o_b,
            e_a_e6, v_e6, chi2_e6,
            CAST(CASE WHEN chi2_e6 > 3841459 THEN 1 ELSE 0 END
              AS BIGINT) AS reject_95
          FROM stat"""
    QueryDef(
      "ml35_logrank",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("g_ml35_events")
        s.sql(sql("unix_micros", "DIV", "STRING")
          .replace("FROM events", "FROM g_ml35_events"))
      },
      Some(sql("epoch_us", "//", "VARCHAR")))
  }

  val all: Seq[QueryDef] =
    Seq(lrOrders, treeOrders, kmeansClusters, kmeansClustersExact, olsExact,
      stumpExact, cvSlopeStability, learningCurve, transferMatrix,
      lofoImportance, abWelch, cupedReadout, naiveBayes, poissonBootstrap,
      woeIv, ksTest, tostEquivalence, ridgePath, pca2d, mannWhitney,
      chiSquare, logitNewton, permutationTest, groupedOls,
      groupedLogitNewton, liftGains, kendallTau, spearmanRho, sesForecast,
      madAnomaly, cusumDrift, benfordAudit, runsTest, theilSen,
      kaplanMeier, logRank)
}
